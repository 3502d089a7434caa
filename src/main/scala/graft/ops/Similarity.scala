package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — training-data pipeline op.
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, score every
  * candidate, windowed rank). Scale path: LSH bucketing via random-hyperplane
  * signs so candidate generation is an equi-join on bucket instead of a full
  * cross product — same pattern as Dedup.minhashBands.
  * All math in double precision via higher-order functions (codegen'd;
  * deterministic left-fold order — no UDF).
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Cosine similarity of two array<float|double> columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = aggregate(transform(ad, x => x * x), lit(0.0), (s, x) => s + x)
    val nb = aggregate(transform(bd, x => x * x), lit(0.0), (s, x) => s + x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force top-k: for each query row, rank all candidates by cosine
    * (desc, candidate id tie-break). queries should be small (broadcast). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cos"))
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `planes` pseudo-random hyperplanes (deterministic from xxhash64 of
    * (dim, plane) — no RNG state, reproducible anywhere). */
  def lshBucket(vec: Column, dims: Int, planes: Int): Column = {
    val signBits = (0 until planes).map { p =>
      // plane component w[d] = centered hash in [-0.5, 0.5)
      val dot = aggregate(
        zip_with(asDouble(vec), sequence(lit(0), lit(dims - 1)),
          (x, d) => x * (pmod(xxhash64(d, lit(p)), lit(1000000L)).cast("double") / 1000000.0 - 0.5)),
        lit(0.0), (s, x) => s + x)
      when(dot >= 0, shiftleft(lit(1L), p).cast("long")).otherwise(lit(0L))
    }
    signBits.reduce((a: Column, b: Column) => a + b)
  }

  /** Bucketed ANN: join queries to candidates sharing an LSH bucket, then
    * rank within bucket — candidate generation is an equi-join (shuffle on
    * bucket), never a cross product. Recall < 1 by construction; increase
    * `probes` by unioning neighbor buckets if needed. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, dims: Int, planes: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), dims, planes).as("bucket"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), dims, planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cos"))
  }
}
