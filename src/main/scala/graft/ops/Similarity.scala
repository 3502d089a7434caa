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
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Dot product of two array<float|double> columns (deterministic left
    * fold): the native loop expression [[graft.plans.VecDotExpr]] —
    * bit-identical to the previous aggregate(zip_with(...)) HOF formulation
    * (same products, same left-to-right IEEE addition order from 0.0, same
    * NULL semantics; VecDotExpr scaladoc + OpsSpec fuzz pin it) but
    * JIT-compilable: array HOFs are CodegenFallback, which made every
    * per-pair cosine in the join hot paths interpreted (~20µs/pair at 64
    * dims — measured ~6x on q_dedup_embed at sf0.1). */
  def dot(a: Column, b: Column): Column =
    graft.plans.GraftExtensions.vecDot(a, b)

  /** L2 norm of an array<float|double> column. Precompute this ONCE PER ROW
    * before a pairwise join: cosine of a pair is then dot/(normA*normB) with
    * bit-identical value (same sqrt of the same fold), but the per-pair work
    * drops from three array folds to one — the dominant cost of every
    * pairwise-scoring op here. sqrt(dot(v,v)) IS the previous HOF fold:
    * products x*x in index order from 0.0. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Brute-force top-k: for each query row, rank all candidates by cosine
    * (desc, candidate id tie-break). queries should be small (broadcast). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cos"))
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `planes` pseudo-random hyperplanes (deterministic hash of (dim, plane) —
    * no RNG state, reproducible anywhere). mode=PortableMd5 derives the plane
    * weights from the md5-60 family instead of xxhash64 — same plan shape,
    * and an external SQL engine can replay the bucket assignment bit-exactly
    * (the q_embed_lsh_topk oracle; xxhash64 stays the scale default). */
  /** Plane component w[d] = centered hash in [-0.5, 0.5). Computed on the
    * DRIVER with the same bit semantics as the engine hash expressions —
    * xxhash64(int d, int p) is XXH64.hashInt(p, XXH64.hashInt(d, 42)) (seed
    * 42, column-chained), md5h60 is the first 15 md5 hex chars as a long —
    * so the literal weights equal what a per-row hash expression would
    * produce (OpsSpec asserts equality against the runtime expressions). */
  private[graft] def planeWeight(d: Int, p: Int, mode: HashMode): Double = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h = mode match {
      case HashMode.XxHash =>
        val x = XXH64.hashInt(p, XXH64.hashInt(d, 42L))
        ((x % 1000000L) + 1000000L) % 1000000L // pmod
      case HashMode.PortableMd5 =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"${d}_$p".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L
    }
    h.toDouble / 1000000.0 - 0.5
  }

  def lshBucket(vec: Column, dims: Int, planes: Int,
                mode: HashMode = HashMode.XxHash): Column = {
    // The weights depend only on (d, p), so they are computed ONCE on the
    // driver and embedded as a literal array per plane: the per-row work is
    // then a pure zip_with/aggregate dot product, not dims×planes hash
    // evaluations per row (measured ~6x on q_dedup_embed at sf0.1).
    // vec_dot (native loop codegen, not zip_with/aggregate HOFs, which are
    // interpreted CodegenFallback): same products in the same left-to-right
    // addition order as the previous HOF form, so the dot — and therefore
    // the bucket — is bit-identical (the w[d] literals are unchanged).
    val signBits = (0 until planes).map { p =>
      val weights = (0 until dims).map(d => planeWeight(d, p, mode)).toArray
      val dotP = dot(vec, lit(weights))
      when(dotP >= 0, shiftleft(lit(1L), p).cast("long")).otherwise(lit(0L))
    }
    signBits.reduce((a: Column, b: Column) => a + b)
  }

  /** DuckDB CTE body replaying lshBucket(mode=PortableMd5) over the
    * `embeddings` table: (vec_id, embedding, bucket). The dot product is a
    * list_reduce left fold in dimension order, matching Spark's aggregate()
    * fold exactly (0.0 + x1 == x1, so the rounding sequence is identical). */
  def lshBucketOracleSql(dims: Int, planes: Int): String = {
    val terms = (0 until planes).map { p =>
      val w = s"((${Portable.md5h60Sql(s"(d-1)::VARCHAR || '_$p'")} % 1000000)" +
        "/1000000.0 - 0.5)"
      val dot = s"list_reduce(list_transform(range(1, ${dims + 1}), " +
        s"d -> embedding[d]::DOUBLE * $w), (s, x) -> s + x)"
      s"(CASE WHEN $dot >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    s"SELECT vec_id, embedding, ($terms) AS bucket FROM embeddings"
  }

  /** DuckDB SQL replaying [[cosine]] with the engine's exact arithmetic:
    * dot/(norm(a)*norm(b)), each factor a dimension-order left fold (DuckDB's
    * init-less list_reduce equals Spark's aggregate-from-0.0 fold because
    * 0.0 + x == x bit-exactly). Oracles use THIS instead of DuckDB's native
    * list_cosine_similarity so a cosine landing within an ulp of a threshold
    * or rank tie can never split the engines (ADVICE r3). */
  def cosineSql(a: String, b: String, dims: Int): String =
    s"(${dotSql(a, b, dims)} / (${normSql(a, dims)} * ${normSql(b, dims)}))"

  /** DuckDB replay of [[dot]] (dimension-order left fold, double math). */
  def dotSql(a: String, b: String, dims: Int): String =
    s"list_reduce(list_transform(range(1, ${dims + 1}), " +
      s"d -> $a[d]::DOUBLE * $b[d]::DOUBLE), (s, x) -> s + x)"

  /** DuckDB replay of [[norm]]. */
  def normSql(v: String, dims: Int): String = s"sqrt(${dotSql(v, v, dims)})"

  /** IVF-flat centroids: deterministic seeding (the k vectors with smallest
    * hash(id); id tie-break) + `iterations` Lloyd steps computed relationally
    * (posexplode → per-(cell,dim) mean → re-collect). Returns dense centroid
    * vectors. k is small (≤ a few hundred): centroids broadcast as plain
    * arrays. mode=PortableMd5 seeds by md5h60(id) so an external SQL engine
    * can derive the identical seed set — with iterations=0 (seed vectors ARE
    * the centroids) the whole assign/probe/rank pipeline is then replayable
    * bit-exactly in DuckDB ([[ivfTopKOracleSql]]); XxHash + Lloyd stays the
    * scale default. */
  def ivfCentroids(data: DataFrame, idCol: String, vecCol: String, k: Int,
                   iterations: Int = 2,
                   mode: HashMode = HashMode.XxHash): Array[Array[Double]] = {
    val spark = data.sparkSession
    val seedHash = mode match {
      case HashMode.XxHash => xxhash64(col(idCol))
      case HashMode.PortableMd5 => Portable.md5h60(col(idCol).cast("string"))
    }
    val seeded = data
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"), seedHash.as("h"))
      .orderBy(col("h"), col("id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    var centroids = seeded
    for (_ <- 1 to iterations) {
      val assigned = ivfAssign(data, idCol, vecCol, centroids)
      val means = assigned
        .select(col("cell"), posexplode(asDouble(col("vec"))).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"), transform(col("dm"), s => s.getField("m")).as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length && i < b.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) -1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Assign each vector to its nearest centroid by cosine (broadcast
    * centroids, narrow UDF — the classic IVF partitioning step). */
  def ivfAssign(data: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]]): DataFrame = {
    val assignUdf = udf { (v: Seq[Float]) =>
      val vd = v.map(_.toDouble).toArray
      var best = 0; var bestS = Double.NegativeInfinity; var c = 0
      while (c < centroids.length) {
        val s = cosineLocal(vd, centroids(c)); if (s > bestS) { bestS = s; best = c }; c += 1
      }
      best
    }
    data.select(col(idCol).as("id"), col(vecCol).as("vec"),
      assignUdf(transform(col(vecCol), x => x.cast("float"))).as("cell"))
  }

  /** IVF search: probe the nprobe nearest cells per query, equi-join
    * candidates on cell, rank by cosine — candidate generation touches only
    * ~nprobe/k of the corpus (the scale path; recall measured vs brute force
    * in OpsSpec). */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
              centroids: Array[Array[Double]], nprobe: Int, k: Int): DataFrame = {
    val probeUdf = udf { (v: Seq[Float]) =>
      val vd = v.map(_.toDouble).toArray
      centroids.indices
        .map(c => (c, cosineLocal(vd, centroids(c))))
        .sortBy { case (c, s) => (-s, c) }.take(nprobe).map(_._1)
    }
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"),
        explode(probeUdf(transform(col(vecCol), x => x.cast("float")))).as("cell")))
    val c = ivfAssign(candidates, idCol, vecCol, centroids)
      .select(col("id").as("neighbor_id"), col("vec").as("cv"),
        norm(col("vec")).as("cn"), col("cell"))
    val scored = c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cos"))
  }

  /** DuckDB replay of the FULL harness-mode IVF pipeline —
    * ivfCentroids(mode=PortableMd5, iterations=0) seeding, nearest-centroid
    * assignment, nprobe probing, in-cell cosine ranking — over the
    * `embeddings` table. Exactness argument: seeds are the k rows with
    * smallest md5h60(vec_id) (id tie-break, both engines); every cosine is
    * the [[cosineSql]] fold replay (the assign/probe UDFs accumulate
    * dot/normA/normB in one dimension-order loop — the same fold sequence);
    * all argmax/rank tie-breaks are (score DESC, index ASC) in both engines.
    * queryFilterSql e.g. "WHERE vec_id < 8". */
  def ivfTopKOracleSql(k: Int, nprobe: Int, topK: Int, dims: Int,
                       queryFilterSql: String): String = {
    def cos(a: String, b: String) = cosineSql(a, b, dims)
    s"WITH seeds AS (SELECT cv, cell FROM (SELECT embedding AS cv, " +
      s"row_number() OVER (ORDER BY ${Portable.md5h60Sql("vec_id::VARCHAR")}, vec_id) - 1 " +
      s"AS cell FROM embeddings) WHERE cell < $k), " +
      s"assigned AS (SELECT vec_id, embedding, cell FROM (SELECT e.vec_id, e.embedding, " +
      s"s.cell, row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
      s"${cos("e.embedding", "s.cv")} DESC, s.cell) AS rn FROM embeddings e " +
      s"CROSS JOIN seeds s) WHERE rn = 1), " +
      s"probes AS (SELECT query_id, qv, cell FROM (SELECT q.vec_id AS query_id, " +
      s"q.embedding AS qv, s.cell, row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
      s"${cos("q.embedding", "s.cv")} DESC, s.cell) AS rn FROM " +
      s"(SELECT * FROM embeddings $queryFilterSql) q CROSS JOIN seeds s) WHERE rn <= $nprobe), " +
      s"scored AS (SELECT p.query_id, a.vec_id AS neighbor_id, " +
      s"${cos("p.qv", "a.embedding")} AS cos FROM probes p JOIN assigned a " +
      s"ON p.cell = a.cell WHERE p.query_id <> a.vec_id) " +
      s"SELECT query_id, neighbor_id, rnk FROM (SELECT query_id, neighbor_id, " +
      s"cast(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) " +
      s"as bigint) AS rnk FROM scored) WHERE rnk <= $topK"
  }

  /** Bucketed ANN: join queries to candidates sharing an LSH bucket, then
    * rank within bucket — candidate generation is an equi-join (shuffle on
    * bucket), never a cross product. Recall < 1 by construction; increase
    * `probes` by unioning neighbor buckets if needed.
    *
    * broadcastQueries=true ships the query side to every executor — right
    * when the query set is driver-memory small (the interactive case). For a
    * query set that is itself a large table (batch kNN join), pass false: the
    * join becomes a plain shuffle equi-join on bucket, both sides
    * hash-partitioned — no driver bottleneck (results identical; asserted by
    * OpsSpec/PlanAuditSpec). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, dims: Int, planes: Int, k: Int,
              broadcastQueries: Boolean = true,
              mode: HashMode = HashMode.XxHash): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"),
      lshBucket(col(vecCol), dims, planes, mode).as("bucket"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"),
      lshBucket(col(vecCol), dims, planes, mode).as("bucket"))
    val scored = c.join(if (broadcastQueries) broadcast(q) else q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cos"))
  }
}
