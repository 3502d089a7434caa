package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 jaccardPairs internals change: per-doc set sizes are
  * now computed directly as size(shingleSet) in UNCAPPED mode (no explode,
  * no groupBy) and the inverted-index self-join is merge-hinted for
  * exchange reuse. Results must equal the round-5 exploded-sizes
  * formulation on graphs with duplicate docs, near-dups, empty and
  * single-token docs — including the degenerate rows the direct-size form
  * KEEPS in `sizes` (zero-token docs) that the exploded form dropped:
  * provably irrelevant because such docs never reach `inter`. */
class JaccardSizesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Round-5 sizes formulation: count the exploded distinct shingles. */
  private def oldJaccard(docs: DataFrame, shingleN: Int, pct: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), col("block"),
      explode(Dedup.shingleSet(col("text"), shingleN)).as("shingle"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * 100 >= col("uni") * pct)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  test("direct-size jaccardPairs == exploded-size formulation incl. degenerate docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma delta", "s1"), // exact dup of 1
      (3L, "alpha beta gamma zeta", "s1"),  // near dup of 1/2
      (4L, "unrelated words entirely here", "s1"),
      (5L, "", "s1"),                        // zero tokens
      (6L, "   ", "s1"),                     // whitespace only -> zero tokens
      (7L, "alpha", "s1"),                   // single token
      (8L, "alpha beta gamma delta", "s2")   // dup text, different block
    ).toDF("doc_id", "text", "block")
    for (pct <- Seq(30, 50, 80); n <- Seq(1, 2)) {
      val got = Dedup.jaccardPairs(docs, "doc_id", "text", "block", n, pct)
        .as[(Long, Long, Long, Long)].collect().toSet
      val exp = oldJaccard(docs, n, pct)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == exp, s"pct=$pct n=$n: $got != $exp")
    }
    // sanity: the planted dups ARE found at 50%, cross-block dup is not
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "block", 1, 50)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 8L || b == 8L })
  }
}
