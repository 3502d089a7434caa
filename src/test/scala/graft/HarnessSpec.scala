package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract spec (SURVEY.md §5.2 HarnessSpec): every SparkEntry query
  * runs on sf0.001 testdata and returns rows; oracle keys ⊆ query keys;
  * the flagship entry smoke-checks rows > 0. */
class HarnessSpec extends AnyFunSuite with SharedSpark {

  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
