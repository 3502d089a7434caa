package graft

import graft.plans.BandJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BandJoinRule: band-interval theta joins are rewritten into bucketed
  * equi-joins (exploded anchor bucket pair + probe bucket in the hash key,
  * band kept as exact residual) with results identical to the naive plan. */
class BandJoinRuleSpec extends AnyFunSuite with SharedSpark with BeforeAndAfterAll {

  import spark.implicits._

  override def beforeAll(): Unit = { super.beforeAll(); BandJoinRule.install(spark) }
  override def afterAll(): Unit = { BandJoinRule.uninstall(spark); super.afterAll() }

  /** Run `q` with the rule disabled, then enabled; assert identical sorted
    * results and return the enabled run's physical plan string. */
  private def offOnPlan(q: => DataFrame): (Array[String], String) = {
    spark.conf.set("spark.graft.bandJoin.enabled", "false")
    val off = try q.collect().map(_.toString).sorted
    finally spark.conf.set("spark.graft.bandJoin.enabled", "true")
    val on = q
    val got = on.collect().map(_.toString).sorted
    assert(off.sameElements(got),
      s"rule changed results:\noff=${off.mkString("|")}\non=${got.mkString("|")}")
    (got, on.queryExecution.executedPlan.toString)
  }

  private def eventsDf: DataFrame = {
    // 3 users x 40 events spaced 97s apart — plenty of in-band pairs
    val rows = for (u <- 0 until 3; i <- 0 until 40)
      yield (u.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0).plusSeconds(i * 97L)), s"t${i % 4}")
    rows.toDF("uid", "ts", "etype")
  }

  test("timestamp band join: rewritten to bucketed equi-join, same results") {
    def q = {
      val e = eventsDf
      val a = e.select(col("uid").as("uid_a"), col("ts").as("ts_a"), col("etype"))
      val b = e.select(col("uid").as("uid_b"), col("ts").as("ts_b"))
      a.join(b, col("uid_a") === col("uid_b") && col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("etype")).agg(count(lit(1)).as("n"))
    }
    val (res, plan) = offOnPlan(q)
    assert(res.nonEmpty)
    assert(plan.contains("__graft_band_bucket"),
      s"expected bucketed rewrite in plan:\n$plan")
    // the bucket attr must be IN the hash-join keys, not just projected
    assert(plan.contains("HashJoin [uid_a") || plan.contains("SortMergeJoin [uid_a"),
      s"expected equi join on (uid, bucket):\n$plan")
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("pure band join (no equi conjunct): cartesian becomes equi-join") {
    def q = {
      val e = eventsDf.filter(col("uid") === 0)
      val a = e.select(col("ts").as("ts_a"), col("etype"))
      val b = e.select(col("ts").as("ts_b"))
      a.join(b, col("ts_b") >= col("ts_a") &&
          col("ts_b") < col("ts_a") + expr("INTERVAL 3 MINUTES"))
        .groupBy(col("etype")).agg(count(lit(1)).as("n"))
    }
    val (_, plan) = offOnPlan(q)
    assert(plan.contains("__graft_band_bucket"), plan)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"band-only join must not plan as a product:\n$plan")
  }

  test("numeric band joins bucket correctly, including negative values") {
    // long values straddling zero: floor division must not truncate toward
    // zero or pairs near the sign boundary drop out
    def qLong = {
      val v = (-25L to 25L).toDF("x")
      val a = v.select(col("x").as("xa"))
      val b = v.select(col("x").as("xb"))
      a.join(b, col("xb") >= col("xa") && col("xb") < col("xa") + lit(10L))
        .groupBy(col("xa")).agg(count(lit(1)).as("n"))
    }
    val (resL, planL) = offOnPlan(qLong)
    assert(resL.length == 51 && planL.contains("__graft_band_bucket"), planL)

  }

  test("floating-point bands are NOT rewritten (bucket rounding regression)") {
    // Rounding counterexample: floor(0.3/0.1)=2 but floor(0.4/0.1)=4 in
    // double arithmetic even though 0.4 <= 0.3 + 0.1 holds, so a 2-value
    // exploded anchor would silently drop the (0.3, 0.4) pair. The rule must
    // leave double bands on their natural (correct) plan.
    def q(vals: Seq[Double], w: Double) = {
      val v = vals.toDF("x")
      val a = v.select(col("x").as("xa"))
      val b = v.select(col("x").as("xb"))
      a.join(b, col("xb") >= col("xa") && col("xb") <= col("xa") + lit(w))
    }
    val boundary = q(Seq(0.3, 0.4, 2.4999999999999996, 5.0), 0.1)
    assert(!boundary.queryExecution.executedPlan.toString.contains("__graft_band_bucket"),
      "double band must not be bucket-rewritten")
    val pairs = boundary.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(pairs.contains((0.3, 0.4)), s"boundary pair dropped: $pairs")
    // second counterexample from the wider-width family (W=2.5)
    val wide = q(Seq(2.4999999999999996, 5.0), 2.5)
    assert(!wide.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
    val widePairs = wide.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(widePairs.contains((2.4999999999999996, 5.0)), s"dropped: $widePairs")
    // and the general off/on equality still holds for an arbitrary double band
    def qDouble = {
      val v = (-20 to 20).map(_ * 0.7).toDF("x")
      val a = v.select(col("x").as("xa"))
      val b = v.select(col("x").as("xb"))
      a.join(b, col("xb") >= col("xa") && col("xb") < col("xa") + lit(2.5))
        .groupBy(col("xa")).agg(count(lit(1)).as("n"))
    }
    val (resD, planD) = offOnPlan(qDouble)
    assert(resD.length == 41, planD)
    assert(!planD.contains("__graft_band_bucket"), planD)
  }

  test("out-of-scope shapes are left untouched") {
    val e = eventsDf
    // lower bound only (as-of shape): no constant width, no rewrite
    val a = e.select(col("uid").as("uid_a"), col("ts").as("ts_a"))
    val b = e.select(col("uid").as("uid_b"), col("ts").as("ts_b"))
    val asof = a.join(b, col("uid_a") === col("uid_b") && col("ts_b") <= col("ts_a"))
    assert(!asof.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
    // non-inner join types keep their plan (explode would change semantics)
    val semi = a.join(b, col("uid_a") === col("uid_b") && col("ts_b") > col("ts_a") &&
      col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"), "left_semi")
    assert(!semi.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
    // width must be positive
    val zero = a.join(b, col("uid_a") === col("uid_b") && col("ts_b") > col("ts_a") &&
      col("ts_b") <= col("ts_a") + expr("INTERVAL 0 MINUTES"))
    assert(!zero.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
  }

  test("rule is idempotent under repeated optimizer application") {
    val e = eventsDf
    val a = e.select(col("uid").as("uid_a"), col("ts").as("ts_a"))
    val b = e.select(col("uid").as("uid_b"), col("ts").as("ts_b"))
    val j = a.join(b, col("uid_a") === col("uid_b") && col("ts_b") > col("ts_a") &&
      col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
    val once = j.queryExecution.optimizedPlan
    val twice = BandJoinRule(once)
    assert(twice.fastEquals(once), s"second application must be a no-op:\n$twice")
  }
}
