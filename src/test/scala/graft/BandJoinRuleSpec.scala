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

  test("date band join (date_add width): exact Int-days bucketing") {
    // dates straddling the epoch so negative day counts hit the floor-div
    // path; W=10 days
    def q = {
      val v = (-40 to 40).map(i => java.sql.Date.valueOf(
        java.time.LocalDate.of(1970, 1, 1).plusDays(i * 3L))).toDF("d")
      val a = v.select(col("d").as("da"))
      val b = v.select(col("d").as("db"))
      a.join(b, col("db") >= col("da") && col("db") <= date_add(col("da"), 10))
        .groupBy(col("da")).agg(count(lit(1)).as("n"))
    }
    val (res, plan) = offOnPlan(q)
    assert(res.length == 81, plan)
    assert(plan.contains("__graft_band_bucket"), plan)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  private def qDbl(vals: Seq[java.lang.Double], w: Double,
                   strictUpper: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val v = spark.createDataFrame(
      new java.util.ArrayList[Row](vals.map(Row(_)).asJava),
      StructType(Seq(StructField("x", DoubleType, nullable = true))))
    val a = v.select(col("x").as("xa"))
    val b = v.select(col("x").as("xb"))
    val upper = if (strictUpper) col("xb") < col("xa") + lit(w)
                else col("xb") <= col("xa") + lit(w)
    a.join(b, col("xb") >= col("xa") && upper)
  }

  test("double bands ARE rewritten and survive the rounding boundary") {
    // Rounding counterexample: floor(0.3/0.1)=2 but floor(0.4/0.1)=4 in
    // double arithmetic even though 0.4 <= 0.3 + 0.1 holds — a 2-value
    // exploded anchor dropped this pair; the 7-value window must keep it.
    val boundary = qDbl(Seq(0.3, 0.4, 2.4999999999999996, 5.0), 0.1)
    assert(boundary.queryExecution.executedPlan.toString.contains("__graft_band_bucket"),
      "double band must now be bucket-rewritten")
    val pairs = boundary.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(pairs.contains((0.3, 0.4)), s"boundary pair dropped: $pairs")
    // second counterexample from the wider-width family (W=2.5)
    val wide = qDbl(Seq(2.4999999999999996, 5.0), 2.5)
    val widePairs = wide.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(widePairs.contains((2.4999999999999996, 5.0)), s"dropped: $widePairs")
    // general off/on equality with the rewrite active
    def q = qDbl((-20 to 20).map(i => java.lang.Double.valueOf(i * 0.7)), 2.5,
        strictUpper = true)
      .groupBy(col("xa")).agg(count(lit(1)).as("n"))
    val (resD, planD) = offOnPlan(q)
    assert(resD.length == 41, planD)
    assert(planD.contains("__graft_band_bucket"), planD)
    assert(!planD.contains("NestedLoop") && !planD.contains("Cartesian"), planD)
  }

  test("double band guard rails: huge magnitudes, infinities, NaN, nulls") {
    // sentinel territory (|x/W| >= 2^50), the clamp band around it, infinite
    // fl(a+W) (1.5e308 + 1e308 overflows), NaN, nulls — off/on must agree
    val w = 1.0e-3
    val q50 = 1.125899906842624e15 // 2^50 quotients at W=1e-3 -> |x| ~ 1.1e12
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      0.0, 1.0e-3, 2.5e-3, -1.0e-3,
      q50 * w, q50 * w + 1.0, -q50 * w, (q50 - 5.0) * w, (q50 + 5.0) * w,
      (q50 * 2) * w, Double.MaxValue, -Double.MaxValue,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN, null)
    def q = qDbl(vals, w).groupBy(col("xa")).agg(count(lit(1)).as("n"))
    val (_, plan) = offOnPlan(q)
    assert(plan.contains("__graft_band_bucket"), plan)
    // and at a width where a+W overflows to +Inf for max-magnitude anchors:
    // +Inf probes satisfy b <= +Inf and must still pair (sentinel coverage)
    val big: Seq[java.lang.Double] = Seq[java.lang.Double](
      1.5e308, 1.6e308, Double.MaxValue, Double.PositiveInfinity, 0.0, 1.0)
    def qBig = qDbl(big, 1.0e308).groupBy(col("xa")).agg(count(lit(1)).as("n"))
    val (resBig, _) = offOnPlan(qBig)
    assert(resBig.nonEmpty)
  }

  test("double band fuzz: off/on equality on adversarial multiples of W") {
    val rnd = new scala.util.Random(20260818L)
    val widths = Seq(0.1, 2.5, 1.0e-7, 3.7e7, 0.30000000000000004)
    for (w <- widths) {
      // values pinned to k*W with ±ulp nudges — every value sits on a bucket
      // boundary, the worst case for computed-floor drift
      val vals: Seq[java.lang.Double] = (0 until 120).map { _ =>
        val k = rnd.between(-60, 60).toLong
        val base = k * w
        val nudged = rnd.nextInt(3) match {
          case 0 => base
          case 1 => Math.nextUp(base)
          case _ => Math.nextDown(base)
        }
        java.lang.Double.valueOf(nudged)
      }
      val strict = rnd.nextBoolean() // drawn once: off and on must see the same query
      def q = qDbl(vals, w, strictUpper = strict)
        .groupBy(col("xa")).agg(count(lit(1)).as("n"))
      val (_, plan) = offOnPlan(q)
      assert(plan.contains("__graft_band_bucket"), s"W=$w not rewritten:\n$plan")
    }
  }

  test("out-of-scope shapes are left untouched") {
    val e = eventsDf
    // lower bound only (as-of shape): no constant width, no rewrite
    val a = e.select(col("uid").as("uid_a"), col("ts").as("ts_a"))
    val b = e.select(col("uid").as("uid_b"), col("ts").as("ts_b"))
    val asof = a.join(b, col("uid_a") === col("uid_b") && col("ts_b") <= col("ts_a"))
    assert(!asof.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
    // semi with the ANCHOR ON THE LEFT (output side) keeps its plan —
    // exploding the output side would duplicate left rows (here ts_a, the
    // band's anchor, belongs to `a`, the semi join's left input)
    val semiLeftAnchor = a.join(b,
      col("uid_a") === col("uid_b") && col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"), "left_semi")
    assert(!semiLeftAnchor.queryExecution.executedPlan.toString
      .contains("__graft_band_bucket"),
      "left-anchored semi band must stay unrewritten")
    // width must be positive
    val zero = a.join(b, col("uid_a") === col("uid_b") && col("ts_b") > col("ts_a") &&
      col("ts_b") <= col("ts_a") + expr("INTERVAL 0 MINUTES"))
    assert(!zero.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
  }

  test("semi/anti band joins rewrite when the anchor is on the right side") {
    // "events with (semi) / without (anti) a follow-up by the same user
    // within 5 minutes": probe ts_b on the LEFT (output) side, anchor ts_a
    // exploded on the RIGHT — existence preserved, multiplicity untouched
    def q(joinType: String) = {
      val e = eventsDf
      val lead = e.select(col("uid").as("uid_b"), col("ts").as("ts_b"),
        col("etype"))
      val follow = e.select(col("uid").as("uid_a"), col("ts").as("ts_a"))
      lead.join(follow, col("uid_b") === col("uid_a") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"), joinType)
        .groupBy(col("etype")).agg(count(lit(1)).as("n"))
    }
    for (jt <- Seq("left_semi", "left_anti")) {
      def qj = q(jt)
      val (res, plan) = offOnPlan(qj)
      assert(res.nonEmpty, jt)
      assert(plan.contains("__graft_band_bucket"), s"$jt not rewritten:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"$jt:\n$plan")
    }
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
