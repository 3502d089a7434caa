package graft

import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the AQE-assisted skew-join handling the pipeline relies on
  * for high-degree entities (spark.sql.adaptive.skewJoin.enabled in
  * graft.Main): a shuffle join with one hot key must come out of AQE with
  * the hot partition SPLIT across tasks (skew=true) instead of one
  * straggler task. Thresholds are scaled down so toy data crosses them; at
  * 100 TB the defaults (256 MB / factor 5) play the same role. Salting
  * (kg/Stages canonicalization) covers skewed AGGREGATION; this covers
  * skewed JOINS — the two skew mechanisms the north_star names.
  */
class SkewJoinSpec extends AnyFunSuite with SharedSpark {

  test("AQE splits the hot partition of a skewed shuffle join (skew=true)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // toy-scale thresholds: a partition is skewed when > 2x median and
    // > 16 KB; split target 8 KB (defaults: 5x / 256 MB / 64 MB)
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    // key 1 carries ~99% of the left side; the right side is a plain dim
    val hot = (1 to 20000).map(i => (1L, s"payload_padding_padding_$i"))
    val rest = (1 to 200).map(i => (i.toLong + 1, s"p_$i"))
    val left = (hot ++ rest).toDF("k", "v")
    val right = (1 to 201).map(i => (i.toLong, i * 10)).toDF("k", "w")

    val joined = left.join(right, "k")
    val qe = joined.queryExecution
    val n = qe.toRdd.count() // materialize so AQE finalizes the plan
    assert(n == 20000 + 200, s"join row count wrong: $n")
    val plan = qe.executedPlan.toString()
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(plan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$plan")
  }
}
