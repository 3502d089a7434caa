package graft

import graft.streaming.StreamOps
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Structured-Streaming throughput smoke (BENCH completeness: StreamOps was
  * correctness-tested only). Drives a deterministic synthetic event stream
  * through the two sessionization paths — the custom
  * flatMapGroupsWithState [[StreamOps.sessionize]] and the built-in
  * session_window aggregation — in micro-batches via MemoryStream, and
  * prints one JSON line per op with end-to-end events/sec (data injection +
  * every microbatch + state eviction included).
  *
  *   sbt "runMain graft.StreamBench [cpus] [nEvents] [batches]"
  *
  * Event pattern (no RNG — reproducible anywhere): U users round-robin; each
  * user's k-th event is base + k minutes + (k/40)*3h, so every 40 events a
  * >gap jump closes a session. Numbers land in BENCH/BASELINE.md; this is a
  * single-box smoke, not a cluster claim — at scale the same queries run on
  * a real source with state in the configured store per partition.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val nEvents = if (args.length > 1) args(1).toInt else 1000000
    val batches = if (args.length > 2) args(2).toInt else 20
    val users = 1000
    val gapMs = 30L * 60 * 1000
    val baseMs = 1700000000000L

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def eventsFor(b: Int, perBatch: Int): Seq[(Long, Timestamp)] =
      (b * perBatch until (b + 1) * perBatch).map { g =>
        val user = (g % users).toLong
        val k = g / users // per-user sequence number, in ts order
        (user, new Timestamp(baseMs + k * 60000L + (k / 40) * 3 * 3600000L))
      }

    def run(op: String)(start: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.streaming.DataStreamWriter[_]): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, Timestamp)]
      val q = start(in.toDF().toDF("user_id", "ts")).start()
      val perBatch = nEvents / batches
      val t0 = System.nanoTime()
      for (b <- 0 until batches) {
        in.addData(eventsFor(b, perBatch))
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val out = spark.table(s"sb_$op").count()
      q.stop()
      val n = perBatch * batches
      println(f"""{"bench":"stream","op":"$op","cpus":$cpus,"events":$n,"batches":$batches,"sec":$sec%.3f,"events_per_sec":${n / sec}%.0f,"rows_out":$out}""")
    }

    run("sessionize") { df =>
      StreamOps.sessionize(df, gapMs).writeStream
        .format("memory").queryName("sb_sessionize").outputMode("append")
    }
    run("session_window") { df =>
      StreamOps.sessionWindowCounts(df, gap = "30 minutes").writeStream
        .format("memory").queryName("sb_session_window").outputMode("append")
    }
    spark.stop()
  }
}
