package graft.kg

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Run-scoped Spark listener for A14 metrics: one JSON line per completed
  * stage (task count, executor run time, input records, shuffle bytes) —
  * appended to the run's metrics.jsonl next to the per-partition lineage in
  * _manifest. */
final class StageMetricsListener extends SparkListener {
  private val rows = TrieMap.empty[Int, String]

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val si = ev.stageInfo
    val tm = si.taskMetrics
    val name = si.name.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(80)
    rows.put(si.stageId,
      s"""{"stage":${si.stageId},"name":"$name","tasks":${si.numTasks},""" +
        s""""run_ms":${tm.executorRunTime},"input_records":${tm.inputMetrics.recordsRead},""" +
        s""""shuffle_write_bytes":${tm.shuffleWriteMetrics.bytesWritten},""" +
        s""""spill_bytes":${tm.diskBytesSpilled}}""")
  }

  def lines: Seq[String] = rows.toSeq.sortBy(_._1).map(_._2)
}
