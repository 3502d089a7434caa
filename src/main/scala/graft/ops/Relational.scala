package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins, composed from existing ops
  * (the preferred extension path — no custom physical operator needed).
  */
object Relational {

  /** Point-in-time ("as-of") join: every left row gets the payload of the
    * LATEST right row with the same key and right ts <= left ts (inclusive)
    * — the feature-store / training-data join that prevents time leakage.
    *
    * Spark-first formulation: NO theta/range join (which would explode into
    * a per-key cross product). Both sides are unioned with a side tag, one
    * window pass per key carries the last non-null payload forward in
    * (ts, side) order — right rows sort before left rows at equal ts, which
    * is exactly the inclusive as-of rule — then left rows are filtered back
    * out. One shuffle on key; the sort is per key partition. At 100 TB this
    * is the formulation that scales; DuckDB's ASOF JOIN replays it exactly
    * (q_join_asof carries an exact oracle).
    *
    * Contract: right rows unique per (key, ts). Result = left columns plus
    * an `asof` struct of `payload` columns (null when no right row precedes
    * the left row — filter on it for inner semantics). The working columns
    * `_ts`/`_side`/`_p` and the output column `asof` are RESERVED: inputs
    * already carrying any of them are rejected up front (silent shadowing
    * would corrupt the result). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val reserved = Seq("_ts", "_side", "_p", "asof")
    val clashes = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"asofJoin: input columns ${clashes.mkString(", ")} clash with reserved " +
        s"working/output columns (${reserved.mkString(", ")}) — rename them first")
    val l2 = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r2 = right.select(
      col(key),
      col(rightTs).as("_ts"),
      lit(0).as("_side"),
      struct(payload.map(col): _*).as("_p"))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_ts", "_side", "_p")
  }
}
