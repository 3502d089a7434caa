package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-table facade (SURVEY.md §7.3).
  *
  * The north star targets Iceberg tables (BASELINE.json:6,14,15), but no
  * iceberg-spark-runtime jar exists in this zero-egress sandbox (SURVEY.md
  * §0). This facade keeps the pipeline source-agnostic: the `Parquet` backend
  * writes Spark-catalog parquet tables (hive-style partition dirs — the same
  * logical layout Iceberg's identity/bucket partition transforms produce) and
  * is what every test exercises; the `Iceberg` backend issues the equivalent
  * `USING iceberg` DDL and drops in unchanged when a runtime jar is present
  * (set spark.sql.catalog.* + TableIO.Iceberg — documented gap, README).
  */
sealed trait TableIO {
  def read(spark: SparkSession, name: String): DataFrame
  def write(df: DataFrame, name: String, partitionCols: Seq[String] = Nil,
            mode: SaveMode = SaveMode.Overwrite): Unit
}

object TableIO {

  /** Path-backed parquet tables under a warehouse root. */
  final case class Parquet(warehouse: String) extends TableIO {
    private def path(name: String) = s"$warehouse/$name"
    def read(spark: SparkSession, name: String): DataFrame =
      spark.read.parquet(path(name))
    def write(df: DataFrame, name: String, partitionCols: Seq[String],
              mode: SaveMode): Unit = {
      val w = df.write.mode(mode)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(path(name))
    }
  }

  /** Iceberg catalog tables — identical interface; requires an
    * iceberg-spark-runtime jar on the classpath at session-build time
    * (unavailable in this sandbox; compiles, not exercised by tests). */
  final case class Iceberg(catalog: String) extends TableIO {
    def read(spark: SparkSession, name: String): DataFrame =
      spark.read.table(s"$catalog.$name")
    def write(df: DataFrame, name: String, partitionCols: Seq[String],
              mode: SaveMode): Unit = {
      val w = df.writeTo(s"$catalog.$name")
      mode match {
        case SaveMode.Overwrite => w.createOrReplace()
        case _                  => w.append()
      }
    }
  }
}
