package graft

import graft.fixtures.Gen
import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM, plus
  * lazily-generated fixture directories (idempotent; FIXTURES.md §2).
  */
object SparkKit {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val fixturesRoot = "/root/repo/fixtures"

  /** sf0.001 webtext fixture (~500 pages), generated once per checkout. */
  lazy val sf0001: String = synchronized {
    val dir = s"$fixturesRoot/sf0.001"
    Gen.generate(session, dir, Gen.pageCount(0.001))
    dir
  }

  /** sf0.01 webtext fixture (~5,000 pages). */
  lazy val sf001: String = synchronized {
    val dir = s"$fixturesRoot/sf0.01"
    Gen.generate(session, dir, Gen.pageCount(0.01))
    dir
  }
}

trait SharedSpark { self: org.scalatest.Suite =>
  lazy val spark: SparkSession = SparkKit.session
}
