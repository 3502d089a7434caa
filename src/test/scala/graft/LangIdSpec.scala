package graft

import graft.ops.TextStats
import graft.plans.LangIdRuntime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 native language-ID scan ([[graft.plans.LangIdExpr]],
  * now behind TextStats.langId) against the replace-based marker-gram
  * Catalyst formulation it replaced — identical lang_pred per document on
  * fixture docs and adversarial edge strings. The formulation here is
  * byte-for-byte what the q_lang_id DuckDB oracle replays (same profile
  * constants, single-sourced from LangIdRuntime), so equality here is
  * oracle equality. */
class LangIdSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** The round-5 formulation, verbatim (padded lower text, 50 replace-based
    * occurrence counts, array_sort argmax, < 2 hits or null -> 'und'). */
  private def oldLangId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def occurrences(t: org.apache.spark.sql.Column, g: String) =
      ((length(t) - length(replace(t, lit(g), lit("")))) / g.length).cast("long")
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    val entries = LangIdRuntime.Profiles.map { case (lang, grams) =>
      val hits = grams.map(g => occurrences(padded, g)).reduce(_ + _)
      struct((-hits).as("nh"), lit(lang).as("lang"))
    }
    val best = element_at(array_sort(array(entries: _*)), 1)
    docs.select(col(idCol).as("doc_id"),
      when(col(textCol).isNull || (-best.getField("nh")) < 2, lit("und"))
        .otherwise(best.getField("lang")).as("lang_pred"))
  }

  private def compare(docs: DataFrame): Unit = {
    val got = TextStats.langId(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    val exp = oldLangId(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == exp, {
      val bad = got.keySet.filter(k => got(k) != exp(k)).take(5)
      s"mismatch on ${bad.map(k => s"$k: ${got(k)} != ${exp(k)}")}"
    })
  }

  test("native lang_id == replace-based formulation on fixture docs") {
    compare(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text"))
  }

  test("native lang_id edge cases: null, empty, ties, threshold, case, overlaps") {
    val docs = Seq[(Long, String)](
      (1L, null), (2L, ""), (3L, "x"),
      (4L, "the the the"),               // clear en
      (5L, "der der sch ich"),           // clear de
      (6L, "de de de"),                  // ' de'/'de ' overlap counting, es-vs-fr tie -> es
      (7L, "THE AND ING"),               // lowercasing
      (8L, "的是在了和有中人国一"),          // zh markers
      (9L, "que que"),                   // es/fr shared gram tie -> es
      (10L, "ionion ionion"),            // non-overlapping count semantics
      (11L, " th"), (12L, " th th ")     // threshold boundary (1 vs >=2 hits)
    ).toDF("doc_id", "text")
    compare(docs)
  }

  test("native lang_id identifies planted languages (behavior sanity)") {
    val samples = Seq(
      (1L, "the cat and the dog are sitting of the garden watching the evening"),
      (2L, "der hund und die katze schlafen nicht in der nacht"),
      (3L, "的是在了和有中人国一")).toDF("doc_id", "text")
    val got = TextStats.langId(samples, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "zh", got.toString)
  }
}
