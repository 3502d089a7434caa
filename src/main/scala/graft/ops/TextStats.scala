package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language ID (char-n-gram
  * heuristic), quality scoring, token counting, and winnowing document
  * fingerprints — training-data pipeline ops.
  */
object TextStats {

  /** Tiny per-language character-trigram profiles (hand-pinned marker n-grams;
    * a deterministic heuristic, not a trained model — documented limitation).
    * Score = marker hits per language; argmax with 'und' fallback. */
  private val Profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "ing", " of", "ion", " to", "ed "),
    "de" -> Seq(" de", "der", "ie ", "ein", "sch", "ich", "nd ", "die", "und", "cht"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", "ión", "ent", " el", "que", "ado"),
    "fr" -> Seq(" de", "de ", " le", "es ", "le ", "ent", " la", "que", "ion", "eur"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "中", "人", "国", "一"))

  /** UDF island: count marker hits per language, emit argmax (ties → language
    * name order; < 2 hits → "und"). */
  val langIdUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) "und"
    else {
      val t = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
      val best = Profiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
        var hits = 0
        grams.foreach { g =>
          var idx = t.indexOf(g)
          while (idx >= 0) { hits += 1; idx = t.indexOf(g, idx + 1) }
        }
        (lang, hits)
      }.maxBy(_._2)
      if (best._2 >= 2) best._1 else "und"
    }
  }

  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), langIdUdf(col(textCol)).as("lang_pred"))

  /** Quality stats, all integer-exact (oracle-friendly): chars, tokens,
    * non-space chars, longest token, alpha-char count. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      length(regexp_replace(col(textCol), " ", "")).cast("long").as("n_nonspace"),
      coalesce(array_max(transform(toks, t => length(t))), lit(0)).cast("long")
        .as("max_token_len"))
  }

  /** Whitespace + BPE-ish token counts: whitespace tokens, and subword-ish
    * pieces via a pinned regex (letter runs, digit runs, single punct). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(filter(split(col(textCol), "\\s+"), t => length(t) > 0))
        .cast("long").as("ws_tokens"),
      size(filter(split(col(textCol), "(?<=[^\\p{L}\\p{Nd}])|(?=[^\\p{L}\\p{Nd}])"),
        t => length(t) > 0 && t =!= " ")).cast("long").as("bpeish_tokens"))

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): rolling hashes of
    * char k-grams, minimum per window, distinct — the standard near-dup /
    * provenance fingerprint. Pure Catalyst: substring k-grams via transform
    * over a sequence, window-min via nested slice. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val txt = col(textCol)
    // Shape note: the k-gram hashes are one flat HOF over the text column
    // (O(n) per row), then EXPLODED so the sliding-window minimum runs as a
    // frame window function. Nesting array_min(slice(grams,...)) inside a
    // lambda re-inlines the gram computation per element after
    // CollapseProject — O(n^2) per row, measured 537s vs ~1s on sf0.1.
    val nGrams = length(txt) - (k - 1)
    val grams = docs
      .filter(nGrams >= 1) // guard: sequence(a, b) DESCENDS when a > b
      .select(col(idCol).as("doc_id"),
        greatest(nGrams - (window - 1), lit(1)).as("nkeep"), // known pre-explode
        posexplode(transform(sequence(lit(1), nGrams),
          i => xxhash64(txt.substr(i, lit(k))))).as(Seq("pos", "h")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    val nWinOk = grams
      .withColumn("winmin", min(col("h")).over(w))
      .filter(col("pos") < col("nkeep")) // drop ragged tail frames
    nWinOk.groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("winmin"))).as("fingerprint"))
      .filter(size(col("fingerprint")) > 0)
  }
}
