package graft.kg

import graft.text.{Extract, TextModel}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The dataflow stages of the KG pipeline (SURVEY.md §2 Table A), expressed
  * Catalyst-first: scan/filter/partition/sentence-split/tokenize are pure
  * built-in expressions (pushdown, pruning and whole-stage codegen apply);
  * the only UDF islands are the three the spec sanctions (BASELINE.json:6):
  * HTML extraction, and the fused mention-detect/featurize/score step against
  * broadcast dictionary + weights.
  */
object Stages {

  /** A2 + explicit url-hash partitioning (BASELINE.json:6). `part_id` is the
    * checkpoint/lineage unit; pmod(xxhash64(url), P) so assignment is stable
    * across cluster sizes and runs. */
  def partitioned(webpages: DataFrame, langs: Seq[String], numParts: Int,
                  repartitionInput: Boolean = true): DataFrame = {
    val filtered = webpages
      .filter(col("lang").isin(langs: _*) && col("html").isNotNull)
      .select(col("url"), col("html"),
        pmod(xxhash64(col("url")), lit(numParts.toLong)).cast("int").as("part_id"))
    // The repartition ships (url, html) once so extraction, checkpointing and
    // lineage are per-partition in the reference's sense. For input already
    // bucketed by url (or when checkpoint granularity may follow input splits)
    // set repartitionInput=false and skip the exchange entirely.
    if (repartitionInput) filtered.repartition(numParts, col("part_id")) else filtered
  }

  /** A3 — HTML→text, the pinned byte-identical extractor. Default path is the
    * native Catalyst expression (codegen-fused, null-intolerant — SURVEY.md
    * §4.3); the udf() wrapper is kept for the equivalence spec. */
  val extractTextUdf = udf((html: Array[Byte]) => Extract.text(html))

  def pageText(partitioned: DataFrame): DataFrame =
    partitioned.select(col("url"), col("part_id"),
      graft.plans.GraftExtensions.extractText(col("html")).as("text"))

  /** A4 — UDF-free sentence split: built-in split + posexplode Generator. */
  def sentences(pageText: DataFrame): DataFrame =
    pageText
      .select(col("url"), col("part_id"),
        posexplode(split(col("text"), TextModel.SentenceSplitRegex)).as(Seq("sent_idx", "sent")))
      .filter(length(col("sent")) > 0)

  /** A5 — UDF-free tokenization: lower + split + higher-order filter, kept as
    * an ArrayType column (not exploded) for batching. */
  def tokenized(sentences: DataFrame): DataFrame =
    sentences.withColumn("tokens",
      filter(split(lower(col("sent")), TextModel.TokenSplitRegex), t => length(t) > 0))

  /** A6–A10 fused: greedy dictionary scan → ordered pair candidates →
    * hashed featurization → broadcast-weights scoring → linked relations.
    * One narrow UDF (tokens in, scored relations out) so Catalyst can prune
    * every other column; accumulators feed per-run metrics (A14 — approximate
    * under task retries, see Pipeline.RunStats). mentionMode "scan" | "aho"
    * selects the A6 implementation (Pipeline.Config scaladoc). */
  def relations(tokenized: DataFrame, model: Broadcast[KgModel],
                accMentions: Option[LongAccumulator] = None,
                accCandidates: Option[LongAccumulator] = None,
                mentionMode: String = "scan"): DataFrame = {
    require(mentionMode == "scan" || mentionMode == "aho",
      s"unknown mentionMode '$mentionMode' (expected scan|aho)")
    val useAho = mentionMode == "aho"
    val scoreUdf = udf { (tokens: Seq[String]) =>
      val m = model.value
      val toks = tokens.toIndexedSeq
      val ms = if (useAho) m.aho.scanGreedy(toks) else m.scanMentions(toks)
      accMentions.foreach(_.add(ms.length.toLong))
      if (ms.length >= 2) {
        accCandidates.foreach(_.add((ms.length.toLong * (ms.length - 1))))
        m.scoreRelations(toks, ms)
      } else Seq.empty[ScoredRelation]
    }
    tokenized
      .select(col("url"), col("part_id"), explode(scoreUdf(col("tokens"))).as("rel"))
      .select(col("url"), col("part_id"),
        col("rel.subj").as("subj"), col("rel.pred").as("pred"),
        col("rel.obj").as("obj"), col("rel.score").as("score"))
  }

  /** End-to-end A1→A10: webpages → scored relation mentions. */
  def extractRelations(webpages: DataFrame, model: Broadcast[KgModel],
                       langs: Seq[String], numParts: Int,
                       repartitionInput: Boolean = true,
                       accMentions: Option[LongAccumulator] = None,
                       accCandidates: Option[LongAccumulator] = None,
                       mentionMode: String = "scan"): DataFrame =
    relations(
      tokenized(sentences(pageText(partitioned(webpages, langs, numParts, repartitionInput)))),
      model, accMentions, accCandidates, mentionMode)

  /** A11 phase 1 — per-part partial canonicalization. Keyed by part_id first:
    * after the explicit repartition the rows are already hash-distributed by
    * part_id, so this aggregation needs NO shuffle, and part_id acts as the
    * salt that spreads hot (subj,pred,obj) keys over partitions
    * (BASELINE.json:6 "salted-key groupBy to defeat skew on hot entities").
    *
    * min_str(url) ≡ min(url), but the built-in min over a string buffer (and
    * min_by, and min(struct)) are declarative aggregates Spark can only plan
    * as SortAggregate — a full sort of the relation stream. min_str is a
    * TypedImperativeAggregate (graft.plans.StringMinAgg) that keeps the whole
    * aggregation on the hash-based ObjectHashAggregate path
    * (PlanAuditSpec asserts; quantified in BENCH/BASELINE.md). */
  def partialTriples(relations: DataFrame): DataFrame =
    relations.groupBy(col("part_id"), col("subj"), col("pred"), col("obj"))
      .agg(count(lit(1)).as("n"), max(col("score")).as("score"),
        graft.plans.GraftExtensions.minStr(col("url")).as("first_url"))

  /** A11 phase 2 — merge partials globally (the one unavoidable shuffle; all
    * measures are algebraic so partial+final loses nothing). */
  def mergeTriples(partials: DataFrame): DataFrame =
    partials.groupBy(col("subj"), col("pred"), col("obj"))
      .agg(sum(col("n")).as("n_evidence"), max(col("score")).as("score"),
        graft.plans.GraftExtensions.minStr(col("first_url")).as("first_url"))

  /** Generic salted two-phase aggregation, exposed for the harness
    * (q_agg_twophase) and CanonicalizeSpec: equivalent by algebra to the
    * single groupBy for algebraic measures. */
  def saltedTwoPhase(df: DataFrame, keys: Seq[String], saltExpr: Column, salts: Int)(
      aggs: (Seq[Column], Seq[Column])): DataFrame = {
    val (phase1, phase2) = aggs
    val kCols = keys.map(col)
    df.withColumn("_salt", pmod(saltExpr, lit(salts.toLong)))
      .groupBy(kCols :+ col("_salt"): _*).agg(phase1.head, phase1.tail: _*)
      .groupBy(kCols: _*).agg(phase2.head, phase2.tail: _*)
  }

  /** Output bucket column for materialization: same logical layout as an
    * Iceberg bucket(B, subj) partition transform (SURVEY.md §7.3). */
  def subjBucket(numBuckets: Int): Column =
    pmod(xxhash64(col("subj")), lit(numBuckets.toLong)).cast("int").as("bucket")
}
