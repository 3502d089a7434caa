package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Broadcast-hash-join mention detection (SURVEY.md §2 A6 mode (a)).
  *
  * The default pipeline path scans tokens against a broadcast dictionary map
  * (KgModel.scanMentions — one pass, shuffle-free). This alternative stays
  * fully relational: explode token positions and 2-gram positions, broadcast
  * hash join against the dictionary table, then reconcile overlaps IN-ROW with
  * a sorted greedy fold that reproduces exactly the scan's greedy
  * longest-match semantics (MentionEquivalenceSpec asserts equality).
  * Useful when the dictionary is too large to ship as a JVM map but still fits
  * the broadcast-join threshold, or when mentions themselves are the product.
  */
object MentionJoin {

  /** tokenized(url, part_id, sent_idx, tokens) × dict -> one row per sentence
    * with a `mentions` array<struct> matching KgModel.scanMentions. */
  def mentions(spark: SparkSession, tokenized: DataFrame, dict: DataFrame): DataFrame = {
    val d = broadcast(dict.select(
      col("surface"), col("entity_id"), col("ent_type"), col("canonical"),
      size(split(col("surface"), " ")).as("slen")))

    // candidate match positions: unigrams and 2-grams by position
    val grams = tokenized.select(
      col("url"), col("part_id"), col("sent_idx"), col("tokens"),
      explode(concat(
        transform(col("tokens"), (t, i) => struct(i.as("pos"), t.as("gram"))),
        filter(
          transform(col("tokens"), (t, i) =>
            // get() is the non-ANSI accessor: null past the end, filtered below
            struct(i.as("pos"),
              concat_ws(" ", t, get(col("tokens"), i + 1)).as("gram"))),
          s => s.getField("pos") < size(col("tokens")) - 1))).as("g"))
      .select(col("url"), col("part_id"), col("sent_idx"), col("tokens"),
        col("g.pos").as("pos"), col("g.gram").as("gram"))

    val matched = grams.join(d, grams("gram") === d("surface"))
      .select(col("url"), col("part_id"), col("sent_idx"), col("tokens"),
        struct(col("pos"), col("slen"), col("entity_id"), col("canonical"),
          col("ent_type")).as("m"))

    // in-row greedy reconciliation: sort by (pos asc, slen desc), keep a match
    // iff it starts at/after the scan cursor — equals the greedy scan
    val collected = matched
      .groupBy("url", "part_id", "sent_idx")
      .agg(first(col("tokens")).as("tokens"), collect_list(col("m")).as("ms"))
      .withColumn("ms", array_sort(col("ms"),
        (a, b) => when(a.getField("pos") < b.getField("pos"), -1)
          .when(a.getField("pos") > b.getField("pos"), 1)
          .when(a.getField("slen") > b.getField("slen"), -1)
          .when(a.getField("slen") < b.getField("slen"), 1)
          .otherwise(0)))
      .withColumn("mentions",
        aggregate(
          col("ms"),
          struct(lit(0).as("cursor"),
            array().cast("array<struct<entityId:bigint,canonical:string,entType:string,begin:int,end:int>>")
              .as("out")),
          (acc, m) => {
            val take = m.getField("pos") >= acc.getField("cursor")
            struct(
              when(take, m.getField("pos") + m.getField("slen"))
                .otherwise(acc.getField("cursor")).as("cursor"),
              when(take, array_append(acc.getField("out"),
                struct(m.getField("entity_id").as("entityId"),
                  m.getField("canonical").as("canonical"),
                  m.getField("ent_type").as("entType"),
                  m.getField("pos").cast("int").as("begin"),
                  (m.getField("pos") + m.getField("slen")).cast("int").as("end"))))
                .otherwise(acc.getField("out")).as("out"))
          },
          acc => acc.getField("out")))
      .select(col("url"), col("part_id"), col("sent_idx"), col("tokens"), col("mentions"))
    collected
  }
}
