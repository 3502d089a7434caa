package graft

import graft.fixtures.{Gen, Vocab}
import graft.kg.{KgModel, Pipeline, Stages, Train}
import graft.ops.{Dedup, HashMode, Multimodal, Relational, Similarity, TextStats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver harness contract (SURVEY.md §2 Table B + training-data ops).
  *
  * Every oracle-checked query is designed integer/string-exact so the
  * driver's value-hash compare is bit-stable across Spark and DuckDB:
  * money sums are per-row `cast(round(x*100) as bigint)` cents, counts are
  * bigint, rankings carry deterministic tie-breaks, and DuckDB sums (which
  * widen to int128) are cast back to bigint. Column names are aliased
  * identically on both sides.
  *
  * Signature-based ops (minhash/simhash/fingerprints/LSH buckets) run in
  * HashMode.PortableMd5 here so DuckDB replays them bit-exactly (xxhash64
  * stays the scale default — same plan shape, audited once). The remaining
  * no-oracle queries are approximate or not SQL-expressible BY DESIGN:
  * q_agg_approx (HLL sketch; exact twin in-query), q_pipeline_triples +
  * q_train_labels (the KG pipeline / its training labeling — gated by P/R
  * and TrainSpec instead). Each is covered by a ScalaTest spec
  * (HarnessSpec/OpsSpec/TrainSpec). q_embed_ivf_topk runs harness mode
  * (portable seeding, iterations=0) and is oracle-exact; the iterative
  * Lloyd path keeps its recall spec.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Flagship: the full KG pipeline (extract → mentions → featurize → score →
    * canonicalize) on an in-memory 150-page webtext fixture. rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val model = Gen.inMemoryModel(spark)
    Pipeline.triples(spark, Gen.webpagesDF(spark, 150),
      model, Pipeline.Config(fixturesDir = "", outDir = "", numParts = 8))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scan / filter / project (pushdown-verified) ----
    "q_scan_filter" -> ((s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))),

    // ---- joins ----
    "q_join_hash" -> ((s, d) => t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("c_name"))),

    "q_join_broadcast" -> ((s, d) => t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"))),

    "q_join_merge" -> ((s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders").hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"))),

    "q_join_anti" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))),

    "q_join_semi" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))),

    // written in the NATURAL band-join form; graft's BandJoinRule optimizer
    // rule rewrites it into the bucketed equi-join plan automatically (the
    // 5-min band folds into the hash key instead of riding as a residual on
    // a potentially hot user_id) — q_join_range_bucketed below is the same
    // rewrite done by hand, kept as the rule's readable specification
    "q_join_range" -> ((s, d) => {
      graft.plans.BandJoinRule.install(s)
      val e = t(s, d, "events")
      val a = e.select(col("user_id").as("uid_a"), col("ts").as("ts_a"), col("event_type"))
      val b = e.select(col("user_id").as("uid_b"), col("ts").as("ts_b"))
      a.join(b, col("uid_a") === col("uid_b") && col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // the scale-safe formulation of q_join_range: the 5-min band becomes part
    // of the EQUI-join key (ts bucket b and b+1), so the join hashes on
    // (user_id, bucket) instead of carrying the band as a residual on a
    // potentially hot user_id — same oracle, same result
    "q_join_range_bucketed" -> ((s, d) => {
      val e = t(s, d, "events")
      val bucket = (c: Column) => floor(unix_timestamp(c) / 300L)
      val a = e.select(col("user_id").as("uid_a"), col("ts").as("ts_a"),
        col("event_type"), bucket(col("ts")).as("b_a"))
      val b = e.select(col("user_id").as("uid_b"), col("ts").as("ts_b"),
        bucket(col("ts")).as("b_b"))
      // ts_b in (ts_a, ts_a+5min] implies bucket(ts_b) in {bucket(ts_a), +1}
      a.withColumn("jb", explode(array(col("b_a"), col("b_a") + 1)))
        .join(b, col("uid_a") === col("uid_b") && col("jb") === col("b_b") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // DOUBLE band self-join written in the natural theta form; BandJoinRule
    // rewrites it to an equi-join on (user_id, value-bucket) with the proven
    // 7-bucket anchor window (W=0.1 is not binary-representable, so the
    // computed floor(x/W) drifts at bucket boundaries — the exact case the
    // window + residual handles; see plans/BandJoinRule.scala)
    "q_join_band_double" -> ((s, d) => {
      graft.plans.BandJoinRule.install(s)
      val e = t(s, d, "events")
      val a = e.select(col("user_id").as("uid_a"), col("value").as("v_a"),
        col("event_type"))
      val b = e.select(col("user_id").as("uid_b"), col("value").as("v_b"))
      a.join(b, col("uid_a") === col("uid_b") && col("v_b") >= col("v_a") &&
          col("v_b") <= col("v_a") + lit(0.1))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // DATE band (exact Int-days bucketing): lineitems shipped within 30 days
    // of their order's date — natural date_add theta form, rewritten to an
    // equi-join on (orderkey, day-bucket)
    "q_join_band_date" -> ((s, d) => {
      graft.plans.BandJoinRule.install(s)
      // the fixture stores these as timestamps; project to DATE first so the
      // band is over bare DateType attributes (the rule's matching scope)
      val o = t(s, d, "orders").select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"), col("o_orderpriority"))
      val l = t(s, d, "lineitem").select(col("l_orderkey"),
        to_date(col("l_shipdate")).as("l_sdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_sdate") >= col("o_date") &&
          col("l_sdate") <= date_add(col("o_date"), 30))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    }),

    // semi band: events that FOLLOW another event of the same user within
    // 5 minutes — BandJoinRule explodes the right (anchor) side, existence
    // semantics preserved; left output multiplicity untouched
    "q_join_band_semi" -> ((s, d) => {
      graft.plans.BandJoinRule.install(s)
      val e = t(s, d, "events")
      val lead = e.select(col("user_id").as("uid_b"), col("ts").as("ts_b"),
        col("event_type"))
      val prior = e.select(col("user_id").as("uid_a"), col("ts").as("ts_a"))
      lead.join(prior, col("uid_b") === col("uid_a") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"), "left_semi")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // anti twin: events with NO prior same-user event within 5 minutes
    // (conversation starters) — complementary failure mode to the semi
    "q_join_band_anti" -> ((s, d) => {
      graft.plans.BandJoinRule.install(s)
      val e = t(s, d, "events")
      val lead = e.select(col("user_id").as("uid_b"), col("ts").as("ts_b"),
        col("event_type"))
      val prior = e.select(col("user_id").as("uid_a"), col("ts").as("ts_a"))
      lead.join(prior, col("uid_b") === col("uid_a") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"), "left_anti")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }),

    // point-in-time join: each click gets the latest preceding view's payload
    // for the same user (union + window formulation — no range join)
    "q_join_asof" -> ((s, d) => {
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(sum(cents(col("value"))).cast("long").as("view_cents"))
      Relational.asofJoin(clicks, views, "user_id", "ts", "ts",
        Seq("ts", "view_cents"))
        .filter(col("asof").isNotNull) // inner as-of semantics
        // ntz -> tz cast is wall-time in the UTC session, matching epoch_us
        .select(col("event_id"),
          unix_micros(col("asof.ts").cast("timestamp")).as("view_us"),
          col("asof.view_cents").as("view_cents"))
    }),

    // ---- aggregation ----
    "q_agg_group" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("long").as("revenue_cents"))),

    "q_agg_twophase" -> ((s, d) =>
      Stages.saltedTwoPhase(
        t(s, d, "lineitem").withColumn("rev_c",
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))),
        keys = Seq("l_returnflag", "l_linestatus"),
        saltExpr = xxhash64(col("l_orderkey")), salts = 16)(
        (Seq(count(lit(1)).as("pc"), sum(col("l_quantity")).as("pq"),
          sum(col("rev_c")).as("pr")),
          Seq(sum(col("pc")).cast("long").as("n"), sum(col("pq")).cast("long").as("sum_qty"),
            sum(col("pr")).cast("long").as("revenue_cents"))))),

    // approx_count_distinct (HLL sketch) — no DuckDB oracle by design: the
    // sketch estimate is engine-specific; DedupSpec-style exactness lives in
    // q_distinct. Rows-only check (SURVEY.md §2 Table B approx-distinct row).
    "q_agg_approx" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))),

    "q_distinct" -> ((s, d) => t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .agg(count(lit(1)).as("n"))),

    "q_agg_rollup" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))),

    "q_agg_cube" -> ((s, d) => t(s, d, "orders")
      .cube(col("o_orderstatus"), date_format(col("o_orderdate"), "yyyy").as("yr"))
      .agg(count(lit(1)).as("n"))),

    // explicit GROUPING SETS (arbitrary combos beyond rollup/cube's fixed
    // lattices) — the two single-column subtotals without the cross term;
    // status/priority are never null in the fixture, so subtotal-marker
    // nulls are unambiguous
    "q_agg_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql("SELECT o_orderstatus, o_orderpriority, count(*) AS n " +
        "FROM orders_gs " +
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())")
    }),

    // full outer join with a join-side predicate: non-'P' orders and their
    // customers null-extend on both sides — count(col) vs count(*) pins the
    // null-extension exactly
    "q_join_full" -> ((s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey") && col("o_orderstatus") === "P",
          "full_outer")
        .agg(count(lit(1)).as("n_rows"),
          count(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_ord"))),

    // ---- windows / sort / top-k / set ops ----
    // batch sessionization via lag(): a new session starts after a >30-min
    // gap; the streaming twin is graft.streaming.StreamOps.sessionize
    "q_sessionize_batch" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),
    "q_window_rank" -> ((s, d) => t(s, d, "orders")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"))),

    "q_window_frame" -> ((s, d) => t(s, d, "events")
      .withColumn("run_cents", sum(cents(col("value"))).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select(col("user_id"), col("event_id"), col("run_cents"))),

    "q_topk" -> ((s, d) => t(s, d, "part")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .limit(10)),

    // exact grouped percentiles (p25/p50/p75 of doc length per lang) via ONE
    // per-group window sort: positions are pure integer arithmetic on the
    // group count (rank = ceil(n*p/100) = (n*p + 99) div 100), so
    // the result is a real row, integer-exact across engines — no
    // interpolation, no float quantile definition to match. One shuffle on
    // the group key; for sketch-tolerant one-pass scans at 100 TB,
    // approx_percentile is the alternative (cf. q_agg_approx), and a group
    // too large for one task's sort calls for two-pass count-then-select.
    // Tie-break on doc_id keeps the selected row deterministic.
    "q_quantile_group" -> ((s, d) => t(s, d, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .withColumn("pct",
        explode(expr("filter(array(25L, 50L, 75L), p -> rn = (n * p + 99) div 100)")))
      .select(col("lang"), col("pct"), col("n_chars").cast("long").as("chars"))),

    "q_set_except" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.filter(col("l_quantity") >= 48).select(col("l_orderkey")).distinct()
        .except(li.filter(col("l_returnflag") === "R").select(col("l_orderkey")))
    }),

    // nested-loop theta join — sanctioned ONLY with a broadcast-small side
    // (here the 5-row region dim): with no equi-key the planner's only
    // physical choice is BroadcastNestedLoopJoin, which is fine when one side
    // is dim-sized and a scale-killer otherwise (the range/as-of queries
    // show the equi-join rewrites to use instead)
    "q_join_nl" -> ((s, d) => t(s, d, "nation")
      .join(broadcast(t(s, d, "region")), col("n_regionkey") < col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n"))),

    // ---- strings / dates / arrays / json ----
    // map functions: build a per-user map(event_type -> count), filter and
    // rescale it with map_filter/transform_values, then EXPLODE back to rows
    // (map columns never cross the oracle boundary — engines hash maps
    // differently, so the comparison surface stays plain columns)
    "q_map_fns" -> ((s, d) => {
      val counts = t(s, d, "events").groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
          .as("m"))
        .select(col("user_id"),
          explode(transform_values(map_filter(col("m"), (_, v) => v >= 3),
            (_, v) => v * 10L)).as(Seq("event_type", "score")))
    }),
    // relational PIVOT with a declared value list, expressed as conditional
    // aggregation — ONE hash aggregation, map-side partials, one shuffle on
    // the group key. Measured (PlanAuditSpec): the built-in
    // `.pivot(col, values)` plans TWO exchanges even with an explicit value
    // list (a pre-aggregate on (key, pivot_col) then pivotfirst on key), so
    // count(when(...)) per declared value is the at-scale pivot form; the
    // open-ended pivot (extra distinct-values JOB) is doubly rejected —
    // at 100 TB the pivot domain must be declared, not discovered
    "q_pivot" -> ((s, d) => t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(when(col("event_type") === "click", 1)).as("n_click"),
        Seq("view", "purchase", "signup", "error").map(v =>
          count(when(col("event_type") === v, 1)).as(s"n_$v")): _*)),

    // deterministic hash-based sampling: the reproducible TABLESAMPLE form —
    // sample membership is a pure function of the row key (portable md5-60
    // here so DuckDB replays it exactly; xxhash64 at scale), so every engine,
    // retry, and rerun draws the SAME 10%. The hash predicate cannot reach
    // parquet PushedFilters (not a column comparison) but it runs inside the
    // scan's codegen stage, before any shuffle — 90% of rows never leave
    // their input partition; no RNG state, no driver coordination
    "q_sample_hash" -> ((s, d) => t(s, d, "documents")
      .filter(pmod(graft.ops.Portable.md5h60(col("doc_id").cast("string")),
        lit(100L)) < 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars"))),

    "q_date_bucket" -> ((s, d) => t(s, d, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))),

    "q_explode_tokens" -> ((s, d) => t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(5)),

    "q_json_extract" -> ((s, d) => t(s, d, "events")
      .filter(get_json_object(col("props"), "$.k").cast("long") > 50)
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).cast("long").as("sum_cents"))),

    // ---- training-data ops: dedup ----
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          count(lit(1)).as("n_unique"))),

    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "source", shingleN = 1, minJaccardPct = 50)),

    // portable-hash mode: the full band table is replayed bit-exactly by the
    // DuckDB oracle (HashMode.XxHash is the production-scale default,
    // identical plan shape — OpsSpec covers it)
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashBands(t(s, d, "documents"), "doc_id", "text",
        shingleN = 1, numPerm = 32, bands = 8, mode = HashMode.PortableMd5)),

    "q_dedup_minhash_pairs" -> ((s, d) =>
      Dedup.minhashPairs(Dedup.minhashBands(
        t(s, d, "documents").filter(col("doc_id") % 5 === 0), "doc_id", "text",
        shingleN = 1, numPerm = 32, bands = 8, mode = HashMode.PortableMd5))),

    "q_dedup_jaccard_capped" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "source", shingleN = 1, minJaccardPct = 50,
        dfMax = Some(18L))),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashTable(t(s, d, "documents"), "doc_id", "text")),

    // the cluster step after pairing: connected components by pointer-doubling
    // min-label propagation; oracle replays it with a recursive CTE
    "q_dedup_components" -> ((s, d) =>
      Dedup.components(Dedup.jaccardPairs(
        t(s, d, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "source", shingleN = 1, minJaccardPct = 50))),

    // embedding-cosine near-dup: LSH-bucket blocking + exact cosine check.
    // The testdata embeddings carry no planted near-dups (max pairwise cosine
    // ~0.51 at sf0.01), so the threshold 0.35 is chosen to exercise the
    // operator non-vacuously; the semantics are threshold-independent
    "q_dedup_embed" -> ((s, d) =>
      Dedup.embeddingPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        dims = 64, planes = 4, minCosine = 0.35, mode = HashMode.PortableMd5)),

    // ---- training-data ops: similarity search ----
    "q_embed_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
    }),

    // harness mode: portable-md5 seeding + iterations=0 (the seed vectors ARE
    // the centroids), which makes the whole assign/probe/rank pipeline
    // SQL-expressible — the oracle replays it bit-exactly (ivfTopKOracleSql).
    // xxhash64 seeding + Lloyd iterations stay the scale default (the
    // iterative path's recall is OpsSpec-tested; same pipeline shape).
    "q_embed_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 16,
        iterations = 0, mode = HashMode.PortableMd5)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        cents, nprobe = 4, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
    }),

    // portable-hash mode: the bucket assignment is replayed bit-exactly by
    // the DuckDB oracle, making the WHOLE bucketed-ANN result exact-checkable
    // (rank-only output, deterministic tie-breaks; XxHash stays the scale
    // default — identical plan, PlanAuditSpec covers it)
    "q_embed_lsh_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", dims = 64, planes = 4, k = 10,
        mode = HashMode.PortableMd5)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
    }),

    // ---- training-data ops: text analysis ----
    "q_text_quality" -> ((s, d) =>
      TextStats.quality(t(s, d, "documents"), "doc_id", "text")),

    "q_token_bpeish" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long").as("bpeish_tokens"))),

    "q_lang_stats" -> ((s, d) => t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("chars"))),

    "q_lang_id" -> ((s, d) =>
      TextStats.langId(t(s, d, "documents"), "doc_id", "text")),

    // portable-hash mode: winnowing selection replayed exactly by DuckDB;
    // fingerprint array is sorted, so element 0 is the min fingerprint.
    // Sampled doc_id % 5 = 0 like the jaccard queries: same oracle rigor at
    // 1/5 the per-char md5 cost in every harness/bench run (the md5 price is
    // harness-only — xxhash64 at scale)
    "q_fingerprint" -> ((s, d) =>
      TextStats.fingerprints(t(s, d, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", mode = HashMode.PortableMd5)
        .select(col("doc_id"), size(col("fingerprint")).cast("long").as("n_fp"),
          get(col("fingerprint"), lit(0)).as("fp_min"))),

    // ---- multimodal plumbing ----
    "q_binary_meta" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_md5"))),

    "q_media_features" -> ((s, d) => {
      val media = Multimodal.withMeta(
        t(s, d, "documents").select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")),
        "doc_id", "bin")
      // the sha256 submetric rides through the real mapPartitions decode path
      // and is DuckDB-checkable; the histogram feature is covered by OpsSpec
      Multimodal.decodeBatch(s, media).toDF()
        .select(col("media_id"), col("n_bytes"), col("content_sha256"))
    }),

    // ---- in-engine training: the distant-supervision labeling join ----
    // one relational pass: candidates × type-matching predicates, left-join
    // the gold KB -> per-predicate candidate/positive counts (deterministic;
    // the LR fit itself is exercised by TrainSpec's learned-weights P/R gate)
    "q_train_labels" -> ((s, _) => {
      import s.implicits._
      val dictModel = KgModel.fromData(s, Vocab.dictEntries, Vocab.predicates, Nil, 0.0)
      val tokenized = Stages.tokenized(Stages.sentences(Stages.pageText(
        Stages.partitioned(Gen.webpagesDF(s, 150), Seq("en"), 8))))
      val cands = Train.candidateInstances(tokenized, dictModel)
      val predsDf = broadcast(Vocab.predicates
        .map(p => (p.pred, p.subjType, p.objType))
        .toDF("pred", "subj_type", "obj_type"))
      val kb = broadcast(Gen.goldDF(s, 0, 150)
        .select(col("subj"), col("pred"), col("obj")).distinct()
        .withColumn("label", lit(1L)))
      cands.join(predsDf, Seq("subj_type", "obj_type"))
        .join(kb, Seq("subj", "pred", "obj"), "left")
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("n_cand"),
          sum(coalesce(col("label"), lit(0L))).cast("long").as("n_pos"))
    }),

    // ---- the KG pipeline itself as a harness query ----
    "q_pipeline_triples" -> ((s, _) => {
      val model = Gen.inMemoryModel(s)
      Pipeline.triples(s, Gen.webpagesDF(s, 300), model,
        Pipeline.Config(fixturesDir = "", outDir = "", numParts = 8))
    }))

  def oracleSql: Map[String, String] = Map(
    "q_scan_filter" ->
      ("SELECT l_orderkey, cast(l_linenumber as bigint) AS l_linenumber, cast(l_quantity as bigint) AS qty " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 5"),
    "q_join_hash" ->
      "SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_totalprice > 400000",
    "q_join_broadcast" ->
      ("SELECT p_brand, count(*) AS n, cast(sum(l_quantity) as bigint) AS sum_qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand"),
    "q_join_merge" ->
      ("SELECT o_orderstatus, count(*) AS n, cast(sum(l_quantity) as bigint) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus"),
    "q_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"),
    "q_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')"),
    "q_join_range" ->
      ("SELECT a.event_type AS event_type, count(*) AS n FROM events a JOIN events b " +
        "ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE " +
        "GROUP BY a.event_type"),
    // same semantics as q_join_range — the bucketing is a plan-level rewrite
    "q_join_range_bucketed" ->
      ("SELECT a.event_type AS event_type, count(*) AS n FROM events a JOIN events b " +
        "ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE " +
        "GROUP BY a.event_type"),
    // double band: IEEE double add/compare evaluate bit-identically in
    // DuckDB (0.1 cast to DOUBLE = the same nearest-double literal Spark
    // folds), so the theta predicate selects the same pairs
    "q_join_band_double" ->
      ("SELECT a.event_type AS event_type, count(*) AS n FROM events a JOIN events b " +
        "ON a.user_id = b.user_id AND b.value >= a.value " +
        "AND b.value <= a.value + CAST(0.1 AS DOUBLE) GROUP BY a.event_type"),
    "q_join_band_date" ->
      ("SELECT o.o_orderpriority AS o_orderpriority, count(*) AS n " +
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE) " +
        "AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + 30 " +
        "GROUP BY o.o_orderpriority"),
    "q_join_band_semi" ->
      ("SELECT a.event_type AS event_type, count(*) AS n FROM events a " +
        "WHERE EXISTS (SELECT 1 FROM events b WHERE b.user_id = a.user_id " +
        "AND a.ts > b.ts AND a.ts <= b.ts + INTERVAL 5 MINUTE) " +
        "GROUP BY a.event_type"),
    "q_join_band_anti" ->
      ("SELECT a.event_type AS event_type, count(*) AS n FROM events a " +
        "WHERE NOT EXISTS (SELECT 1 FROM events b WHERE b.user_id = a.user_id " +
        "AND a.ts > b.ts AND a.ts <= b.ts + INTERVAL 5 MINUTE) " +
        "GROUP BY a.event_type"),
    "q_agg_group" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, cast(sum(l_quantity) as bigint) AS sum_qty, " +
        "cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) as bigint) AS revenue_cents " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "q_agg_twophase" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, cast(sum(l_quantity) as bigint) AS sum_qty, " +
        "cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) as bigint) AS revenue_cents " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "q_distinct" ->
      "SELECT count(*) AS n FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
    "q_agg_cube" ->
      ("SELECT o_orderstatus, strftime(o_orderdate, '%Y') AS yr, count(*) AS n " +
        "FROM orders GROUP BY CUBE(o_orderstatus, yr)"),
    "q_sessionize_batch" ->
      ("SELECT user_id, cast(sum(new_sess) as bigint) AS n_sessions, count(*) AS n_events FROM " +
        "(SELECT user_id, CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_sess FROM (SELECT user_id, ts, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)) " +
        "GROUP BY user_id"),
    "q_agg_rollup" ->
      ("SELECT r_name, n_name, count(*) AS n FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP(r_name, n_name)"),
    "q_agg_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders " +
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"),
    "q_join_full" ->
      ("SELECT count(*) AS n_rows, count(c_custkey) AS n_cust, " +
        "count(o_orderkey) AS n_ord FROM customer c FULL OUTER JOIN orders o " +
        "ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'"),
    "q_window_rank" ->
      ("SELECT o_custkey, o_orderkey, rnk FROM (SELECT o_custkey, o_orderkey, " +
        "cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) as bigint) AS rnk " +
        "FROM orders) WHERE rnk <= 3"),
    "q_window_frame" ->
      ("SELECT user_id, event_id, cast(sum(cast(round(value * 100) as bigint)) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS run_cents " +
        "FROM events"),
    "q_topk" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10",
    "q_quantile_group" ->
      ("SELECT lang, cast(p AS bigint) AS pct, cast(n_chars AS bigint) AS chars FROM " +
        "(SELECT lang, n_chars, " +
        "row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY lang) AS n FROM documents) " +
        "CROSS JOIN (VALUES (25), (50), (75)) v(p) WHERE rn = (n * p + 99) // 100"),
    "q_set_except" ->
      ("SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 48 " +
        "EXCEPT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'"),
    "q_date_bucket" ->
      "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2",
    "q_explode_tokens" ->
      ("SELECT tok, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "WHERE length(tok) > 0 GROUP BY tok ORDER BY n DESC, tok LIMIT 5"),
    "q_json_extract" ->
      ("SELECT count(*) AS n, cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents " +
        "FROM events WHERE try_cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS bigint) > 50"),
    "q_dedup_exact" ->
      ("SELECT cast(sum(n_docs) as bigint) AS n_docs, count(*) AS n_unique FROM " +
        "(SELECT md5(text) AS h, count(*) AS n_docs FROM documents GROUP BY 1)"),
    "q_dedup_jaccard" ->
      ("WITH d AS (SELECT * FROM documents WHERE doc_id % 5 = 0), " +
        "tok AS (SELECT doc_id, source, unnest(list_distinct(list_filter(string_split(text, ' '), t -> length(t) > 0))) AS tok FROM d), " +
        "sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter FROM tok a " +
        "JOIN tok b ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, cast(p.inter as bigint) AS inter, cast(sa.sz + sb.sz - p.inter as bigint) AS uni " +
        "FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id JOIN sizes sb ON p.doc_b = sb.doc_id " +
        "WHERE p.inter * 100 >= (sa.sz + sb.sz - p.inter) * 50"),
    "q_dedup_jaccard_capped" ->
      ("WITH d AS (SELECT * FROM documents WHERE doc_id % 5 = 0), " +
        "tok0 AS (SELECT doc_id, source, unnest(list_distinct(list_filter(string_split(text, ' '), t -> length(t) > 0))) AS tok FROM d), " +
        "dfok AS (SELECT source, tok FROM tok0 GROUP BY source, tok HAVING count(*) <= 18), " +
        "tok AS (SELECT t.doc_id, t.source, t.tok FROM tok0 t JOIN dfok USING (source, tok)), " +
        "sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter FROM tok a " +
        "JOIN tok b ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, cast(p.inter as bigint) AS inter, cast(sa.sz + sb.sz - p.inter as bigint) AS uni " +
        "FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id JOIN sizes sb ON p.doc_b = sb.doc_id " +
        "WHERE p.inter * 100 >= (sa.sz + sb.sz - p.inter) * 50"),
    "q_dedup_components" ->
      ("WITH RECURSIVE d AS (SELECT * FROM documents WHERE doc_id % 5 = 0), " +
        "tok AS (SELECT doc_id, source, unnest(list_distinct(list_filter(string_split(text, ' '), t -> length(t) > 0))) AS tok FROM d), " +
        "sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id), " +
        "p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter FROM tok a " +
        "JOIN tok b ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "p AS (SELECT doc_a, doc_b FROM p0 JOIN sizes sa ON p0.doc_a = sa.doc_id " +
        "JOIN sizes sb ON p0.doc_b = sb.doc_id WHERE p0.inter * 100 >= (sa.sz + sb.sz - p0.inter) * 50), " +
        "edges AS (SELECT doc_a AS s, doc_b AS t FROM p UNION SELECT doc_b, doc_a FROM p), " +
        "reach(id, comp) AS (SELECT DISTINCT s, s FROM edges " +
        "UNION SELECT e.s, r.comp FROM edges e JOIN reach r ON e.t = r.id) " +
        "SELECT id AS doc_id, min(comp) AS comp FROM reach GROUP BY id"),
    "q_join_asof" ->
      ("SELECT l.event_id, epoch_us(r.ts) AS view_us, r.view_cents AS view_cents " +
        "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l " +
        "ASOF JOIN (SELECT user_id, ts, cast(sum(cast(round(value * 100) as bigint)) as bigint) AS view_cents " +
        "FROM events WHERE event_type = 'view' GROUP BY 1, 2) r " +
        "ON l.user_id = r.user_id AND r.ts <= l.ts"),
    "q_dedup_minhash" ->
      (Dedup.minhashBandsOracleCte("", numPerm = 32, bands = 8) +
        " SELECT doc_id, band, band_hash FROM band"),
    "q_dedup_minhash_pairs" ->
      (Dedup.minhashBandsOracleCte("WHERE doc_id % 5 = 0", numPerm = 32, bands = 8) +
        " SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM band a JOIN band b " +
        "ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id"),
    "q_dedup_simhash" -> Dedup.simhashOracleSql,
    // cosine replayed with the engine's exact fold (cosineSql), not DuckDB's
    // native list_cosine_similarity — a pair within an ulp of the 0.35
    // threshold can then never split the engines (ADVICE r3)
    "q_dedup_embed" ->
      (s"WITH b AS (${Similarity.lshBucketOracleSql(dims = 64, planes = 4)}) " +
        "SELECT a.vec_id AS doc_a, c.vec_id AS doc_b FROM b a JOIN b c " +
        "ON a.bucket = c.bucket AND a.vec_id < c.vec_id " +
        s"WHERE ${Similarity.cosineSql("a.embedding", "c.embedding", 64)} >= 0.35"),
    "q_join_nl" ->
      ("SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey < r_regionkey " +
        "GROUP BY r_name"),
    "q_map_fns" ->
      ("SELECT user_id, event_type, cast(n * 10 as bigint) AS score FROM " +
        "(SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2) WHERE n >= 3"),
    "q_pivot" ->
      ("SELECT user_id, " +
        "cast(count(*) FILTER (WHERE event_type = 'click') as bigint) AS n_click, " +
        "cast(count(*) FILTER (WHERE event_type = 'view') as bigint) AS n_view, " +
        "cast(count(*) FILTER (WHERE event_type = 'purchase') as bigint) AS n_purchase, " +
        "cast(count(*) FILTER (WHERE event_type = 'signup') as bigint) AS n_signup, " +
        "cast(count(*) FILTER (WHERE event_type = 'error') as bigint) AS n_error " +
        "FROM events GROUP BY user_id"),
    "q_sample_hash" ->
      ("SELECT lang, count(*) AS n, cast(sum(n_chars) as bigint) AS sum_chars FROM documents " +
        s"WHERE ${graft.ops.Portable.md5h60Sql("cast(doc_id as VARCHAR)")} % 100 < 10 " +
        "GROUP BY lang"),
    "q_fingerprint" -> TextStats.fingerprintOracleSql(k = 8, window = 4,
      filterSql = "AND doc_id % 5 = 0"),
    "q_embed_lsh_topk" ->
      (s"WITH b AS (${Similarity.lshBucketOracleSql(dims = 64, planes = 4)}) " +
        "SELECT query_id, neighbor_id, rnk FROM (SELECT q.vec_id AS query_id, " +
        "c.vec_id AS neighbor_id, cast(row_number() OVER (PARTITION BY q.vec_id " +
        s"ORDER BY ${Similarity.cosineSql("q.embedding", "c.embedding", 64)} DESC, " +
        "c.vec_id) as bigint) AS rnk FROM b q JOIN b c ON q.bucket = c.bucket " +
        "AND c.vec_id <> q.vec_id WHERE q.vec_id < 8) WHERE rnk <= 10"),
    "q_embed_ivf_topk" -> Similarity.ivfTopKOracleSql(k = 16, nprobe = 4,
      topK = 10, dims = 64, queryFilterSql = "WHERE vec_id < 8"),
    "q_lang_id" -> TextStats.langIdOracleSql,
    "q_media_features" ->
      ("SELECT doc_id AS media_id, cast(octet_length(encode(text)) as bigint) AS n_bytes, " +
        "sha256(text) AS content_sha256 FROM documents"),
    "q_embed_topk" ->
      ("SELECT query_id, neighbor_id, rnk FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "cast(row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        s"${Similarity.cosineSql("q.embedding", "c.embedding", 64)} DESC, c.vec_id) as bigint) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) WHERE rnk <= 10"),
    "q_text_quality" ->
      ("SELECT doc_id, cast(length(text) as bigint) AS n_chars, " +
        "cast(len(list_filter(string_split(text, ' '), x -> length(x) > 0)) as bigint) AS n_tokens, " +
        "cast(length(replace(text, ' ', '')) as bigint) AS n_nonspace, " +
        "cast(coalesce(list_max(list_transform(list_filter(string_split(text, ' '), x -> length(x) > 0), x -> length(x))), 0) as bigint) AS max_token_len " +
        "FROM documents"),
    "q_token_bpeish" ->
      ("SELECT doc_id, cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) as bigint) AS bpeish_tokens " +
        "FROM documents"),
    "q_lang_stats" ->
      "SELECT lang, count(*) AS n, cast(sum(n_chars) as bigint) AS chars FROM documents GROUP BY lang",
    "q_binary_meta" ->
      ("SELECT doc_id, cast(octet_length(encode(text)) as bigint) AS n_bytes, md5(text) AS content_md5 " +
        "FROM documents"))
}
