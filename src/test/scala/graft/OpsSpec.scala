package graft

import graft.ops.{Dedup, HashMode, Multimodal, Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the training-data ops that have no DuckDB oracle
  * (minhash/simhash signatures, LSH ANN, language ID, fingerprints,
  * multimodal decode): planted near-duplicates must be found, planted
  * languages identified, and everything deterministic. */
class OpsSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches the birds fly south " +
      "every winter season brings cold winds and long nights to the northern villages"
  private lazy val docs = Seq(
    (1L, base, "s0"),
    (2L, base.replace("lazy", "sleepy"), "s0"), // near-dup of 1
    (3L, base, "s1"),                           // exact dup of 1, other block
    (4L, "completely different content about spark catalyst optimizer rules and " +
      "whole stage code generation for columnar execution engines at scale", "s0"),
    (5L, "vectors matrices tensors gradients optimizers schedulers batches epochs " +
      "losses metrics checkpoints shards replicas pipelines dataflows kernels", "s1"))
    .toDF("doc_id", "text", "source")

  test("exact dedup groups identical content") {
    val groups = Dedup.exact(docs, "doc_id", "text").filter($"n_docs" > 1).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("n_docs") == 2L)
    assert(groups(0).getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds planted near-dup pair, skips unrelated docs") {
    val pairs = Dedup.minhashPairs(
      Dedup.minhashBands(docs, "doc_id", "text", shingleN = 2, numPerm = 32, bands = 8))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)), "exact dup must collide in every band")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 3L)),
      s"near-dup should collide in some band: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L),
      s"unrelated docs must not pair: $pairs")
  }

  test("simhash: near-dups close in hamming space, unrelated docs far") {
    val sh = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(1L, 3L) == 0)
    assert(ham(1L, 2L) <= 8, s"near-dup hamming ${ham(1L, 2L)}")
    assert(ham(1L, 4L) >= 16, s"unrelated hamming ${ham(1L, 4L)}")
  }

  test("jaccard pairs: exact intersection/union arithmetic, blocking respected") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "source",
      shingleN = 1, minJaccardPct = 50)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc1 vs doc2 share all but one token (same block s0)
    assert(pairs.exists { case (a, b, i, u) => a == 1L && b == 2L && i < u })
    // doc1 vs doc3 identical but different blocks -> never paired
    assert(!pairs.exists { case (a, b, _, _) => a == 1L && b == 3L })
  }

  test("jaccard df-cap prunes a planted stop-shingle's d^2 join rows, keeps real near-dups") {
    // 40 unrelated docs sharing ONE stop token ("corpus") + 2 real near-dups
    val planted = (1L to 40L).map(i =>
      (100L + i, s"corpus unique${i}a unique${i}b unique${i}c unique${i}d", "blk")) ++ Seq(
      (1L, "corpus alpha beta gamma delta epsilon", "blk"),
      (2L, "corpus alpha beta gamma delta zeta", "blk"))
    val df = planted.toDF("doc_id", "text", "source")

    // uncapped: the stop token alone creates an intersection row for every
    // one of the 42*41/2 pairs feeding the join (bounded here, fatal at scale)
    val uncappedInter = Dedup.jaccardPairs(df, "doc_id", "text", "source",
      shingleN = 1, minJaccardPct = 1).count()
    // capped at df<=10: the stop token (df=42) leaves the universe; only the
    // real near-dup pair shares any shingle at all
    val capped = Dedup.jaccardPairs(df, "doc_id", "text", "source",
      shingleN = 1, minJaccardPct = 1, dfMax = Some(10L))
      .as[(Long, Long, Long, Long)].collect()
    assert(uncappedInter > 800L, s"stop-shingle should pair everything: $uncappedInter")
    assert(capped.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"cap must keep only the true near-dup pair: ${capped.toSeq}")
    // the surviving pair's arithmetic is exact over the capped universe:
    // 4 shared of 5+5 tokens (stop token removed from both sizes)
    val (_, _, inter, uni) = capped.head
    assert(inter == 4L && uni == 6L, s"inter=$inter uni=$uni")
  }

  test("connected components: chain + separate cluster + untouched docs") {
    // chain 1-2-3 (transitively connected), island 7-8, doc 9 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val comp = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L),
      comp.toString)
    // a long path needs label propagation over multiple rounds; pointer
    // doubling must collapse a diameter-11 path well inside 5 rounds
    // (plain min-propagation would need 11)
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp2 = Dedup.components(path, maxIter = 5).as[(Long, Long)].collect().toMap
    assert(comp2.values.toSet == Set(1L), s"12-node path must collapse to 1: $comp2")
    // non-convergence is an error, never silently-partial labels
    assertThrows[IllegalStateException] { Dedup.components(path, maxIter = 1) }
  }

  test("components: pointer doubling is O(log diameter) on a 2^k chain") {
    // a path of 2^k+1 nodes has diameter 2^k: plain min-propagation needs
    // 2^k rounds; pointer doubling must land in ~k (+small constant) rounds.
    // k=7 (129 nodes, diameter 128) makes the gap unambiguous: <= 10 vs 128.
    val k = 7
    val n = 1 << k
    val path = (1L to n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.componentsWithRounds(path, maxIter = 25)
    val comp = labels.as[(Long, Long)].collect().toMap
    assert(comp.size == n + 1 && comp.values.toSet == Set(1L),
      s"chain must collapse to component 1 (${comp.values.toSet})")
    assert(rounds <= k + 3,
      s"doubling depth: expected <= ${k + 3} rounds for diameter $n, got $rounds")
    assert(rounds >= 3, s"fixture must exercise doubling depth (rounds=$rounds)")
  }

  test("lshBucket literal plane weights equal the runtime hash expressions") {
    val grid = (for { d <- 0 until 8; p <- 0 until 4 } yield (d, p)).toDF("d", "p")
    val viaXx = grid.select(col("d"), col("p"),
        (pmod(xxhash64(col("d"), col("p")), lit(1000000L)).cast("double") / 1000000.0 - 0.5)
          .as("w")).as[(Int, Int, Double)].collect()
    viaXx.foreach { case (d, p, w) =>
      assert(Similarity.planeWeight(d, p, HashMode.XxHash) == w, s"xx d=$d p=$p") }
    val viaMd5 = grid.select(col("d"), col("p"),
        ((graft.ops.Portable.md5h60(concat_ws("_", col("d").cast("string"),
          col("p").cast("string"))) % 1000000L).cast("double") / 1000000.0 - 0.5)
          .as("w")).as[(Int, Int, Double)].collect()
    viaMd5.foreach { case (d, p, w) =>
      assert(Similarity.planeWeight(d, p, HashMode.PortableMd5) == w, s"md5 d=$d p=$p") }
  }

  test("embedding near-dup pairs: planted duplicate found, distinct vectors not") {
    // v1 == v2 (exact dup, same bucket by construction), v3 orthogonal-ish
    val vecs = Seq(
      (1L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (2L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (3L, Array(-1.0f, 0.5f, -0.3f, 0.9f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding",
      dims = 4, planes = 2, minCosine = 0.95).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
    // portable mode finds the same planted dup (identical vectors always
    // share a bucket regardless of the plane hash family)
    val portable = Dedup.embeddingPairs(vecs, "vec_id", "embedding",
      dims = 4, planes = 2, minCosine = 0.95, mode = HashMode.PortableMd5)
      .as[(Long, Long)].collect().toSet
    assert(portable == Set((1L, 2L)), portable.toString)
  }

  test("as-of join: latest preceding payload per key, inclusive at equal ts") {
    import java.sql.Timestamp
    def at(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (10L, 1L, at("2024-01-01 10:30:00")), // after r@10:00 -> 100
      (11L, 1L, at("2024-01-01 11:00:00")), // equal ts to r@11:00 -> 200 (inclusive)
      (12L, 1L, at("2024-01-01 09:00:00")), // before any right row -> null
      (13L, 2L, at("2024-01-01 10:30:00"))  // other key, no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, at("2024-01-01 10:00:00"), 100L),
      (1L, at("2024-01-01 11:00:00"), 200L)).toDF("user_id", "ts", "cents")
    val res = graft.ops.Relational.asofJoin(left, right, "user_id", "ts", "ts", Seq("cents"))
      .select($"event_id", $"asof.cents")
      .as[(Long, Option[Long])].collect().toMap
    assert(res == Map(10L -> Some(100L), 11L -> Some(200L), 12L -> None, 13L -> None),
      res.toString)
  }

  test("brute-force cosine top-k: self-similar vectors rank first; deterministic") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 3)
      .select($"neighbor_id", $"rnk").as[(Long, Long)].collect().sortBy(_._2)
    assert(topk.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }

  test("LSH top-k is a subset of brute-force candidates with sane ranks") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val res = Similarity.lshTopK(emb.filter($"vec_id" < 4), emb,
      "vec_id", "embedding", dims = 64, planes = 4, k = 5)
      .select($"query_id", $"neighbor_id", $"rnk").collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 5))
    // determinism
    val res2 = Similarity.lshTopK(emb.filter($"vec_id" < 4), emb,
      "vec_id", "embedding", dims = 64, planes = 4, k = 5)
      .select($"query_id", $"neighbor_id", $"rnk").collect()
    assert(res.map(_.toString).sorted.toSeq == res2.map(_.toString).sorted.toSeq)
  }

  test("IVF top-k: deterministic, bounded probes, decent recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 16, iterations = 1)
    assert(cents.length == 16 && cents.forall(_.length == 64))
    val queries = emb.filter($"vec_id" < 8)
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", cents, nprobe = 8, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect bf).size.toDouble / bf.size
    info(s"IVF recall@10 with nprobe=8/16 cells: $recall")
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // determinism
    val cents2 = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 16, iterations = 1)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
  }

  test("language ID heuristic identifies planted languages") {
    val samples = Seq(
      (1L, "the cat and the dog are sitting of the garden watching the evening"),
      (2L, "der hund und die katze schlafen in einem schönen garten nicht schlecht"),
      (3L, "la casa de la abuela está cerca de la ciudad que tiene los parques"),
      (4L, "le chien de la maison est dans le jardin que nous avons entendu"),
      (5L, "这是一个关于中国的人和一个有名的故事")).toDF("doc_id", "text")
    val preds = TextStats.langId(samples, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "en", preds.toString)
    assert(preds(2L) == "de", preds.toString)
    assert(preds(3L) == "es", preds.toString)
    assert(preds(4L) == "fr", preds.toString)
    assert(preds(5L) == "zh", preds.toString)
  }

  test("winnowing fingerprints: shared for dups, deterministic, guards short text") {
    val fp = TextStats.fingerprints(docs, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(fp(1L) == fp(3L), "identical docs share the fingerprint")
    assert(fp(1L) != fp(4L))
    val overlap = fp(1L).toSet.intersect(fp(2L).toSet).size.toDouble / fp(1L).size
    assert(overlap > 0.5, s"near-dup fingerprint overlap $overlap")
    // short-text guard (sequence() descend bug)
    val short = Seq((9L, "ab")).toDF("doc_id", "text")
    assert(TextStats.fingerprints(short, "doc_id", "text").count() == 0)
  }

  test("multimodal: metadata + batched decode plumbing") {
    val media = Multimodal.withMeta(
      docs.select($"doc_id", encode($"text", "UTF-8").as("bin")), "doc_id", "bin")
    val metas = media.select($"media_id", $"meta.n_bytes", $"meta.magic").collect()
    assert(metas.forall(_.getLong(1) > 0))
    val feats = Multimodal.decodeBatch(spark, media, batchSize = 2).collect()
    assert(feats.length == 5)
    assert(feats.forall(f => math.abs(f.histogram.sum - 1.0) < 1e-9))
    // identical payloads -> identical features
    val f = feats.map(x => x.media_id -> x.histogram.toSeq).toMap
    assert(f(1L) == f(3L))
  }
}
