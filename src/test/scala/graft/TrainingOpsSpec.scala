package graft

import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-pipeline operator semantics: kNN label voting, centroid
  * outlier scoring, sharded epoch shuffle, cluster purity, and the
  * duplicated-span inventory (q96-q100).
  */
class TrainingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def embs = Tables.load(spark, sf, "embeddings")

  // Two tight clusters on orthogonal axes: vec 0/1 near +x (label 1,
  // except the query), vec 2/3/4 near +y (label 2). Queries are 0 and 2.
  private def tinyEmbs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 9),
    (1L, Array(0.9f, 0.1f, 0.0f), 1),
    (2L, Array(0.0f, 1.0f, 0.0f), 9),
    (3L, Array(0.1f, 0.9f, 0.0f), 2),
    (4L, Array(0.0f, 0.95f, 0.1f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("tokenizerFertility: per-lang token/char sums; a zero-token doc still counts toward n_docs") {
    val TA = graft.operators.TextAnalysis
    val tiny = Seq(
      (1L, "aa aa", "xx", 5L),   // 2 words of "aa"
      (2L, "  ",    "xx", 2L),   // tokenizes to NOTHING
      (3L, "aa b",  "yy", 4L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = TA.tokenizerFertility(tiny, merges = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // one merge folds a+a -> "aa": each "aa" word is ONE token, "b" one
    val xx = out.find(_._1 == "xx").get
    assert(xx._2 === 2L, "the empty doc must count toward n_docs")
    assert(xx._3 === 2L, "two aa words = two folded tokens, empty doc adds 0")
    assert(xx._4 === 7L)
    assert(math.abs(xx._5 - 2.0 / 7.0) < 1e-15)
    val yy = out.find(_._1 == "yy").get
    assert((yy._2, yy._3, yy._4) === ((1L, 2L, 4L)))
    // rollup consistency on real data: lang sums equal the doc sums
    val full = TA.tokenizerFertility(docs, merges = 2)
    val fromDocs = TA.bpeEncodeIds(docs, merges = 2)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(full.agg(sum(col("bpe_tokens"))).head().getLong(0) === fromDocs)
  }

  test("knnClassify predicts the label of the geometric neighbours, not the query's own") {
    val out = Similarity.knnClassify(tinyEmbs, nQueries = 3, k = 2)
      .as[(Long, Long, Long, Long)].collect()
    // queries are 0,1,2; train is 3,4 (both label 2)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L))
    out.foreach { case (_, _, pred, votes) => assert(pred == 2L && votes == 2L) }
    // true_label passes through unchanged
    assert(out.map(r => r._1 -> r._2).toMap == Map(0L -> 9L, 1L -> 1L, 2L -> 9L))
  }

  test("knnClassify vote tie breaks to the smaller label") {
    // query 0 at the bisector of two train vectors with labels 7 and 3
    val e = Seq(
      (0L, Array(1.0f, 1.0f), 0),
      (1L, Array(1.0f, 0.0f), 7),
      (2L, Array(0.0f, 1.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(e, nQueries = 1, k = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._3 == 3L && out.head._4 == 1L)
  }

  test("knnClassify on testdata: 50 rows, votes within [1,k], deterministic") {
    val a = Similarity.knnClassify(embs, nQueries = 50, k = 5).collect()
    val b = Similarity.knnClassify(embs, nQueries = 50, k = 5).collect()
    assert(a.length == 50 && a.sameElements(b))
    a.foreach(r => assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L))
  }

  test("knnClassifyIvf with nprobe = nlist equals the brute classifier exactly") {
    val brute = Similarity.knnClassify(embs, nQueries = 10, k = 5)
    val ivf = Similarity.knnClassifyIvf(embs, nQueries = 10, k = 5, nlist = 8, nprobe = 8)
    assert(ivf.exceptAll(brute).isEmpty && brute.exceptAll(ivf).isEmpty)
  }

  test("knnClassifyIvf probing fewer cells still answers every query here") {
    val out = Similarity.knnClassifyIvf(embs, nQueries = 10, k = 5, nlist = 8, nprobe = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).distinct.length == out.length)
    out.foreach(r => assert(r._4 >= 1L && r._4 <= 5L))
  }

  test("embeddingOutliers ranks the contrarian vector first") {
    // three aligned vectors and one pointing the opposite way
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.95f, 0.05f), 0),
      (3L, Array(-1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(e, n = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.head._2 == 3L)              // most outlying = the flipped vector
    assert(out.map(_._1).toSeq == (1L to 4L)) // dense ranks
    assert(out.map(_._4).toSeq == out.map(_._4).toSeq.sorted) // ascending cosine
  }

  test("a NULL embedding row never shifts a centroid: outliers, drift, and k-means match the corpus without it") {
    // graft_vsum SKIPS null vectors (the explode form emitted no lane
    // rows for them) — so the mean DIVISORS must skip them too
    // (count(qa), not count(*)); a count(*) denominator silently
    // shrinks every centroid lane by n/(n+nulls)
    val base = Seq(
      (0L, Some(Array(1.0f, 0.0f)), 1),
      (1L, Some(Array(0.9f, 0.1f)), 1),
      (2L, Some(Array(0.0f, 1.0f)), 2),
      (3L, Some(Array(0.1f, 0.9f)), 2)
    )
    val clean = base.toDF("vec_id", "embedding", "label")
    val withNull = (base :+ (9L, Option.empty[Array[Float]], 1))
      .toDF("vec_id", "embedding", "label")

    // outliers: the real vectors' fixed-point scores are unchanged
    val scoreClean = Similarity.embeddingOutliers(clean, n = 5)
      .select($"vec_id", $"cos_fp").as[(Long, Long)].collect().toMap
    val scoreWith = Similarity.embeddingOutliers(withNull, n = 5)
      .where($"cos_fp".isNotNull) // the NULL row itself scores NULL
      .select($"vec_id", $"cos_fp").as[(Long, Long)].collect().toMap
    scoreClean.foreach { case (id, fp) => assert(scoreWith(id) === fp,
      s"vec $id cos_fp moved when a NULL row joined the corpus") }

    // drift: whole-report equality — the NULL row contributes no lanes
    // and n_members counts only contributing vectors
    assert(Similarity.labelCentroidDrift(withNull).collect().toSeq ===
      Similarity.labelCentroidDrift(clean).collect().toSeq)

    // k-means: non-null rows' assignments ride identical centroids
    val aClean = Similarity.kmeansAssign(clean, k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    val aWith = Similarity.kmeansAssign(withNull, k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    aClean.foreach { case (id, cid) => assert(aWith(id) === cid,
      s"vec $id changed cluster when a NULL row joined the corpus") }
  }

  test("embeddingOutliers scores are fixed-point cosines in [-1e6, 1e6]") {
    val out = Similarity.embeddingOutliers(embs, n = 20).collect()
    assert(out.length == 20)
    out.foreach(r => assert(math.abs(r.getLong(3)) <= 1000000L))
  }

  test("epochShuffle partitions every row into dense per-shard positions") {
    val out = Sampling.epochShuffle(docs, "doc_id", "epoch0", nShards = 8)
    assert(out.count() == docs.count())
    val perShard = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"shard_pos").as("lo"), max($"shard_pos").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    perShard.foreach { case (shard, n, lo, hi) =>
      assert(shard >= 0L && shard < 8L && lo == 1L && hi == n)
    }
  }

  test("epochShuffle is seed-deterministic and seed-sensitive") {
    val a = Sampling.epochShuffle(docs, "doc_id", "epoch0", 8).collect()
    val b = Sampling.epochShuffle(docs, "doc_id", "epoch0", 8).collect()
    val c = Sampling.epochShuffle(docs, "doc_id", "epoch1", 8).collect()
    assert(a.sameElements(b))
    assert(!a.sameElements(c)) // a different epoch is a different permutation
  }

  test("epochShuffle rejects nShards < 1") {
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(docs, "doc_id", "epoch0", 0)
    }
  }

  test("clusterPurity is 1e6 on perfectly label-separated clusters") {
    // vec_id < k seeds the centroids, so 0 and 1 seed the two clusters
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 5),
      (1L, Array(0.0f, 1.0f), 6),
      (2L, Array(0.9f, 0.1f), 5),
      (3L, Array(0.1f, 0.9f), 6)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterPurity(e, k = 2, iters = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == 4L)
    assert(out.map(r => r._3 -> r._4).toSet == Set(5L -> 1000000L, 6L -> 1000000L))
  }

  test("clusterPurity members sum to the corpus and purity is a valid ppm") {
    val out = Similarity.clusterPurity(embs, k = 8, iters = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == embs.count())
    out.foreach { case (_, n, _, ppm) =>
      assert(ppm >= 1000000L / n && ppm <= 1000000L) // majority >= 1/n share
    }
  }

  test("dupSpans finds a shared 8-gram with exact df and occurrence counts") {
    val shared = "a b c d e f g h"
    val d = Seq(
      (1L, s"$shared x y z"),
      (2L, s"p q $shared"),
      (3L, s"p q r s t u v w x y"), // no shared span
      (4L, s"$shared $shared")      // two occurrences, one doc
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(d, n = 8, minDf = 2)
      .as[(String, Long, Long, Long)].collect()
    val hit = out.find(_._1 == shared).get
    assert(hit._2 == 3L && hit._4 == 1L) // docs 1,2,4; first owner 1
    assert(hit._3 >= 4L)                 // 1+1+2 occurrences (overlaps add more)
    out.foreach(r => assert(r._2 >= 2L))
  }

  test("dupSpans never reports a span absent from the shingle inventory") {
    val spans = Dedup.dupSpans(docs, n = 8, minDf = 2).select($"span")
    val all = Dedup.shingles(docs, 8).select($"shingle".as("span")).distinct()
    assert(spans.exceptAll(all).isEmpty)
  }

  test("qualityLogit computes the exact integer logit on a known document") {
    // "aa bb aa" -> 3 tokens, 2 distinct, 8 chars
    // ttr = 2*1e6/3 = 666666, len = 8*1e6/3 = 2666666
    // logit = (2*666666)/1000 + 2666666/1000 + 10*3 - 7000 = 1333 + 2666 + 30 - 7000
    val d = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityLogit(d).as[(Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((1L, 666666L, 2666666L, 3L, -2971L, 0L)))
  }

  test("qualityLogit keep flag matches the sign of the logit corpus-wide") {
    val out = TextAnalysis.qualityLogit(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == docs.count())
    out.foreach { case (_, ttr, len, ntok, logit, keep) =>
      assert(logit == (2 * ttr) / 1000 + len / 1000 + 10 * ntok - 7000)
      assert(keep == (if (logit >= 0) 1L else 0L))
      assert(ttr >= 0 && ttr <= 1000000L && ntok >= 1)
    }
  }

  test("qualityLogit rejects negative weights (engine div semantics diverge)") {
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityLogit(docs, wTtr = -1L)
    }
  }

  test("crossSourceDups accounts for every capped-Jaccard pair exactly once") {
    val pairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20)
    val matrix = Dedup.crossSourceDups(docs, 3, 0.5, 20)
      .as[(String, String, Long, Double)].collect()
    assert(matrix.map(_._3).sum == pairs.count())
    matrix.foreach { case (lo, hi, n, maxJ) =>
      assert(lo <= hi && n >= 1 && maxJ >= 0.5 && maxJ <= 1.0)
    }
  }

  test("crossSourceDups normalizes the source pair order") {
    val d = Seq(
      (1L, "one two three four five six seven", "srcB"),
      (2L, "one two three four five six seven", "srcA"),
      (3L, "totally different words here now ok fine", "srcC")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceDups(d, 3, 0.5, 20)
      .as[(String, String, Long, Double)].collect()
    assert(out.toSeq == Seq(("srcA", "srcB", 1L, 1.0)))
  }

  test("invertedIndex builds sorted postings, counts df once per doc, and stop-lists") {
    val d = Seq(
      (3L, "apple banana apple"),  // apple twice in one doc -> df 1
      (1L, "apple cherry"),
      (2L, "stopword stopword"),
      (4L, "stopword apple cherry")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(d, maxDf = 2)
      .as[(String, Long, Long, String)].collect().toSeq
    // apple df=3 exceeds the cap; stopword df=2 stays
    assert(out == Seq(("banana", 1L, 0L, "3"), ("cherry", 2L, 0L, "1,4"),
      ("stopword", 2L, 0L, "2,4")))
  }

  test("invertedIndex shards postings at shardSize and reassembles to the exact doc set") {
    val idx = TextAnalysis.invertedIndex(docs, maxDf = docs.count(), shardSize = 7)
      .as[(String, Long, Long, String)].collect()
    idx.groupBy(_._1).take(5).foreach { case (term, shards) =>
      val df = shards.head._2
      shards.foreach { case (_, _, _, p) => assert(p.split(",").length <= 7) }
      // shards are dense 0..ceil(df/7)-1 and reassemble to the sorted doc list
      assert(shards.map(_._3).sorted.toSeq == (0L until (df + 6) / 7).toSeq)
      val ids = shards.sortBy(_._3).flatMap(_._4.split(",").map(_.toLong))
      assert(ids.length == df && ids.toSeq == ids.sorted.toSeq)
      val expected = docs.filter(array_contains(split(lower(trim($"text")), "\\s+"), term))
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(ids.toSeq == expected, s"term $term")
    }
  }

  test("labelCentroidDrift: a label aligned with the corpus mean scores higher than a contrarian one") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.95f, 0.05f), 1),
      (3L, Array(-1.0f, 0.02f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidDrift(e)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out.map(_._2) == Seq(3L, 1L))           // member counts
    assert(out(0)._3 > 900000L && out(1)._3 < 0L)  // aligned vs contrarian
  }

  test("labelCentroidDrift members sum to the corpus and drift is a valid fixed-point cosine") {
    val out = Similarity.labelCentroidDrift(embs)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._2).sum == embs.count())
    out.foreach(r => assert(math.abs(r._3) <= 1000000L))
  }

  // ---- physical-plan scale guards: the shapes that make these ops
  // survive 100x are locked here, not just described in scaladoc ----

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q152/q155 broadcast the ratio table; q153 heap-cuts the resample — no corpus self-join anywhere") {
    for (q <- Seq("q152_dsir_weights", "q155_dsir_persisted")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"),
        s"$q must broadcast the buckets-row log-ratio table")
      assert(!p.contains("SortMergeJoin"),
        s"$q must not shuffle-join the corpus against anything corpus-sized")
    }
    val p153 = plan("q153_dsir_resample")
    assert(p153.contains("TakeOrderedAndProject"),
      "the resample cut must be a bounded heap, not a global sort")
  }

  test("q96/q101 broadcast the query batch and heap-prune the top-k before the exchange") {
    for (q <- Seq("q96_knn_classify", "q101_knn_classify_ivf")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q must broadcast the bounded query side")
      assert(p.contains("WindowGroupLimit"), s"$q must pre-prune top-k per partition")
      assert(!p.contains("SortMergeJoin"), s"$q must not shuffle the train corpus for a join")
    }
  }

  test("q97 takes the bottom-n with a heap, not a global sort of the corpus") {
    val p = plan("q97_embedding_outliers")
    assert(p.contains("TakeOrderedAndProject"))
    // centroid lane sums fold via the native array-sum aggregate with
    // a map-side partial (partial_graft_vsum), not an n·dim explode
    assert(p.contains("partial_graft_vsum"),
      "centroid lane sums must combine map-side via graft_vsum")
    assert(!p.contains("Generate posexplode"),
      "the centroid must not explode the corpus lanes")
  }

  test("q98 windows per shard — no empty-frame global window over the corpus") {
    val p = plan("q98_epoch_shuffle")
    // a global row_number renders as windowspecdefinition with no
    // partition key before the ordering spec; the shard key must be there
    assert(p.contains("windowspecdefinition(shard#") ||
      p.contains("windowspecdefinition(shard"), "shard must partition the window")
  }

  test("q105 rank and df windows share one term-partitioned exchange; q111 fuses its lags into one Window") {
    val p105 = plan("q105_inverted_index")
    assert("\\bWindow\\b".r.findAllIn(p105).length == 2)
    assert("Exchange".r.findAllIn(p105).length <= 2,
      "rank + df must ride the same term exchange (plus only the final sort)")
    val p111 = plan("q111_next_event_examples")
    assert("\\bWindow\\b".r.findAllIn(p111).length == 1,
      "all k lag columns must evaluate in a single Window operator")
    for (q <- Seq("q104_cdf_quantiles", "q109_range_window_7d"))
      assert(!plan(q).contains("SortMergeJoin"), s"$q must not join")
  }

  test("q100 is one agg over the explode — no join operator anywhere in the plan") {
    val p = plan("q100_dup_spans")
    for (op <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!p.contains(op), s"q100 must not contain $op")
    assert(p.contains("partial_count") || p.contains("partial_min") || p.contains("HashAggregate"),
      "span counts must combine map-side")
  }
}
