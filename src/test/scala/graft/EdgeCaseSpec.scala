package graft

import graft.operators.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate inputs must not throw or divide by zero: empty text,
  * single tokens, unicode, and empty binary payloads.
  */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private val weird = docsOf("", " ", "one", "héllo wörld été", "a\tb\nc   d")

  test("text analysis operators are total on degenerate inputs") {
    assert(TextAnalysis.langId(weird).count() == 5)
    assert(TextAnalysis.qualityScore(weird).count() == 5)
    assert(TextAnalysis.fingerprint(weird).count() == 5)
    assert(TextAnalysis.tokenCounts(weird).count() == 5)
    // no NaN/null quality for the non-empty docs; empty doc may be NaN but not an exception
    val q = TextAnalysis.qualityScore(weird).filter($"n_chars" > 1).collect()
    q.foreach(r => assert(!r.getAs[Double]("quality").isNaN))
  }

  test("unicode text fingerprints agree across runs (UTF-8 stable)") {
    val a = TextAnalysis.fingerprint(weird).collect().toSeq
    val b = TextAnalysis.fingerprint(weird).collect().toSeq
    assert(a == b)
  }

  test("dedup operators handle docs below the shingle size") {
    // "one" has 1 token < n=3: contributes no shingles, no pairs, no crash
    val pairs = Dedup.jaccardPairs(weird, 3, 0.1)
    assert(pairs.count() == 0)
    assert(Dedup.exact(weird).count() == 5)
    assert(Dedup.simhashPairs(weird, 32).count() >= 0) // total, permissive budget
  }

  test("multimodal stub codec survives empty payloads") {
    val media = Multimodal.asMedia(docsOf("", "x"), "doc_id", "text", "image", "image/fake")
    assert(Multimodal.decodeImages(media).count() == 2)
    val f = Multimodal.extractFeatures(media, 8).collect()
    assert(f.forall(_.features.length == 8))
    assert(f.forall(_.features.forall(!_.isNaN))) // zero-norm guarded
  }

  test("graph/cluster operators are total on an empty pair frame") {
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(operators.Graph.pageRank(noPairs, 2).count() == 0)
    assert(Dedup.duplicateClusters(noPairs).count() == 0)
    // keep-best with no pairs = every doc its own singleton cluster
    val docs = Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "n_chars")
    val reps = Dedup.keepBestPerCluster(docs, noPairs, "n_chars")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(reps == List((1L, 1L, 5L, 1L), (2L, 2L, 9L, 1L)))
  }

  test("tfidf/zipf/funnel are total on degenerate inputs") {
    assert(TextAnalysis.tfidfTopTerms(weird, 3).count() >= 1)
    assert(TextAnalysis.zipfHistogram(weird).count() >= 1)
    val docs = weird.withColumn("source", lit("s"))
    val funnel = TextAnalysis.qualityFunnel(docs, "source").collect()
    assert(funnel.length == 1 && funnel.head.getAs[Long]("n_input") == 5L)
  }

  test("temperatureMixture on a single group degenerates to plain targetFrac") {
    val one = weird.withColumn("grp", lit("only"))
    val rates = operators.Sampling.temperatureMixture(one, "grp", "doc_id", 0.5, 0.4)
      .groupBy($"grp").agg(max($"rate_pct")).as[(String, Long)].collect().toMap
    assert(rates.getOrElse("only", 40L) == 40L) // n^a/n^a = 1 -> rate = targetFrac
  }

  test("round-5 text/sampling operators are total on degenerate inputs") {
    // below the span size, empty text, whitespace-only
    assert(Dedup.dupSpans(weird, n = 8, minDf = 2).count() == 0)
    assert(TextAnalysis.qualityLogit(weird).count() == 5) // "" tokenizes to [""], size 1
    assert(TextAnalysis.invertedIndex(weird, maxDf = 10).count() >= 1)
    val shuffled = graft.operators.Sampling.epochShuffle(weird, "doc_id", "e", 100)
    assert(shuffled.count() == 5) // more shards than rows: positions still dense
    shuffled.collect().foreach(r => assert(r.getLong(1) == 1L))
  }

  test("round-5 embedding operators are total when the query/train split is degenerate") {
    val e = Seq((0L, Array(1.0f, 0.0f), 1), (1L, Array(0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    // every vector is a query -> empty train set -> empty result, no throw
    assert(graft.operators.Similarity.knnClassify(e, nQueries = 2, k = 3).count() == 0)
    // k larger than the train set: votes bounded by what exists
    val out = graft.operators.Similarity.knnClassify(e, nQueries = 1, k = 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._4 == 1L)
    // outliers with n larger than the corpus returns the whole corpus ranked
    assert(graft.operators.Similarity.embeddingOutliers(e, n = 10).count() == 2)
  }

  test("kmeans with k larger than the corpus still assigns every vector") {
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = operators.Similarity.kmeansAssign(tiny, k = 10, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L)) // each its own centroid
  }

  test("an all-zero embedding never becomes NaN: it ranks last, not first") {
    // a failed-encoder zero vector normalizes to itself (cosine 0
    // everywhere); without the guard it is 0/0 = NaN, and NaN sorts
    // GREATER than every double in Spark — the zero vector would be
    // the #1 neighbour of every query and a "near-dup" of everything
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = operators.Similarity.cosineTopK(e, nQueries = 1, k = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(top.forall(r => !r._4.isNaN))
    assert(top.head._3 == 1L) // the real neighbour outranks the zero vector
    val dups = operators.Similarity.embeddingNearDups(e, minCos = 0.5)
    assert(dups.filter($"vec_a" === 2L || $"vec_b" === 2L).count() == 0)
  }

  test("a zero-vector centroid seed stays finite instead of NaN-capturing the corpus") {
    // k-means seeds centroids from the first k vectors; vec 0 is all
    // zeros, so centroid 0 normalizes to the zero vector (cosine 0
    // against everything). Without the guard it is NaN, every csim is
    // NaN, and NaN desc-sorts FIRST — the whole corpus would collapse
    // into the garbage centroid.
    val e = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = operators.Similarity.kmeansAssign(e, k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    // the real directions cluster together, away from the zero seed
    assert(got(1L) == got(2L) && got(1L) != got(0L))
  }
}
