package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q76–q78 operators: TF-IDF top terms, Zipf df-histogram, per-source
  * quality funnel.
  */
class TfidfFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("tfidfTopTerms ranks the distinctive term above ubiquitous ones") {
    val docs = Seq(
      (1L, "zebra common common common"),
      (2L, "common common common common"),
      (3L, "common filler words here")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .filter($"doc_id" === 1 && $"rnk" === 1).select($"term").as[String].head()
    // "zebra": df=1 -> idf=ln(4/2)+1; "common": df=3, tf=3 -> 3*(ln(1)+1)=3
    // 3 > 1.69 so common outranks by weight; doc 1 rank 1 is "common"
    assert(top == "common")
    val doc3 = TextAnalysis.tfidfTopTerms(docs, k = 4).filter($"doc_id" === 3)
      .orderBy($"rnk").select($"term").as[String].collect().toSeq
    // all tf=1: distinctive (df=1) terms outrank "common" (df=3)
    assert(doc3.take(3).toSet == Set("filler", "here", "words") && doc3.last == "common")
  }

  test("ngramNovelty: lowest doc owns all its grams; hand-built overlap scores exactly") {
    val docs = Seq(
      (1L, "a b c d"),      // grams: "a b c", "b c d" — both first owned here
      (2L, "a b c d"),      // identical: zero novel
      (3L, "a b c x y z")). // "a b c" seen; "b c x", "c x y", "x y z" novel
      toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, n = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 4L, 3L, 0.75)))
    // corpus identity: novel grams across docs == distinct grams overall
    val total = TextAnalysis.ngramNovelty(Tables.load(spark, sf, "documents"), n = 3)
    val novelSum = total.agg(sum($"n_novel")).head().getLong(0)
    val distinctGrams = graft.operators.Dedup.shingles(
      Tables.load(spark, sf, "documents"), 3).select($"shingle").distinct().count()
    assert(novelSum == distinctGrams)
  }

  test("zipfHistogram buckets document frequencies by exact log2") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a b"), (4L, "a")).toDF("doc_id", "text")
    // df: a=4 (bucket 2), b=3 (bucket 1), c=1 (bucket 0)
    val got = TextAnalysis.zipfHistogram(docs)
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((0L, 1L, 1L), (1L, 1L, 3L), (2L, 1L, 4L)))
  }

  test("qualityFunnel gates are cumulative and bounded by n_input") {
    val f = TextAnalysis.qualityFunnel(Tables.load(spark, sf, "documents"), "source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(f.nonEmpty)
    f.foreach { case (_, n, g1, g2, g3, g4) =>
      assert(n >= g1 && g1 >= g2 && g2 >= g3 && g3 >= g4 && g4 >= 0)
    }
    // totals agree with the corpus row count
    assert(f.map(_._2).sum == Tables.load(spark, sf, "documents").count())
  }

  test("bigramLogProb matches hand-computed add-1 smoothed probabilities") {
    val docs = Seq((1L, "a b a b"), (2L, "a a"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, a) => id -> ((n, a)) }.toMap
    // V=3 (a, b, solo); c2: (a,b)=2 (b,a)=1 (a,a)=1; c1: a=3, b=1
    val pAB = 3.0 / 6.0; val pBA = 2.0 / 4.0; val pAA = 2.0 / 6.0
    val d1 = (-math.log(pAB) * 2 - math.log(pBA)) / 3
    val d2 = -math.log(pAA) / 1
    assert(got.keySet == Set(1L, 2L)) // "solo" has no bigrams
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - d1) < 1e-9)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - d2) < 1e-9)
  }

  test("weightedSample keeps everything at weight 1, nothing at 0, slice in between") {
    val df = (1 to 200).map(i => (i.toLong, if (i <= 100) 1.0 else 0.0))
      .toDF("doc_id", "wt")
    val kept = graft.operators.Sampling.weightedSample(df, "wt", "doc_id")
      .as[(Long, Double, Long)].collect()
    assert(kept.forall(_._1 <= 100) && kept.length == 100) // rate 100 keeps all, 0 none
    val half = (1 to 1000).map(i => (i.toLong, 0.5)).toDF("doc_id", "wt")
    val keptHalf = graft.operators.Sampling.weightedSample(half, "wt", "doc_id")
    val expect = half.filter(
      graft.operators.Sampling.hashBucket($"doc_id".cast("string")) < 50).count()
    assert(keptHalf.count() == expect && expect > 300 && expect < 700)
  }

  test("qualityFunnel first gate equals a direct recount") {
    val docs = Tables.load(spark, sf, "documents")
    val direct = docs
      .select(size(split(lower(trim($"text")), "\\s+")).as("n"), $"source")
      .filter($"n" >= 10).groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val funnel = TextAnalysis.qualityFunnel(docs, "source")
      .select($"source", $"n_len_ok").as[(String, Long)].collect().toMap
    assert(funnel.filter(_._2 > 0) == direct)
  }
}
