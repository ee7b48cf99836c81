package graft

import graft.operators.{Dedup, Multimodal, TextAnalysis}
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
}
