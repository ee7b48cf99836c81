package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-tier consistency: the scale paths must agree with their exact
  * baselines on data where their approximations are lossless.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  test("capped jaccard equals exact jaccard when no shingle exceeds the cap") {
    val maxDf = Dedup.shingles(docs, 3)
      .groupBy($"shingle").agg(count(lit(1)).as("df"))
      .agg(max($"df")).head().getLong(0).toInt
    val exact = Dedup.jaccardPairs(docs, 3, 0.5)
    val capped = Dedup.jaccardPairsCapped(docs, 3, 0.5, maxDf)
    assert(capped.exceptAll(exact).isEmpty && exact.exceptAll(capped).isEmpty)
  }

  test("catalog cap (maxDf=20) is inactive on small SFs: q11 equals the uncapped baseline") {
    val exact = Dedup.jaccardPairs(docs, 3, 0.5)
    val catalog = Dedup.jaccardPairsCapped(docs, 3, 0.5, maxDf = 20)
    assert(catalog.exceptAll(exact).isEmpty && exact.exceptAll(catalog).isEmpty)
  }

  test("aggressive cap only removes pairs, never invents them") {
    val exactPairs = Dedup.jaccardPairs(docs, 3, 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val cappedPairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // capping shrinks shingle sets on both sides; near-identical docs
    // keep overlapping in rare shingles, so survivors are a subset
    assert(cappedPairs.subsetOf(exactPairs))
  }

  test("minhash-LSH pairs are a subset of exact jaccard pairs with equal scores") {
    val exact = Dedup.jaccardPairs(docs, 3, 0.5)
    val lsh = Dedup.minhashLsh(docs, 3, 16, 4, 0.5)
    assert(lsh.exceptAll(exact).isEmpty) // every LSH pair exists exactly, same jaccard
  }

  test("minhashEstimateAccuracy covers exactly the minhash-LSH pairs, bounded error") {
    val lshPairs = Dedup.minhashLsh(docs, 3, 16, 4, 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val est = Dedup.minhashEstimateAccuracy(docs, 3, 16, 4, 0.5)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(est.map(r => (r._1, r._2)).toSet == lshPairs)
    est.foreach { case (_, _, e, j, err) =>
      assert(e >= 0.0 && e <= 1.0 && j >= 0.5)
      assert(math.abs(err - math.abs(e - j)) == 0.0)
    }
    // 16 hashes: the estimator's per-pair std dev is sqrt(j(1-j)/16)
    // <= 0.125; mean |error| over true near-dups stays well inside 3 sigma
    assert(est.map(_._5).sum / est.length <= 0.375)
  }
}
