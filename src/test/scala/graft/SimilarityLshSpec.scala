package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed pair-operator consistency: the 100 TB LSH forms must agree
  * with their exact all-pairs baselines on every pair they emit —
  * bucketing may only LOSE pairs (recall < 1), never invent or
  * mis-score one.
  */
class SimilarityLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embs = Tables.load(spark, sf, "embeddings")

  test("embeddingNearDupsLsh is a subset of the exact near-dups with identical cosines") {
    val exact = Similarity.embeddingNearDups(embs, minCos = 0.45)
    val lsh = Similarity.embeddingNearDupsLsh(embs, minCos = 0.45, planes = 4, dim = 64)
    assert(lsh.exceptAll(exact).isEmpty)
    assert(lsh.count() > 0) // the bucketing keeps at least one real near-dup on testdata
  }

  test("topPairsLsh emits real pairs with exactly-scored cosines and contiguous ranks") {
    val allPairs = Similarity.embeddingNearDups(embs, minCos = -2.0) // every pair, exact cosine
      .select($"vec_a", $"vec_b", $"cosine")
    val lsh = Similarity.topPairsLsh(embs, n = 20, planes = 4, dim = 64)
    assert(lsh.select($"rnk").as[Long].collect().toSeq == (1L to 20L))
    assert(lsh.select($"vec_a", $"vec_b", $"cosine").exceptAll(allPairs).isEmpty)
  }

  test("fewer planes means bigger buckets and monotonically higher recall") {
    val exact = Similarity.embeddingNearDups(embs, minCos = 0.45).count()
    val coarse = Similarity.embeddingNearDupsLsh(embs, 0.45, planes = 1, dim = 64).count()
    val fine = Similarity.embeddingNearDupsLsh(embs, 0.45, planes = 8, dim = 64).count()
    assert(fine <= coarse && coarse <= exact)
  }

  test("recallAtK: bounded per query, coarser bucketing only helps") {
    val r = Similarity.recallAtK(embs, nQueries = 10, k = 5, planes = 4, dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(r.length == 10)
    r.foreach { case (_, n, rec) =>
      assert(n >= 0 && n <= 5 && rec >= 0.0 && rec <= 1.0 && rec == n / 5.0)
    }
    // halving the planes doubles expected bucket size: recall can
    // only rise (same candidate sets or supersets)
    val coarse = Similarity.recallAtK(embs, 10, 5, planes = 1, dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(coarse.map(_._3).sum >= r.map(_._3).sum)
    assert(coarse.map(_._3).sum > 0.0) // the 2-bucket split still finds neighbors
  }

  test("recallAtKIvf: monotone in nprobe, exactly 1.0 at nprobe = nlist") {
    def total(nprobe: Int): Double =
      Similarity.recallAtKIvf(embs, nQueries = 10, k = 5, nlist = 16, nprobe = nprobe)
        .as[(Long, Long, Double)].collect().map(_._3).sum
    val narrow = total(1)
    val mid = total(4)
    val full = total(16)
    // probing more cells can only add candidates — never drop one
    assert(narrow <= mid && mid <= full)
    // probing every cell IS the exact scan (minus nothing): recall 1.0/query
    assert(full == 10.0)
    assert(mid > 0.0)
  }

  test("semanticNearDups pairs exist in the exact baseline with identical cosines") {
    val exact = Similarity.embeddingNearDups(embs, minCos = 0.45)
    val sem = Similarity.semanticNearDups(embs, k = 8, iters = 2, minCos = 0.45)
    assert(sem.select($"vec_a", $"vec_b", $"cosine").exceptAll(exact).isEmpty)
    assert(sem.count() > 0) // co-clustered near-dups survive on testdata
    // every pair's two vectors really share the emitted cluster
    val assign = Similarity.kmeansAssign(embs, k = 8, iters = 2)
      .as[(Long, Long)].collect().toMap
    sem.select($"cluster_id", $"vec_a", $"vec_b").as[(Long, Long, Long)].collect()
      .foreach { case (c, a, b) => assert(assign(a) == c && assign(b) == c) }
  }

  test("derivePlanes/deriveK reduce to the catalog constants at testdata sizes and scale with n") {
    assert(Similarity.derivePlanes(500) == 2)   // sf0.001 / sf0.01
    assert(Similarity.derivePlanes(2000) == 4)  // sf0.1 — the q57/q58 point
    assert(Similarity.derivePlanes(50000) == 9) // 100× sf0.01
    assert(Similarity.deriveK(500) == 8)
    assert(Similarity.deriveK(2000) == 32)
    // integer-exact at the boundary: one vector past a power-of-two
    // capacity must open the next plane (a float log2 could ulp-flip)
    assert(Similarity.derivePlanes(2000 * 1) == 4 && Similarity.derivePlanes(2001) == 5)
    assert(Similarity.deriveK(2048) == 32 && Similarity.deriveK(2049) == 33)
    // floors: tiny corpora never go below the minimum operating point
    assert(Similarity.derivePlanes(1) == 2 && Similarity.deriveK(1) == 8)
  }

  test("auto pair operators equal the explicit forms at the derived operating point") {
    val n = embs.count()
    val planes = Similarity.derivePlanes(n)
    val auto = Similarity.embeddingNearDupsLshAuto(embs, 0.45, dim = 64)
    val explicit = Similarity.embeddingNearDupsLsh(embs, 0.45, planes, dim = 64)
    assert(auto.count() == explicit.count() && auto.exceptAll(explicit).isEmpty)
    val autoTop = Similarity.topPairsLshAuto(embs, n = 20, dim = 64)
    val explicitTop = Similarity.topPairsLsh(embs, n = 20, planes, dim = 64)
    assert(autoTop.exceptAll(explicitTop).isEmpty && autoTop.count() == explicitTop.count())
    val autoSem = Similarity.semanticNearDupsAuto(embs, iters = 2, minCos = 0.45)
    val explicitSem = Similarity.semanticNearDups(embs, Similarity.deriveK(n), iters = 2, minCos = 0.45)
    assert(autoSem.count() == explicitSem.count() && autoSem.exceptAll(explicitSem).isEmpty)
    // the auto pairs remain a subset of the exact all-pairs baseline
    assert(auto.exceptAll(Similarity.embeddingNearDups(embs, 0.45)).isEmpty)
  }

  test("kmeansAssign rejects iters < 1 with a clear error") {
    val e = intercept[IllegalArgumentException](Similarity.kmeansAssign(embs, k = 8, iters = 0))
    assert(e.getMessage.contains("iters"))
  }

  test("recallAtKInt8: bounded per query and high (quantization only flips near-ties)") {
    val r = Similarity.recallAtKInt8(embs, nQueries = 10, k = 5)
      .as[(Long, Long, Double)].collect()
    assert(r.length == 10)
    r.foreach { case (_, n, rec) =>
      assert(n >= 0 && n <= 5 && rec == n / 5.0)
    }
    // int8 scans every vector — misses come only from 8-bit rank
    // tie-flips at the k boundary, so aggregate recall stays high
    assert(r.map(_._3).sum / 10.0 >= 0.8)
  }
}
