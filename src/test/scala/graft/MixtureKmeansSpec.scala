package graft

import graft.operators.{Dedup, Sampling, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q73–q75 operators: temperature-scaled mixture sampling, dedup with
  * representative selection, spherical k-means assignment.
  */
class MixtureKmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- temperature mixture ----------------------------------------------

  test("temperatureMixture computes n^alpha-flattened integer rates, capped at 100") {
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "small"))).toDF("doc_id", "grp")
    val kept = Sampling.temperatureMixture(df, "grp", "doc_id", alpha = 0.5, targetFrac = 0.5)
    val rates = kept.groupBy($"grp").agg(max($"rate_pct")).as[(String, Long)].collect().toMap
    // shares ~ sqrt(n): sqrt(900)=30, sqrt(100)=10, T=500
    // big:   floor(500*30/40/900*100 + .5) = 42; small: 125 -> capped 100
    assert(rates == Map("big" -> 42L, "small" -> 100L))
    val counts = kept.groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(counts("small") == 100L) // rate 100 keeps every row
    // the kept set is exactly the hash slice, recomputable independently
    val expectBig = df.filter($"grp" === "big")
      .filter(Sampling.hashBucket($"doc_id".cast("string")) < 42).count()
    assert(counts("big") == expectBig && expectBig < 900)
    // mixture flattened: small's share rose from 10% toward uniform
    assert(counts("small").toDouble / (counts("big") + counts("small")) > 0.15)
  }

  test("temperatureMixture with alpha=1 keeps every group's rate equal to targetFrac") {
    val df = ((1 to 300).map(i => (i.toLong, "a")) ++
      (301 to 400).map(i => (i.toLong, "b"))).toDF("doc_id", "grp")
    val rates = Sampling.temperatureMixture(df, "grp", "doc_id", alpha = 1.0, targetFrac = 0.3)
      .groupBy($"grp").agg(max($"rate_pct")).as[(String, Long)].collect().toMap
    assert(rates == Map("a" -> 30L, "b" -> 30L)) // alpha=1 = plain proportional
  }

  // ---- keep-best representative -----------------------------------------

  test("leakFreeSplit: every near-dup pair lands whole in one split; doc-level split leaks") {
    val docs = Tables.load(spark, sf, "documents")
    val pairs = graft.operators.Dedup.jaccardPairsCapped(docs, 3, 0.5, 20)
    val split = graft.operators.Sampling.leakFreeSplit(docs, pairs, 80)
    // complete partition of the corpus
    assert(split.count() == docs.count())
    // THE invariant: no near-dup pair straddles the split boundary
    val straddling = pairs
      .join(split.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(split.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .filter($"sa" =!= $"sb")
    assert(straddling.count() == 0)
    // contrast: the per-doc split DOES leak on this corpus (the very
    // failure mode the cluster-keyed split exists to prevent)
    val perDoc = graft.operators.Sampling.trainTestSplit(docs, "doc_id", 80)
    val perDocStraddling = pairs
      .join(perDoc.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(perDoc.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .filter($"sa" =!= $"sb")
    assert(perDocStraddling.count() > 0)
  }

  test("keepBestPerCluster keeps the longest member per cluster, singletons survive") {
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 30L), (4L, 7L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.keepBestPerCluster(docs, pairs, "n_chars")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((1L, 2L, 50L, 3L), (4L, 4L, 7L, 1L)))
  }

  test("keepBestPerCluster ties break to the lowest doc_id") {
    val docs = Seq((7L, 20L), (8L, 20L)).toDF("doc_id", "n_chars")
    val pairs = Seq((7L, 8L)).toDF("doc_a", "doc_b")
    val got = Dedup.keepBestPerCluster(docs, pairs, "n_chars")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((7L, 7L, 20L, 2L)))
  }

  test("keepBestPerCluster output is a complete partition of the corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val pairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20)
    val reps = Dedup.keepBestPerCluster(docs, pairs, "n_chars")
    val total = reps.agg(sum($"n_members")).as[Long].head()
    assert(total == docs.count()) // every doc counted exactly once
    assert(reps.select($"rep_doc_id").distinct().count() == reps.count())
  }

  // ---- spherical k-means -------------------------------------------------

  /** Local mirror of the operator's exact arithmetic: sequential-fold
    * normalize and dot (the graft_dot order), argmax with min-cid ties.
    */
  private def localAssign(vecs: Map[Long, Array[Double]],
                          cents: Map[Long, Array[Double]]): Map[Long, Long] =
    vecs.map { case (id, u) =>
      id -> cents.toSeq
        .map { case (cid, cu) => (cid, u.zip(cu).foldLeft(0.0) { case (a, (p, q)) => a + p * q }) }
        .sortBy { case (cid, cs) => (-cs, cid) }.head._1
    }

  test("kmeansAssign round 1 is the nearest-seed-centroid assignment") {
    val embs = Tables.load(spark, sf, "embeddings")
    val unit = embs
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .as[(Long, Array[Double])].collect()
      .map { case (id, v) =>
        val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
        id -> v.map(_ / n)
      }.toMap
    val expect = localAssign(unit, unit.filter(_._1 < 4))
    val got = Similarity.kmeansAssign(embs, k = 4, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("kmeansAssign after 2 rounds covers every vector and is deterministic") {
    val embs = Tables.load(spark, sf, "embeddings")
    val a = Similarity.kmeansAssign(embs, k = 4, iters = 2).as[(Long, Long)].collect()
    assert(a.length == embs.count())
    assert(a.map(_._2).toSet.subsetOf((0L until 4L).toSet))
    assert(a.map(_._2).distinct.length > 1) // data actually separates
    val b = Similarity.kmeansAssign(embs, k = 4, iters = 2).as[(Long, Long)].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("coarse k-means with every super probed equals the flat assignment exactly") {
    val embs = Tables.load(spark, sf, "embeddings")
    for (k <- Seq(4, 9)) {
      val m = math.ceil(math.sqrt(k.toDouble)).toInt
      val flat = Similarity.kmeansAssign(embs, k, iters = 2)
      val coarse = Similarity.kmeansAssignCoarse(embs, k, iters = 2, nprobe = m)
      assert(coarse.exceptAll(flat).isEmpty && flat.exceptAll(coarse).isEmpty, s"k=$k")
    }
  }

  test("coarse k-means below full probe stays deterministic and mostly agrees with flat") {
    val embs = Tables.load(spark, sf, "embeddings")
    val flat = Similarity.kmeansAssign(embs, k = 9, iters = 2).as[(Long, Long)].collect()
    val c1 = Similarity.kmeansAssignCoarse(embs, k = 9, iters = 2, nprobe = 2)
      .as[(Long, Long)].collect()
    val c2 = Similarity.kmeansAssignCoarse(embs, k = 9, iters = 2, nprobe = 2)
      .as[(Long, Long)].collect()
    assert(c1.toSeq == c2.toSeq) // deterministic under re-run
    assert(c1.length == flat.length)
    val agree = c1.zip(flat).count { case ((v1, a1), (v2, a2)) => v1 == v2 && a1 == a2 }
    assert(agree.toDouble / flat.length >= 0.6, s"agreement $agree/${flat.length}")
  }

  test("coarse k-means rejects bad nprobe/iters") {
    val embs = Tables.load(spark, sf, "embeddings")
    intercept[IllegalArgumentException] {
      Similarity.kmeansAssignCoarse(embs, 4, iters = 0, nprobe = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansAssignCoarse(embs, 4, iters = 1, nprobe = 0)
    }
  }
}
