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

  test("estimator-verified LSH equals estimate-accuracy pairs at the same threshold") {
    // minhashLshEstimated keeps candidates whose SIGNATURE estimate
    // clears the threshold — exactly the q94 harness's est_jaccard
    // column thresholded, so the two must agree pair-for-pair
    val estVer = Dedup.minhashLshEstimated(docs, 3, 16, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    val fromHarness = Dedup.minhashEstimateAccuracy(docs, 3, 16, 4, 0.0)
      .filter($"est_jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(estVer.sorted == fromHarness.sorted)
    // and every estimator-passed pair is a real LSH candidate
    val cand = Dedup.minhashLsh(docs, 3, 16, 4, 0.0)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(estVer.map(r => (r._1, r._2)).forall(cand.contains))
  }

  test("star variant capped mid-convergence still emits exactly one row per doc") {
    val chain = spark.range(1L, 64L)
      .select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
    val capped = Dedup.duplicateClustersStar(chain, maxIter = 1)
    // output contract holds even unconverged: one label per node
    assert(capped.count() == 64)
    assert(capped.select($"doc_id").distinct().count() == 64)
    // and labels are still a valid refinement (never exceed the node id)
    assert(capped.filter($"cluster_id" > $"doc_id").count() == 0)
  }

  test("incremental minhash: new batch vs persisted signatures, old pairs never re-emitted") {
    val state = java.nio.file.Files.createTempDirectory("graft_mh_inc").toString + "/mh"
    val bucket = graft.operators.Sampling.hashBucket($"doc_id".cast("string"))
    val old = docs.filter(bucket < 80)
    val fresh = docs.filter(bucket >= 80)
    Dedup.persistMinhashSignatures(old, 3, 16, 4, state)
    val inc = Dedup.incrementalMinhashEstimated(fresh, 3, 16, 4, 0.5, state)
      .as[(Long, Long, Double)].collect().toSet

    val freshIds = fresh.select($"doc_id").as[Long].collect().toSet
    // every emitted pair involves the new batch
    assert(inc.forall(p => freshIds.contains(p._1) || freshIds.contains(p._2)))
    // and equals the full-corpus estimator pairs restricted to >=1 new endpoint
    val full = Dedup.minhashLshEstimated(docs, 3, 16, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full.filter(p => freshIds.contains(p._1) || freshIds.contains(p._2)))

    // the run appended the new state: a SECOND batch of the same docs
    // now sees them as history (self-pairs via est=1.0 against the
    // stored signatures), proving the daily loop advances
    val again = Dedup.incrementalMinhashEstimated(
      fresh.withColumn("doc_id", $"doc_id" + 1000000L), 3, 16, 4, 1.0, state)
      .filter($"doc_b" === $"doc_a" + 1000000L)
    assert(again.count() == fresh.count())
  }

  test("keepBestPerCluster has no forced broadcast and survives the shuffle-join path") {
    val pairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20)
    val reps = Dedup.keepBestPerCluster(docs, pairs, "n_chars")
    // no broadcast hint anywhere in the plan: on a dup-heavy 100 TB
    // crawl the label frame is billions of rows, so the join must be
    // free to stay a shuffle join when AQE measures it big
    assert(!reps.queryExecution.analyzed.toString.toLowerCase.contains("hint"))
    val expected = reps.collect().toSeq
    // force the non-broadcast path: with both broadcast thresholds off,
    // the label join runs as a shuffle join — results must be identical
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val shuffled = Dedup.keepBestPerCluster(docs, pairs, "n_chars").collect().toSeq
      assert(shuffled == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("materialize=persist (lineage-safe DISK_ONLY) yields identical results to localCheckpoint") {
    val default = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20).collect().toSeq
    sys.props("graft.materialize") = "persist"
    try {
      val persisted = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20).collect().toSeq
      assert(persisted == default)
    } finally {
      sys.props.remove("graft.materialize")
      Dedup.releaseMaterialized()
    }
  }

  test("releaseMaterialized drops every persist-mode block (no session-lifetime leak)") {
    val sc = spark.sparkContext
    sys.props("graft.materialize") = "persist"
    try {
      val before = sc.getPersistentRDDs.keySet
      Dedup.jaccardPairsCapped(docs, 3, 0.5, 20).collect()
      assert((sc.getPersistentRDDs.keySet -- before).nonEmpty,
        "persist mode should pin DISK_ONLY blocks while the query runs")
      Dedup.releaseMaterialized()
      assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
        "release must unpin every block materialize registered")
    } finally {
      sys.props.remove("graft.materialize")
      Dedup.releaseMaterialized()
    }
  }

  test("pointer-jumping (large-star/small-star) labels equal propagation labels") {
    // real near-dup pairs (clique-ish) ...
    val realPairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20)
    val viaProp = Dedup.duplicateClustersPropagate(realPairs).collect().toSeq
    val viaStar = Dedup.duplicateClustersStar(realPairs).collect().toSeq
    assert(viaStar == viaProp)
    // ... AND the adversarial shapes: a long chain (diameter = n), a
    // star given backwards, and two disjoint chains that must not merge
    val chains = spark.range(1L, 64L)
      .select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
      .union(spark.range(1000L, 1040L).select($"id".as("doc_a"), ($"id" + 1).as("doc_b")))
      .union(spark.range(1L, 10L).select(lit(5000L).as("doc_a"), ($"id" + 5000L).as("doc_b")))
    val propChain = Dedup.duplicateClustersPropagate(chains, maxIter = 200).collect().toSeq
    val starChain = Dedup.duplicateClustersStar(chains).collect().toSeq
    assert(starChain == propChain)
    // chain components collapse to their minimum label
    assert(starChain.filter(_.getLong(0) <= 64L).forall(_.getLong(1) == 1L))
    assert(starChain.filter(r => r.getLong(0) >= 1000L && r.getLong(0) <= 1040L)
      .forall(_.getLong(1) == 1000L))
  }

  test("pointer-jumping converges in O(log d) rounds where propagation needs diameter rounds") {
    val chain = spark.range(1L, 257L).select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
    val (starLabels, starRounds) = Dedup.starWithRounds(chain, maxIter = 50)
    val (_, propRounds) = Dedup.propagateWithRounds(chain, maxIter = 50)
    assert(starLabels.select($"cluster_id").distinct().count() == 1L,
      "a 257-node chain is one component")
    assert(starRounds <= 12, s"star took $starRounds rounds on a 256-edge chain")
    assert(propRounds == 50, "propagation hits the cap on a chain longer than maxIter")
  }

  test("duplicateClusters defaults to star; -Dgraft.cc=propagate opts into propagation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val expected = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
    // default (no flag): the O(log d) star variant — a chain longer
    // than the default maxIter must still fully converge, which only
    // star does (propagation at maxIter=25 leaves a 40-hop chain
    // unconverged; the equality suite above pins label-equality where
    // both converge)
    val chain = spark.range(100L, 141L).select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
    assert(Dedup.duplicateClusters(chain).as[(Long, Long)].collect()
      .forall(_._2 == 100L), "the default dispatch must converge a 41-hop chain (star)")
    assert(Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toSeq == expected)
    sys.props("graft.cc") = "propagate"
    try {
      val got = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toSeq
      assert(got == expected)
    } finally sys.props.remove("graft.cc")
  }
}
