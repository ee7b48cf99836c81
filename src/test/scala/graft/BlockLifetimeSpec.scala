package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-block lifetime (VERDICT r17 item 2): every frame the
  * engine `localCheckpoint()`s must be droppable deterministically.
  * ContextCleaner only reclaims checkpoint blocks after a driver GC
  * collects the frame — on a quiet large heap that can be never, and
  * round 17's driver sweep showed the cost: the block store fills
  * with dead blocks across 190 queries and late-sweep queries pay the
  * eviction churn (q23 samples rising monotonically, 33–42 s
  * second-pass blowups). The contract under test:
  *
  *  - iterative operators release each superseded round's blocks
  *    inline (the CC loops always did; the BPE fold loops now do);
  *  - every surviving engine checkpoint is registered in Dedup's weak
  *    tracker, so `releaseMaterialized()` between queries returns the
  *    persistent-RDD census to its pre-query level;
  *  - released results recompute nothing wrong: the NEXT invocation
  *    rebuilds its frames from source (Bench's per-sample pattern).
  */
class BlockLifetimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def census: Int = spark.sparkContext.getPersistentRDDs.size

  private def censusIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def describe(ids: Set[Int]): String =
    ids.toSeq.sorted.map { id =>
      spark.sparkContext.getPersistentRDDs.get(id)
        .map(r => s"$id=${r.name}@${r.getStorageLevel.description}(${r.getClass.getSimpleName})")
        .getOrElse(s"$id=<gone>")
    }.mkString("[", ", ", "]")

  /** The assertions are ID-SCOPED: only RDDs first seen DURING the
    * test must vanish after release. A shared test session carries
    * unrelated async pinning (a prior suite's stream finishing late,
    * ContextCleaner beats) that a bare size comparison false-flags —
    * observed as order-dependent failures in the full suite that never
    * reproduce solo. releaseMaterialized also unpersists with
    * blocking = false, so poll until the tracked set settles.
    */
  private def settledLeftover(beforeIds: Set[Int], timeoutMs: Long = 15000): Set[Int] = {
    val t0 = System.currentTimeMillis
    var left = censusIds -- beforeIds
    while (left.nonEmpty && System.currentTimeMillis - t0 < timeoutMs) {
      Thread.sleep(100); left = censusIds -- beforeIds
    }
    left
  }

  test("BPE train+persist+encode checkpoints all release; census returns to baseline") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 60)
    Dedup.releaseMaterialized() // drop anything earlier suites pinned
    val before = censusIds
    val st = Scratch.dir("graft_blocklife_bpe") + "/bpe"
    TextAnalysis.persistBpeVocabBatched(docs, rounds = 3, batch = 4, st)
    val enc = TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, st)
    val rows = enc.count()
    assert(rows > 0)
    Dedup.releaseMaterialized()
    val leftover = settledLeftover(before)
    assert(leftover.isEmpty,
      s"RDDs ${describe(leftover)} created by the query survived release: an engine checkpoint escaped the tracker")
    // the released state must not poison a fresh run (Bench re-invokes
    // the same query fn per sample)
    assert(TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, st).count() === rows)
  }

  test("connected-components checkpoints all release") {
    // a chain forces several pointer-jumping rounds, so the loop
    // checkpoints multiple generations of edges + intermediates
    val pairs = (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    Dedup.releaseMaterialized()
    val before = censusIds
    val labels = Dedup.duplicateClusters(pairs)
    assert(labels.select(countDistinct(col("cluster_id"))).head().getLong(0) === 1L)
    Dedup.releaseMaterialized()
    val leftover = settledLeftover(before)
    assert(leftover.isEmpty,
      s"RDDs $leftover created by the CC query survived release")
  }

  test("a loop releases only what IT checkpointed: a materialized input survives training") {
    // regression (round-18 bpe32k probe): releaseCheckpoint used to
    // tree-search the plan for ANY LogicalRDD, so releasing round-1's
    // `seqs` (a derived plan over the caller's corpus) found the
    // CALLER'S materialized input as a leaf and unpersisted it — the
    // encode crashed minutes later with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    val docs = Dedup.materialize(
      Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .filter(col("doc_id") < 40))
    val expect = docs.count()
    val st = Scratch.dir("graft_blocklife_input") + "/bpe"
    TextAnalysis.persistBpeVocabBatched(docs, rounds = 4, batch = 2, st)
    // the input's checkpoint blocks must still be readable AFTER the
    // trainer's per-round releases (lineage is truncated — a released
    // block cannot be recomputed, so this count would throw)
    assert(docs.count() === expect)
    assert(TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, st).count() === expect)
    Dedup.releaseMaterialized()
  }

  test("deltaAntiState equals the plain anti join in BOTH gate branches") {
    // the replay/append filter's broadcast-semi shape must be
    // algebraically invisible: delta ▷ K ≡ delta ▷ (K ⋉ delta). The
    // state-size gate picks the branch off the planner's broadcast
    // threshold — force each branch via the threshold conf and compare
    // against the reference anti join.
    val delta = (0L until 50L).map(i => (i, s"fp$i")).toDF("doc_id", "fp")
    val state = (25L until 500L).map(i => (i, s"fp$i")).toDF("doc_id", "fp")
    val expect = delta.join(state, Seq("doc_id", "fp"), "left_anti")
      .orderBy(col("doc_id")).collect().toSeq
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      for (thresh <- Seq("10MB", "-1")) { // small-state branch, big-state branch
        spark.conf.set(key, thresh)
        val out = Dedup.deltaAntiState(delta, state, Seq("doc_id", "fp"))
        val got = out.orderBy(col("doc_id")).collect().toSeq
        assert(got === expect, s"deltaAntiState diverged at threshold $thresh")
        if (thresh == "-1") {
          // the scale property itself, plan-pinned: with broadcast
          // disabled the plain anti would sort-merge (exchanging the
          // state); the semi shape must never sort-merge — its only
          // exchanges sit inside delta-sized broadcast builds
          val plan = out.queryExecution.executedPlan.toString
          assert(!plan.contains("SortMergeJoin"),
            s"big-state branch sort-merged (state exchanged):\n$plan")
        }
      }
    } finally spark.conf.set(key, saved)
    Dedup.releaseMaterialized()
  }

  test("superseded BPE fold rounds release inline, before the query ends") {
    // applyMergeWaves discipline: with W waves only O(1) checkpoints
    // may be live at once, not O(W). Train enough merges at batch=1 to
    // force many singleton waves through the encode path, then check
    // the census mid-stream is far below the wave count.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 40)
    Dedup.releaseMaterialized()
    val before = censusIds
    val st = Scratch.dir("graft_blocklife_waves") + "/bpe"
    TextAnalysis.persistBpeVocabBatched(docs, rounds = 12, batch = 1, st)
    TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, st).count()
    val during = (censusIds -- before).size
    // 12 training rounds + 12 singleton encode waves would pin ~24
    // generations without the inline release; the retained set is the
    // handful of per-call survivors the tracker frees below
    assert(during < 12,
      s"$during new RDDs pinned: superseded fold rounds are not released inline")
    Dedup.releaseMaterialized()
    assert(settledLeftover(before).isEmpty)
  }
}
