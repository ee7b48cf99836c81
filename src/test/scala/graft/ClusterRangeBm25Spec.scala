package graft

import graft.operators.{Dedup, RangeJoin, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q64–q67 operators: dup-pair connected components, benchmark
  * contamination, keyless band join, BM25 scoring.
  */
class ClusterRangeBm25Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def events = Tables.load(spark, sf, "events")

  // ---- connected components ---------------------------------------------

  test("duplicateClusters labels a chain a-b, b-c, plus an isolated pair, with min ids") {
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 40L, 50L -> 40L))
  }

  test("duplicateClusters converges on a long path (diameter > 2)") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(chain).as[(Long, Long)].collect().toMap
    assert(got.size == 13 && got.values.forall(_ == 0L))
  }

  test("duplicateClusters over real jaccard pairs: every member maps to its component min") {
    val pairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20).select($"doc_a", $"doc_b")
    val clusters = Dedup.duplicateClusters(pairs)
    // each cluster_id must itself be a member labeled with itself, and
    // every edge must connect two docs with the same label
    val byDoc = clusters.as[(Long, Long)].collect().toMap
    assert(byDoc.values.toSet.forall(c => byDoc(c) == c))
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"edge ($a,$b) split across clusters")
    }
  }

  // ---- contamination -----------------------------------------------------

  test("contamination finds exact-duplicate docs across the split and skips clean ones") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"),
                     (2L, "one two three four five six seven"),
                     (3L, "tiny")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, bench, n = 5, minShared = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L)._2 && got(1L)._1 == 2) // two shared 5-grams in a 6-token doc
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false))) // < n tokens still surfaces with 0
  }

  test("contamination covers every corpus doc exactly once on real data") {
    val bucket = graft.operators.Sampling.hashBucket(col("doc_id").cast("string"))
    val corpus = docs.filter(bucket < 80)
    val out = Dedup.contamination(corpus, docs.filter(bucket >= 80), 5, 1)
    assert(out.count() == corpus.count())
    assert(out.select($"doc_id").distinct().count() == corpus.count())
  }

  // ---- band join ---------------------------------------------------------

  test("band join matches the theta-join oracle on real events") {
    val clicks = events.filter($"event_type" === "click")
    val errors = events.filter($"event_type" === "error")
    val got = RangeJoin.bandCount(clicks, errors, "ts", "event_id", 300L)
    val oracle = clicks.as("l")
      .join(errors.as("r"),
        abs(unix_micros($"r.ts") - unix_micros($"l.ts")) <= 300000000L, "left")
      .groupBy($"l.event_id".as("l_id"))
      .agg(count($"r.event_id").as("n"))
    assert(got.exceptAll(oracle).isEmpty && oracle.exceptAll(got).isEmpty)
  }

  test("band join emits each qualifying pair exactly once across bucket boundaries") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // right row at a bucket edge; left rows straddling adjacent buckets
    val l = Seq((1L, t("2026-01-01 10:04:59")), (2L, t("2026-01-01 10:05:01")),
                (3L, t("2026-01-01 10:20:00"))).toDF("event_id", "ts")
    val r = Seq((9L, t("2026-01-01 10:05:00")), (8L, t("2026-01-01 10:09:59")))
      .toDF("event_id", "ts")
    val pairs = RangeJoin.bandJoinPairs(l, r, "ts", "event_id", 300L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 9L), (2L, 9L), (2L, 8L), (1L, 8L))) // (1,8): dt = 300s exactly, inclusive
  }

  test("band join plans an equi hash join, not a nested loop") {
    val clicks = events.filter($"event_type" === "click")
    val errors = events.filter($"event_type" === "error")
    val plan = RangeJoin.bandCount(clicks, errors, "ts", "event_id", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  // ---- bm25 --------------------------------------------------------------

  test("bm25 ranks the term-dense short doc above a diluted long one") {
    val d = Seq(
      (1L, "merge merge merge scan"),
      (2L, "merge " + Seq.fill(200)("filler").mkString(" ")),
      (3L, "filler filler filler filler")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(d, Seq("merge", "scan"), 1.2, 0.75, 10)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 has no query term
    assert(got(0)._2 > got(1)._2)
  }

  test("bm25 on real docs: k rows, sorted by score desc then doc_id, all finite") {
    val got = TextAnalysis.bm25(docs, Seq("merge", "window", "scan"), 1.2, 0.75, 100)
      .as[(Long, Double)].collect()
    assert(got.length == 100)
    assert(got.forall { case (_, s) => !s.isNaN && !s.isInfinite && s > 0 })
    val sorted = got.sortBy { case (id, s) => (-s, id) }.toSeq
    assert(got.toSeq == sorted)
  }

  // ---- interval overlap join ---------------------------------------------

  test("intervalOverlapJoin finds overlaps once each, including slab-spanning and touching") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    // slab = 100 s. left interval [50, 450] spans 5 slabs.
    val left = Seq((1L, t(50), t(450))).toDF("event_id", "start", "end")
    val right = Seq(
      (10L, t(0), t(49)),    // ends before left starts -> no match
      (11L, t(0), t(50)),    // touches left start -> overlap 0
      (12L, t(100), t(400)), // nested, shares 4 slabs -> exactly one row
      (13L, t(450), t(500)), // touches left end -> overlap 0
      (14L, t(451), t(600))  // after -> no match
    ).toDF("event_id", "start", "end")
    val got = RangeJoin
      .intervalOverlapJoin(left, right, "start", "end", "event_id", slabSec = 100L)
      .orderBy($"r_id").as[(Long, Long, Double)].collect().toList
    assert(got == List((1L, 11L, 0.0), (1L, 12L, 300.0), (1L, 13L, 0.0)))
  }

  test("intervalOverlapJoin plans an equi hash join, not a nested loop") {
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id", $"ts".as("start"), ($"ts" + expr("INTERVAL 300 SECONDS")).as("end"))
    val errors = events.filter($"event_type" === "error")
      .select($"event_id", $"ts".as("start"), ($"ts" + expr("INTERVAL 60 SECONDS")).as("end"))
    val joined = RangeJoin.intervalOverlapJoin(clicks, errors, "start", "end", "event_id", 300L)
    assert(!joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // agrees with the direct theta-join answer
    val theta = clicks.select($"event_id".as("l_id"), $"start".as("ls"), $"end".as("le"))
      .join(errors.select($"event_id".as("r_id"), $"start".as("rs"), $"end".as("re")),
        $"ls" <= $"re" && $"rs" <= $"le")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(joined.select($"l_id", $"r_id").as[(Long, Long)].collect().toSet == theta)
  }

  // ---- pagerank ----------------------------------------------------------

  test("pageRank: star center outranks its leaves, leaves tie exactly") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("doc_a", "doc_b")
    val got = operators.Graph.pageRank(star, iters = 3).as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L))
    assert(Set(got(2L), got(3L), got(4L), got(5L)).size == 1) // exact fixed-point tie
    // total mass stays ~n (no dangling nodes; fixed-point rounding only)
    assert(math.abs(got.values.sum - 5.0) < 1e-6)
  }

  test("pageRank is deterministic across partitionings") {
    val pairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20)
    val a = operators.Graph.pageRank(pairs, 2).as[(Long, Double)].collect().toSeq
    val b = operators.Graph.pageRank(pairs.repartition(17), 2).as[(Long, Double)].collect().toSeq
    assert(a == b)
  }
}
