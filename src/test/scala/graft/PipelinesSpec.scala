package graft

import java.nio.file.Files

import graft.operators.Validation
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end runs of the three composed pipelines (SURVEY.md §5.2
  * item 5): golden summaries, sink contents, validation ordering.
  */
class PipelinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-pipe").toString

  private val item1 =
    """{"played_at":"2024-01-10T12:00:00.000Z","track":{"id":"t1","name":"A",
      |"popularity":80,"duration_ms":185000,"explicit":true,
      |"artists":[{"id":"ar1","name":"X"}]}}""".stripMargin.replaceAll("\n", "")
  private val item2 =
    """{"played_at":"2024-01-10T13:00:00.000Z","track":{"id":"t2","name":"B",
      |"popularity":41,"duration_ms":200000,"explicit":false,
      |"artists":[{"id":"ar2","name":"Y"}]}}""".stripMargin.replaceAll("\n", "")

  test("EP1 end-to-end: CSV written, summary has count and mean popularity") {
    val dir = tmp
    val payload = """{"tracks":[{"id":"t1","name":"A","popularity":80,"artists":[{"name":"X"}]},
                    |{"id":"t2","name":"B","popularity":40,"artists":[{"name":"X"}]}]}"""
      .stripMargin.replaceAll("\n", "")
    val json = Pipelines.topTracksEtl(spark, Seq(payload).toDS(), s"$dir/out")
    assert(json.contains("\"tracks_processed\":2") && json.contains("\"avg_popularity\":60.0"))
    assert(spark.read.option("header", "true").csv(s"$dir/out").count() == 2)
  }

  test("EP1 end-to-end: empty payload raises like the reference") {
    intercept[RuntimeException] {
      Pipelines.topTracksEtl(spark, Seq("""{"tracks":[]}""").toDS(), s"$tmp/out")
    }
  }

  test("EP2 end-to-end: validated, appended by date partition, summarized") {
    val dir = tmp
    val json = Pipelines.recentlyPlayedEtl(spark,
      Seq(s"""{"items":[$item1,$item2]}""").toDS(),
      s"$dir/tbl", java.sql.Date.valueOf("2024-01-12"))
    assert(json.contains("\"tracks_processed\":2"))
    assert(json.contains("\"date_range\":\"2024-01-10 to 2024-01-10\""))
    val back = spark.read.parquet(s"$dir/tbl")
    assert(back.count() == 2 && back.columns.contains("timestamp"))
  }

  test("EP2 end-to-end: duplicate PK raises BEFORE anything is written") {
    val dir = tmp
    intercept[Validation.PrimaryKeyViolation] {
      Pipelines.recentlyPlayedEtl(spark,
        Seq(s"""{"items":[$item1,$item1]}""").toDS(),
        s"$dir/tbl", java.sql.Date.valueOf("2024-01-12"))
    }
    assert(!new java.io.File(s"$dir/tbl").exists()) // sink untouched
  }

  test("EP2 end-to-end: empty input short-circuits with no_data status") {
    val json = Pipelines.recentlyPlayedEtl(spark,
      Seq("""{"items":[]}""").toDS(), s"$tmp/tbl", java.sql.Date.valueOf("2024-01-12"))
    assert(json.contains("no_data"))
  }

  test("EP3 end-to-end: csv + banker's-rounded summary from one cached frame") {
    val dir = tmp
    val json = Pipelines.recentlyPlayedAnalysis(spark,
      Seq(s"""{"items":[$item1,$item2]}""").toDS(), s"$dir/out")
    assert(json.contains("\"tracks_processed\":2"))
    assert(json.contains("\"average_popularity\":60.5"))
    assert(json.contains("\"explicit_tracks\":1"))
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.columns.contains("rank") && back.count() == 2)
  }

  test("observedSummary collects run metrics inside the sink job — no second scan") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val (instrumented, obs) = graft.operators.RunSummaries.observedSummary(ev, "event_id", "ts")
    // the ONLY action is the sink write; metrics ride its tasks
    instrumented.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val expected = ev.agg(count(lit(1)), sum(when(col("event_id").isNull, 1L).otherwise(0L)),
      min($"ts"), max($"ts")).head()
    assert(m("n_rows") == expected.getLong(0))
    assert(m("null_pk") == expected.getLong(1))
    assert(m("min_ts") == expected.getTimestamp(2) && m("max_ts") == expected.getTimestamp(3))
  }

  test("EP4 shared pair table: every family consumer equals its standalone catalog form") {
    import graft.operators.{Dedup, Sampling}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val family = Pipelines.nearDupFamily(spark, docs, tmp + "/pairs")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    def standalonePairs = Dedup.jaccardPairsCapped(docs, 3, 0.5, 20)
    assert(same(family("clusters")(), Dedup.duplicateClusters(standalonePairs)))
    assert(same(family("clusters_star")(), Dedup.duplicateClustersStar(standalonePairs)))
    assert(same(family("keep_best")(), Dedup.keepBestPerCluster(docs, standalonePairs, "n_chars")))
    assert(same(family("leakfree_split")(), Sampling.leakFreeSplit(docs, standalonePairs, 80)))
  }

  test("EP5 daily incremental loop: day-2 state equals a full day-2 rebuild on the added-rows path") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity, Snapshot}
    val dir = tmp
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // grow-only corpus: day 1 = 80%, day 2 adds the remaining 20%
    val day1Docs = docs.filter($"doc_id" % 5 =!= 0)
    // IVF centroids are the first nlist vec_ids — day 1 MUST contain
    // them (appendToIvfIndex's bit-identity precondition)
    val d1e = emb.filter($"vec_id" < 16 || $"vec_id" % 5 =!= 0)
    // day 0: full build of both state tiers from day 1
    Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, s"$dir/mh")
    Similarity.buildIvfIndex(d1e, nlist = 16, path = s"$dir/ivf")
    // the loop
    val out = Pipelines.dailyIncremental(spark, day1Docs, docs, d1e, emb,
      s"$dir/mh", s"$dir/ivf")
    // 1. diff routed exactly the added keys into the batch
    val added = out("doc_changes").filter($"status" === "added")
      .select($"doc_id").as[Long].collect().toSet
    assert(added === docs.filter($"doc_id" % 5 === 0).select($"doc_id").as[Long].collect().toSet)
    assert(out("doc_changes").filter($"status" =!= "added").isEmpty) // grow-only: nothing else
    // 2. signature state now equals a from-scratch day-2 build
    Dedup.persistMinhashSignatures(docs, 3, 16, 4, s"$dir/mh_full")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(same(spark.read.parquet(s"$dir/mh/sigs"), spark.read.parquet(s"$dir/mh_full/sigs")),
      "incremental signature state must equal the full rebuild")
    // 3. the appended IVF index equals a full day-2 rebuild (same
    //    deterministic centroids: day 1 contained vec_id < 16)
    Similarity.buildIvfIndex(emb, nlist = 16, path = s"$dir/ivf_full")
    assert(same(spark.read.parquet(s"$dir/ivf/assignments"),
      spark.read.parquet(s"$dir/ivf_full/assignments")),
      "appended IVF assignments must equal the full rebuild")
    // 4. and the new pairs are the full day-2 estimator pairs that
    //    touch an added endpoint (old-old pairs never re-emitted)
    val fullPairs = Dedup.minhashLshEstimated(docs, 3, 16, 4, 0.5)
      .filter($"doc_a".isin(added.toSeq: _*) || $"doc_b".isin(added.toSeq: _*))
    assert(same(out("dedup_pairs"), fullPairs),
      "incremental pairs must equal the added-endpoint slice of the full run")
  }

  test("from-empty delta turn: change frames stay LAZY, emissions equal the diff form") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity}
    val dir = tmp
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val day1Docs = docs.filter($"doc_id" % 5 =!= 0)
    val d1e = emb.filter($"vec_id" < 16 || $"vec_id" % 5 =!= 0)
    Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, s"$dir/mh")
    Similarity.buildIvfIndex(d1e, nlist = 16, path = s"$dir/ivf")
    val batch = docs.filter($"doc_id" % 5 === 0)
    // the stream fronts' delta-turn shape: LocalRelation empties as
    // "yesterday" (TurnStream builds exactly these)
    def emptyLike(df: org.apache.spark.sql.DataFrame) = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), df.schema)
    val out = Pipelines.dailyIncrementalDelta(spark,
      emptyLike(docs), batch, emptyLike(emb), emptyLike(emb),
      s"$dir/mh", s"$dir/ivf")
    // 1. the change frames must NOT be checkpoint-backed on this path:
    //    against an empty old side the diff is a pure projection of
    //    the batch, and re-pinning it would re-add two driver actions
    //    per micro-batch (the job-wave constant the drain queries pay
    //    per turn). A materialize() regression surfaces here as a
    //    LogicalRDD node backing the frame.
    for (name <- Seq("doc_changes", "emb_changes"))
      assert(out(name).queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l
      }.isEmpty, s"$name is checkpoint-backed — the from-empty turn re-pinned a pure batch projection")
    // 2. semantics identical to the diff form: every batch row is
    //    "added", and the pair emissions + signature appends match the
    //    added-endpoint slice of a full run (EP5's oracle, from-empty
    //    variant)
    val added = out("doc_changes").filter($"status" === "added")
      .select($"doc_id").as[Long].collect().toSet
    assert(added === batch.select($"doc_id").as[Long].collect().toSet)
    assert(out("doc_changes").filter($"status" =!= "added").isEmpty)
    val fullPairs = Dedup.minhashLshEstimated(docs, 3, 16, 4, 0.5)
      .filter($"doc_a".isin(added.toSeq: _*) || $"doc_b".isin(added.toSeq: _*))
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(same(out("dedup_pairs"), fullPairs),
      "from-empty pairs must equal the added-endpoint slice of the full run")
    Dedup.persistMinhashSignatures(docs, 3, 16, 4, s"$dir/mh_full")
    assert(same(spark.read.parquet(s"$dir/mh/sigs"), spark.read.parquet(s"$dir/mh_full/sigs")),
      "state after the from-empty turn must equal the full rebuild")
  }

  test("EP6 curated selection: every pick is a kept representative; lake pairs equal the self-contained form") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Pipelines.curatedSelection(docs, "src0", k = 10)
    val picks = out.select($"doc_id").as[Long].collect().toSet
    assert(picks.size == 10)
    // (a) every pick survived the near-dup collapse as its cluster's rep
    val reps = Dedup.keepBestPerCluster(
        docs, Dedup.jaccardPairsCapped(docs, 3, 0.5, 20), "n_chars")
      .select($"rep_doc_id".as("doc_id")).as[Long].collect().toSet
    assert(picks.subsetOf(reps), s"non-representative picked: ${picks -- reps}")
    // (b) every pick passes the quality gate, and none is a target doc
    val kept = TextAnalysis.qualityLogit(docs).filter($"keep" === 1)
      .select($"doc_id").as[Long].collect().toSet
    assert(picks.subsetOf(kept), s"quality-rejected doc picked: ${picks -- kept}")
    assert(docs.filter($"source" === "src0")
      .select($"doc_id").as[Long].collect().toSet.intersect(picks).isEmpty)
    // (c) a lake-persisted pair table yields the identical selection —
    // the amortization contract (pairs built once, consumers fan out)
    val pairsPath = tmp + "/ep6pairs"
    Dedup.jaccardPairsCapped(docs, 3, 0.5, 20).write.parquet(pairsPath)
    val viaLake = Pipelines.curatedSelection(docs, "src0", k = 10,
      pairs = Some(spark.read.parquet(pairsPath)))
    assert(out.exceptAll(viaLake).isEmpty && viaLake.exceptAll(out).isEmpty)
  }
}
