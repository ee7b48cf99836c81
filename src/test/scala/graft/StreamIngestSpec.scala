package graft

import java.nio.file.Files

import graft.operators.{Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-14 streaming ingest fronts (DsirStream, VectorStream):
  * each persisted state tier's micro-batched drain must equal its
  * one-shot form under any arrival partitioning, and a full replay
  * must be a state no-op — the sum tier via deterministic batch-id
  * stamps, the key tiers via live-view key filters.
  */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def embs = Tables.load(spark, sf, "embeddings")

  test("DSIR stream drain sums to the one-shot state; replay skips via the bid stamp") {
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val ref = Files.createTempDirectory("graft_ds_ref").toString + "/dsir"
    TextAnalysis.persistDsirState(docs, "src0", ref)
    val st = Files.createTempDirectory("graft_ds_stream").toString
    TextAnalysis.persistDsirState(docs.filter(bucket < 80), "src0", st + "/dsir")
    docs.filter(bucket >= 80).repartition(4).write.parquet(st + "/feed")
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/dsir", st + "/ckpt")
    // sums, not rows: the tiers split the same counts across different
    // batch boundaries; only the per-bucket totals are the state
    def sums(p: String) = spark.read.parquet(p + "/buckets")
      .groupBy(col("b")).agg(sum(col("tc")).as("tc"), sum(col("sc")).as("sc"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    assert(sums(st + "/dsir") === sums(ref))
    val before = spark.read.parquet(st + "/dsir/buckets").count()
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/dsir", st + "/ckpt2")
    assert(spark.read.parquet(st + "/dsir/buckets").count() === before,
      "a full replay must append no cells (bid stamps match)")
  }

  test("two distinct feeds into one DSIR state path both land (content bids, not positions)") {
    // the failure mode of positional batch ids: a second drain's
    // checkpoint restarts foreachBatch ids at 0, so its batches would
    // collide with the first drain's stamps and be silently skipped.
    // Content-derived bids must keep the two feeds' batches distinct
    // while still skipping a true replay of either feed.
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val ref = Files.createTempDirectory("graft_ds2_ref").toString + "/dsir"
    TextAnalysis.persistDsirState(docs, "src0", ref)
    val st = Files.createTempDirectory("graft_ds2_stream").toString
    TextAnalysis.persistDsirState(docs.filter(bucket < 60), "src0", st + "/dsir")
    docs.filter(bucket >= 60 && bucket < 80).repartition(2).write.parquet(st + "/feedA")
    docs.filter(bucket >= 80).repartition(2).write.parquet(st + "/feedB")
    streaming.DsirStream.incrementalCounts(spark, st + "/feedA", "src0",
      st + "/dsir", st + "/ckptA")
    streaming.DsirStream.incrementalCounts(spark, st + "/feedB", "src0",
      st + "/dsir", st + "/ckptB")
    def sums(p: String) = spark.read.parquet(p + "/buckets")
      .groupBy(col("b")).agg(sum(col("tc")).as("tc"), sum(col("sc")).as("sc"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    assert(sums(st + "/dsir") === sums(ref),
      "feed B's batches must append despite feed A having drained first")
    val before = spark.read.parquet(st + "/dsir/buckets").count()
    streaming.DsirStream.incrementalCounts(spark, st + "/feedA", "src0",
      st + "/dsir", st + "/ckptA2")
    assert(spark.read.parquet(st + "/dsir/buckets").count() === before,
      "a re-drain of feed A through a fresh checkpoint is still a no-op")
  }

  test("stream-fed daily turn: N micro-batch turns equal one batch turn; replay is a no-op") {
    import spark.implicits._
    val st = Files.createTempDirectory("graft_turnstream").toString
    val day1Docs = docs.filter(col("doc_id") % 5 =!= 0)
    val d1e = embs.filter(col("vec_id") < 16 || col("vec_id") % 5 =!= 0)
    // reference: ONE batch turn over the whole feed
    val ref = Files.createTempDirectory("graft_turnstream_ref").toString
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, ref + "/mh")
    operators.Similarity.buildIvfIndex(d1e, nlist = 16, path = ref + "/ivf")
    val refPairs = Pipelines.dailyIncremental(spark, day1Docs, docs, d1e, embs,
      ref + "/mh", ref + "/ivf")("dedup_pairs").collect().map(_.toSeq).toSeq
    // streamed: the same feed as micro-batch delta turns
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh")
    operators.Similarity.buildIvfIndex(d1e, nlist = 16, path = st + "/ivf")
    docs.filter(col("doc_id") % 5 === 0).repartition(4).write.parquet(st + "/docfeed")
    embs.filter(col("vec_id") >= 16 && col("vec_id") % 5 === 0).repartition(2)
      .write.parquet(st + "/embfeed")
    streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
      st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt")
    val streamed = streaming.TurnStream.emittedPairs(spark, st + "/pairs")
      .collect().map(_.toSeq).toSeq
    assert(streamed === refPairs,
      "the union of per-micro-batch turn pairs must equal the one-shot turn's")
    def ivfRows(p: String) = operators.Similarity.loadIvfIndex(spark, p)._2
      .select(col("vec_id")).as[Long].collect().toSet
    assert(ivfRows(st + "/ivf") === ivfRows(ref + "/ivf"))
    // replay through a FRESH checkpoint: state + pairs both no-ops —
    // q167's retry-idempotence under streaming delivery. The pairs
    // guard matters doubly here: a re-run of an early batch would see
    // state the later batches have since grown, so its recomputed
    // pairs would differ — the content-addressed _SUCCESS skip keeps
    // the original emission.
    val sigCount = spark.read.parquet(st + "/mh/sigs").count()
    val ivfBefore = spark.read.parquet(st + "/ivf/assignments").count()
    streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
      st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt2")
    assert(spark.read.parquet(st + "/mh/sigs").count() === sigCount)
    assert(spark.read.parquet(st + "/ivf/assignments").count() === ivfBefore)
    val replayed = streaming.TurnStream.emittedPairs(spark, st + "/pairs")
      .collect().map(_.toSeq).toSeq
    assert(replayed === streamed, "replay must not duplicate or rewrite pairs")
  }

  test("DSIR + encoded tiers ride the stream-fed turn; content-digest runIds survive late replay") {
    import spark.implicits._
    val st = Files.createTempDirectory("graft_turnfull").toString
    val day1Docs = docs.filter(col("doc_id") % 5 =!= 0)
    val d1e = embs.filter(col("vec_id") < 16 || col("vec_id") % 5 =!= 0)
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh")
    operators.Similarity.buildIvfIndex(d1e, nlist = 16, path = st + "/ivf")
    TextAnalysis.persistDsirState(day1Docs, "src0", st + "/dsir")
    TextAnalysis.persistBpeVocab(docs, merges = 3, st + "/bpe")
    TextAnalysis.persistEncodedCorpus(day1Docs, spark, st + "/bpe", st + "/enc")
    docs.filter(col("doc_id") % 5 === 0).repartition(4).write.parquet(st + "/docfeed")
    embs.filter(col("vec_id") >= 16 && col("vec_id") % 5 === 0).repartition(2)
      .write.parquet(st + "/embfeed")
    def drain(ckpt: String): Unit =
      streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
        st + "/mh", st + "/ivf", st + "/pairs", st + s"/$ckpt",
        dsirStatePath = Some(st + "/dsir"),
        bpeVocabPath = Some(st + "/bpe"), encodedPath = Some(st + "/enc"))
    drain("ckpt")
    // DSIR: drained state scores the full corpus like the inline form
    val streamed = TextAnalysis.dsirWeightsFromState(docs, spark, st + "/dsir", "src0")
      .collect().map(_.toSeq).toSeq
    val inline = TextAnalysis.dsirWeights(docs, "src0").collect().map(_.toSeq).toSeq
    assert(streamed === inline)
    // encoded corpus: merge-on-read view equals the one-shot encode
    def encRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("ids").cast("array<long>"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    assert(encRows(TextAnalysis.loadEncodedCorpus(spark, st + "/enc")) ===
      encRows(TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, st + "/bpe")
        .select(col("doc_id"), col("ids"))),
      "the stream-fed turns' encoded appends must equal a one-shot encode")
    // LATE replay through a fresh checkpoint: the state has grown
    // since each batch's first delivery, which would flip a DERIVED
    // DSIR stamp (non-family context changed) — the content-digest
    // runId is delivery-independent, so every tier is a no-op
    val dsirCells = spark.read.parquet(st + "/dsir/buckets").count()
    val encCount = spark.read.parquet(st + "/enc/ids").count()
    drain("ckpt2")
    assert(spark.read.parquet(st + "/dsir/buckets").count() === dsirCells,
      "a late replay must not double-sum the DSIR state")
    assert(spark.read.parquet(st + "/enc/ids").count() === encCount)
  }

  test("multi-file grouping caveat: a regrouped re-drain double-sums; the default is exact") {
    // DsirStream's scaladoc pins the digest guard to the micro-BATCH:
    // it is exact across fresh checkpoints iff file-to-batch grouping
    // is stable. Demonstrate the documented failure mode — the same
    // feed re-drained under a DIFFERENT maxFilesPerTrigger regroups
    // content across batch boundaries, derives digests the state has
    // never seen, and double-sums — and that the documented default
    // (one file per trigger) re-drains as an exact no-op.
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val st = Files.createTempDirectory("graft_ds_regroup").toString
    def sums(p: String) = spark.read.parquet(p + "/buckets")
      .groupBy(col("b")).agg(sum(col("tc")).as("tc"), sum(col("sc")).as("sc"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    // grouped drain (4 feed files, 2 per batch)
    TextAnalysis.persistDsirState(docs.filter(bucket < 80), "src0", st + "/grouped")
    docs.filter(bucket >= 80).repartition(4).write.parquet(st + "/feed")
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/grouped", st + "/g_ckpt", maxFilesPerTrigger = 2)
    val groupedSums = sums(st + "/grouped")
    // regrouped re-drain: 3 files per batch → new digests → re-append
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/grouped", st + "/g_ckpt2", maxFilesPerTrigger = 3)
    assert(sums(st + "/grouped") !== groupedSums,
      "a regrouped re-drain must double-sum — the documented multi-file hazard " +
        "(if this starts passing, the guard grew stronger: update the scaladoc)")
    // the default: one file per batch — regrouping is impossible, any
    // re-drain (here through a fresh checkpoint) is a no-op
    TextAnalysis.persistDsirState(docs.filter(bucket < 80), "src0", st + "/single")
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/single", st + "/s_ckpt")
    val singleSums = sums(st + "/single")
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/single", st + "/s_ckpt2")
    assert(sums(st + "/single") === singleSums,
      "the one-file-per-trigger default must re-drain as an exact no-op")
  }

  test("migratePositionalBids: a pre-digest state regains re-drain idempotence") {
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val st = Files.createTempDirectory("graft_ds_migrate").toString
    def sums(p: String) = spark.read.parquet(p + "/buckets")
      .groupBy(col("b")).agg(sum(col("tc")).as("tc"), sum(col("sc")).as("sc"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    TextAnalysis.persistDsirState(docs.filter(bucket < 80), "src0", st + "/dsir")
    docs.filter(bucket >= 80).repartition(4).write.parquet(st + "/feed")
    // synthesize the PRE-DIGEST drain: one positional `stream:<N>`
    // stamp per feed file, in the file stream's delivery order — the
    // exact on-disk shape the old scheme left behind
    val fd = new org.apache.hadoop.fs.Path(st + "/feed")
    val fs = fd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fd).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .sortBy(s => (s.getModificationTime, s.getPath.toString))
    files.zipWithIndex.foreach { case (f, i) =>
      TextAnalysis.persistDsirState(spark.read.parquet(f.getPath.toString),
        "src0", st + "/dsir", batchId = s"stream:$i")
    }
    val ref = Files.createTempDirectory("graft_ds_migrate_ref").toString + "/dsir"
    TextAnalysis.persistDsirState(docs, "src0", ref)
    assert(sums(st + "/dsir") === sums(ref))
    // un-migrated, a fresh-checkpoint re-drain double-sums: content
    // digests can never match positional stamps (the documented hole)
    val unmigrated = st + "/unmigrated"
    fs.rename(new org.apache.hadoop.fs.Path(st + "/dsir"),
      new org.apache.hadoop.fs.Path(unmigrated))
    fs.mkdirs(new org.apache.hadoop.fs.Path(st + "/dsir"))
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(unmigrated + "/buckets"),
      fs, new org.apache.hadoop.fs.Path(st + "/dsir/buckets"), false,
      spark.sparkContext.hadoopConfiguration)
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      unmigrated, st + "/u_ckpt")
    assert(sums(unmigrated) !== sums(ref),
      "an unmigrated positional state must double-sum on re-drain (the hole the migration closes)")
    // migrated: the positional stamps become the digests the re-drain
    // derives, so the same re-drain is an exact no-op
    streaming.DsirStream.migratePositionalBids(spark, st + "/feed", st + "/dsir")
    val bids = TextAnalysis.dsirStateSummary(spark, st + "/dsir")._3
    assert(!bids.exists(_.matches("persist:stream:\\d+")),
      s"no positional bids may survive the migration (got $bids)")
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/dsir", st + "/m_ckpt")
    assert(sums(st + "/dsir") === sums(ref),
      "a migrated state must skip the re-drain exactly")
    // idempotent: a second migration pass touches nothing
    val before = spark.read.parquet(st + "/dsir/buckets").collect().map(_.toSeq).toSet
    streaming.DsirStream.migratePositionalBids(spark, st + "/feed", st + "/dsir")
    assert(spark.read.parquet(st + "/dsir/buckets").collect().map(_.toSeq).toSet === before)
  }

  test("migratePositionalBids on a CRASHED old drain: the un-ingested suffix still lands") {
    // a pre-digest drain that died mid-feed left positional stamps for
    // only a PREFIX of the files (streams deliver in mtime order).
    // The migration must digest exactly that prefix — marking the
    // whole feed ingested would silently skip the tail forever.
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val st = Files.createTempDirectory("graft_ds_migrate_partial").toString
    def sums(p: String) = spark.read.parquet(p + "/buckets")
      .groupBy(col("b")).agg(sum(col("tc")).as("tc"), sum(col("sc")).as("sc"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    TextAnalysis.persistDsirState(docs.filter(bucket < 80), "src0", st + "/dsir")
    docs.filter(bucket >= 80).repartition(4).write.parquet(st + "/feed")
    val fd = new org.apache.hadoop.fs.Path(st + "/feed")
    val fs = fd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fd).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .sortBy(s => (s.getModificationTime, s.getPath.toString))
    // the old drain ingested only the first 2 of 4 files, positionally
    files.take(2).zipWithIndex.foreach { case (f, i) =>
      TextAnalysis.persistDsirState(spark.read.parquet(f.getPath.toString),
        "src0", st + "/dsir", batchId = s"stream:$i")
    }
    // force the 4 files onto ONE mtime (parallel write tasks usually
    // land in the same second, but not deterministically): a crashed
    // drain's ingested-prefix boundary is then order-ambiguous and the
    // migration must REFUSE rather than guess which file was the
    // second batch
    val t0 = files.head.getModificationTime
    files.foreach(f => fs.setTimes(f.getPath, t0, -1))
    val tied = intercept[IllegalArgumentException] {
      streaming.DsirStream.migratePositionalBids(spark, st + "/feed", st + "/dsir")
    }
    assert(tied.getMessage.contains("modification-time-tied"))
    // a real arrival queue's files carry distinct arrival mtimes —
    // model that, in the same (mtime, path) order the drain saw
    files.zipWithIndex.foreach { case (f, i) =>
      fs.setTimes(f.getPath, t0 + i * 1000L, -1)
    }
    streaming.DsirStream.migratePositionalBids(spark, st + "/feed", st + "/dsir")
    // resuming the drain (fresh checkpoint, whole feed) must skip the
    // migrated prefix and append exactly the tail
    streaming.DsirStream.incrementalCounts(spark, st + "/feed", "src0",
      st + "/dsir", st + "/ckpt")
    val ref = Files.createTempDirectory("graft_ds_migrate_partial_ref").toString + "/dsir"
    TextAnalysis.persistDsirState(docs, "src0", ref)
    assert(sums(st + "/dsir") === sums(ref),
      "post-migration resume must ingest exactly the crashed drain's un-ingested tail")
  }

  test("tiers enabled mid-feed backfill on re-drain; pairs and prior tiers stay no-ops") {
    // the round-15 hazard: the pairs marker gated the ENTIRE turn, so
    // a feed drained before dsirStatePath/encodedPath were enabled
    // could never deliver its content to the new tiers — every marked
    // batch skipped wholesale. The skip is now keyed per tier: a
    // re-drain after enabling tiers must backfill them over the whole
    // feed while the pairs sink and the already-ingested sig/IVF
    // tiers remain exact no-ops.
    val st = Files.createTempDirectory("graft_turnbackfill").toString
    val day1Docs = docs.filter(col("doc_id") % 5 =!= 0)
    val d1e = embs.filter(col("vec_id") < 16 || col("vec_id") % 5 =!= 0)
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh")
    operators.Similarity.buildIvfIndex(d1e, nlist = 16, path = st + "/ivf")
    docs.filter(col("doc_id") % 5 === 0).repartition(4).write.parquet(st + "/docfeed")
    embs.filter(col("vec_id") >= 16 && col("vec_id") % 5 === 0).repartition(2)
      .write.parquet(st + "/embfeed")
    // drain 1: no opt-in tiers
    streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
      st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt")
    val pairs1 = streaming.TurnStream.emittedPairs(spark, st + "/pairs")
      .collect().map(_.toSeq).toSeq
    val sigCount = spark.read.parquet(st + "/mh/sigs").count()
    // tiers enabled between drains: day-0 builds over day-1 docs only —
    // the feed's content exists in NO tier state yet
    TextAnalysis.persistDsirState(day1Docs, "src0", st + "/dsir")
    TextAnalysis.persistBpeVocab(docs, merges = 3, st + "/bpe")
    TextAnalysis.persistEncodedCorpus(day1Docs, spark, st + "/bpe", st + "/enc")
    // drain 2 (fresh checkpoint, tiers on): every batch is pairs-marked,
    // so only the gapped tiers may act
    def drain(ckpt: String): Unit =
      streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
        st + "/mh", st + "/ivf", st + "/pairs", st + s"/$ckpt",
        dsirStatePath = Some(st + "/dsir"),
        bpeVocabPath = Some(st + "/bpe"), encodedPath = Some(st + "/enc"))
    drain("ckpt2")
    val streamedW = TextAnalysis.dsirWeightsFromState(docs, spark, st + "/dsir", "src0")
      .collect().map(_.toSeq).toSeq
    val inlineW = TextAnalysis.dsirWeights(docs, "src0").collect().map(_.toSeq).toSeq
    assert(streamedW === inlineW,
      "the re-drain must backfill the DSIR tier over the already-marked feed")
    def encRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("ids").cast("array<long>"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    assert(encRows(TextAnalysis.loadEncodedCorpus(spark, st + "/enc")) ===
      encRows(TextAnalysis.bpeEncodeIdsFromVocab(docs, spark, st + "/bpe")
        .select(col("doc_id"), col("ids"))),
      "the re-drain must backfill the encoded tier over the already-marked feed")
    assert(streaming.TurnStream.emittedPairs(spark, st + "/pairs")
      .collect().map(_.toSeq).toSeq === pairs1,
      "the backfill must not rewrite or duplicate the pairs sink")
    assert(spark.read.parquet(st + "/mh/sigs").count() === sigCount,
      "the backfill turns must not re-append signatures")
    // the per-tier skip reads the stored bid format — pin it: stream
    // turns' DSIR appends land as "persist:stream:<digest>:added"
    // (the appendDsirCells operation qualifier + the turn's explicit
    // runId + the grow-only sub-batch suffix). If this format drifts,
    // the needDsir probe re-runs every marked batch's turn on every
    // re-drain — correct but no longer cheap.
    val bids = TextAnalysis.dsirStateSummary(spark, st + "/dsir")._3
    assert(bids.exists(_.startsWith("persist:stream:")),
      s"stream-turn DSIR bids must carry the persist:stream: prefix the per-tier skip matches (got $bids)")
    // drain 3: everything ingested everywhere — full no-op
    val dsirCells = spark.read.parquet(st + "/dsir/buckets").count()
    val encCount = spark.read.parquet(st + "/enc/ids").count()
    drain("ckpt3")
    assert(spark.read.parquet(st + "/dsir/buckets").count() === dsirCells)
    assert(spark.read.parquet(st + "/enc/ids").count() === encCount)
  }

  test("encoded tier born EMPTY mid-feed: the backfill probe reads the missing table as empty and creates it") {
    // like the mid-feed-enable test above, but the encoded tier has NO
    // day-0 build: the table is born by the backfill's first append.
    // Before round 17's fix the needEnc probe crashed on the missing
    // ids dir (loadEncodedCorpus read it unconditionally); a missing
    // dir IS the empty table.
    val st = Files.createTempDirectory("graft_turnborn").toString
    val day1Docs = docs.filter(col("doc_id") % 5 =!= 0)
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh")
    operators.Similarity.buildIvfIndex(embs, nlist = 16, path = st + "/ivf")
    val fed = docs.filter(col("doc_id") % 5 === 0)
    fed.repartition(2).write.parquet(st + "/docfeed")
    embs.limit(0).write.parquet(st + "/embfeed")
    // drain 1: no opt-in tiers — every batch gets pairs-marked
    streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
      st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt")
    // the pair is enabled between drains against a FRESH encoded path
    TextAnalysis.persistBpeVocab(docs, merges = 3, st + "/bpe")
    val fs = new org.apache.hadoop.fs.Path(st).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(st + "/enc/ids")),
      "precondition: the encoded table must not exist yet")
    // drain 2 (fresh checkpoint): marked batches hit the needEnc probe
    // against the absent table — must read as empty, then backfill
    streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
      st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt2",
      bpeVocabPath = Some(st + "/bpe"), encodedPath = Some(st + "/enc"))
    def encRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("ids").cast("array<long>"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    assert(encRows(TextAnalysis.loadEncodedCorpus(spark, st + "/enc")) ===
      encRows(TextAnalysis.bpeEncodeIdsFromVocab(fed, spark, st + "/bpe")
        .select(col("doc_id"), col("ids"))),
      "the backfill must create the table and encode exactly the fed docs")
    // drain 3: ingested everywhere — a no-op, and the view stays stable
    val encCount = spark.read.parquet(st + "/enc/ids").count()
    streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
      st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt3",
      bpeVocabPath = Some(st + "/bpe"), encodedPath = Some(st + "/enc"))
    assert(spark.read.parquet(st + "/enc/ids").count() === encCount)
  }

  test("compactPairs: batch dirs fold into one base; replay-skip markers survive; emissions unchanged") {
    val st = Files.createTempDirectory("graft_pairscompact").toString
    val day1Docs = docs.filter(col("doc_id") % 5 =!= 0)
    val d1e = embs.filter(col("vec_id") < 16 || col("vec_id") % 5 =!= 0)
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh")
    operators.Similarity.buildIvfIndex(d1e, nlist = 16, path = st + "/ivf")
    docs.filter(col("doc_id") % 5 === 0).repartition(4).write.parquet(st + "/docfeed")
    embs.filter(col("vec_id") >= 16 && col("vec_id") % 5 === 0).repartition(2)
      .write.parquet(st + "/embfeed")
    def drain(ckpt: String): Unit =
      streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
        st + "/mh", st + "/ivf", st + "/pairs", st + s"/$ckpt")
    def pairs() = streaming.TurnStream.emittedPairs(spark, st + "/pairs")
      .collect().map(_.toSeq).toSeq
    val fs = new org.apache.hadoop.fs.Path(st).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def entries = fs.listStatus(new org.apache.hadoop.fs.Path(st + "/pairs"))
      .toSeq.map(_.getPath.getName).sorted
    drain("ckpt")
    val before = pairs()
    assert(entries.count(_.startsWith("batch_")) === 6, "4 doc + 2 emb batch dirs pre-compaction")
    streaming.TurnStream.compactPairs(spark, st + "/pairs")
    assert(entries === Seq("_pairs_base", "_pairs_manifest"),
      s"every batch dir must fold into the base (got $entries)")
    assert(pairs() === before, "compaction must not change the emissions")
    // replay through a FRESH checkpoint: the manifest IS the marker now
    // — no turn re-runs, no batch dirs reappear, state untouched
    val sigCount = spark.read.parquet(st + "/mh/sigs").count()
    drain("ckpt2")
    assert(spark.read.parquet(st + "/mh/sigs").count() === sigCount,
      "replayed batches must skip via the manifest digests")
    assert(!entries.exists(_.startsWith("batch_")),
      "a replayed batch must not rewrite its folded pairs directory")
    assert(pairs() === before)
    // NEW content after compaction lands as a fresh batch dir (one per
    // new file); the next compaction folds it into base v2 — listing
    // cost stays flat no matter how many drains accumulate
    docs.filter(col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 0)
      .repartition(1).write.mode("append").parquet(st + "/docfeed")
    drain("ckpt3")
    assert(entries.count(_.startsWith("batch_")) === 1,
      "only the genuinely new file may produce a live batch dir")
    val withNew = pairs()
    streaming.TurnStream.compactPairs(spark, st + "/pairs")
    assert(entries === Seq("_pairs_base", "_pairs_manifest"))
    assert(pairs() === withNew, "the second fold must preserve old base + new batch")
    // idempotent: a compaction with nothing to fold only re-runs GC
    streaming.TurnStream.compactPairs(spark, st + "/pairs")
    assert(pairs() === withNew)
  }

  test("compactPairs crash windows: leftover base, undeleted folded dirs, and torn writes all converge") {
    val st = Files.createTempDirectory("graft_pairscrash").toString
    val day1Docs = docs.filter(col("doc_id") % 5 =!= 0)
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh")
    operators.Similarity.buildIvfIndex(embs, nlist = 16, path = st + "/ivf")
    docs.filter(col("doc_id") % 5 === 0).repartition(3).write.parquet(st + "/docfeed")
    embs.limit(0).write.parquet(st + "/embfeed")
    streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
      st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt")
    def pairs() = streaming.TurnStream.emittedPairs(spark, st + "/pairs")
      .collect().map(_.toSeq).toSeq
    val before = pairs()
    val fs = new org.apache.hadoop.fs.Path(st).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // WINDOW 1 — crash after the new base was written but BEFORE the
    // manifest rename: fabricate the debris (a garbage v1 base + a
    // stale manifest tmp). Readers must still see the pre-compaction
    // view; the re-run must overwrite the leftover and converge.
    val junk = new org.apache.hadoop.fs.Path(st + "/pairs/_pairs_base/v1")
    docs.limit(3).select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b"),
      col("doc_id").cast("double").as("est_jaccard")).write.parquet(junk.toString)
    val mdir = new org.apache.hadoop.fs.Path(st + "/pairs/_pairs_manifest")
    fs.mkdirs(mdir)
    fs.create(new org.apache.hadoop.fs.Path(mdir, "v1.manifest.tmp"), true).close()
    assert(pairs() === before,
      "a crashed compaction's unreferenced base must be invisible to readers")
    streaming.TurnStream.compactPairs(spark, st + "/pairs")
    assert(pairs() === before, "the re-run must overwrite the leftover base")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(mdir, "v1.manifest.tmp")),
      "GC must collect the stale manifest tmp")
    // WINDOW 2 — crash after the manifest rename but BEFORE GC:
    // resurrect a folded batch dir (its digest IS in the manifest).
    // Readers must not double-count it; the re-run GCs it.
    val bid = {
      val mf = fs.listStatus(mdir).map(_.getPath)
        .filter(_.getName.endsWith(".manifest")).head
      val in = fs.open(mf)
      try new String(in.readAllBytes(), "UTF-8").split("\n").tail
        .filter(_.nonEmpty).head
      finally in.close()
    }
    val zombie = new org.apache.hadoop.fs.Path(s"$st/pairs/batch_$bid")
    spark.read.schema("doc_a BIGINT, doc_b BIGINT, est_jaccard DOUBLE")
      .parquet(st + "/pairs/_pairs_base/v1")
      .write.parquet(zombie.toString)
    assert(pairs() === before,
      "an undeleted folded dir must be ignored (its digest is in the manifest)")
    streaming.TurnStream.compactPairs(spark, st + "/pairs")
    assert(!fs.exists(zombie), "the re-run must GC the folded dir")
    assert(pairs() === before)
    // TORN WRITE — a batch dir without _SUCCESS (its turn crashed
    // mid-write): never folded, never read; the view is unchanged.
    val torn = new org.apache.hadoop.fs.Path(st + "/pairs/batch_torn")
    fs.mkdirs(torn)
    fs.create(new org.apache.hadoop.fs.Path(torn, "part-00000.parquet"), true)
      .close() // zero-byte "parquet": unreadable if anything touches it
    assert(pairs() === before, "a torn write must not reach readers")
    streaming.TurnStream.compactPairs(spark, st + "/pairs")
    assert(fs.exists(torn), "a torn dir is left for its turn's retry, not folded")
    assert(pairs() === before)
  }

  test("duplicate-content file mid-drain: the backfill's DSIR append reads fresh state, never double-sums") {
    // the round-16 ADVICE hazard: the per-tier gap probe answers from
    // a ONCE-per-drain pre-drain bid snapshot. A file whose content
    // digest already carries a pairs marker lands in the backfill
    // branch, and when the matching DSIR bid was appended DURING this
    // drain (a duplicate-content file whose first copy's turn just
    // ran), the bid is missing from the snapshot — the probe firing
    // spuriously is the accepted cost, but the append itself must then
    // read FRESH state: handing it the stale snapshot as the replay
    // authority would double-sum the sum-shaped state permanently.
    val st = Files.createTempDirectory("graft_turndup").toString
    val day1Docs = docs.filter(col("doc_id") % 5 =!= 0)
    val mu = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0)
    val alpha = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 =!= 0)
    operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh")
    operators.Similarity.buildIvfIndex(embs.filter(col("vec_id") < 16),
      nlist = 16, path = st + "/ivf")
    TextAnalysis.persistDsirState(day1Docs, "src0", st + "/dsir")
    embs.limit(0).write.parquet(st + "/embfeed")
    // drain 1: file M only, DSIR tier on → M pairs-marked AND stamped
    mu.repartition(1).write.parquet(st + "/docfeed")
    def drain(ckpt: String): Unit =
      streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
        st + "/mh", st + "/ivf", st + "/pairs", st + s"/$ckpt",
        dsirStatePath = Some(st + "/dsir"))
    drain("ckpt1")
    // two files with IDENTICAL content (one digest) arrive after M
    val tmp = Files.createTempDirectory("graft_turndup_alpha").toString + "/alpha"
    alpha.repartition(1).write.parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(st).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def firstPart(dir: String) = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")).head
    val src = firstPart(tmp).getPath
    val t0 = firstPart(st + "/docfeed").getModificationTime
    for ((name, off) <- Seq(("part-dupa.parquet", 10000L), ("part-dupb.parquet", 20000L))) {
      val dst = new org.apache.hadoop.fs.Path(st + "/docfeed/" + name)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
      fs.setTimes(dst, t0 + off, -1)
    }
    // drain 2 (fresh checkpoint): M's marked batch forces the pre-drain
    // snapshot BEFORE the first α copy's turn appends its bid; the
    // second α copy is pairs-marked by the first, so its gap probe
    // fires on the stale snapshot — only the append's own fresh-state
    // guard stands between it and a double-sum
    drain("ckpt2")
    def sums(p: String) = spark.read.parquet(p + "/buckets")
      .groupBy(col("b")).agg(sum(col("tc")).as("tc"), sum(col("sc")).as("sc"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    val ref = Files.createTempDirectory("graft_turndup_ref").toString + "/dsir"
    TextAnalysis.persistDsirState(day1Docs.unionAll(mu).unionAll(alpha), "src0", ref)
    assert(sums(st + "/dsir") === sums(ref),
      "the duplicate-content file's backfill append must skip via fresh state — " +
        "counting α twice is the ADVICE double-sum hazard")
  }

  test("dailyTurns rejects an unpaired encodedPath before touching any state") {
    val st = Files.createTempDirectory("graft_turnpair").toString
    docs.limit(5).write.parquet(st + "/docfeed")
    embs.limit(0).write.parquet(st + "/embfeed")
    val e = intercept[IllegalArgumentException] {
      streaming.TurnStream.dailyTurns(spark, st + "/docfeed", st + "/embfeed",
        st + "/mh", st + "/ivf", st + "/pairs", st + "/ckpt",
        encodedPath = Some(st + "/enc"))
    }
    assert(e.getMessage.contains("pair"))
    assert(!new java.io.File(st + "/pairs").exists,
      "the shape error must fire before any state mutation")
  }

  test("migratePositionalBids refuses a state drained at maxFilesPerTrigger > 1") {
    // grouped batches stamp the same contiguous numbers 0..maxBatch the
    // one-file form would, so the numbering-consistency check passes
    // VACUOUSLY — the cell-additive count check is what must catch the
    // unverifiable precondition instead of silently stamping per-file
    // digests that leave the grouped tail to double-sum on re-drain.
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val st = Files.createTempDirectory("graft_ds_migrate_grouped").toString
    TextAnalysis.persistDsirState(docs.filter(bucket < 80), "src0", st + "/dsir")
    docs.filter(bucket >= 80).repartition(4).write.parquet(st + "/feed")
    val fd = new org.apache.hadoop.fs.Path(st + "/feed")
    val fs = fd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fd).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .sortBy(s => (s.getModificationTime, s.getPath.toString))
    // distinct mtimes: the refusal must come from the count check, not
    // the boundary-tie check
    val t0 = files.head.getModificationTime
    files.zipWithIndex.foreach { case (f, i) => fs.setTimes(f.getPath, t0 + i * 1000L, -1) }
    // the old drain ran at maxFilesPerTrigger = 2: two files per batch
    files.grouped(2).zipWithIndex.foreach { case (group, i) =>
      TextAnalysis.persistDsirState(
        group.map(f => spark.read.parquet(f.getPath.toString)).reduce(_ unionAll _),
        "src0", st + "/dsir", batchId = s"stream:$i")
    }
    val e = intercept[IllegalArgumentException] {
      streaming.DsirStream.migratePositionalBids(spark, st + "/feed", st + "/dsir")
    }
    assert(e.getMessage.contains("maxFilesPerTrigger"))
  }

  test("IVF stream drain rebuilds the full-build assignments; replay appends nothing") {
    val bucket = Sampling.hashBucket(col("vec_id").cast("string"))
    val full = Files.createTempDirectory("graft_vs_full").toString + "/idx"
    Similarity.buildIvfIndex(embs, nlist = 16, path = full)
    def rows(p: String) = Similarity.loadIvfIndex(spark, p)._2
      .select(col("vec_id"), col("cell").cast("long"), col("u").cast("array<double>"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    val fullRows = rows(full)
    val st = Files.createTempDirectory("graft_vs_stream").toString
    Similarity.buildIvfIndex(embs, nlist = 16, path = st + "/idx")
    val batch = embs.filter(bucket >= 80)
    Similarity.compactIvfIndex(spark, st + "/idx", batch.select("vec_id"))
    batch.repartition(4).write.parquet(st + "/feed")
    streaming.VectorStream.incrementalIvf(spark, st + "/feed", st + "/idx", st + "/ckpt")
    assert(rows(st + "/idx") === fullRows,
      "streamed assignments against the frozen centroids must equal the full build")
    streaming.VectorStream.incrementalIvf(spark, st + "/feed", st + "/idx", st + "/ckpt2")
    assert(rows(st + "/idx") === fullRows, "a full replay must not change the index")
  }

  test("PQ stream drain rebuilds the full-build codes; replay appends nothing") {
    val bucket = Sampling.hashBucket(col("vec_id").cast("string"))
    val full = Files.createTempDirectory("graft_ps_full").toString + "/idx"
    Similarity.buildPqIndex(embs, m = 8, ks = 16, path = full)
    def rows(p: String) = Similarity.loadPqIndex(spark, p)._2
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    val fullRows = rows(full)
    val st = Files.createTempDirectory("graft_ps_stream").toString
    Similarity.buildPqIndex(embs, m = 8, ks = 16, path = st + "/idx")
    val batch = embs.filter(bucket >= 80)
    Similarity.compactPqIndex(spark, st + "/idx", batch.select("vec_id"))
    batch.repartition(4).write.parquet(st + "/feed")
    streaming.VectorStream.incrementalPq(spark, st + "/feed", st + "/idx", st + "/ckpt")
    assert(rows(st + "/idx") === fullRows,
      "streamed codes against the frozen codebooks must equal the full build")
    streaming.VectorStream.incrementalPq(spark, st + "/feed", st + "/idx", st + "/ckpt2")
    assert(rows(st + "/idx") === fullRows, "a full replay must not change the index")
  }
}
