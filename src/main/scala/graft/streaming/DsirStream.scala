package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.operators.TextAnalysis

/** Streaming front of the DSIR distribution state: arriving documents
  * append their bucket counts micro-batch by micro-batch. The state is
  * CELL-ADDITIVE pure sums ([[graft.operators.TextAnalysis.persistDsirState]]),
  * so the drained state equals the one-shot append of the whole feed
  * under ANY arrival partitioning — the same order-independence the
  * KMV/CMS/centroid stream twins rely on (q139/q147/q148). Replay (a
  * batch whose checkpoint commit was lost) is a state no-op: each
  * micro-batch stamps an order-independent CONTENT digest of its own
  * rows as the batch identity, and a re-delivered digest is skipped by
  * the bid replay guard rather than double-summed.
  *
  * The content-derived bid — the same digest lane
  * [[graft.Pipelines.dailyIncremental]] uses for its derived run
  * identity — is what makes one state path safely shared by MORE THAN
  * ONE drain: foreachBatch's positional batch id is checkpoint-local
  * (every fresh checkpoint restarts at 0), so stamping the position
  * would make a second feed's batches collide with the first's and
  * silently vanish, while identical content re-delivered under a NEW
  * position (a re-drain of a grown feed regrouping old files) would
  * double-sum. Content digests invert both failure modes: same rows →
  * same bid → skip; different rows → different bid → append —
  * regardless of which checkpoint or feed dir delivered them. One
  * caveat rides the batch granularity: the digest identifies the
  * micro-BATCH, so re-drains through a fresh checkpoint are exact iff
  * file-to-batch grouping is stable — guaranteed at
  * `maxFilesPerTrigger = 1` (the default: one file, one batch, one
  * digest), not under multi-file grouping, where a regrouped re-drain
  * can split old content across new batch boundaries. Keep the default
  * when a state path outlives its checkpoint.
  *
  * MIGRATION NOTE: states drained by the pre-digest scheme carry
  * POSITIONAL bids (`stream:0`, `stream:1`, …) that no content digest
  * can ever match — a fresh-checkpoint re-drain of content those
  * drains already ingested will re-append (double-sum) rather than
  * skip. Such states keep growing correctly under NEW content; only
  * replays of old-drained content lose the guard.
  * [[migratePositionalBids]] rewrites the old stamps to content
  * digests in one atomic pass, restoring re-drain idempotence without
  * a state rebuild.
  */
object DsirStream {

  /** One-shot migration of a pre-digest state: rewrite every
    * positional `persist:stream:<N>` bid to the content digest the
    * current scheme would have stamped, so a fresh-checkpoint re-drain
    * of the already-ingested feed skips instead of double-summing.
    *
    * The batch→content mapping is reconstructed from the feed itself:
    * under the one-file-per-trigger default the old drain's batch N
    * was the feed's N-th file in the file stream's delivery order
    * (modification time, path-tiebroken), so the first K files — K =
    * the number of positional bids, which is all of them for a
    * completed drain and a prefix for a crashed one — are digested
    * one file per batch and substituted positionally. Even a wrong
    * positional pairing (two files sharing one mtime and sorting
    * differently than the old listing) cannot double-sum: the replay
    * guard is set MEMBERSHIP of the digest, not which rows carry it —
    * the pairing only has to cover exactly the ingested files, which
    * the (mtime, path) prefix does. Assumes the feed dir is the one
    * the old drain read, unmodified since (the standard append-only
    * arrival queue), and that the state was drained at
    * `maxFilesPerTrigger = 1` (the documented default for any state
    * outliving its checkpoint — a multi-file-grouped state cannot be
    * migrated file-wise; rebuild it). Idempotent: a state with no
    * positional bids returns without touching storage. The rewrite is
    * atomic ([[graft.sources.Sinks.swapRewrite]]); a crash never
    * strands a half-migrated table.
    */
  def migratePositionalBids(spark: SparkSession, feedDir: String,
                            statePath: String): Unit = {
    import org.apache.spark.sql.functions._
    val bucketsDir = s"$statePath/buckets"
    val positional = spark.read.parquet(bucketsDir)
      .select(col("bid")).distinct().collect().map(_.getString(0))
      .filter(_.matches("persist:stream:\\d+"))
      .sortBy(_.substring("persist:stream:".length).toLong)
    if (positional.isEmpty) return
    val fd = new org.apache.hadoop.fs.Path(feedDir)
    val fs = fd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fd).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .sortBy(s => (s.getModificationTime, s.getPath.toString))
    require(files.length >= positional.length,
      s"state at $statePath carries ${positional.length} positional stream bids " +
        s"but $feedDir holds only ${files.length} files — not the drained feed?")
    val schema = spark.read.parquet(feedDir).schema
    val mapping = positional.zipWithIndex.map { case (old, i) =>
      val batch = spark.read.schema(schema).parquet(files(i).getPath.toString)
      old -> s"persist:stream:${StreamIds.docBid(batch)}"
    }.toMap
    graft.sources.Sinks.swapRewrite(spark, bucketsDir) { tmp =>
      val m = typedLit(mapping)
      spark.read.parquet(bucketsDir)
        .withColumn("bid", coalesce(element_at(m, col("bid")), col("bid")))
        .write.parquet(tmp)
    }
  }

  /** Drain `feedDir` (a parquet directory of arriving documents) as a
    * file stream in `maxFilesPerTrigger`-file micro-batches, appending
    * each batch's DSIR bucket counts to `statePath`. The state must
    * hold the day-0 build ([[graft.operators.TextAnalysis.persistDsirState]]).
    */
  def incrementalCounts(spark: SparkSession, feedDir: String,
                        targetSource: String, statePath: String,
                        checkpoint: String,
                        maxFilesPerTrigger: Int = 1): Unit = {
    val (nb, ng) = TextAnalysis.dsirStateParams(spark, statePath)
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
    EventStream.runForeachBatch(stream, checkpoint) { (batch, _) =>
      TextAnalysis.persistDsirState(batch, targetSource, statePath, nb, ng,
        batchId = s"stream:${StreamIds.docBid(batch)}")
    }
  }
}
