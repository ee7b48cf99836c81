package graft

import java.nio.file.Files

import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming front of the EP5 ingest (streaming.DedupStream): the
  * micro-batched incremental near-dup must be INVARIANT to the arrival
  * partitioning — any file split of the feed yields the one-shot
  * incrementalMinhashEstimated result, and the signature state after
  * the drain equals a fresh full build (history + every batch,
  * appended exactly once).
  */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  test("micro-batched drain equals the one-shot incremental run, and state equals a fresh build") {
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val history = docs.filter(bucket < 80)
    val added = docs.filter(bucket >= 80)

    // one-shot reference on its own state copy
    val refState = Files.createTempDirectory("graft_sd_ref").toString + "/mh"
    Dedup.persistMinhashSignatures(history, 3, 16, 4, refState)
    val oneShot = Dedup.incrementalMinhashEstimated(added, 3, 16, 4, 0.5, refState)
      .collect().toSeq

    // streamed: the same added set split across 4 files, drained one
    // file per micro-batch
    val st = Files.createTempDirectory("graft_sd_stream").toString
    Dedup.persistMinhashSignatures(history, 3, 16, 4, st + "/mh")
    added.repartition(4).write.parquet(st + "/feed")
    val streamed = streaming.DedupStream.incrementalPairs(spark, st + "/feed",
      n = 3, numHashes = 16, bands = 4, minJ = 0.5,
      sigPath = st + "/mh", outDir = st + "/pairs", checkpoint = st + "/ckpt")
      .collect().toSeq
    assert(streamed === oneShot,
      "streamed pair set must equal the one-shot incremental run")

    // post-drain state: every batch appended exactly once
    val fresh = Files.createTempDirectory("graft_sd_fresh").toString + "/mh"
    Dedup.persistMinhashSignatures(docs, 3, 16, 4, fresh)
    def rows(p: String) = Dedup.loadSignatures(spark, p)
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    assert(rows(st + "/mh") === rows(fresh))

    // full replay — every batch re-delivered (fresh checkpoint, same
    // feed, state and sink): ingest must be a state no-op, and the
    // returned view must be unchanged (replayed early batches re-emit
    // cross-batch pairs against the advanced horizon as bit-identical
    // rows, which the view's distinct collapses exactly)
    val replayed = streaming.DedupStream.incrementalPairs(spark, st + "/feed",
      n = 3, numHashes = 16, bands = 4, minJ = 0.5,
      sigPath = st + "/mh", outDir = st + "/pairs", checkpoint = st + "/ckpt2")
      .collect().toSeq
    assert(replayed === streamed, "a full replay must not change the consumer-visible pairs")
    assert(rows(st + "/mh") === rows(fresh), "a full replay must not change state")
  }
}
