package graft

import java.nio.file.Files

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming front of the encoded-corpus tier (streaming.EncodeStream):
  * documents encode independently under the frozen vocab, so the
  * micro-batched drain must equal the one-shot persistEncodedCorpus
  * build over the full corpus, under any arrival partitioning, and a
  * full replay must be a state no-op (key+content-filtered appends).
  */
class EncodeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  private def rows(p: String) = TextAnalysis.loadEncodedCorpus(spark, p)
    .select(col("doc_id"), col("fp"), col("ids").cast("string"))
    .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)

  test("micro-batched encode drain equals the one-shot build, and replay is a no-op") {
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    val vocab = Files.createTempDirectory("graft_es_vocab").toString + "/bpe"
    TextAnalysis.persistBpeVocab(docs, merges = 3, vocab)

    // one-shot reference over the FULL corpus
    val ref = Files.createTempDirectory("graft_es_ref").toString + "/enc"
    TextAnalysis.persistEncodedCorpus(docs, spark, vocab, ref)

    // streamed: day-0 covers 80%, the rest arrives as a 4-file feed
    // drained one file per micro-batch
    val st = Files.createTempDirectory("graft_es_stream").toString
    TextAnalysis.persistEncodedCorpus(docs.filter(bucket < 80), spark, vocab, st + "/enc")
    docs.filter(bucket >= 80).repartition(4).write.parquet(st + "/feed")
    streaming.EncodeStream.incrementalEncode(spark, st + "/feed",
      vocabPath = vocab, encPath = st + "/enc", checkpoint = st + "/ckpt")
    assert(rows(st + "/enc") === rows(ref),
      "stream-fed encoded state must equal the one-shot build")

    // full replay — every batch re-delivered against fresh checkpoint:
    // the (doc_id, fp) anti-join must drop every row
    streaming.EncodeStream.incrementalEncode(spark, st + "/feed",
      vocabPath = vocab, encPath = st + "/enc", checkpoint = st + "/ckpt2")
    assert(rows(st + "/enc") === rows(ref), "a full replay must not change state")

    // arrival-partitioning invariance: the same feed as one file
    val st2 = Files.createTempDirectory("graft_es_onebatch").toString
    TextAnalysis.persistEncodedCorpus(docs.filter(bucket < 80), spark, vocab, st2 + "/enc")
    docs.filter(bucket >= 80).coalesce(1).write.parquet(st2 + "/feed")
    streaming.EncodeStream.incrementalEncode(spark, st2 + "/feed",
      vocabPath = vocab, encPath = st2 + "/enc", checkpoint = st2 + "/ckpt")
    assert(rows(st2 + "/enc") === rows(ref),
      "the degenerate single-batch drain must equal the one-shot build")
  }
}
