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
  * micro-batch stamps its deterministic foreachBatch id as the batch
  * identity, and a re-delivered id is skipped by the bid replay guard
  * rather than double-summed.
  *
  * Scale shape: each micro-batch pays one token pass over ITS rows
  * plus a 64-row append; the (buckets, ngram) params are read off the
  * state's own stamp once at drain start, so a stream can never
  * append at params the day-0 build didn't use.
  */
object DsirStream {

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
    EventStream.runForeachBatch(stream, checkpoint) { (batch, id) =>
      TextAnalysis.persistDsirState(batch, targetSource, statePath, nb, ng,
        batchId = s"stream:$id")
    }
  }
}
