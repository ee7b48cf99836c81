package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Streaming fronts of the vector-index tiers: arriving vectors assign
  * against the FROZEN centroid/codebook artifact micro-batch by
  * micro-batch — completing the per-tier stream story (signatures
  * q165, encoded corpus q175, DSIR q178). Assignment and encoding
  * depend only on the frozen artifact and the vector itself, so the
  * union of appends over any arrival partitioning equals the one-shot
  * append, and — because the artifact is the versioned corpus-level
  * build — a stream-fed index answers probes bit-identically to the
  * full build that trained it (q179/q180 share q121/q132's oracles
  * verbatim). Replay is a state no-op: each micro-batch key-filters
  * against the live view before appending, the same guard the daily
  * loop's vector tier uses.
  *
  * Scale shape per micro-batch: one broadcast-artifact scoring pass
  * over the batch plus a narrow key anti-join against the live view
  * (vec_id column only) and one append — never a corpus re-read.
  */
object VectorStream {

  /** Drain `feedDir` (a parquet directory of arriving (vec_id,
    * embedding) rows) into the IVF index at `ivfPath`, one
    * `maxFilesPerTrigger`-file micro-batch at a time. The index must
    * hold the versioned centroid build
    * ([[graft.operators.Similarity.buildIvfIndex]]).
    */
  def incrementalIvf(spark: SparkSession, feedDir: String, ivfPath: String,
                     checkpoint: String, maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
    EventStream.runForeachBatch(stream, checkpoint) { (batch, _) =>
      // replay filter via Dedup.deltaAntiState: once the assignment-key
      // table outgrows broadcast, an anti join can only exchange it
      // (build-right) — the semi shape keeps the state un-shuffled;
      // below broadcast size this IS the old plain anti
      val fresh = graft.operators.Dedup.deltaAntiState(batch,
        Similarity.loadIvfIndex(spark, ivfPath)._2.select(col("vec_id")),
        Seq("vec_id"))
      Similarity.appendToIvfIndex(fresh, spark, ivfPath)
    }
  }

  /** The PQ twin: arriving vectors encode against the persisted
    * codebooks and append, key-filtered for replay. The index must
    * hold the versioned codebook build
    * ([[graft.operators.Similarity.buildPqIndex]]).
    */
  def incrementalPq(spark: SparkSession, feedDir: String, pqPath: String,
                    checkpoint: String, maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
    EventStream.runForeachBatch(stream, checkpoint) { (batch, _) =>
      val fresh = graft.operators.Dedup.deltaAntiState(batch,
        Similarity.loadPqIndex(spark, pqPath)._2.select(col("vec_id")).distinct(),
        Seq("vec_id"))
      Similarity.appendToPqIndex(fresh, spark, pqPath)
    }
  }
}
