package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Incremental-batch alternative to the streaming tier: the reference
  * recomputes its cursor from wall clock (`now - 24h`,
  * spotify_etl2.py:102-104), so a late run skips data and a retry
  * double-appends. Here the cursor is derived from the sink itself
  * (max event time already written), making the ingest idempotent
  * under retries and gap-free under late runs — the property the
  * reference's Airflow `retries=2` silently violates (SURVEY.md §2.10).
  *
  * At scale the `max(ts)` probe is a metadata-cheap aggregate over the
  * sink's latest partition, not a full scan, when the sink is
  * date-partitioned (Sinks.appendPartitioned).
  */
object IncrementalBatch {

  /** Append rows of `incoming` newer than the sink's high-water mark;
    * returns the number of rows appended.
    */
  def ingest(incoming: DataFrame, sinkPath: String, tsCol: String = "ts"): Long = {
    val spark = incoming.sparkSession
    // ONLY a genuinely-missing sink means "first run". A catch-all here
    // would turn any transient probe failure (IO error, permissions, a
    // corrupt footer, tsCol renamed in the sink) into cursor = None —
    // skipping the filter and re-appending the whole input, the exact
    // double-append this module exists to prevent. Everything but
    // path-not-found propagates and fails the run loudly.
    val cursor =
      try Option(spark.read.parquet(sinkPath).agg(max(col(tsCol))).head().get(0))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          None // first run: no sink yet
      }

    val fresh = cursor.fold(incoming)(c => incoming.filter(col(tsCol) > lit(c)))
    // count once, write once: cache the (usually small) daily increment
    fresh.cache()
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode(SaveMode.Append).parquet(sinkPath)
      n
    } finally fresh.unpersist()
  }
}
