package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All schemas are fixed by the parquet footers; we read them as-is
  * (parquet is self-describing — no inferSchema cost). At 100 TB these
  * would be partitioned directories; the API is path-based so the same
  * code serves `sfDir` fixtures and a production lake layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an `events`-shaped frame so `ts` is a session-zone
    * TimestampType at micros precision, whatever the producer wrote:
    *
    *  - `LongType` — parquet TIMESTAMP(NANOS) surfaced as raw nanos by
    *    `spark.sql.legacy.parquet.nanosAsLong` (Spark 4 has no nanos
    *    timestamp). Truncate to micros — the same truncation DuckDB
    *    applies on CAST(ts AS TIMESTAMP), so oracle comparisons agree.
    *  - `TimestampNTZType` — naive micros/millis (isAdjustedToUTC=false
    *    footers). Cast to TimestampType; value-preserving because every
    *    entrypoint pins `spark.sql.session.timeZone=UTC`.
    *  - `TimestampType` — UTC-adjusted micros; already canonical.
    *
    * A lake ingesting from heterogeneous producers sees all three, so
    * the unit is read from the footer schema, never assumed.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported storage type $other")
    }
  }

  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    // Lets TIMESTAMP(NANOS) footers load at all (as long); harmless for
    // micros/millis footers, which still read as timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Register every table as a temp view (for spark.sql paths / tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
