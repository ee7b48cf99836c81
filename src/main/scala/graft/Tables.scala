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

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 refuses to
    * read as a timestamp. Read nanos as long and truncate to micros —
    * the same truncation DuckDB applies on CAST(ts AS TIMESTAMP), so
    * oracle comparisons agree (FIXTURES.md §5 caveat).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view (for spark.sql paths / tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
