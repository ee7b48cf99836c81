package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's four sinks (SURVEY.md §2.2), Spark-native.
  *
  * K1 CSV: `df.to_csv(path, index=False)` → header'd CSV write; any
  *     Hadoop FS path works (s3a:// for the reference's S3 case).
  * K2 append table: `to_sql(..., if_exists="append")` → at scale the
  *     right analog is an append to a date-partitioned parquet table
  *     (each daily batch lands as new files, no table rewrite); JDBC
  *     remains available for actual RDBMS targets.
  * K3 console display: formatted show with the m:ss duration math
  *     (new.py:170).
  * K4 XCom summary: single-row aggregate → one JSON line on stdout,
  *     captured by whatever orchestrator submitted the job.
  */
object Sinks {

  /** K1 — header'd CSV (spotify_etl.py:170-194, new.py:178-208). */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** K2 (scale path) — append a batch to a `timestamp`-partitioned
    * parquet table; the accumulating-append semantics of the SQLite
    * sink (spotify_etl2.py:220) with partition pruning for free.
    */
  def appendPartitioned(df: DataFrame, path: String, partitionCol: String = "timestamp"): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)

  /** Format breadth beyond the reference: ORC sink (columnar sibling
    * of parquet, ships with Spark). Same append-partitioned shape as
    * [[appendPartitioned]].
    */
  def appendPartitionedOrc(df: DataFrame, path: String, partitionCol: String = "timestamp"): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).orc(path)

  /** Sorted write for data skipping: repartition by range on
    * `sortCol` then sort within partitions before writing — every
    * parquet row group gets tight min/max bounds on `sortCol`, so at
    * 100 TB a point/range predicate prunes most row groups at scan
    * time (the poor man's Z-order, exact for one dimension). One
    * range shuffle at write time buys every subsequent read's skip.
    */
  def writeSorted(df: DataFrame, path: String, sortCol: String, partitions: Int): Unit =
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** K2 (RDBMS path) — JDBC append, any driver on the classpath
    * (reference spotify_etl2.py:220 `to_sql(..., if_exists="append")`).
    * Exercised end-to-end in JdbcSinkSpec against embedded Apache
    * Derby (the JDBC engine that ships in /opt/spark/jars); the
    * partitioned-parquet path above remains the lake-scale default.
    */
  def appendJdbc(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Append).format("jdbc")
      .option("url", url).option("dbtable", table).save()

  /** K3 — console display incl. m:ss duration formatting (new.py:170). */
  def display(df: DataFrame, n: Int = 20): Unit =
    df.withColumn("duration", graft.Ops.msToMinSec(col("duration_ms")))
      .show(n, truncate = false)

  /** K4 — one-row summary DataFrame → single JSON line for the
    * orchestrator (reference returns a dict to Airflow XCom).
    */
  def xcomJson(summary: DataFrame): String = summary.toJSON.head()
}
