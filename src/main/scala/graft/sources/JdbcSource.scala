package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC READ path, completing the K2 round trip ([[Sinks.appendJdbc]]
  * is the write half — reference spotify_etl2.py:220). The reference
  * reads its sqlite table back for validation (spotify_etl2.py:57-63,
  * a full-table `SELECT *` into pandas); at scale that is exactly
  * wrong, so both knobs Spark's JDBC relation offers are first-class
  * here:
  *
  *  - PUSHDOWN: filters on the returned frame compile into the remote
  *    `WHERE` clause (JdbcSinkSpec plan-asserts `PushedFilters` is
  *    non-empty), so the database — not Spark — discards the rows and
  *    only the survivors cross the wire.
  *  - PARTITIONED READ: without bounds, a JDBC read is ONE connection
  *    on one executor — a single-threaded scan of the remote table no
  *    matter how big the cluster is. `readPartitioned` splits the
  *    table into `numPartitions` range slices of `partitionCol`, one
  *    connection per slice, all executors pulling concurrently.
  */
object JdbcSource {

  /** Single-partition read — fine for small dimension/config tables
    * (they broadcast afterwards anyway). Filters still push down.
    */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning `partitionCol` slices of width
    * (upper-lower)/numPartitions. Bounds only steer the slicing —
    * rows outside them are still read (into the edge slices), so the
    * result is the WHOLE table regardless of the bounds' tightness.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}
