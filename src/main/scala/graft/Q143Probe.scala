package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: split q143's cost into drain vs merge, and A/B the state
  * store provider + state partition count. Not part of the contract. */
object Q143Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(body: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"[q143probe] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val src = streaming.EventStream.source(spark, s"$sfDir/events.parquet")
    // full query as shipped
    time("full_rocksdb_p8") {
      streaming.EventStream.withStatePartitions(spark, 8) {
        operators.Retention.mergeRollingKmv(
          streaming.KmvStream.drainedPartials(spark, src, k = 64),
          windowDays = 7, k = 64)
      }.orderBy(col("day")).write.format("noop").mode("overwrite").save()
    }
    // drain alone (rocksdb, as shipped)
    time("drain_rocksdb_p8") {
      streaming.EventStream.withStatePartitions(spark, 8) {
        streaming.KmvStream.drainedPartials(spark, src, k = 64)
      }.write.format("noop").mode("overwrite").save()
    }
    // state-partition count sweep: one RocksDB store instance per
    // partition per batch — init+commit constant scales with count
    for (np <- Seq(1, 4, 32)) {
      time(s"drain_rocksdb_p$np") {
        streaming.EventStream.withStatePartitions(spark, np) {
          streaming.KmvStream.drainedPartials(spark, src, k = 64)
        }.write.format("noop").mode("overwrite").save()
      }
    }
    // changelog checkpointing: commit appends a changelog instead of
    // uploading a full snapshot per batch
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    time("drain_rocksdb_p8_changelog") {
      streaming.EventStream.withStatePartitions(spark, 8) {
        streaming.KmvStream.drainedPartials(spark, src, k = 64)
      }.write.format("noop").mode("overwrite").save()
    }
    spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    spark.stop()
  }
}
