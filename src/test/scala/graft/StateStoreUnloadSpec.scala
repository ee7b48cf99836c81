package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract behind the bench harness's between-sample state-store
  * release (GraftSqlBridge.unloadStreamingState → StateStore.stop):
  * unloading the cached providers between two drained stateful streams
  * must be invisible to the second stream's results — providers and
  * the maintenance task re-initialize lazily. This is the round-19
  * fix for the in-sweep maintenance storm (every drained stream's
  * providers otherwise stay cached and the shared maintenance task
  * snapshots all of them every interval, degrading late-sweep stateful
  * queries ~2×).
  */
class StateStoreUnloadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def dailyCounts() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = EventStream.source(spark, s"$sf/events.parquet")
    val agg = src
      .withWatermark("ts", "7 days")
      .dropDuplicates("event_id")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
    EventStream.withStatePartitions(spark, 4)(EventStream.runToCompletion(spark, agg))
      .select(col("w.start").as("day"), col("n_events"))
      .orderBy(col("day"))
      .collect()
      .toSeq
  }

  test("a stateful drain after unloadStreamingState equals the drain before it") {
    val before = dailyCounts()
    assert(before.nonEmpty)
    org.apache.spark.sql.GraftSqlBridge.unloadStreamingState()
    val after = dailyCounts()
    assert(after == before)
    // and a second unload with nothing loaded is a harmless no-op
    org.apache.spark.sql.GraftSqlBridge.unloadStreamingState()
  }
}
