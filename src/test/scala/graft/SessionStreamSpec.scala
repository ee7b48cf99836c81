package graft

import java.nio.file.Files

import graft.streaming.{EventStream, SessionStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Timer-based session close (`SessionStream`): the transformWithState
  * processor must agree with batch gap-sessionization, close sessions
  * by DATA when a successor proves the gap and by TIMER when the
  * watermark passes a quiet user's close time, and hold back sessions
  * the watermark cannot prove closed.
  */
class SessionStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def stage(rows: Seq[(Long, String)]): String = {
    val dir = tmp("graft-sess-stream")
    rows.toDF("user_id", "ts").withColumn("ts", to_timestamp($"ts"))
      .write.parquet(s"$dir/data")
    s"$dir/data"
  }

  private def drain(dir: String, gapMinutes: Int = 30) =
    EventStream.withStatePartitions(spark, 4) {
      SessionStream.drainClosed(spark, EventStream.source(spark, dir), gapMinutes)
    }.select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2.getTime))

  test("data-driven close: a successor past the gap emits the previous session") {
    // u1's 12:00 event proves the 10:00-10:10 session closed; the
    // 12:00 session itself stays open (watermark = max ts = 12:00
    // < close 12:30) and must NOT emit
    val got = drain(stage(Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"),
      (1L, "2024-01-01 12:00:00"))))
    assert(got.map(r => (r._1, r._2.toString, r._3.toString, r._4)) ===
      Seq((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L)))
  }

  test("timer-driven close: a quiet user's session fires once the watermark passes it") {
    // u1 never has a successor event — only the TIMER can close 10:00;
    // u2's late event pushes the final watermark to 13:00 > u1's 10:30
    // close, while u2's own session (close 13:30) stays open
    val got = drain(stage(Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 13:00:00"))))
    assert(got.map(r => (r._1, r._2.toString, r._3.toString, r._4)) ===
      Seq((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0", 1L)))
  }

  test("sentinel-flushed drain equals batch gap-sessionization on sf0.001") {
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", $"ts").filter($"user_id".isNotNull)
    val dir = tmp("graft-sess-full")
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    val sentinel = Seq((-1L,
      new java.sql.Timestamp(maxTs.getTime + 31L * 60 * 1000))).toDF("user_id", "ts")
    ev.unionByName(sentinel).write.parquet(s"$dir/data")

    val streamed = EventStream.withStatePartitions(spark, 4) {
      SessionStream.drainClosed(spark, EventStream.source(spark, s"$dir/data"), 30)
    }.filter($"user_id" =!= -1L)

    // mirror the q107 oracle: a gap of EXACTLY 30 min starts a new
    // session (>= break — session_window's rule; Sessionize's analytic
    // form breaks strictly greater, a deliberate variant)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
    val batch = ev
      .withColumn("brk", when(lag($"ts", 1).over(w).isNull ||
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)) >= 30L * 60 * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("session_id",
        sum($"brk").over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"),
        (max($"ts") + expr("INTERVAL 30 MINUTES")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"session_start", $"session_end", $"n_events")

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
