package graft

import java.nio.file.Files

import graft.streaming.{EventStream, SessionStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Timer-based session close (`SessionStream`): the transformWithState
  * processor must agree with batch gap-sessionization, emit a session
  * exactly when the WATERMARK proves it closed (a successor event
  * advances the watermark; a quiet user's timer fires as it passes),
  * hold back sessions the watermark cannot prove closed, and keep
  * cross-batch stragglers in their own sessions instead of back-
  * filling them across a proven gap.
  */
class SessionStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** Stage one parquet file per `drop` into `dir` with pinned,
    * strictly-increasing modification times — FileStreamSource orders
    * by modtime, so with maxFilesPerTrigger=1 each drop is one
    * micro-batch, in drop order, whatever the fs clock does.
    */
  private def stageDrops(dir: String, drops: Seq[Seq[(Long, String)]]): Unit =
    drops.zipWithIndex.foreach { case (rows, i) =>
      val staging = tmp("graft-sess-stage")
      rows.toDF("user_id", "ts").withColumn("ts", to_timestamp($"ts"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = Files.list(java.nio.file.Paths.get(staging)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(dir, f"f${i + 1}%02d.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
    }

  private def drainPerFile(dir: String, gapMinutes: Int, watermarkDelay: String) = {
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    EventStream.withStatePartitions(spark, 4) {
      SessionStream.drainClosed(spark, src, gapMinutes, watermarkDelay)
    }.select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2.getTime))
  }

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

  test("a successor past the gap emits the previous session") {
    // u1's 12:00 event drags the 0-delay watermark past the
    // 10:00-10:10 session's 10:40 close, so it emits; the 12:00
    // session itself stays open (watermark = max ts = 12:00
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

  test("a cross-batch straggler past the gap forms its own session, not a back-fill") {
    // Batch-by-batch delivery (maxFilesPerTrigger=1, one file each,
    // watermark delay 2h): 13:00 arrives first (wm -> 11:00), then the
    // 11:30 straggler — admissible (11:30 > wm) but 90 min BEFORE the
    // open session with a 30-min gap rule, so it must become its OWN
    // session; merging it into [13:00, ...] spans a proven gap. The
    // 16:00 file then pushes the final watermark to 14:00, proving
    // both u1 sessions closed (u9's own session stays open).
    val dir = tmp("graft-sess-straggler")
    stageDrops(dir, Seq(
      Seq((1L, "2024-01-01 13:00:00")),
      Seq((1L, "2024-01-01 11:30:00")),
      Seq((9L, "2024-01-01 16:00:00"))))
    val got = drainPerFile(dir, 30, "2 hours")
    assert(got.map(r => (r._1, r._2.toString, r._3.toString, r._4)) === Seq(
      (1L, "2024-01-01 11:30:00.0", "2024-01-01 12:00:00.0", 1L),
      (1L, "2024-01-01 13:00:00.0", "2024-01-01 13:30:00.0", 1L)))
  }

  test("a cross-batch straggler WITHIN the gap back-fills the open session") {
    // Same delivery shape, but the straggler lands 10 min before the
    // open session's start — inside the gap — so the merge is correct:
    // one session [12:50, 13:30) with both events.
    val dir = tmp("graft-sess-backfill")
    stageDrops(dir, Seq(
      Seq((1L, "2024-01-01 13:00:00")),
      Seq((1L, "2024-01-01 12:50:00")),
      Seq((9L, "2024-01-01 16:00:00"))))
    val got = drainPerFile(dir, 30, "2 hours")
    assert(got.map(r => (r._1, r._2.toString, r._3.toString, r._4)) ===
      Seq((1L, "2024-01-01 12:50:00.0", "2024-01-01 13:30:00.0", 2L)))
  }

  test("sentinel-flushed drain equals batch gap-sessionization on sf0.001") {
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", $"ts").filter($"user_id".isNotNull)
    val dir = tmp("graft-sess-full")
    SessionStream.stageWithSentinel(ev, s"$dir/data", gapMinutes = 30)

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
