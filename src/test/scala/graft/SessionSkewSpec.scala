package graft

import graft.operators.{Sessionize, SkewAgg}
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted aggregation must be plan-different but result-identical to
  * the direct groupBy; batch (analytic-window) and streaming
  * (session_window) sessionization must implement the same gap rule.
  */
class SessionSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("nextEventExamples pads missing history and shifts context correctly") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, 10L, t(100), "a"),
      (1L, 11L, t(200), "b"),
      (1L, 12L, t(300), "c"),
      (1L, 13L, t(400), "d"),
      (2L, 20L, t(100), "x")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.nextEventExamples(ev, k = 3)
      .as[(Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, "-,-,-", "a"),
      (1L, 11L, "-,-,a", "b"),
      (1L, 12L, "-,a,b", "c"),
      (1L, 13L, "a,b,c", "d"),
      (2L, 20L, "-,-,-", "x")))
  }

  test("nextEventExamples emits one example per event, label preserved") {
    val ev = Tables.load(spark, sf, "events")
    val out = Sessionize.nextEventExamples(ev, k = 2)
    assert(out.count() == ev.count())
    assert(out.filter($"context".isNull || $"label".isNull).count() == 0)
  }

  test("salted count+sum equals direct groupBy bit-for-bit") {
    val ev = Tables.load(spark, sf, "events")
    val salted = SkewAgg.saltedCountSum(ev, Seq("event_type"), $"event_id", 16, "value")
    val direct = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(12,2)")).cast("double").as("total"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // and it really is two aggregation exchanges, not one
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt") || plan.split("HashAggregate").length > 3)
  }

  test("sessionize: gap rule assigns 1-based per-user session ids") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val ev = Seq(
      (1L, 1L, at(0)), (1L, 2L, at(30)),   // session 1 (gap 30m < 60m)
      (1L, 3L, at(120)),                   // session 2 (gap 90m)
      (2L, 4L, at(0))                      // other user: own session 1
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize.assignSessions(ev, 60)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))

    val stats = Sessionize.userSessionStats(ev, 60).collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("streaming session_window agrees with batch sessionization stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    Tables.load(spark, sf, "events")
      .write.parquet(s"$dir/data")
    val streamed = EventStream.runToCompletion(spark,
      EventStream.sessionAgg(EventStream.source(spark, s"$dir/data"), gapMinutes = 60))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), max($"n_events").as("longest_session_events"))

    val batch = Sessionize.userSessionStats(Tables.load(spark, sf, "events"), 60)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
