package graft

import graft.operators.{Merge, Profile}
import org.scalatest.funsuite.AnyFunSuite

/** q84–q85 operators: latest-wins upsert merge and the one-pass
  * numeric column profiler.
  */
class MergeProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("latestWins: newest version wins, updates beat base on ties, base survives alone") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val base = Seq(
      (1L, 10L, 1.0, t(100)), // overwritten by newer update
      (2L, 20L, 2.0, t(200)), // tied version -> update wins
      (3L, 30L, 3.0, t(300))  // no update -> survives
    ).toDF("user_id", "event_id", "value", "ts")
    val updates = Seq(
      (1L, 11L, 1.5, t(150)),
      (2L, 21L, 2.5, t(200))
    ).toDF("user_id", "event_id", "value", "ts")
    val got = Merge.latestWins(base, updates, "user_id", "ts", "event_id")
      .select($"user_id", $"event_id", $"src")
      .as[(Long, Long, String)].collect().sortBy(_._1).toList
    assert(got == List((1L, 11L, "update"), (2L, 21L, "update"), (3L, 30L, "base")))
  }

  test("latestWins emits exactly one row per key on real events") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"event_id", $"value", $"ts")
    val bucket = graft.operators.Sampling.hashBucket($"event_id".cast("string"))
    val merged = Merge.latestWins(
      ev.filter(bucket < 80), ev.filter(bucket >= 80), "user_id", "ts", "event_id")
    assert(merged.count() == merged.select($"user_id").distinct().count())
    assert(merged.count() == ev.select($"user_id").distinct().count())
  }

  test("numericColumns profiles nulls, cardinality, and range in one row per column") {
    val df = Seq(
      (Some(1.0), 5.0), (None, 5.0), (Some(3.0), 7.0), (Some(1.0), 9.0)
    ).toDF("a", "b")
    val got = Profile.numericColumns(df, Seq("a", "b"))
      .as[(String, Long, Long, Double, Double)].collect().toList
    assert(got == List(
      ("a", 1L, 2L, 1.0, 3.0),
      ("b", 0L, 3L, 5.0, 9.0)))
  }

  test("numericColumns is a single aggregate pass (one scan, no joins)") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = Profile.numericColumns(df, Seq("l_quantity", "l_tax"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    // exactly one file scan feeds the profile
    assert("FileScan parquet".r.findAllIn(plan).length == 1)
  }
}
