package graft

import graft.sources.Sinks
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed layout: a join or aggregation keyed on the bucket column
  * must plan ZERO shuffles on the bucketed side(s) — the write-once
  * shuffle contract that makes join-heavy workloads viable at 100 TB.
  * Results must equal the unbucketed plans exactly.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketed-bucketed join on the bucket key plans no shuffle at all") {
    val events = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val users = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
    Sinks.writeBucketed(events, "b_events", buckets = 8, key = "user_id")
    Sinks.writeBucketed(users, "b_users", buckets = 8, key = "user_id")
    try {
      val be = spark.table("b_events")
      val bu = spark.table("b_users")
      // co-located: both sides pre-hashed into the same 8 buckets
      val joined = be.join(bu, Seq("user_id"))
        .groupBy($"user_id").agg(sum($"value").as("sv"), max($"n_events").as("ne"))
      assert(shuffles(joined) == 0,
        s"expected zero exchanges:\n${joined.queryExecution.executedPlan}")
      // same result as the unbucketed plan
      val plain = events.join(users, Seq("user_id"))
        .groupBy($"user_id").agg(sum($"value").as("sv"), max($"n_events").as("ne"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_events")
      spark.sql("DROP TABLE IF EXISTS b_users")
    }
  }

  test("aggregation on the bucket key rides the bucket partitioning (no exchange)") {
    val events = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"value")
    Sinks.writeBucketed(events, "b_agg_events", buckets = 8, key = "user_id")
    try {
      val agg = spark.table("b_agg_events")
        .groupBy($"user_id").agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      assert(shuffles(agg) == 0,
        s"expected zero exchanges:\n${agg.queryExecution.executedPlan}")
      val plain = events.groupBy($"user_id").agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      assert(agg.exceptAll(plain).isEmpty && plain.exceptAll(agg).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS b_agg_events")
  }

  test("within-bucket sortBy lets the sort-merge join skip its sorts") {
    val events = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"value")
    Sinks.writeBucketed(events, "b_sorted_events", buckets = 4, key = "user_id", "user_id")
    try {
      // plan under SMJ (broadcast disabled) INSIDE the conf scope —
      // executedPlan materializes lazily, so assertions live here too
      val (nShuffles, n) = withSmj {
        val be = spark.table("b_sorted_events")
        val joined = be.as("a")
          .join(spark.table("b_sorted_events").as("b"), Seq("user_id"))
          .select($"user_id", $"a.event_id", $"b.event_id")
        (shuffles(joined), joined.count())
      }
      // bucketed SMJ self-join: no exchange; sorts may still appear for
      // multi-file buckets, but the join must not re-shuffle
      assert(nShuffles == 0)
      assert(n > 0)
    } finally spark.sql("DROP TABLE IF EXISTS b_sorted_events")
  }

  private def withSmj[T](body: => T): T = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try body finally spark.conf.set(k, saved)
  }
}
