package graft

import graft.operators.{Merge, Profile, Snapshot}
import org.apache.spark.sql.functions.{lit, to_date}
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

  test("cdfQuantiles picks the type-1 quantile on a known distribution") {
    val d = Seq(("a", 1.00), ("a", 2.00), ("a", 3.00), ("a", 4.00),
                ("b", 10.00)).toDF("g", "v")
    val got = Profile.cdfQuantiles(d, "g", "v", Seq(50, 90, 99))
      .as[(String, Long, Long)].collect().toSeq
    // group a: n=4 -> p50 needs cum >= 2 (cent 200), p90/p99 need cum >= 3.6/3.96 (cent 400)
    assert(got == Seq(("a", 50L, 200L), ("a", 90L, 400L), ("a", 99L, 400L),
                      ("b", 50L, 1000L), ("b", 90L, 1000L), ("b", 99L, 1000L)))
  }

  test("cdfQuantiles equals rank-then-pick on the quantized values corpus-wide") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val got = Profile.cdfQuantiles(ev, "event_type", "value", Seq(50, 90, 99))
      .as[(String, Long, Long)].collect()
    val cents = ev.selectExpr("event_type", "cast(floor(value * 100.0D + 0.5D) as bigint) as c")
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (g, p, q) =>
      val xs = cents(g)
      val idx = math.ceil(p * xs.length / 100.0).toInt - 1
      assert(q == xs(idx), s"group $g p$p")
    }
  }

  test("cdfQuantiles is partitioning-invariant") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val a = Profile.cdfQuantiles(ev, "event_type", "value", Seq(50, 90)).collect()
    val b = Profile.cdfQuantiles(ev.repartition(7), "event_type", "value", Seq(50, 90)).collect()
    assert(a.sameElements(b))
  }

  test("cdfQuantiles rejects percents outside [1,100]") {
    val d = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] { Profile.cdfQuantiles(d, "g", "v", Seq(0)) }
    intercept[IllegalArgumentException] { Profile.cdfQuantiles(d, "g", "v", Nil) }
  }

  test("Snapshot.diff: all four statuses on a hand fixture; diffRows drops unchanged") {
    val oldSnap = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
      .toDF("doc_id", "text", "lang")
    val newSnap = Seq((2L, "b", "en"), (3L, "c CHANGED", "de"), (4L, "d", "fr"))
      .toDF("doc_id", "text", "lang")
    val full = Snapshot.diff(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(full == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    val rows = Snapshot.diffRows(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((4L, "added"), (3L, "changed"), (1L, "removed")))
  }

  test("Snapshot fingerprint separates columns: value shifts across the boundary differ") {
    // without the  separator ("ab","c") and ("a","bc") would
    // fingerprint identically and read as unchanged
    val oldSnap = Seq((1L, "ab", "c")).toDF("doc_id", "text", "lang")
    val newSnap = Seq((1L, "a", "bc")).toDF("doc_id", "text", "lang")
    val got = Snapshot.diff(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "changed")))
  }

  test("rollingQuantilesFromPartials equals a from-scratch compute per window") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val got = Profile.rollingQuantilesFromPartials(
        Profile.dailyCentCounts(ev, "purchase", "value"), windowDays = 7, percents = Seq(50, 90))
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // oracle: for each reported day, quantize the window's raw events
    // and pick the type-1 quantile by rank
    val cents = ev.filter($"event_type" === "purchase" && $"value".isNotNull)
      .selectExpr("cast(to_date(ts) as string) as day",
        "cast(floor(value * 100.0D + 0.5D) as bigint) as c")
      .as[(String, Long)].collect()
    got.groupBy(_._1).foreach { case (day, rows) =>
      val lo = java.sql.Date.valueOf(day.toLocalDate.minusDays(6)).toString
      val xs = cents.filter { case (d, _) => d >= lo && d <= day.toString }.map(_._2).sorted
      rows.foreach { case (_, p, q) =>
        val idx = math.ceil(p * xs.length / 100.0).toInt - 1
        assert(q == xs(idx), s"day $day p$p")
      }
    }
  }

  test("dailyCentCounts is one map-side-combined pass; the rolling walk never rescans events") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val partialPlan = Profile.dailyCentCounts(ev, "purchase", "value")
      .queryExecution.executedPlan.toString
    // partial -> final hash aggregation around a single exchange: the
    // reduced frame is (day, cent) cells, not rows
    assert("HashAggregate".r.findAllIn(partialPlan).length >= 2)
    assert("FileScan parquet".r.findAllIn(partialPlan).length == 1)
    // the rolling merge reads ONLY the partial frame: no second events scan
    val rollPlan = Profile.rollingQuantilesFromPartials(
        Profile.dailyCentCounts(ev, "purchase", "value"), 7, Seq(50, 90))
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(rollPlan).length <= 2,
      "rolling walk should reuse the partial (<= 2 scans: partial + day domain)")
  }

  test("incrementally appended cent partials answer identically to one-shot state") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val cutoff = ev.selectExpr("cast(max(to_date(ts)) as string)").as[String].head()
    val dir = java.nio.file.Files.createTempDirectory("graft-cents").toString
    val one = s"$dir/one"; val inc = s"$dir/inc"
    Profile.persistDailyCents(ev, "purchase", "value", one)
    // split ingest: history strictly before the last day, then a top-up
    // batch carrying the last day — partials must SUM across appends
    Profile.persistDailyCents(ev.filter(to_date($"ts") < lit(cutoff)), "purchase", "value",
      inc, append = true)
    Profile.persistDailyCents(ev.filter(to_date($"ts") === lit(cutoff)), "purchase", "value",
      inc, append = true)
    val a = Profile.rollingQuantilesFromState(spark, one, 7, Seq(50, 90)).collect().toSeq
    val b = Profile.rollingQuantilesFromState(spark, inc, 7, Seq(50, 90)).collect().toSeq
    assert(a === b)
  }
}
