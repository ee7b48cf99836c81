package graft

import graft.operators.{Retention, Sessionize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rolling DAU/WAU (exact + KMV sketch path) and the ordered-step
  * session funnel — hand-computed fixtures plus estimator-accuracy and
  * internal-consistency checks on the real testdata.
  */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ev(rows: (Long, String, Long, String)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", to_timestamp($"ts"))

  test("rollingActiveUsers: hand-computed DAU/WAU/stickiness") {
    // u1 active d1+d2, u2 active d1, u3 active d9 (outside 7d of d1/d2)
    val e = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-01 11:00:00", 1, "view"), // same (day,user): no double count
      (3, "2024-01-01 12:00:00", 2, "view"),
      (4, "2024-01-02 09:00:00", 1, "click"),
      (5, "2024-01-09 09:00:00", 3, "view"))
    val got = Retention.rollingActiveUsers(e, windowDays = 7)
      .select($"day".cast("string"), $"dau", $"wau", $"stickiness_bp")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 2L, 2L, 10000L),
      ("2024-01-02", 1L, 2L, 5000L),   // window 12-27..01-02 sees u1,u2
      ("2024-01-09", 1L, 1L, 10000L))) // u1's 01-02 is 7 days gone by 01-09
  }

  test("rollingActiveUsers at sf0.001: wau >= dau, wau <= cumulative users, day-grid complete") {
    val events = Tables.load(spark, sf, "events")
    val got = Retention.rollingActiveUsers(events, windowDays = 7)
    val days = events.select(to_date($"ts").as("day")).distinct().count()
    assert(got.count() === days)
    assert(got.filter($"wau" < $"dau").isEmpty)
    val maxUsers = events.select($"user_id").distinct().count()
    assert(got.filter($"wau" > maxUsers).isEmpty)
    // trailing-7d distinct must dominate any single window day's dau
    val brute = got.select($"day", $"dau").collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    got.select($"day", $"wau").collect().foreach { r =>
      val w = brute.filter { case (d, _) =>
        !d.after(r.getDate(0)) && d.toLocalDate.plusDays(6).compareTo(r.getDate(0).toLocalDate) >= 0
      }.values
      assert(r.getLong(1) >= w.max, s"wau below max window dau on ${r.getDate(0)}")
    }
  }

  test("rollingActiveUsersKmv: estimator within 3-sigma of exact at sf0.001") {
    val k = 64
    val got = Retention.rollingActiveUsersKmv(
      Tables.load(spark, sf, "events"), windowDays = 7, k = k).collect()
    assert(got.nonEmpty)
    val sigma = 1.0 / math.sqrt(k - 2.0)
    got.foreach { r =>
      val (nKept, approx, exact) =
        (r.getAs[Long]("n_kept"), r.getAs[Double]("approx_wau"), r.getAs[Long]("exact_wau"))
      assert(nKept <= k)
      if (nKept < k) assert(approx === exact.toDouble) // sketch IS the set
      else assert(math.abs(approx - exact) <= 3 * sigma * exact,
        s"estimate $approx vs exact $exact out of bound on ${r.get(0)}")
    }
  }

  test("persisted KMV state: incremental appends equal the one-shot estimate") {
    val events = Tables.load(spark, sf, "events")
    val cutoff = "2024-01-21"
    val state = java.nio.file.Files.createTempDirectory("graft-kmv-state").toString + "/state"
    // day 1-20 ingested first; later days appended batch-by-batch,
    // plus a deliberate same-day top-up (late data) — the merge must
    // re-sketch the union associatively
    Retention.persistDailyKmv(events.filter(to_date($"ts") < lit(cutoff)), 64, state)
    Retention.persistDailyKmv(events.filter(to_date($"ts") >= lit(cutoff)), 64, state, append = true)
    Retention.persistDailyKmv(events.filter(to_date($"ts") === lit(cutoff)), 64, state, append = true)
    val fromState = Retention.rollingWauFromState(spark, state, 7, 64)
      .orderBy($"day").collect().toSeq
    val oneShot = Retention.rollingWauKmvEstimate(events, 7, 64)
      .orderBy($"day").collect().toSeq
    assert(fromState === oneShot)
  }

  test("streaming KMV state equals the batch estimate, even with every event delivered twice") {
    import graft.streaming.{EventStream, KmvStream}
    val src = EventStream.source(spark, s"$sf/events.parquet")
    val doubled = src.union(EventStream.source(spark, s"$sf/events.parquet"))
    val streamed = EventStream.withStatePartitions(spark, 4) {
      operators.Retention.mergeRollingKmv(
        KmvStream.drainedPartials(spark, doubled, 64), 7, 64)
    }.orderBy($"day").collect().toSeq
    val batch = operators.Retention.rollingWauKmvEstimate(
      Tables.load(spark, sf, "events"), 7, 64).orderBy($"day").collect().toSeq
    // k-min of a multiset ignores repeats: duplicate delivery cannot
    // move the sketch, so no dedup/watermark machinery is needed
    assert(streamed === batch)
  }

  test("cohortRetention: hand-computed cohort matrix") {
    // cohort 01-01: u1 (active wk0 + wk1), u2 (wk0 only)
    // cohort 01-02: u3 (active wk0 + wk2)
    val e = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-08 10:00:00", 1, "view"),  // day 7 -> week_offset 1
      (3, "2024-01-01 11:00:00", 2, "view"),
      (4, "2024-01-02 10:00:00", 3, "view"),
      (5, "2024-01-16 10:00:00", 3, "view"))  // day 14 -> week_offset 2
    val got = Retention.cohortRetention(e, bucketDays = 7)
      .select($"cohort_day".cast("string"), $"week_offset", $"cohort_size",
        $"n_active", $"retention_bp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L, 2L, 10000L),
      ("2024-01-01", 1L, 2L, 1L, 5000L),
      ("2024-01-02", 0L, 1L, 1L, 10000L),
      ("2024-01-02", 2L, 1L, 1L, 10000L)))
  }

  test("cohortRetention at sf0.001: offset-0 full, bounded, cohorts partition users") {
    val events = Tables.load(spark, sf, "events")
    val got = Retention.cohortRetention(events, bucketDays = 7).persist()
    assert(got.filter($"week_offset" === 0 && $"retention_bp" =!= 10000).isEmpty)
    assert(got.filter($"retention_bp" > 10000 || $"n_active" > $"cohort_size").isEmpty)
    val users = events.select($"user_id").distinct().count()
    val sizeSum = got.filter($"week_offset" === 0)
      .agg(sum($"cohort_size")).as[Long].head()
    assert(sizeSum === users)
    got.unpersist()
  }

  test("sessionFunnel: hand-computed in-order vs out-of-order sessions") {
    // u1 s1: view->click->purchase (all in order)
    // u2 s1: click before view (click step must NOT count), purchase present
    // u3 s1: view only
    val e = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-01 10:05:00", 1, "click"),
      (3, "2024-01-01 10:10:00", 1, "purchase"),
      (4, "2024-01-01 10:00:00", 2, "click"),
      (5, "2024-01-01 10:05:00", 2, "view"),
      (6, "2024-01-01 10:10:00", 2, "purchase"),
      (7, "2024-01-01 10:00:00", 3, "view"))
    val got = Sessionize.sessionFunnel(e, gapMinutes = 60,
        steps = Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "view", 3L, 10000L),     // all 3 sessions view
      (2L, "click", 1L, 3333L),     // only u1 clicks after viewing
      (3L, "purchase", 1L, 10000L)))
  }

  test("funnelLatency: hand-computed latency percentiles over converting sessions only") {
    // u1 converts in 600s; u2 is out of order (excluded); u3 converts in 60s
    val e = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-01 10:05:00", 1, "click"),
      (3, "2024-01-01 10:10:00", 1, "purchase"),
      (4, "2024-01-01 10:00:00", 2, "click"),
      (5, "2024-01-01 10:05:00", 2, "view"),
      (6, "2024-01-01 10:10:00", 2, "purchase"),
      (7, "2024-01-01 10:00:00", 3, "view"),
      (8, "2024-01-01 10:00:30", 3, "click"),
      (9, "2024-01-01 10:01:00", 3, "purchase"))
    val got = Sessionize.funnelLatency(e, gapMinutes = 60,
        steps = Seq("view", "click", "purchase"))
      .as[(Long, Double, Double, Long)].head()
    assert(got === ((2L, 330.0, 546.0, 600L))) // interpolated p50/p90 of {60, 600}
  }

  test("activityHistogram: hand-computed power-user curve; user counts total") {
    val e = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-02 10:00:00", 1, "view"),
      (3, "2024-01-03 10:00:00", 1, "view"),
      (4, "2024-01-01 11:00:00", 2, "view"),
      (5, "2024-01-01 12:00:00", 3, "view"), // same day twice: still 1 day
      (6, "2024-01-01 13:00:00", 3, "view"))
    val got = Retention.activityHistogram(e)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (3L, 1L)))
    val users = Tables.load(spark, sf, "events").select($"user_id").distinct().count()
    val total = Retention.activityHistogram(Tables.load(spark, sf, "events"))
      .agg(sum($"n_users")).as[Long].head()
    assert(total === users)
  }

  test("funnelLatencyCdf: per-day type-1 quantiles agree with a brute-force check") {
    // one day, latencies {60, 300, 600} sec for u1-u3 (view->click)
    val e = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-01 10:01:00", 1, "click"),
      (3, "2024-01-01 10:00:00", 2, "view"),
      (4, "2024-01-01 10:05:00", 2, "click"),
      (5, "2024-01-01 10:00:00", 3, "view"),
      (6, "2024-01-01 10:10:00", 3, "click"))
    val got = Sessionize.funnelLatencyCdf(e, gapMinutes = 60,
        steps = Seq("view", "click"), percents = Seq(50, 100))
      .select($"day".cast("string"), $"p", $"q_cents")
      .as[(String, Long, Long)].collect().toSeq
    // type-1 lower quantile over {6000, 30000, 60000} centisec
    assert(got === Seq(("2024-01-01", 50L, 30000L), ("2024-01-01", 100L, 60000L)))
  }

  test("transitionMatrix: hand-computed transitions with session-boundary END") {
    // u1 one session: view->click->view; u2 two sessions (2h gap):
    // view | purchase — the cross-session edge must become END
    val e = ev(
      (1, "2024-01-01 10:00:00", 1, "view"),
      (2, "2024-01-01 10:05:00", 1, "click"),
      (3, "2024-01-01 10:10:00", 1, "view"),
      (4, "2024-01-01 10:00:00", 2, "view"),
      (5, "2024-01-01 12:30:00", 2, "purchase"))
    val got = Sessionize.transitionMatrix(e, gapMinutes = 60)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("click", "view", 1L, 10000L),
      ("purchase", "END", 1L, 10000L),
      ("view", "END", 2L, 6666L),
      ("view", "click", 1L, 3333L)))
  }

  test("transitionMatrix at sf0.001: outgoing edges per row sum to the row total") {
    val got = Sessionize.transitionMatrix(Tables.load(spark, sf, "events"), 60)
    // every event has exactly one outgoing edge (END included)
    val total = got.agg(sum($"n")).as[Long].head()
    assert(total === Tables.load(spark, sf, "events").count())
    assert(got.filter($"p_bp" > 10000).isEmpty)
  }

  test("ltvDeciles: hand-computed concentration; deciles partition users at sf0.001") {
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 30.0),
      (2L, "2024-01-01 11:00:00", 2L, "purchase", 10.0),
      (3L, "2024-01-01 12:00:00", 2L, "purchase", 10.0),
      (4L, "2024-01-01 13:00:00", 3L, "view", 99.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val got = Retention.ltvDeciles(e, "purchase", "value")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // two users: u1 3000c (decile 1), u2 2000c (decile 2); view ignored
    assert(got === Seq((1L, 1L, 3000L, 6000L), (2L, 1L, 2000L, 4000L)))

    val real = Retention.ltvDeciles(Tables.load(spark, sf, "events"), "purchase", "value")
    val buyers = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase").select($"user_id").distinct().count()
    assert(real.agg(sum($"n_users")).as[Long].head() === buyers)
    // top decile concentrates at least its proportional share
    val top = real.filter($"decile" === 1).select($"share_bp").as[Long].head()
    assert(top >= 1000L)
  }

  test("ltvDeciles: all-NULL-value users are excluded, not silently lost from a decile") {
    // u9's only purchase has a NULL value: it must not appear in any
    // decile AND must not inflate the ntile total (pre-fix it fell out
    // of the rank equi-join on a NULL cents key while still counting
    // in n_total, shifting every decile boundary)
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", Some(30.0)),
      (2L, "2024-01-01 11:00:00", 2L, "purchase", Some(10.0)),
      (3L, "2024-01-01 12:00:00", 9L, "purchase", None: Option[Double]))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val got = Retention.ltvDeciles(e, "purchase", "value")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 3000L, 7500L), (2L, 1L, 1000L, 2500L)))
    assert(got.map(_._2).sum === 2L)
  }

  test("ltvDeciles equals the literal ntile(10) definition at sf0.001") {
    // the sort-free rank decomposition must reproduce ntile bit-for-bit
    // (same bucket sizes, same tie handling) — checked against a
    // literal ntile plan on the real fixture
    val e = Tables.load(spark, sf, "events")
    val perUser = e
      .filter($"event_type" === "purchase" && $"user_id".isNotNull)
      .select($"user_id", expr("cast(floor(value * 100.0D + 0.5D) as bigint)").as("cents"))
      .groupBy($"user_id").agg(sum($"cents").as("cents"))
    val W = org.apache.spark.sql.expressions.Window
    val ref = perUser
      .withColumn("decile",
        ntile(10).over(W.orderBy($"cents".desc, $"user_id")).cast("long"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_users"), sum($"cents").as("total_value_cents"))
      .orderBy($"decile")
      .as[(Long, Long, Long)].collect().toSeq
    val got = Retention.ltvDeciles(e, "purchase", "value")
      .select($"decile", $"n_users", $"total_value_cents")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === ref)
  }

  test("ltvDeciles plans ntile-free: no unpartitioned window over user rows") {
    import org.apache.spark.sql.execution.ExplainMode
    val df = Retention.ltvDeciles(Tables.load(spark, sf, "events"), "purchase", "value")
    df.collect() // settle AQE so the explain shows the final plan
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      .split("== Initial Plan ==").head
    assert(!plan.contains("ntile"), plan)
    // the only legal unpartitioned Window is the running sum over the
    // COARSE BUCKET histogram (domain = value-range / bucketWidth).
    // One whose input carries user_id would be the old
    // single-partition sort of every user; one carrying cents would
    // be the distinct-value histogram, which near-unique money sums
    // grow back to ~user cardinality
    val unpartitionedOverUsers = plan.split("\\(\\d+\\) ")
      .filter(s => s.startsWith("Window") && s.contains(", [], [")
        && (s.contains("user_id") || s.contains("cents")))
    assert(unpartitionedOverUsers.isEmpty,
      unpartitionedOverUsers.mkString("\n---\n"))
  }

  test("ltvDeciles is bucketWidth-invariant and matches ntile across bucket boundaries") {
    // lifetime values chosen to straddle coarse buckets at width 4:
    // ties, adjacent values in different buckets, and one user whose
    // refunds push the sum negative (div-toward-zero buckets still
    // partition the value line into ordered intervals)
    val e = Seq(
      (1L, 1L, 0.07), (2L, 2L, 0.07), (3L, 3L, 0.08), (4L, 4L, 0.03),
      (5L, 5L, 0.04), (6L, 6L, 0.01), (7L, 7L, -0.05), (8L, 8L, 0.12),
      (9L, 9L, 0.11), (10L, 10L, 0.02), (11L, 11L, 0.06))
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:00")))
      .withColumn("event_type", lit("purchase"))
    val W = org.apache.spark.sql.expressions.Window
    val ref = e
      .select($"user_id", expr("cast(floor(value * 100.0D + 0.5D) as bigint)").as("cents"))
      .groupBy($"user_id").agg(sum($"cents").as("cents"))
      .withColumn("decile", ntile(10).over(W.orderBy($"cents".desc, $"user_id")).cast("long"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_users"), sum($"cents").as("total_value_cents"))
      .orderBy($"decile")
      .as[(Long, Long, Long)].collect().toSeq
    for (width <- Seq(2L, 4L, 1000L, 1L << 20)) {
      val got = Retention.ltvDeciles(e, "purchase", "value", bucketWidth = width)
        .select($"decile", $"n_users", $"total_value_cents")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === ref, s"bucketWidth=$width")
    }
  }

  test("plan shapes: transitionMatrix folds lag+sum+lead into one Window; q133 has none") {
    import org.apache.spark.sql.execution.ExplainMode
    def fmt(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // settle AQE so the explain shows the final plan
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    }
    // the two leads (type, ts) share partitioning, ordering AND frame,
    // so the whole boundary decision folds into ONE Window node on one
    // user-partitioned (ts, event_id) sort; the only other Sort in
    // the plan is the final tiny orderBy
    val events = Tables.load(spark, sf, "events")
    val tmPlan = fmt(Sessionize.transitionMatrix(events, 60))
      .split("== Initial Plan ==").head
    val windows = "\\bWindow \\(".r.findAllIn(tmPlan).size
    val sorts = "\\bSort \\(".r.findAllIn(tmPlan).size
    assert(windows === 1, s"expected 1 Window node, got $windows:\n$tmPlan")
    assert(sorts === 2, s"expected 2 Sorts (window + final orderBy), got $sorts:\n$tmPlan")
    // the rolling-distinct path is windowless by design (explode, not
    // a moving frame) and must not funnel through a single partition
    val raPlan = fmt(Retention.rollingActiveUsers(events, 7))
      .split("== Initial Plan ==").head
    assert("\\bWindow \\(".r.findAllIn(raPlan).isEmpty, raPlan)
    assert(!raPlan.contains("SinglePartition"), raPlan)
  }

  test("seeded funnel (q144/q145): the full three-step chain is exercised with rows > 0") {
    val funnel = SparkEntry.queries("q144_session_funnel_seeded")(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    // at least the two seeded in-order converters reach step 3; the
    // out-of-order and gap-split seeds must NOT count
    val step3 = funnel.find(_._1 == 3L).get._3
    assert(step3 >= 2L, s"expected the seeded converters at step 3, got $step3")
    assert(funnel.map(_._3) === funnel.map(_._3).sorted.reverse)
    val lat = SparkEntry.queries("q145_funnel_latency_seeded")(spark, sf).collect().head
    assert(lat.getLong(0) >= 2L)
    assert(lat.getLong(3) >= 1800L) // the 30-min seeded chain
  }

  test("sessionFunnel at sf0.001: counts monotonically non-increasing, conv_bp <= 10000") {
    val got = SparkEntry.queries("q135_session_funnel")(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got.map(_._2) === Seq("view", "click", "purchase"))
    assert(got.map(_._3) === got.map(_._3).sorted.reverse)
    assert(got.forall(_._4 <= 10000L))
  }
}
