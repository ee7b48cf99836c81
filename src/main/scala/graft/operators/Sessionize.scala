package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-feed extension of
  * the reference's play-history model (a "listening session" = plays
  * separated by less than `gap`).
  *
  * Batch form uses analytic windows: a session starts where the gap
  * from the previous event of the same user exceeds the threshold
  * (`lag`), and session ids are a running sum of start markers — both
  * partitioned by user, so the sort is per-user-partition, never
  * global. The streaming form is the built-in `session_window`
  * (EventStream.sessionAgg). Boundary caveat: this batch form breaks
  * on gap STRICTLY GREATER than the threshold (`diff > gap`, pinned
  * by the q31 oracle), while `session_window` and the timer processor
  * (SessionStream) break on gap >= threshold (their [start, last+gap)
  * window is half-open; pinned by the q107/q146 oracle) — two events
  * EXACTLY one gap apart share a session here and split there. A
  * deliberate documented variant, not drift: each side matches its
  * own oracle.
  */
object Sessionize {

  /** Per-event session ids. Output: input columns + session_id
    * (1-based per user). Deterministic: event ordering tie-breaks on
    * event_id.
    */
  def assignSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val newSession =
      when(lag(col("ts"), 1).over(byUser).isNull, 1L)
        .otherwise(when(
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
            > gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
    events
      .withColumn("_new", newSession)
      .withColumn("session_id",
        sum(col("_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** Per-user session stats. Output:
    * (user_id, n_sessions, longest_session_events) ordered by user_id.
    */
  def userSessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    assignSessions(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("longest_session_events"))
      .orderBy(col("user_id"))

  /** Sequence-example construction — the training-set builder for
    * next-event prediction (the recsys / behavioral-LM analogue of
    * TextPrep's chunk+pack): each event becomes one example whose
    * features are the user's previous `k` event types (oldest first,
    * "-" where history runs out) and whose label is the current type.
    * Everything is per-user analytic windows ordered by (ts, event_id)
    * — deterministic under ties, no self-join, no collect.
    *
    * Scale shape: k `lag` columns ride ONE user-partitioned sort (all
    * window specs share the partitioning and ordering, so Catalyst
    * evaluates them in a single Window operator over a single
    * exchange); cost is one shuffle of the events keyed by user.
    * Output: (user_id, event_id, context, label) ordered by
    * (user_id, event_id) — context is the "-"-padded
    * comma-join so the row hashes identically in any engine.
    */
  def nextEventExamples(events: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ctx = concat_ws(",",
      (k to 1 by -1).map(i =>
        coalesce(lag(col("event_type"), i).over(byUser), lit("-"))): _*)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("context", ctx)
      .select(col("user_id"), col("event_id"), col("context"),
        col("event_type").as("label"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Per-session first-occurrence time of each step: one analytic
    * window (session assignment) + one combinable-min groupBy.
    * Output: (user_id, session_id, t0..tN).
    */
  private def stepTimes(events: DataFrame, gapMinutes: Int, steps: Seq[String]): DataFrame = {
    val aggs = steps.zipWithIndex.map { case (st, i) =>
      min(when(col("event_type") === st, col("ts"))).as(s"t$i")
    }
    assignSessions(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** reached(i): every step up to i present, first occurrences in
    * nondecreasing order (equal timestamps count as in-order).
    */
  private def reachedFlags(steps: Seq[String]): Seq[org.apache.spark.sql.Column] =
    steps.indices.map { i =>
      (0 to i).map(j => col(s"t$j").isNotNull)
        .reduce(_ && _) && (1 to i).map(j => col(s"t${j - 1}") <= col(s"t$j"))
        .foldLeft(lit(true))(_ && _)
    }

  /** Ordered-step funnel over gap-sessions: how many sessions reach
    * step i = contain every one of `steps(0..i)` with nondecreasing
    * first-occurrence times (a session that clicks before it ever
    * views does NOT count as view→click). Equal timestamps count as
    * in-order, and first occurrences (`min` per step) make the check
    * deterministic without any per-row sequencing.
    *
    * Scale shape: session assignment is the per-user analytic window
    * (one user-keyed shuffle); per-session step times are one groupBy
    * with map-side-combinable `min`s; the funnel itself is a single
    * global aggregate of boolean flags — a handful of longs, no
    * second pass. Conversion is reported in exact integer basis
    * points (step i vs step i-1; step 0 vs all sessions), so the row
    * hashes identically in any engine.
    * Output: (step_idx, step, n_sessions, conv_bp) ordered by step_idx.
    */
  def sessionFunnel(events: DataFrame, gapMinutes: Int, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val perSession = stepTimes(events, gapMinutes, steps)
    val reached = reachedFlags(steps)
    val counts = perSession.agg(
      count(lit(1)).as("c_total"),
      steps.indices.map(i =>
        sum(when(reached(i), 1L).otherwise(0L)).as(s"c$i")): _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val prev = if (i == 0) "c_total" else s"c${i - 1}"
      struct(
        lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
        col(s"c$i").as("n_sessions"),
        // nullif guard: a feed missing a step makes the divisor 0 and
        // ANSI mode would throw; NULL matches the oracle's NULLIF.
        expr(s"c$i * 10000L div nullif($prev, 0L)").as("conv_bp"))
    }
    counts
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_sessions"), col("r.conv_bp"))
      .orderBy(col("step_idx"))
  }

  /** First-order transition matrix over within-session event
    * sequences (the Markov-chain view of user behavior; "END" marks
    * session termination): counts and exact basis-point row
    * probabilities for every (from, to) pair. The session boundary is
    * decided DIRECTLY from `lead(ts)` — the successor starts a new
    * session iff its gap exceeds the threshold — so no session ids
    * are materialized at all: where the assignSessions route needs
    * lag + running-sum + lead (three Window nodes), this is ONE
    * Window node (both leads share the frame) on one user-partitioned
    * (ts, event_id) sort, plan-asserted in RetentionSpec — then one
    * combinable groupBy; output is |types|² rows at any corpus size.
    * Output: (from_type, to_type, n, p_bp) ordered by (from_type,
    * to_type).
    */
  def transitionMatrix(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // same-session rule as assignSessions: gap STRICTLY greater than
    // the threshold starts a new session, so the successor is a
    // within-session transition iff gap <= threshold
    val next = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .select(col("event_type").as("from_type"),
        when(col("next_ts").isNotNull &&
            unix_micros(col("next_ts")) - unix_micros(col("ts"))
              <= gapMinutes * 60L * 1000000L, col("next_type"))
          .otherwise(lit("END")).as("to_type"))
    val counts = next.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("row_total"))
    counts.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 10000L div row_total").as("p_bp"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** The 100 TB form of [[funnelLatency]]: per-conversion-day latency
    * quantiles through [[Profile.cdfQuantiles]]' quantized-count CDF —
    * one map-side-combinable shuffle over the (day, centisecond)
    * domain instead of buffering every latency in one exact-percentile
    * state. All integer arithmetic (type-1 quantile), so bit-identical
    * in any engine; per-day groups also make it the latency TREND
    * (p50/p90/p99 by day), which the single-group exact form can't
    * report without the same groupBy anyway.
    * Output: (day, p, q_cents) — centiseconds — ordered by (day, p).
    */
  def funnelLatencyCdf(events: DataFrame, gapMinutes: Int, steps: Seq[String],
      percents: Seq[Int]): DataFrame = {
    require(steps.size >= 2, s"need at least 2 steps (got ${steps.size})")
    val last = steps.size - 1
    val lat = stepTimes(events, gapMinutes, steps)
      .filter(reachedFlags(steps).last)
      .select(to_date(col("t0")).as("day"),
        expr(s"(unix_micros(t$last) - unix_micros(t0)) div 1000000").as("lat_sec"))
    Profile.cdfQuantiles(lat, "day", "lat_sec", percents)
  }

  /** Time-to-convert for sessions completing the whole funnel: whole
    * seconds from the first occurrence of the first step to the first
    * occurrence of the last, exact percentiles over that (the SLA /
    * "how long does view→purchase take" number). Rides the same two
    * stages as [[sessionFunnel]] plus one global aggregate; exact
    * `percentile` is the small-output baseline, and at 100 TB the
    * same latency column feeds Profile.cdfQuantiles' quantized
    * no-global-collection path (q104) instead.
    * Output: one row (n_converting, p50_sec, p90_sec, max_sec).
    */
  def funnelLatency(events: DataFrame, gapMinutes: Int, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need at least 2 steps (got ${steps.size})")
    val perSession = stepTimes(events, gapMinutes, steps)
    val last = steps.size - 1
    perSession
      .filter(reachedFlags(steps).last)
      .select(expr(s"(unix_micros(t$last) - unix_micros(t0)) div 1000000").as("lat_sec"))
      .agg(
        count(lit(1)).as("n_converting"),
        expr("percentile(lat_sec, 0.5)").as("p50_sec"),
        expr("percentile(lat_sec, 0.9)").as("p90_sec"),
        max(col("lat_sec")).as("max_sec"))
  }
}
