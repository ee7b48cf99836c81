package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling user-activity analytics (DAU / WAU / stickiness) — the
  * engagement dashboard tier a play-history product sits under (the
  * reference's `played_at` feed aggregated per listener per day;
  * SURVEY.md §2.10's event-feed extension).
  *
  * Rolling DISTINCT is the interesting operator at scale: a trailing
  * 7-day distinct-user count per day cannot ride a window frame
  * (COUNT(DISTINCT) over a moving frame isn't supported by any SQL
  * window engine, and would re-scan the frame per row if it were).
  * Two scale paths:
  *
  *  - [[rollingActiveUsers]] (exact): explode each EVENT into the
  *    `windowDays` target days it contributes to, then ONE distinct of
  *    (target day, user). The cardinality cliff from trillions of
  *    events to (days x users-active-that-day) still happens before
  *    the wire — as the distinct's MAP-SIDE partial aggregation —
  *    without paying a separate pair-materializing shuffle first
  *    (the reduce-then-explode alternative measured slower at x100 on
  *    both staging axes; see the method scaladoc).
  *  - [[rollingActiveUsersKmv]] (sketch): per-day KMV partials
  *    (k smallest portable hashes, as [[ApproxDistinct.kmvDaily]]),
  *    rolling-merged per target day. State per day is k longs, so a
  *    year of dailies merges from ~365*k rows regardless of corpus
  *    size — the mergeability payoff when the exact pair set itself
  *    is too hot (billions of users x days). KMV is engine-portable,
  *    so unlike HLL this sketch is hash-oracle-checkable.
  */
object Retention {

  /** Exact rolling active users. For every day present in `events`:
    * DAU (distinct users that day), WAU-style trailing distinct over
    * `windowDays` days ending that day, and stickiness = DAU/WAU in
    * basis points (integer, exact in any engine).
    * Output: (day DATE, dau, wau, stickiness_bp) ordered by day.
    *
    * Plan shape — explode FIRST, one distinct, and let partial
    * aggregation do the reduction. The tempting "reduce to distinct
    * (day,user) pairs, then explode the reduced set" costs an extra
    * full shuffle to materialize the pair set before the fan-out —
    * and buys nothing on Spark, because the explode's distinct already
    * collapses the per-event duplication MAP-SIDE (hash partial
    * aggregation inside each task) before anything hits the wire: the
    * shuffled volume is bounded by tasks × the reduced domain either
    * way. Measured at x100 on both staging axes (ScaleProbe
    * `rolling_dau_wau` vs `rolling_dau_wau_reduce_first`,
    * tools/scaleprobe_r10_x100.jsonl, explode-first timed FIRST so
    * JVM warm-up biases against it): explode-first ~1.1x ahead on
    * both axes, never behind beyond noise — and it is one whole
    * shuffle stage shorter, the part that compounds on a real
    * network-bound cluster.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1 (got $windowDays)")
    val raw = events
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val dau = raw.distinct().groupBy(col("day")).agg(count(lit(1)).as("dau"))
    // an event on day p makes its user "active" for target days
    // p .. p+windowDays-1; ONE distinct dedups both the per-event
    // duplication and the several-active-days-per-window overlap
    val wau = raw
      .select(col("day"), col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("k"))
      .select(date_add(col("day"), col("k")).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    // inner join drops the phantom target days past the last observed day
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 10000L div wau").as("stickiness_bp"))
      .orderBy(col("day"))
  }

  /** Sketch-path rolling distinct: per-day KMV partials rolling-merged
    * over `windowDays`. The merge unions the retained hashes of the
    * window's days (<= windowDays*k longs), re-takes the k smallest,
    * and estimates (k-1)*2^32/h_k — bit-reproducible in any engine
    * (portable md5-prefix hash, integer state, one double division).
    * `exact_wau` rides along for error inspection.
    * Output: (day DATE, n_kept, kth_hash, approx_wau, exact_wau)
    * ordered by day.
    */
  def rollingActiveUsersKmv(events: DataFrame, windowDays: Int, k: Int): DataFrame = {
    val exact = rollingActiveUsers(events, windowDays)
      .select(col("day"), col("wau").as("exact_wau"))
    rollingWauKmvEstimate(events, windowDays, k)
      .join(exact, Seq("day"))
      .select(col("day"), col("n_kept"), col("kth_hash"), col("approx_wau"), col("exact_wau"))
      .orderBy(col("day"))
  }

  /** Revenue concentration by user decile: users ranked by lifetime
    * `valueCol` over `eventType` events, cut into 10 equal-count
    * buckets (deterministic ties: user_id), per-decile totals and
    * share of revenue in exact basis points — the "top decile drives
    * X% of revenue" table. Bucket assignment is EXACTLY `ntile(10)`
    * over (cents DESC, user_id) — but computed without ever sorting
    * the per-user rows in one partition (the scale-killer a literal
    * ntile plans as). Each user's global rank decomposes THREE ways:
    *
    *   rank = (#users in strictly higher coarse buckets)
    *        + (#users at strictly higher cents in MY bucket)
    *        + (my position among the ties at my exact cents)
    *
    * with coarse bucket = `cents div bucketWidth` (integer `div`
    * intervals are ordered and disjoint, negatives included, so the
    * decomposition is exact). Term 1 is the ONLY unpartitioned window
    * and runs over the BUCKET histogram — its domain is
    * value-range / bucketWidth, independent of user count (a plain
    * cents histogram would not be: near-unique lifetime values — the
    * realistic case for money sums — make it ~one row per user
    * again). Term 2 is a bucket-partitioned running sum whose
    * partitions hold ≤ 2·bucketWidth-1 distinct values by
    * construction (truncating `div` folds cents in
    * (-bucketWidth, bucketWidth) into bucket 0; every other bucket
    * holds < bucketWidth);
    * term 3 is a cents-partitioned `row_number` (distributed; a
    * pathological tie group — millions of users at one exact lifetime
    * value — is the residual hot key, and would need one more level
    * to split). Rank→decile is then ntile's closed-form rule applied
    * map-side: with N users the first N%10 buckets take ceil(N/10),
    * the rest floor(N/10).
    *
    * Null contract: rows with a NULL `valueCol` are excluded before
    * the lifetime sum, so a user with no priced events has no LTV and
    * appears in NO decile (declared in the q142 oracle the same way).
    * Without the filter such users would carry a NULL cents key that
    * silently falls out of the rank equi-join while still counting in
    * n_total — a row-loss bug, not a contract.
    * Output: (decile, n_users, total_value_cents, share_bp) ordered
    * by decile.
    */
  def ltvDeciles(events: DataFrame, eventType: String, valueCol: String,
                 bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth >= 2, s"bucketWidth must be >= 2 (got $bucketWidth)")
    val W = org.apache.spark.sql.expressions.Window
    val perUser = events
      .filter(col("event_type") === eventType && col("user_id").isNotNull &&
        col(valueCol).isNotNull)
      .select(col("user_id"),
        expr(s"cast(floor($valueCol * 100.0D + 0.5D) as bigint)").as("cents"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("cents"))
    // reduced domain: one row per distinct lifetime value, coarse-bucketed
    val hist = perUser.groupBy(col("cents")).agg(count(lit(1)).as("n_at"))
      .withColumn("b", expr(s"cents div ${bucketWidth}L"))
    // term 2: strictly-higher values inside my bucket (distributed;
    // each partition holds < bucketWidth distinct-value rows)
    val inBucket = hist.withColumn("nh_in_b",
      coalesce(
        sum(col("n_at")).over(W.partitionBy(col("b")).orderBy(col("cents").desc)
          .rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
    // term 1: whole higher buckets — the one unpartitioned window,
    // over value-range/bucketWidth bucket rows, never user rows
    val higherBuckets = hist.groupBy(col("b")).agg(sum(col("n_at")).as("n_b"))
      .withColumn("nh_b",
        coalesce(
          sum(col("n_b")).over(W.orderBy(col("b").desc)
            .rowsBetween(W.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("b"), col("nh_b"))
    // bucket rows are value-range/bucketWidth at most — broadcast, so
    // attaching term 1 re-shuffles nothing
    val nHigher = inBucket.join(broadcast(higherBuckets), Seq("b"))
      .select(col("cents"), (col("nh_in_b") + col("nh_b")).as("n_higher"))
    val ranked = perUser
      .withColumn("tie_rk", row_number()
        .over(W.partitionBy(col("cents")).orderBy(col("user_id"))).cast("long"))
      .join(nHigher, Seq("cents"))
      .withColumn("rk", col("n_higher") + col("tie_rk"))
    val totals = perUser.agg(
      count(lit(1)).as("n_total"), sum(col("cents")).as("grand"))
    // ntile's split: rem = N%10 buckets of base+1, then buckets of base.
    // When N < 10 every rank lands in the first branch (rem = N), so
    // the base-sized ELSE (and its div) is never evaluated.
    val cut = ranked.crossJoin(broadcast(totals))
      .withColumn("decile", expr(
        """CASE WHEN rk <= (n_total % 10) * (n_total div 10 + 1)
          |     THEN (rk - 1) div (n_total div 10 + 1) + 1
          |     ELSE (n_total % 10)
          |          + (rk - 1 - (n_total % 10) * (n_total div 10 + 1))
          |            div (n_total div 10) + 1
          |END""".stripMargin))
    cut.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("total_value_cents"),
        max(col("grand")).as("grand"))
      .select(col("decile"), col("n_users"), col("total_value_cents"),
        // nullif: a feed whose priced events net to zero cents makes
        // grand 0, and ANSI div would throw on a valid (degenerate)
        // input — share is NULL then, matching the oracle
        expr("total_value_cents * 10000L div nullif(grand, 0L)").as("share_bp"))
      .orderBy(col("decile"))
  }

  /** Engagement distribution: how many users were active on exactly
    * n distinct days — the "power-user curve" histogram. Two
    * map-side-combinable aggregates over the reduced pair set; output
    * is at most |days| rows.
    * Output: (n_days, n_users) ordered by n_days.
    */
  def activityHistogram(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_days"))
      .groupBy(col("n_days")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_days"))

  /** Cohort retention matrix: users grouped by their first-ever
    * active day (the cohort), each cohort tracked across
    * `bucketDays`-wide offsets — the "do week-0 signups come back in
    * week 2" triangle behind every retention dashboard.
    *
    * Scale shape: the per-user first day is one map-side-combinable
    * `min` straight off the events (no pre-distinct — partial
    * aggregation collapses per-event duplication in-task, so a full
    * pair-materializing shuffle ahead of it is pure cost; measured
    * within noise to ~1.1x ahead at x100 on both staging axes,
    * ScaleProbe `cohort_retention` vs
    * `cohort_retention_reduce_first`). The event→cohort attachment is
    * an equi-join on user_id (both sides hash-partitioned by user,
    * and the first-day side is exactly one row per user — at 100 TB
    * this is the classic big-dim join that bucketing user-keyed
    * tables makes exchange-free); one distinct after the offset
    * projection dedups per-event duplication, and the matrix itself
    * is two more combinable aggregates over (cohort, offset) —
    * output is cohorts x offsets rows, tiny at any corpus size.
    * Retention in exact integer basis points (offset 0 is 10000 by
    * construction — every user is active on their first day).
    * Output: (cohort_day, week_offset, cohort_size, n_active,
    * retention_bp) ordered by (cohort_day, week_offset).
    */
  def cohortRetention(events: DataFrame, bucketDays: Int): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1 (got $bucketDays)")
    val raw = events
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val first = raw.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = first.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    val active = raw.join(first, Seq("user_id"))
      .select(col("cohort_day"),
        expr(s"datediff(day, cohort_day) div $bucketDays").as("week_offset"),
        col("user_id"))
      .distinct()
    active.groupBy(col("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("week_offset"), col("cohort_size"),
        col("n_active"), expr("n_active * 10000L div cohort_size").as("retention_bp"))
      .orderBy(col("cohort_day"), col("week_offset"))
  }

  /** The sketch path alone — what actually runs at 100 TB (the
    * `exact_wau` column above exists to make the estimator auditable;
    * computing it costs the full exact path). One pass builds the
    * per-day partials; the rolling merge then never touches the
    * corpus again, so e.g. backfilling a year of WAU after the fact
    * reads 365*k longs, not a year of events.
    * Output: (day, n_kept, kth_hash, approx_wau), unordered.
    */
  def rollingWauKmvEstimate(events: DataFrame, windowDays: Int, k: Int): DataFrame =
    mergeRollingKmv(dailyKmvPartials(events, k), windowDays, k)

  /** The per-day sketch state: k smallest portable hashes of the day's
    * distinct users — the persistable partial, k longs per day
    * whatever the day's cardinality. Output: (day, h).
    */
  def dailyKmvPartials(events: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    // one distinct on (day, h): hashing BEFORE the dedup makes a
    // pre-distinct of (day, user) redundant — the (day, h) set comes
    // out identical, one full shuffle cheaper
    graft.plans.TopK.perGroup(
      events
        .filter(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("day"),
          graft.functions.PortableHash.hash32(col("user_id").cast("string")).as("h"))
        // null-day contract (ApproxDistinct.dayHashes): a null-ts row
        // belongs to no day — without this filter it burned k sketch
        // slots in the persisted state and then silently vanished at
        // the rolling merge's null-rejecting range join
        .filter(col("h").isNotNull && col("day").isNotNull)
        .distinct(),
      Seq(col("day")), Seq(col("h").asc), k)
  }

  /** Rolling merge over sketch state alone — input is <= k rows per
    * day, so the fan-out is days*windowDays*k longs at ANY corpus
    * size. Accepts freshly-computed or persisted partials; partials
    * for the same day from different ingest batches are legal (the
    * union re-sketches: distinct + k smallest is associative).
    * Output: (day, n_kept, kth_hash, approx_wau), unordered.
    */
  def mergeRollingKmv(partials: DataFrame, windowDays: Int, k: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1 (got $windowDays)")
    require(k >= 2, s"k must be >= 2 (got $k)")
    val days = partials.select(col("day")).distinct()
    // rolling merge: sketch-day s feeds target days s .. s+windowDays-1
    val windowKept = graft.plans.TopK.perGroup(
      partials.select(col("day").as("sday"), col("h"))
        .join(days,
          col("sday") <= col("day") &&
            col("sday") >= date_sub(col("day"), windowDays - 1))
        .select(col("day"), col("h")).distinct(),
      Seq(col("day")), Seq(col("h").asc), k)
    windowKept.groupBy(col("day"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .withColumn("approx_wau",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise((lit((k - 1).toLong) * lit(4294967296L)).cast("double") / col("kth_hash")))
  }

  /** Persist a batch's per-day partials into the state table
    * (`append = true` for incremental daily ingest — new days, or
    * top-ups of existing days from late data; the merge re-sketches
    * either way). At 100 TB this table is what WAU backfills read:
    * 365*k longs per year, never the events.
    */
  def persistDailyKmv(events: DataFrame, k: Int, path: String, append: Boolean = false): Unit =
    dailyKmvPartials(events, k).write
      .mode(if (append) "append" else "overwrite").parquet(path)

  /** Rolling WAU from the persisted state ONLY — no events scan. */
  def rollingWauFromState(spark: org.apache.spark.sql.SparkSession, path: String,
      windowDays: Int, k: Int): DataFrame =
    mergeRollingKmv(spark.read.parquet(path), windowDays, k)
}
