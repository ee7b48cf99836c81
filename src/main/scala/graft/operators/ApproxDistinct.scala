package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based distinct counting — the 100 TB replacement for exact
  * `countDistinct` (SURVEY.md §7.5.6: a global exact distinct is a
  * single-point shuffle; a sketch is mergeable, so partial sketches
  * can be persisted per partition/day and unioned later without
  * re-reading history).
  *
  * Built on Spark's bundled DataSketches HLL expressions — exact
  * parity with the oracle is impossible by construction (different
  * engines, different sketches), so these are test-verified against
  * the exact answer with an error tolerance instead of oracle-checked.
  */
object ApproxDistinct {

  /** Per-day HLL sketch of a key column: the persistable partial. */
  def dailySketches(events: DataFrame, keyCol: String): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col(keyCol)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Merge previously-built daily sketches into one distinct estimate —
    * no rescan of the underlying data.
    */
  def mergedEstimate(daily: DataFrame): DataFrame =
    daily.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))

  /** One-shot estimate (for comparison / simple pipelines). */
  def estimate(events: DataFrame, keyCol: String): DataFrame =
    events.agg(approx_count_distinct(col(keyCol)).as("approx_distinct"))

  /** KMV (k-minimum-values) distinct sketch — the ENGINE-PORTABLE
    * sketch: unlike HLL above (whose binary layout is
    * implementation-specific, so no oracle can check it), KMV's state
    * is just the k smallest 32-bit portable hashes of the distinct
    * keys, and its estimator (k−1)·2³²/h₍ₖ₎ is one exact integer ratio
    * — DuckDB replays it to the bit, which makes the sketch tier
    * hash-oracle-checkable (q113).
    *
    * Output: one row per day plus an 'ALL' row, (day, n_kept,
    * kth_hash, approx_distinct, exact_distinct) ordered by day. The
    * 'ALL' row is computed ONLY from the per-day retained hashes —
    * the mergeability contract: persist k longs per partition/day,
    * union later, never rescan history. When a day has fewer than k
    * distinct keys the sketch IS the exact distinct set and the
    * estimate equals the exact count.
    *
    * Scale shape: distinct-(day, hash) is one map-side-combinable
    * shuffle; the per-day k smallest ride a rank window on the same
    * day-partitioned exchange; the merge sees ≤ k rows per day. Error
    * is the standard KMV bound ~1/√(k−2) (asserted ≤ 3σ in tests).
    */
  /** Distinct (day, h) pairs of non-null keys on non-null days — the
    * shared sketch input of the daily and cumulative forms. NULL-day
    * contract: an event with ts = NULL belongs to no day and is
    * excluded from the ENTIRE tier — daily rows, the 'ALL' merge, and
    * cumulative prefixes — so per-day rows always reconcile with the
    * merged/exact columns (a null day would otherwise survive into
    * the kept/exact frames but silently vanish at the null-rejecting
    * day equi-join, losing the group from the daily output while its
    * keys still counted in 'ALL'). Declared identically in the
    * q113/q125 oracles.
    */
  private def dayHashes(events: DataFrame, keyCol: String): DataFrame =
    events
      .select(to_date(col("ts")).as("day"),
        graft.functions.PortableHash.hash32(col(keyCol).cast("string")).as("h"))
      .filter(col("h").isNotNull && col("day").isNotNull)
      .distinct()

  /** The KMV estimator over a (…, n_kept, kth_hash) frame — the ONE
    * place the (k−1)·2³² / kth_hash formula lives in this tier.
    */
  private def kmvEstimate(grouped: DataFrame, k: Int): DataFrame = grouped
    .withColumn("approx_distinct",
      when(col("n_kept") < k, col("n_kept").cast("double"))
        .otherwise((lit((k - 1).toLong) * lit(4294967296L)).cast("double") / col("kth_hash")))

  def kmvDaily(events: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    // per-day k smallest via the custom partial-heap operator rather
    // than a rank window. Spark 4's WindowGroupLimit does give the
    // window form a partial limit, but it still SORTS each map
    // partition's rows per day before truncating; the heap form's
    // admission test is one compare against the heap head — measured
    // ~30% faster at 20x staged scale with the identical <= k rows
    // per (partition, day) exchange contract
    // NULL keys are excluded BEFORE the top-k: a null hash would sort
    // first under Spark's NULLS FIRST default but last under the
    // oracle's row_number ORDER BY, and would burn a sketch slot that
    // max(h) then ignores — the sketch estimates distinct non-null
    // keys, matching count(DISTINCT key) semantics on both engines
    val kept = graft.plans.TopK.perGroup(
      dayHashes(events, keyCol),
      Seq(col("day")), Seq(col("h").asc), k)
    val exact = events
      .select(to_date(col("ts")).as("day"), col(keyCol).as("key"))
      .filter(col("day").isNotNull)
      .groupBy(col("day")).agg(countDistinct(col("key")).as("exact_distinct"))
    val daily = kmvEstimate(kept.groupBy(col("day"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash")), k)
      .join(exact, Seq("day"))
    // merge path: global k smallest over the per-day retained hashes
    // only (cross-day duplicates collapse by hash value). The
    // unpartitioned window is safe BY CONSTRUCTION: its input is the
    // already-reduced sketch state, ≤ k rows per day — at 10 years of
    // daily sketches with k=64 that is ~234k rows, not the corpus
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("h"))
    val mergedKept = kept.select(col("h")).distinct()
      .withColumn("rnk", row_number().over(wAll)).filter(col("rnk") <= k)
    val exactAll = events.filter(to_date(col("ts")).isNotNull)
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    val merged = kmvEstimate(mergedKept
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash")), k)
      .crossJoin(exactAll)
      .select(lit("ALL").as("day_label"), col("n_kept"), col("kth_hash"),
        col("approx_distinct"), col("exact_distinct"))
    daily
      .select(col("day").cast("string").as("day_label"), col("n_kept"),
        col("kth_hash"), col("approx_distinct"), col("exact_distinct"))
      .unionAll(merged)
      .orderBy(col("day_label"))
  }

  /** Cumulative KMV merge: for every day d, the distinct-keys-TO-DATE
    * estimate from the union of the per-day sketches for days ≤ d —
    * the running "unique users so far" dashboard number, computed
    * WITHOUT ever rescanning history (the mergeability payoff
    * [[kmvDaily]]'s single 'ALL' row demonstrates, extended to every
    * prefix).
    *
    * Scale shape: the inputs to the cumulative stage are the
    * ALREADY-REDUCED sketches — ≤ k rows per day — so the day≤day
    * prefix join is days²·k/2 rows of longs (10 years of dailies at
    * k=64 ≈ 4.3e8 narrow rows, a trivial shuffle; the corpus itself
    * is never touched). Per-prefix k smallest ride the same
    * partial-heap operator as the dailies. The exact comparison
    * column is a cumulative sum over each key's FIRST day — one
    * groupBy + a days-sized window, no per-day rescan either.
    * Output: (day, n_kept, kth_hash, approx_distinct, exact_distinct)
    * ordered by day.
    */
  def kmvCumulative(events: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    val kept = graft.plans.TopK.perGroup(
      dayHashes(events, keyCol),
      Seq(col("day")), Seq(col("h").asc), k)
    val days = kept.select(col("day")).distinct()
    // prefix union of sketch states, dup hashes collapsed, re-sketched
    val cumKept = graft.plans.TopK.perGroup(
      kept.select(col("day").as("sday"), col("h"))
        .join(days, col("sday") <= col("day"))
        .select(col("day"), col("h")).distinct(),
      Seq(col("day")), Seq(col("h").asc), k)
    val est = kmvEstimate(cumKept.groupBy(col("day"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash")), k)
    // exact to-date = how many keys first appeared on or before d
    val firstDays = events
      .select(to_date(col("ts")).as("fd"), col(keyCol).as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(min(col("fd")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).as("n_new"))
    val exactCum = days
      .join(firstDays, col("fd") <= col("day"))
      .groupBy(col("day")).agg(sum(col("n_new")).as("exact_distinct"))
    est.join(exactCum, Seq("day"))
      .select(col("day").cast("string").as("day"), col("n_kept"), col("kth_hash"),
        col("approx_distinct"), col("exact_distinct"))
      .orderBy(col("day"))
  }
}
