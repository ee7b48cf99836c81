package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal band (range) join: pair every left row with the right rows
  * whose timestamp lies within ±`widthSec` of it — with NO equi key.
  *
  * North-star extension (BASELINE.json): no counterpart exists in the
  * reference; semantics are defined by this engine and pinned by the
  * DuckDB oracle + ScalaTest.
  *
  * The naive encoding is a pure theta join (`abs(r.ts - l.ts) <= w`),
  * which Spark plans as BroadcastNestedLoopJoin — O(|L|·|R|) and the
  * classic range-join scale-killer. This implementation buckets time
  * into `widthSec`-wide epochs: a right row within ±w of a left row
  * must land in the left row's bucket or an adjacent one, so the left
  * side explodes to its 3 candidate buckets and the join becomes a
  * plain equi-join on the bucket id (shuffle/broadcast hash join,
  * AQE's choice) followed by the exact band predicate. Each right row
  * has exactly one bucket, so a qualifying pair is produced exactly
  * once — no dedup pass. Cost: 3× the left side through one hash
  * join, linear in data size for any fixed band width; bucket width ==
  * band width keeps the candidate-to-match ratio bounded by the data's
  * temporal density, independent of corpus size.
  *
  * Output: one row per qualifying (left, right) pair —
  * (l_id, r_id, dt_sec) with dt_sec = r.ts - l.ts in seconds.
  */
object RangeJoin {

  def bandJoinPairs(left: DataFrame, right: DataFrame,
                    tsCol: String, idCol: String, widthSec: Long): DataFrame = {
    val wUs = widthSec * 1000000L
    val l = left.select(
      col(idCol).as("l_id"), unix_micros(col(tsCol)).as("l_us"))
    val r = right.select(
      col(idCol).as("r_id"), unix_micros(col(tsCol)).as("r_us"))
      .withColumn("bucket", floor(col("r_us") / wUs))
    val lx = l.select(col("l_id"), col("l_us"),
        explode(array((-1 to 1).map(d => floor(col("l_us") / wUs) + d): _*)).as("bucket"))
    lx.join(r, Seq("bucket"))
      .filter(abs(col("r_us") - col("l_us")) <= wUs)
      .select(col("l_id"), col("r_id"),
        ((col("r_us") - col("l_us")).cast("double") / 1e6).as("dt_sec"))
  }

  /** Interval-overlap join: every (left, right) interval pair that
    * overlaps — `l_s <= r_e AND r_s <= l_e` — without the
    * BroadcastNestedLoopJoin a raw theta join would plan.
    *
    * Scale shape: time is cut into `slabSec`-wide slabs and each
    * interval explodes to the slabs it covers; overlapping intervals
    * necessarily share their overlap's first slab, so the join is a
    * plain hash equi-join on the slab id. Each qualifying pair is kept
    * exactly once — at the FIRST slab both intervals cover (the
    * greater of the two start slabs) — so no distinct pass is needed.
    * Fan-out is interval_length/slabSec per row: pick slabSec near the
    * typical interval length to bound it (the classic spatial-grid
    * trade-off).
    * Output: (l_id, r_id, overlap_sec) — overlap inclusive of touching
    * endpoints (overlap_sec = 0).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          startCol: String, endCol: String, idCol: String,
                          slabSec: Long): DataFrame = {
    val sUs = slabSec * 1000000L
    // malformed intervals (end < start) are EXCLUDED, not joined:
    // Spark's sequence() happily descends for reversed bounds, so such
    // a row would still slab-match and emit a pair with NEGATIVE
    // overlap_sec — nonsense output that looks like data
    def prep(df: DataFrame, p: String) = df.select(
        col(idCol).as(s"${p}_id"),
        unix_micros(col(startCol)).as(s"${p}_s"),
        unix_micros(col(endCol)).as(s"${p}_e"))
      .filter(col(s"${p}_s") <= col(s"${p}_e"))
    val l = prep(left, "l").select(col("l_id"), col("l_s"), col("l_e"),
      explode(sequence(floor(col("l_s") / sUs), floor(col("l_e") / sUs))).as("slab"))
    val r = prep(right, "r").select(col("r_id"), col("r_s"), col("r_e"),
      explode(sequence(floor(col("r_s") / sUs), floor(col("r_e") / sUs))).as("slab"))
    l.join(r, Seq("slab"))
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .filter(col("slab") === greatest(floor(col("l_s") / sUs), floor(col("r_s") / sUs)))
      .select(col("l_id"), col("r_id"),
        ((least(col("l_e"), col("r_e")) - greatest(col("l_s"), col("r_s"))).cast("double") / 1e6)
          .as("overlap_sec"))
  }

  /** Per-left-row band count: how many right rows fall within
    * ±`widthSec` of each left row, zero-preserving (left rows with no
    * neighbor surface with n = 0). The common aggregate consumer of
    * [[bandJoinPairs]] — e.g. "errors within 5 minutes of each click".
    * Output: (l_id, n) ordered by l_id.
    */
  def bandCount(left: DataFrame, right: DataFrame,
                tsCol: String, idCol: String, widthSec: Long): DataFrame = {
    val counts = bandJoinPairs(left, right, tsCol, idCol, widthSec)
      .groupBy(col("l_id")).agg(count(lit(1)).as("n"))
    left.select(col(idCol).as("l_id"))
      .join(counts, Seq("l_id"), "left")
      .select(col("l_id"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("l_id"))
  }
}
