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
}
