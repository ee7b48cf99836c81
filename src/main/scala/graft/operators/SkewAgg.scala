package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe grouped aggregation by salting (SURVEY.md §7.5.6; the
  * standard remedy when one group key carries a disproportionate share
  * of rows and its single reducer becomes the straggler).
  *
  * Stage 1 groups by (keys, salt) — the hot key's rows spread over
  * `buckets` reducers; stage 2 re-aggregates the per-salt partials by
  * the real keys. For algebraic aggregates (sum/count/min/max) the
  * result is IDENTICAL to the direct groupBy — with exact DECIMAL
  * sums, bit-identical — so the same DuckDB oracle checks both plans.
  *
  * The salt derives from a caller-supplied deterministic column (a
  * unique id), never from a random function: re-execution of a failed
  * task must land rows in the same bucket.
  */
object SkewAgg {

  /** count + exact decimal sum per key, computed skew-safely.
    * Output columns: keys :+ n :+ total (total as double).
    */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      buckets: Int,
      valueCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    val partial = salted
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(12,2)")).as("_sum"))
    partial
      .groupBy(keyCols: _*)
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_sum")).cast("double").as("total"))
  }
}
