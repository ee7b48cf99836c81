package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling (ANALYZE-style column statistics) — the first query
  * any pipeline runs against a new 100 TB table: null rates, exact
  * cardinalities and ranges per column, in ONE scan.
  *
  * North-star extension (BASELINE.json): no counterpart exists in the
  * reference; semantics are defined by this engine and pinned by the
  * DuckDB oracle + ScalaTest.
  */
object Profile {

  /** Per-column stats for numeric columns: (column_name, n_nulls,
    * n_distinct, min_val, max_val) — all columns profiled in a single
    * aggregate pass over one scan (4·|cols| aggregates fused into one
    * physical HashAggregate, map-side combinable), then unpivoted with
    * `stack`. Exact distinct here because the oracle demands
    * exactness; the 100 TB variant swaps `countDistinct` for the
    * mergeable HLL sketches in [[ApproxDistinct]].
    * Output ordered by column_name.
    */
  def numericColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericColumns needs at least one column to profile")
    val aggs = cols.flatMap { c => Seq(
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"))
    }
    // backtick-quote interpolated names so a column like `my col`
    // cannot break the stack expression
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_val, max_val)")
      .orderBy(col("column_name"))
  }

  /** Grouped-CDF quantiles — the 100 TB percentile path. The exact
    * `percentile()` (q41) materializes every value per group; this
    * form instead quantizes values to cents (exact i64), reduces to
    * per-(group, cent) counts — ONE map-side-combinable shuffle whose
    * width is the distinct-cent domain, not the row count — and walks
    * the cumulative distribution with a window over that tiny domain.
    * The reported quantile is the smallest cent whose cumulative count
    * reaches ⌈p·n⌉ (type-1 / lower quantile), so everything is integer
    * arithmetic: bit-identical in any engine, under any partitioning.
    *
    * Mergeable by construction: per-day (group, cent) count tables sum
    * cell-wise into the corpus CDF without rescanning history — the
    * same contract as the HLL sketches in [[ApproxDistinct]], but
    * exact, because counts (unlike rank positions) are associative.
    * Output: (groupCol, p, q_cents) ordered by (groupCol, p).
    */
  def cdfQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                   percents: Seq[Int]): DataFrame = {
    // NULL values are excluded from the distribution, declared in the
    // oracle the same way: a NULL cent group would sort FIRST in
    // Spark's cumulative window but LAST in DuckDB's (opposite default
    // null ordering) — the one input on which the two engines would
    // silently disagree — and would inflate `total`, shifting every
    // real quantile. A percentile of the present values is also the
    // standard contract (percentile()/median() skip nulls).
    val counts = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        expr(s"cast(floor($valueCol * 100.0D + 0.5D) as bigint)").as("cent"))
      .groupBy(col(groupCol), col("cent"))
      .agg(count(lit(1)).as("n"))
    cdfWalk(counts, groupCol, percents)
  }

  /** The shared CDF walk: from a reduced (groupCol, cent, n) count
    * frame to type-1 lower quantiles — the single place the quantile
    * rule (`cum·100 ≥ p·total`) lives, so the one-shot ([[cdfQuantiles]])
    * and persisted-state ([[rollingQuantilesFromPartials]]) paths
    * cannot drift. Output: (groupCol, p, q_cents) ordered by
    * (groupCol, p).
    */
  private def cdfWalk(counts: DataFrame, groupCol: String,
                      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100] (got $percents)")
    val spark = counts.sparkSession
    import spark.implicits._
    val cum = counts
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("cent"))))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(col(groupCol))))
    val ps = percents.toDF("p").select(col("p").cast("long").as("p"))
    cum.join(broadcast(ps), col("cum") * lit(100L) >= col("p") * col("total"))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col("cent")).as("q_cents"))
      .orderBy(col(groupCol), col("p"))
  }

  /** Per-day quantized-count CDF partials of `valueCol` over rows of
    * one `event_type` — the persistable QUANTILE state, completing
    * the sketch-state family (KMV partials answer "how many
    * distinct", CMS cells "how often", these "what percentile").
    * Output (day, cent, n): at most |cent domain| rows per day
    * whatever the day's volume, and cell-wise ADDITIVE — unlike rank
    * positions, counts merge across days/batches by plain sum, so a
    * backfill never rescans events. One map-side-combinable shuffle.
    */
  def dailyCentCounts(events: DataFrame, eventType: String, valueCol: String): DataFrame =
    events
      .filter(col("event_type") === eventType && col(valueCol).isNotNull)
      .select(to_date(col("ts")).as("day"),
        expr(s"cast(floor($valueCol * 100.0D + 0.5D) as bigint)").as("cent"))
      // null-day contract (ApproxDistinct.dayHashes): null-ts rows are
      // dead state — persisted but unreachable by the rolling merge
      .filter(col("day").isNotNull)
      .groupBy(col("day"), col("cent"))
      .agg(count(lit(1)).as("n"))

  /** Persist a batch's per-day cent partials into the state table
    * (`append = true` for incremental daily ingest — new days or
    * late-data top-ups; the merge sums either way).
    */
  def persistDailyCents(events: DataFrame, eventType: String, valueCol: String,
                        path: String, append: Boolean = false): Unit =
    dailyCentCounts(events, eventType, valueCol).write
      .mode(if (append) "append" else "overwrite").parquet(path)

  /** Rolling-window percentiles per day from partials ONLY: cent-day s
    * feeds target days s .. s+windowDays-1, window cells sum, and the
    * CDF walk runs over the merged (day, cent) domain — all integer
    * arithmetic, bit-identical to a from-scratch compute on the
    * window's events. The join fans each partial row out windowDays
    * ways, but the partial table is days × |cent domain| rows — at
    * 100 TB this reads kilobytes where q41's exact percentile would
    * re-materialize every event value.
    * Output: (day, p, q_cents) ordered by (day, p).
    */
  def rollingQuantilesFromPartials(partials: DataFrame, windowDays: Int,
                                   percents: Seq[Int]): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1 (got $windowDays)")
    val days = partials.select(col("day")).distinct()
    val merged = partials.select(col("day").as("sday"), col("cent"), col("n"))
      .join(days,
        col("sday") <= col("day") &&
          col("sday") >= date_sub(col("day"), windowDays - 1))
      .groupBy(col("day"), col("cent"))
      .agg(sum(col("n")).as("n"))
    cdfWalk(merged, "day", percents)
  }

  /** Rolling percentiles from the persisted state ONLY — no events scan. */
  def rollingQuantilesFromState(spark: org.apache.spark.sql.SparkSession, path: String,
                                windowDays: Int, percents: Seq[Int]): DataFrame =
    rollingQuantilesFromPartials(spark.read.parquet(path), windowDays, percents)
}
