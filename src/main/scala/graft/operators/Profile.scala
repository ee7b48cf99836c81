package graft.operators

import org.apache.spark.sql.DataFrame
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
    val aggs = cols.flatMap { c => Seq(
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_val, max_val)")
      .orderBy(col("column_name"))
  }
}
