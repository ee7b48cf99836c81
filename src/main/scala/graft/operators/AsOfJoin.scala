package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, the most recent
  * right row with the same key and `right.ts <= left.ts`.
  *
  * North-star extension (BASELINE.json): no counterpart exists in the
  * reference; semantics are defined by this engine and pinned by the
  * DuckDB oracle + ScalaTest.
  *
  * Spark has no AsOf join operator; the naive encodings are a theta
  * join (`r.ts <= l.ts`, which plans as a nested-loop/range join and
  * explodes at scale) or a per-left-row correlated subquery. This
  * implementation uses neither: both sides are UNIONed into one
  * stream, shuffled ONCE by key, and each partition is swept in
  * (ts, side) order carrying the last-seen right row forward with a
  * running `last(_, ignoreNulls)` window — O(n log n) for the
  * per-key sort, no join node at all, no candidate blowup. The same
  * single-shuffle sweep holds at 100 TB: cost is one exchange of
  * (key, ts, payload) plus a linear pass, independent of how many
  * right rows precede each left row.
  *
  * Tie policy: a right row at exactly `left.ts` matches (<=); among
  * right rows sharing (key, ts) the one with the largest `idCol`
  * wins — both pinned by the sort order (ts, side, id) and mirrored
  * in the oracle.
  */
object AsOfJoin {

  /** @param left     rows to enrich; must have `keyCol`, `tsCol`, `idCol`
    * @param right    rows providing the as-of value: `keyCol`, `tsCol`,
    *                 `idCol`, `valueCol`
    * @return left rows + (asof_ts, asof_value), null when no right row
    *         precedes. Column order: keyCol, tsCol, idCol, left extras,
    *         asof_ts, asof_value.
    */
  def asOf(left: DataFrame, right: DataFrame,
           keyCol: String, tsCol: String, idCol: String, valueCol: String): DataFrame = {
    val leftExtras = left.columns.filterNot(Set(keyCol, tsCol, idCol)).toSeq
    val l = left.select(
      col(keyCol), col(tsCol), lit(1).as("_side"), col(idCol),
      struct(leftExtras.map(col): _*).as("_lpay"),
      lit(null).cast(right.schema(tsCol).dataType).as("_rts"),
      lit(null).cast(right.schema(valueCol).dataType).as("_rval"))
    val r = right.select(
      col(keyCol), col(tsCol), lit(0).as("_side"), col(idCol),
      lit(null).cast(l.schema("_lpay").dataType).as("_lpay"),
      col(tsCol).as("_rts"), col(valueCol).as("_rval"))
    // right rows sort before left rows at equal ts (side 0 < 1), so a
    // same-instant right row is visible to the left row's running last()
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l.unionByName(r)
      .withColumn("_asof", last(
        when(col("_side") === 0, struct(col("_rts").as("ts"), col("_rval").as("v"))),
        ignoreNulls = true).over(w))
    swept.filter(col("_side") === 1)
      .select(
        Seq(col(keyCol), col(tsCol), col(idCol)) ++
          leftExtras.map(c => col("_lpay").getField(c).as(c)) ++
          Seq(col("_asof.ts").as("asof_ts"), col("_asof.v").as("asof_value")): _*)
  }
}
