package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert (SCD-1 / latest-record-wins) merge — the warehouse
  * maintenance primitive behind incremental table builds: fold an
  * updates slice into a base table so each key keeps exactly its most
  * recent row.
  *
  * North-star extension (BASELINE.json): no counterpart exists in the
  * reference; semantics are defined by this engine and pinned by the
  * DuckDB oracle + ScalaTest.
  */
object Merge {

  /** One surviving row per key from base ∪ updates: highest
    * `versionCol` wins; on a version tie the updates side wins; any
    * remaining tie breaks on the highest `idCol` (total order, so the
    * result is deterministic under any partitioning).
    *
    * Scale shape: one union (no shuffle) into one per-key window —
    * a single hash shuffle on the merge key, the minimum any merge
    * needs. At 100 TB the base side would be a partitioned table and
    * the updates slice orders of magnitude smaller; the same plan
    * then benefits from AQE coalescing the mostly-empty partitions.
    * Output: base/updates columns + src ("base"/"update"), one row
    * per key.
    */
  def latestWins(base: DataFrame, updates: DataFrame,
                 keyCol: String, versionCol: String, idCol: String): DataFrame = {
    // "src" is part of the OUTPUT contract, so an input column of that
    // name would be silently clobbered by withColumn — refuse loudly
    // rather than corrupt the caller's data
    require(!base.columns.contains("src") && !updates.columns.contains("src"),
      "latestWins adds a 'src' provenance column; rename the inputs' existing 'src' first")
    val rn = "__graft_rn"
    val all = base.withColumn("src", lit("base"))
      .unionByName(updates.withColumn("src", lit("update")))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, (col("src") === "update").desc, col(idCol).desc)
    all.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
