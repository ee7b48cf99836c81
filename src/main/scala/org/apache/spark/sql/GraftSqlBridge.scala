package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface — the standard shim any
  * Spark extension library ships so it can materialize a DataFrame
  * from a custom LogicalPlan node (Dataset.ofRows is package-private).
  * Nothing else from the internal API is exposed.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression (Column wraps a ColumnNode since
    * 4.0). Eagerly converted — NOT the lazy ColumnNodeExpression shim,
    * which custom plan nodes can't serialize — so attributes come back
    * as UnresolvedAttribute and the caller binds them to its child.
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Unload every cached streaming state-store provider and stop the
    * shared maintenance task (both re-initialize lazily on the next
    * stateful stream). Every drained stream leaves its providers in
    * the executor-side cache — numPartitions × stateful-operators per
    * run — and the periodic maintenance task then snapshots/lists ALL
    * of them every interval, forever: across a many-query session the
    * accumulated maintenance storm degrades later stateful queries
    * ~2× (measured round 19: q191 8.4 → 9.8 → 16.7 s across three
    * back-to-back runs in one JVM; flat after this call). Harness
    * use (Bench/BenchOne between samples) — never inside a query.
    */
  def unloadStreamingState(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()

  /** THIS app's Spark scratch directories: the block-manager local
    * dirs (`blockmgr-*` — shuffle files, disk-spilled blocks) plus
    * the driver's own `spark-*` temp root when set. The bench's disk
    * gauge walks exactly these instead of prefix-globbing every
    * `spark-*`/`blockmgr-*` under the SHARED java.io.tmpdir, where a
    * co-tenant process's Spark scratch would be misattributed to this
    * sweep (driver ADVICE r19). Empty when no SparkEnv is live.
    */
  def sparkLocalDirs(): Seq[String] = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) Seq.empty
    else env.blockManager.diskBlockManager.localDirs
      .map(_.getAbsolutePath).toSeq ++ env.driverTmpDir
  }
}
