package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate pair graph (or any
  * undirected edge list with doc_a/doc_b columns).
  *
  * North-star extension (BASELINE.json): no counterpart exists in the
  * reference; semantics are defined by this engine and pinned by the
  * DuckDB oracle + ScalaTest. Complements
  * [[Dedup.duplicateClusters]] (connectivity) with a centrality view:
  * which documents sit at the center of big duplication webs.
  */
object Graph {

  /** PageRank after `iters` power iterations (damping 0.85) over the
    * undirected pair graph, in FIXED-POINT arithmetic: ranks are
    * parts-per-1e9 integers, per-edge contributions are exact integer
    * division (`rq div deg`), and the damping step is
    * `(sum·85 + 50) div 100` — every intermediate is a BIGINT, so the
    * result is bit-identical under any partitioning and in the DuckDB
    * oracle (float PageRank sums in shuffle order and never is).
    *
    * Scale shape per iteration: one equi-join of the edge list with
    * the (node, deg, rank) state plus one map-side-combinable
    * groupBy(dst) sum — the textbook distributed PageRank step, no
    * driver-side graph, no windows. Every node of the pair graph has
    * degree >= 1 by construction, so there is no dangling-mass term.
    * Output: (doc_id, rank) ordered by doc_id; rank = fixed-point/1e9.
    */
  def pageRank(pairs: DataFrame, iters: Int): DataFrame = {
    // materialize the edge list ONCE: every iteration references it
    // (and deg derives from it), and without truncation the upstream
    // pair-generation DAG would replay per reference per round —
    // measured 5× the probe cost before this localCheckpoint
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // the edges⋈deg half of the iteration step is loop-INVARIANT —
    // join it once and checkpoint, so each round pays only the join
    // against the evolving rank state
    val edgeDeg = edges.join(deg, Seq("src")).localCheckpoint()
    var rank = deg.select(col("src"), lit(1000000000L).as("rq"))
    for (_ <- 1 to iters) {
      val next = edgeDeg
        .join(rank, Seq("src"))
        .select(col("dst"), expr("rq div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        // damping via the exact split (a·85+50) div 100 ==
        // (a div 100)·85 + ((a mod 100)·85 + 50) div 100 — identical
        // in value for a >= 0, but overflow-free: the naive sc·85
        // wraps i64 once a hub's incoming mass passes ~1.08e17
        // (a ~1e8-member star at full rank), which non-ANSI Long
        // arithmetic would turn into silent garbage ranks
        .select(col("dst").as("src"),
          (lit(150000000L) +
            expr("(sc div 100) * 85 + ((sc % 100) * 85 + 50) div 100")).as("rq"))
        .localCheckpoint()
      Dedup.releaseCheckpoint(rank)
      rank = next
    }
    rank.select(col("src").as("doc_id"),
        (col("rq").cast("double") / 1e9).as("rank"))
      .orderBy(col("doc_id"))
  }
}
