package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Count-Min frequency sketch — the mergeable heavy-hitters tier of
  * the sketch family (KMV/HLL count distincts; CMS counts frequency).
  *
  * North-star extension (BASELINE.json): no counterpart in the
  * reference; a 100 TB training-data pipeline needs "which keys
  * dominate this corpus" (hot users, duplicate URLs, boilerplate
  * shingles) without a corpus-wide exact groupBy per question.
  *
  * Why CMS and not Misra-Gries/SpaceSaving: CMS cells are plain sums,
  * so the sketch is ORDER-INDEPENDENT and merge is element-wise `+` —
  * the estimate is a pure function of the data multiset, identical
  * under any partitioning, task retry, or merge order. That makes it
  * the only classical frequency sketch whose output the DuckDB oracle
  * can replay bit-for-bit (MG/SpaceSaving results depend on stream
  * order, which a distributed engine does not guarantee).
  *
  * Scale shape: building the sketch is ONE map-side-combinable
  * shuffle whose reduced size is ≤ depth·width cells regardless of
  * corpus size (depth·width·8 B ≈ 16 KiB at the defaults) — the cells
  * are the persistable per-day partial ([[cmsDailyCells]]), and
  * [[cmsMerge]] unions any span of days without rescanning history,
  * exactly like the KMV tier (`ApproxDistinct.kmvDaily`). Point
  * estimates then cost a lookup join against the ≤16 KiB cell table,
  * never a second corpus scan.
  *
  * Guarantee (no deletions): estimate ≥ true count always, and
  * P[err > e·N/width] ≤ exp(-depth) over the hash draw — with our
  * fixed portable hashes the one-sided bound (overcount ≥ 0) is
  * structural and asserted in tests together with merge-equality.
  */
object FreqSketch {

  /** Deterministic pairwise-independent-style row hashes: bucket_j(h)
    * = ((a_j·h + b_j) mod P) mod width, with (a_j, b_j) from the same
    * fixed family as the MinHash permutations. h < 2³², a_j ≤ 2·d+1 —
    * products stay far below 2⁶³, so the modular chain is exact i64
    * in both engines.
    */
  private def bucketCols(h: Column, depth: Int, width: Int): Column =
    array(PortableHash.minhashParams(depth).map { case (j, a, b) =>
      struct(lit(j).as("j"),
        (((lit(a) * h + lit(b)) % lit(PortableHash.P)) % lit(width.toLong)).as("bucket"))
    }: _*)

  /** Per-day CMS cells of a key column: the persistable partial.
    * Output: (day, j, bucket, c) — at most depth·width rows per day
    * after the map-side-combined groupBy, whatever the day's volume.
    */
  def cmsDailyCells(events: DataFrame, keyCol: String,
                    depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1, s"depth must be >= 1 (got $depth)")
    require(width >= 2, s"width must be >= 2 (got $width)")
    events
      .select(to_date(col("ts")).as("day"),
        PortableHash.hash32(col(keyCol).cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .select(col("day"), explode(bucketCols(col("h"), depth, width)).as("jb"))
      .groupBy(col("day"), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge daily cells into one sketch — element-wise sum, no rescan. */
  def cmsMerge(daily: DataFrame): DataFrame =
    daily.groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))

  /** Heavy hitters with sketch-estimated counts: the topN exact keys
    * (count desc, key asc — the exact side is the verification
    * contract the oracle checks; production reads only the sketch)
    * joined against the MERGED daily cells, estimate = min over the
    * depth row-hash cells. Output: (key, exact_cnt, cms_est,
    * overcount) ordered by (exact_cnt desc, key); overcount ≥ 0 by
    * construction.
    */
  def cmsHeavyHitters(events: DataFrame, keyCol: String,
                      depth: Int = 4, width: Int = 512,
                      topN: Int = 20): DataFrame =
    heavyHittersFromCells(events,
      cmsMerge(cmsDailyCells(events, keyCol, depth, width)),
      keyCol, depth, width, topN)

  /** [[cmsHeavyHitters]] against an externally-built merged cell table
    * — the read side shared by the one-shot batch form, the persisted
    * daily partials, and the streaming-maintained state
    * ([[graft.streaming.CmsStream]]): however the ≤ depth·width cells
    * were accumulated, the estimate join below is identical.
    */
  def heavyHittersFromCells(events: DataFrame, cells: DataFrame, keyCol: String,
                            depth: Int, width: Int, topN: Int): DataFrame = {
    val exactTop = events
      .select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("key"))
      .limit(topN)
    val probes = exactTop
      .select(col("key"), col("exact_cnt"),
        explode(bucketCols(PortableHash.hash32(col("key")), depth, width)).as("jb"))
      .select(col("key"), col("exact_cnt"),
        col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    probes
      // cells is ≤ depth·width rows — broadcast it; the probe side is
      // topN·depth rows, so this join never shuffles anything
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("key"), col("exact_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("key"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("key"))
  }
}
