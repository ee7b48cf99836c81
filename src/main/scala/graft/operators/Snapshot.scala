package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change capture — diff two versions of a keyed table into
  * per-key row status (added / removed / changed / unchanged). The
  * incremental-processing primitive every lake pipeline needs: "what
  * changed since the last run" decides what re-enters dedup, index
  * append ([[Similarity.appendToIvfIndex]]/`appendToPqIndex`),
  * re-embedding, and re-scoring — without it every daily run re-pays
  * the full corpus.
  *
  * North-star extension (BASELINE.json): the reference re-pulls its
  * full daily window per run; at 100 TB the diff IS the workload.
  *
  * Scale shape: one full-outer equi-join on the key — the canonical
  * co-partitionable shuffle. Both sides reduce to (key, fingerprint)
  * before the join, so row width entering the shuffle is two strings
  * per side regardless of document size; with both snapshots written
  * bucketed by the key ([[graft.sources.Sinks.writeBucketed]]) the
  * join plans with zero exchanges. Fingerprint = md5 over the value
  * columns separated by  (engine-portable; DuckDB replays it
  * byte-identically). Caveat shared with any concat fingerprint:
  * concat_ws skips NULLs, so (NULL,"a") and ("a",NULL) collide —
  * fine for the non-null document columns this targets; pre-coalesce
  * explicitly if a nullable column must participate.
  *
  * Output: (key, status) for every key in either snapshot.
  */
object Snapshot {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keyCol: String, cols: Seq[String]): DataFrame =
    diffFp(oldSnap, newSnap, keyCol, cols).drop("oh", "nh")

  /** [[diff]] keeping both sides' fingerprints (`oh` old / `nh` new,
    * NULL on the absent side) in the output — for consumers that need
    * a CONTENT identity of the change set without re-scanning either
    * corpus (the daily loop derives its replay-proof run stamp from
    * exactly these rows; the fingerprints are already paid for by the
    * diff's own scan).
    */
  def diffFp(oldSnap: DataFrame, newSnap: DataFrame,
             keyCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one value column to fingerprint")
    def fp(df: DataFrame, as: String) = df.select(
      col(keyCol).as("k"),
      md5(concat_ws("", cols.map(col): _*)).as(as))
    fp(oldSnap, "oh").join(fp(newSnap, "nh"), Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") =!= col("nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("oh"), col("nh"))
  }

  /** The catalog/query form: only the rows a downstream incremental
    * run must touch (everything but `unchanged`), deterministically
    * ordered. The unchanged mass — the whole point at 100 TB — never
    * leaves the join.
    */
  def diffRows(oldSnap: DataFrame, newSnap: DataFrame,
               keyCol: String, cols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, keyCol, cols)
      .filter(col("status") =!= "unchanged")
      .orderBy(col("status"), col(keyCol))
}
