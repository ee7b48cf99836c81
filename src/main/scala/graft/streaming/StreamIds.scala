package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-derived micro-batch identities for the streaming ingest
  * fronts. foreachBatch's positional batch id is CHECKPOINT-LOCAL
  * (every fresh checkpoint restarts at 0), so any replay guard or
  * exactly-once sink keyed on the position confuses "same position"
  * with "same content" the moment a state path outlives its checkpoint
  * or serves a second feed. These digests identify the batch by its
  * ROWS — the same order-independent two-lane hash
  * [[graft.Pipelines.dailyIncremental]] uses for its derived run
  * identity: same rows → same id (replays skip), different rows →
  * different id (second feeds append) — regardless of which checkpoint
  * delivered them. One tiny agg job per micro-batch.
  */
object StreamIds {

  /** Two independent hash lanes summed over the given row-fingerprint
    * columns, plus the row count. Order-free (sums), so stable across
    * shuffle layouts and arrival orders of the same rows.
    */
  def contentBid(batch: DataFrame, fpCols: Seq[Column]): String = {
    def lane(seed: String) = coalesce(sum(graft.functions.PortableHash.hash32(
      concat_ws(" ", (lit(seed) +: fpCols): _*))), lit(0L))
    val r = batch.agg(lane("l1"), lane("l2"), count(lit(1))).head()
    f"${r.getLong(0)}%x-${r.getLong(1)}%x-${r.getLong(2)}%x"
  }

  /** Digest of a documents micro-batch: (doc_id, source, text). */
  def docBid(batch: DataFrame): String =
    contentBid(batch, Seq(col("doc_id").cast("string"),
      coalesce(col("source").cast("string"), lit("")),
      md5(coalesce(col("text"), lit("")))))

  /** Digest of an embeddings micro-batch: (vec_id, vector bytes via
    * the canonical array string form — the same fingerprint the daily
    * turn's embedding diff uses). */
  def embBid(batch: DataFrame): String =
    contentBid(batch, Seq(col("vec_id").cast("string"),
      md5(coalesce(col("embedding").cast("string"), lit("")))))
}
