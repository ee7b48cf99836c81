package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-run XCom summary records of the three reference pipelines
  * (SURVEY.md K4), each as a single-row aggregate DataFrame — collected
  * once at the driver and emitted as JSON for the orchestrator.
  *
  * Rounding parity (SURVEY.md §7.5.1): the reference rounds
  * `avg_popularity` with Python `round`, which is banker's
  * (half-even) rounding — Spark's `bround`, not `round`.
  */
object RunSummaries {

  /** EP1 (spotify_etl.py:275-281): tracks_processed + avg_popularity. */
  def topTracksSummary(flat: DataFrame): DataFrame =
    flat.agg(
      count(lit(1)).as("tracks_processed"),
      avg(col("popularity")).as("avg_popularity"))

  /** EP2 (spotify_etl2.py:271-278): count, distinct artists,
    * "min to max" date-range string over the sliced `timestamp` column.
    */
  def recentlyPlayedSummary(flat: DataFrame): DataFrame =
    flat.agg(
      count(lit(1)).as("tracks_processed"),
      countDistinct(col("artist_name")).as("unique_artists"),
      concat_ws(" to ", min(col("timestamp")), max(col("timestamp"))).as("date_range"))

  /** EP3 (new.py:250-263): count, distinct artists, half-even-rounded
    * mean popularity, explicit count.
    */
  def analysisSummary(flat: DataFrame): DataFrame =
    flat.agg(
      count(lit(1)).as("tracks_processed"),
      countDistinct(col("artist_name")).as("unique_artists"),
      bround(avg(col("popularity")), 2).as("average_popularity"),
      sum(when(col("explicit"), 1L).otherwise(0L)).as("explicit_tracks"))
}
