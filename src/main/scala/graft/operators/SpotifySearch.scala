package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two lookup-shaped scans of the EP1 pipeline (SURVEY.md S2/S3),
  * as plan fragments over parsed payloads.
  */
object SpotifySearch {

  /** S2 — artist search: first hit of the search payload's
    * `artists.items` (spotify_etl.py:117-121: `items[0]` after a
    * `limit=1` request). Output: (artist_id, artist_name), ≤1 row per
    * payload row.
    */
  def firstArtistMatch(searchPayload: DataFrame): DataFrame =
    searchPayload
      .filter(col("artists.items").isNotNull && size(col("artists.items")) > 0)
      .select(
        element_at(col("artists.items"), 1).getField("id").as("artist_id"),
        element_at(col("artists.items"), 1).getField("name").as("artist_name"))

  /** S3 — semantic equivalent of the top-tracks endpoint on local data:
    * top `k` tracks by popularity PER artist (the server computes this
    * for one artist; grouped it is the scale form). Deterministic
    * tie-break on track_id.
    */
  def topTracksPerArtist(tracks: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("artist_name"))
      .orderBy(col("popularity").desc, col("track_id"))
    tracks
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
      .drop("pos")
  }

  /** The EP1 FK chain (SURVEY.md §2.4): artist-search result keyed into
    * the tracks table — a broadcast equi-join, the lookup the reference
    * performs as two sequential HTTP calls.
    */
  def tracksForMatchedArtists(tracks: DataFrame, matchedArtists: DataFrame): DataFrame =
    tracks.join(broadcast(matchedArtists), Seq("artist_name"), "inner")
}
