package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types._

/** Declared StructTypes for the three Spotify Web API payload shapes the
  * reference consumes (shape evidence: FIXTURES.md §1-§3; field accesses
  * at spotify_etl.py:238-252, spotify_etl2.py:155-177, new.py:107-127).
  *
  * Schemas are always declared, never inferred (SURVEY.md §1.3): at
  * 100 TB an inference pass is a full extra scan, and drifting source
  * fields must surface as NULLs handled by the default rules — not as
  * silent schema changes.
  */
object SpotifySchemas {

  private val artist = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType)))

  private val album = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("release_date", StringType)))

  private val externalUrls = StructType(Seq(
    StructField("spotify", StringType)))

  /** One track object (top-tracks entries and recently-played `track`). */
  val track: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("popularity", IntegerType),
    StructField("duration_ms", LongType),
    StructField("explicit", BooleanType),
    StructField("preview_url", StringType),
    StructField("external_urls", externalUrls),
    StructField("album", album),
    StructField("artists", ArrayType(artist))))

  /** GET /v1/artists/{id}/top-tracks response (spotify_etl.py:152-153). */
  val topTracksPayload: StructType = StructType(Seq(
    StructField("tracks", ArrayType(track))))

  /** GET /v1/search?type=artist response (spotify_etl.py:115-121). */
  val artistSearchPayload: StructType = StructType(Seq(
    StructField("artists", StructType(Seq(
      StructField("items", ArrayType(artist)))))))

  /** GET /v1/me/player/recently-played response (spotify_etl2.py:122,155). */
  val recentlyPlayedPayload: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("played_at", StringType),
      StructField("track", track)))))))

  /** Parse a dataset of raw JSON payload strings against `schema`.
    * PERMISSIVE semantics: an unparseable payload yields a NULL struct,
    * which downstream flattens drop — the whole-payload analog of the
    * reference's try/except-continue (SURVEY.md P5).
    */
  def parse(raw: Dataset[String], schema: StructType): DataFrame =
    raw.toDF("json").select(from_json(col("json"), schema).as("p")).select("p.*")

  /** Read a JSON-lines file of payloads with the declared schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S7 — the checked-in sample CSV table. The reference's sample uses
    * the older 4-column variant (`duration`, not `duration_ms` —
    * a documented drift, FIXTURES.md §4); schema declared, never
    * inferred.
    */
  val songsCsv: StructType = StructType(Seq(
    StructField("artist_name", StringType),
    StructField("song_name", StringType),
    StructField("popularity", IntegerType),
    StructField("duration", StringType)))

  def readSongsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(songsCsv).csv(path)
}
