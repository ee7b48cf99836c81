package graft

import graft.operators.{RunSummaries, SpotifyFlatten, Validation}
import graft.sources.{Sinks, SpotifySchemas}
import org.apache.spark.sql.{Dataset, SparkSession}

/** The reference's three pipeline entry points (SURVEY.md §3), composed
  * from the operator modules. Each takes already-fetched payload JSON
  * (the HTTP fetch is a driver-side connector concern, SURVEY.md S1)
  * and returns the run-summary JSON the orchestrator captures —
  * the XCom analog.
  */
object Pipelines {

  /** EP1 — artist top-tracks: flatten → CSV sink → summary
    * (spotify_etl.py:197-291). Raises if no valid track rows, like the
    * reference ("No valid track data processed").
    */
  def topTracksEtl(spark: SparkSession, payloads: Dataset[String], csvPath: String): String = {
    val flat = SpotifyFlatten.topTracks(
      SpotifySchemas.parse(payloads, SpotifySchemas.topTracksPayload))
    flat.cache()
    try {
      if (flat.isEmpty) throw new RuntimeException("No valid track data processed")
      Sinks.csv(flat, csvPath)
      Sinks.xcomJson(RunSummaries.topTracksSummary(flat))
    } finally flat.unpersist()
  }

  /** EP2 — recently-played ingest: flatten → validate → partitioned
    * append → summary (spotify_etl2.py:231-288). Validation order
    * preserved: failures fire BEFORE the sink. Empty input
    * short-circuits with a no-op summary, as the reference does.
    */
  def recentlyPlayedEtl(
      spark: SparkSession,
      payloads: Dataset[String],
      tablePath: String,
      asOf: java.sql.Date): String = {
    val flat = SpotifyFlatten.recentlyPlayed(
      SpotifySchemas.parse(payloads, SpotifySchemas.recentlyPlayedPayload))
    flat.cache()
    try {
      val report = Validation.check(flat, asOf) // raises on duplicate PK
      if (!report.valid) return """{"tracks_processed":0,"status":"no_data"}"""
      Sinks.appendPartitioned(flat, tablePath)
      Sinks.xcomJson(RunSummaries.recentlyPlayedSummary(flat))
    } finally flat.unpersist()
  }

  /** EP3 — recently-played analysis: ranked flatten → display + CSV +
    * summary, one cached frame feeding all three consumers
    * (new.py:211-267; the cache mirrors the single pandas frame).
    */
  def recentlyPlayedAnalysis(spark: SparkSession, payloads: Dataset[String], csvPath: String): String = {
    val ranked = SpotifyFlatten.rankedRecentlyPlayed(
      SpotifySchemas.parse(payloads, SpotifySchemas.recentlyPlayedPayload))
    ranked.cache()
    try {
      Sinks.display(ranked)
      Sinks.csv(ranked, csvPath)
      Sinks.xcomJson(RunSummaries.analysisSummary(ranked))
    } finally ranked.unpersist()
  }
}
