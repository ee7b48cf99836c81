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

  /** EP4 (extension) — the near-dup pair table as a SHARED lake
    * artifact. The q64/q74/q124/q127 catalog queries each re-derive
    * the same df-capped Jaccard pairs because catalog queries are
    * deliberately self-contained; a real pipeline computes the pair
    * table ONCE (the expensive half: shingle, cap, bucket-join,
    * verify), persists it, and fans the cheap consumers out from the
    * parquet artifact — clustering (both CC variants), representative
    * selection, and the leakage-free split. At 100 TB the pair table
    * is also the INCREMENTAL unit: a new ingest batch appends its
    * pairs (see Dedup.incrementalMinhashEstimated) instead of
    * re-pairing the corpus. Amortization is measured in ScaleProbe's
    * `neardup_family` probe (shared vs 4x standalone).
    *
    * Parameters mirror the catalog defaults (n=3 shingles, J>=0.5,
    * df cap 20). Returns the four consumer frames keyed by name.
    */
  def nearDupFamily(spark: SparkSession,
                    docs: org.apache.spark.sql.DataFrame, pairsPath: String,
                    n: Int = 3, minJ: Double = 0.5, maxDf: Int = 20,
                    trainPct: Int = 80): Map[String, org.apache.spark.sql.DataFrame] = {
    graft.operators.Dedup.jaccardPairsCapped(docs, n, minJ, maxDf)
      .write.mode("overwrite").parquet(pairsPath)
    val pairs = spark.read.parquet(pairsPath)
    Map(
      "clusters" -> graft.operators.Dedup.duplicateClusters(pairs),
      "clusters_star" -> graft.operators.Dedup.duplicateClustersStar(pairs),
      "keep_best" -> graft.operators.Dedup.keepBestPerCluster(docs, pairs, "n_chars"),
      "leakfree_split" -> graft.operators.Sampling.leakFreeSplit(docs, pairs, trainPct))
  }
}
