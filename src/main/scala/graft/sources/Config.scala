package graft.sources

/** S6 — the reference's config scan (`Variable.get` with env fallback
  * and defaults, spotify_etl.py:13-43, spotify_etl2.py:16-39,
  * new.py:10-48) as a typed case class resolved once at driver start:
  * no plan node, no per-row cost, and misconfiguration fails the job
  * before any cluster work is scheduled.
  *
  * Resolution order mirrors the reference: explicit override map
  * (the Airflow-Variable analog) → environment → default.
  */
object Config {

  final case class SpotifyConfig(
      clientId: String,
      clientSecret: String,
      artistName: String,
      outputPath: String,
      market: String,
      fetchLimit: Int)

  def resolve(
      overrides: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env): SpotifyConfig = {
    def get(key: String, default: String): String =
      overrides.getOrElse(key, env.getOrElse(key, default))
    SpotifyConfig(
      clientId = get("SPOTIFY_CLIENT_ID", ""),
      clientSecret = get("SPOTIFY_CLIENT_SECRET", ""),
      artistName = get("SPOTIFY_ARTIST_NAME", "The Beatles"),
      outputPath = get("SPOTIFY_OUTPUT_PATH", "spotify_tracks.csv"),
      market = get("SPOTIFY_MARKET", "US"),
      // reference clamps the API limit into [1, 50] (new.py:97)
      fetchLimit = math.min(math.max(get("SPOTIFY_FETCH_LIMIT", "50").toInt, 1), 50))
  }
}
