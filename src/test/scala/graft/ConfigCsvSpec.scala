package graft

import graft.sources.{Config, SpotifySchemas}
import org.scalatest.funsuite.AnyFunSuite

/** S6 config resolution (override → env → default, limit clamp) and
  * S7 declared-schema CSV source.
  */
class ConfigCsvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("config: override beats env beats default; limit clamps to [1,50]") {
    val env = Map("SPOTIFY_ARTIST_NAME" -> "EnvArtist", "SPOTIFY_FETCH_LIMIT" -> "500")
    val c = Config.resolve(Map("SPOTIFY_MARKET" -> "DE"), env)
    assert(c.market == "DE")              // override wins
    assert(c.artistName == "EnvArtist")   // env wins over default
    assert(c.outputPath == "spotify_tracks.csv") // default
    assert(c.fetchLimit == 50)            // clamped down
    assert(Config.resolve(Map("SPOTIFY_FETCH_LIMIT" -> "0"), Map.empty).fetchLimit == 1)
  }

  test("songs CSV source: declared schema, no inference") {
    val path = getClass.getResource("/songs_sample.csv").getPath
    val df = SpotifySchemas.readSongsCsv(spark, path)
    assert(df.schema == SpotifySchemas.songsCsv)
    assert(df.count() == 3)
    assert(df.filter(df("artist_name") === "Alpha Band").count() == 2)
  }
}
