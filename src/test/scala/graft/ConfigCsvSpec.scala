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

  test("text-log source parses matching lines and quarantines the rest") {
    import graft.sources.TextLog
    val dir = java.nio.file.Files.createTempDirectory("graft-log")
    java.nio.file.Files.writeString(dir.resolve("a.log"),
      """2026-01-02T03:04:05 ERROR disk full
        |2026-01-02T03:04:06 INFO started worker 7
        |this line is garbage
        |2026-01-02T03:04:07 WARN retrying
        |""".stripMargin)
    val parsed = TextLog.read(spark, dir.toString)
    assert(parsed.count() == 3)
    assert(parsed.columns.toSeq == Seq("ts", "level", "message"))
    val byLevel = parsed.groupBy("level").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLevel == Map("ERROR" -> 1L, "INFO" -> 1L, "WARN" -> 1L))
    assert(parsed.filter(parsed("ts").isNull).count() == 0)
    val report = TextLog.parseReport(spark, dir.toString).collect().head
    assert((report.getLong(0), report.getLong(1), report.getLong(2)) == ((4L, 3L, 1L)))
  }
}
