package graft

import java.nio.file.{Files, Paths}

import graft.operators.{SpotifyFlatten, SpotifySearch}
import graft.sources.SpotifySchemas
import graft.sources.spotify.FixturePageFetcher
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 connector (S1-S3 as a first-class batch source):
  * one InputPartition per API request, pluggable fetcher, raw pages
  * out, declared-schema parse downstream.
  */
class SpotifyApiSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixtureDir = {
    val dir = Files.createTempDirectory("spotify_fixtures").toString
    Files.createDirectories(Paths.get(dir, "search"))
    Files.createDirectories(Paths.get(dir, "top-tracks"))
    Files.write(Paths.get(dir, "search", "madonna.jsonl"),
      """{"artists":{"items":[{"id":"a1","name":"Madonna"}]}}""".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "search", "cher.jsonl"),
      """{"artists":{"items":[{"id":"a2","name":"Cher"}]}}""".getBytes("UTF-8"))
    // two pages for one artist: pagination = multiple lines
    Files.write(Paths.get(dir, "top-tracks", "a1.jsonl"),
      ("""{"tracks":[{"id":"t1","name":"Song1","popularity":90,"duration_ms":200000,"explicit":false,"artists":[{"id":"a1","name":"Madonna"}],"album":{"id":"al1","name":"Alb","release_date":"2001-01-01"}}]}""" +
        "\n" +
        """{"tracks":[{"id":"t2","name":"Song2","popularity":70,"duration_ms":180000,"explicit":true,"artists":[{"id":"a1","name":"Madonna"}],"album":{"id":"al2","name":"Alb2","release_date":"2002-02-02"}}]}""")
        .getBytes("UTF-8"))
    dir
  }

  private def read(endpoint: String, requests: String): DataFrame =
    spark.read.format("spotify-api")
      .option("endpoint", endpoint)
      .option("requests", requests)
      .option("fetcher", classOf[FixturePageFetcher].getName)
      .option("fixtureDir", fixtureDir)
      .load()

  test("short name resolves via DataSourceRegister and schema is the declared raw-page shape") {
    val df = read("search", "madonna")
    assert(df.columns.toSeq == Seq("endpoint", "request", "page", "payload"))
  }

  test("one input partition per request — the API fan-out unit") {
    val df = read("search", "madonna,cher,nobody")
    assert(df.rdd.getNumPartitions == 3)
    // missing fixture = API miss = zero pages, not an error
    assert(df.count() == 2)
    assert(df.filter($"request" === "nobody").count() == 0)
  }

  test("pagination: each payload line is one page row with its index") {
    val pages = read("top-tracks", "a1").orderBy($"page")
      .select($"page", $"payload").as[(Int, String)].collect()
    assert(pages.map(_._1).toSeq == Seq(0, 1))
    assert(pages(0)._2.contains("\"t1\"") && pages(1)._2.contains("\"t2\""))
  }

  test("end-to-end: connector pages -> declared-schema parse -> existing flatten/search operators") {
    val matched = SpotifySearch.firstArtistMatch(
      SpotifySchemas.parse(read("search", "madonna,cher").select($"payload").as[String],
        SpotifySchemas.artistSearchPayload))
    assert(matched.orderBy($"artist_id").as[(String, String)].collect().toSeq ==
      Seq(("a1", "Madonna"), ("a2", "Cher")))

    val tracks = SpotifyFlatten.topTracks(
      SpotifySchemas.parse(read("top-tracks", "a1").select($"payload").as[String],
        SpotifySchemas.topTracksPayload))
    assert(tracks.count() == 2)
    assert(tracks.select("track_id").as[String].collect().toSet == Set("t1", "t2"))
  }

  test("request filter pushes down: whole API-call partitions are pruned before any fetch") {
    val base = read("search", "madonna,cher,nobody")
    val filtered = base.filter($"request" === "madonna")
    assert(filtered.rdd.getNumPartitions == 1,
      s"expected 1 pruned partition, got ${filtered.rdd.getNumPartitions}")
    assert(filtered.count() == 1)
    val inFiltered = base.filter($"request".isin("madonna", "cher"))
    assert(inFiltered.rdd.getNumPartitions == 2)
    assert(inFiltered.count() == 2)
    // the pruning surfaces in the scan description and results stay correct
    assert(filtered.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .contains("PushedRequests: [madonna]"))
    assert(filtered.select($"request").as[String].collect().toSeq == Seq("madonna"))
  }

  test("microbatch stream: cursors drain in per-batch slices and equal the batch read") {
    val ckpt = Files.createTempDirectory("spotify_stream_ckpt").toString
    val streamed = spark.readStream.format("spotify-api")
      .option("endpoint", "search")
      .option("requests", "madonna,cher,nobody")
      .option("maxRequestsPerBatch", "1")
      .option("fetcher", classOf[FixturePageFetcher].getName)
      .option("fixtureDir", fixtureDir)
      .load()
    val q = streamed.writeStream.format("memory").queryName("spotify_mb")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("spotify_mb")
    // one cursor per micro-batch: 3 cursors -> 3 batches committed
    assert(q.recentProgress.count(_.numInputRows >= 0) >= 3,
      s"expected >=3 micro-batches, saw ${q.recentProgress.length}")
    assert(got.exceptAll(read("search", "madonna,cher,nobody")).isEmpty &&
      read("search", "madonna,cher,nobody").exceptAll(got).isEmpty)
  }

  test("microbatch stream: restart from the checkpoint re-pulls nothing (exactly-once cursor)") {
    val ckpt = Files.createTempDirectory("spotify_stream_ckpt2").toString
    val out = Files.createTempDirectory("spotify_stream_out").toString + "/t"
    def run(): Long = {
      val q = spark.readStream.format("spotify-api")
        .option("endpoint", "search")
        .option("requests", "madonna,cher")
        .option("fetcher", classOf[FixturePageFetcher].getName)
        .option("fixtureDir", fixtureDir)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(run() == 2L) // first run ingests both cursors
    // second run resumes at the committed offset: nothing re-pulled,
    // the sink still holds exactly the first run's rows
    assert(run() == 2L)
  }

  test("unparseable page yields a NULL struct for the P5 malformed-payload rule, not an exception") {
    Files.write(Paths.get(fixtureDir, "search", "broken.jsonl"),
      "this is not json".getBytes("UTF-8"))
    val parsed = SpotifySchemas.parse(
      read("search", "broken").select($"payload").as[String],
      SpotifySchemas.artistSearchPayload)
    assert(parsed.count() == 1 && parsed.filter(col("artists").isNull).count() == 1)
  }
}
