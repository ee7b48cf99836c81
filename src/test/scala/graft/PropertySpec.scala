package graft

import graft.operators.{Dedup, SpotifyFlatten}
import graft.sources.SpotifySchemas
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws (SURVEY.md §5.2.3): the flatten is total under
  * arbitrary missing/null fields (defaults law), the portable hash is
  * stable and bounded, jaccard stays in [0,1], and exact dedup is
  * idempotent. Generators are sampled with fixed seeds so failures
  * reproduce.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val fieldGens: Gen[Map[String, String]] = {
    val entries: Seq[(String, Gen[String])] = Seq(
      "id" -> Gen.alphaNumStr.map(s => s""""$s""""),
      "name" -> Gen.oneOf(Gen.const("null"), Gen.alphaNumStr.map(s => s""""$s"""")),
      "popularity" -> Gen.chooseNum(0, 100).map(_.toString),
      "duration_ms" -> Gen.chooseNum(0L, 600000L).map(_.toString),
      "explicit" -> Gen.oneOf("true", "false", "null"),
      "preview_url" -> Gen.const("\"http://p\""))
    entries.foldLeft(Gen.const(Map.empty[String, String])) { case (acc, (k, g)) =>
      for { m <- acc; ov <- Gen.option(g) } yield ov.fold(m)(v => m + (k -> v))
    }
  }

  test("flatten is total for any subset of present/null track fields; defaults hold") {
    for (seed <- 0L until 30L) {
      val tracks = sample(Gen.listOfN(5, fieldGens), seed)
      val payload = tracks
        .map(m => m.map { case (k, v) => s""""$k": $v""" }.mkString("{", ",", "}"))
        .mkString("""{"tracks":[""", ",", "]}")
      val out = SpotifyFlatten.topTracks(
        SpotifySchemas.parse(Seq(payload).toDS(), SpotifySchemas.topTracksPayload))
        .collect() // must never throw
      assert(out.length == tracks.length, s"seed=$seed")
      out.foreach { r =>
        assert(r.getAs[String]("song_name") != null, s"seed=$seed")   // defaults patched
        assert(r.getAs[Int]("popularity") >= 0, s"seed=$seed")
        assert(r.getAs[String]("album_name") == "Unknown", s"seed=$seed") // album never present
      }
    }
  }

  test("portable hash32 is deterministic and in [0, 2^32)") {
    val xs = sample(Gen.listOfN(20, Gen.alphaNumStr), 7L)
    val df = xs.toDF("s")
      .select(graft.functions.PortableHash.hash32($"s").as("h"))
    val a = df.as[Long].collect()
    val b = df.as[Long].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(h => h >= 0L && h < (1L << 32)))
  }

  test("jaccard scores are within [0,1] and pairs respect doc_a < doc_b") {
    val pairs = Dedup.jaccardPairs(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"), 3, 0.0)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("exact dedup is idempotent: keeping one doc per fingerprint leaves no dupes") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val keep = Dedup.exact(docs).select($"keep_id".as("doc_id"))
    val once = docs.join(keep, Seq("doc_id"), "left_semi")
    val again = Dedup.exact(once)
    assert(again.filter($"n_copies" > 1).isEmpty)
    assert(again.count() == once.count())
  }

  test("sign-tricked div law: the Spark-side expression equals BigInt truncation for any sign") {
    // the portability primitive under q112's trainer: Spark div
    // truncates toward zero, DuckDB // floors; the CASE/sign form must
    // equal BigInt's truncating quotient everywhere
    val gen = for {
      a <- Gen.chooseNum(-1000000000000L, 1000000000000L)
      b <- Gen.chooseNum(1L, 10000000L)
    } yield (a, b)
    val cases = (0L until 200L).map(s => sample(gen, s))
    val df = cases.toDF("a", "b").selectExpr(
      "a", "b",
      "CASE WHEN a >= 0 THEN a div b ELSE -((-a) div b) END AS got")
    df.collect().foreach { r =>
      val (a, b, got) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(got == (BigInt(a) / BigInt(b)).toLong, s"a=$a b=$b")
    }
  }

  test("KMV law: when distinct keys < k the sketch is exact, for arbitrary key multisets") {
    for (seed <- 0L until 5L) {
      val keys = sample(Gen.listOfN(200, Gen.chooseNum(0L, 40L)), seed) // <= 41 distinct < k=64
      val ev = keys.zipWithIndex
        .map { case (u, i) => (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-0${1 + i % 3} 10:00:00"), u) }
        .toDF("event_id", "ts", "user_id")
      val rows = graft.operators.ApproxDistinct.kmvDaily(ev, "user_id", 64)
        .select($"approx_distinct", $"exact_distinct")
        .as[(Double, Long)].collect()
      rows.foreach { case (approx, exact) =>
        assert(approx == exact.toDouble, s"seed=$seed approx=$approx exact=$exact")
      }
    }
  }
}
