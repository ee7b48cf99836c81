package graft

import graft.operators.{SpotifyFlatten, SpotifySearch}
import graft.sources.SpotifySchemas
import org.scalatest.funsuite.AnyFunSuite

/** S2/S3 lookup scans + physical-plan assertions: the catalog queries
  * must keep the plans that scale (pushed filters, broadcast joins,
  * distributed top-k) — regressions here are performance bugs even
  * when results stay correct.
  */
class SearchAndPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("S2 artist search: first hit only; no-hit payload yields no row") {
    val payloads = Seq(
      """{"artists":{"items":[{"id":"a1","name":"Hit"},{"id":"a2","name":"Second"}]}}""",
      """{"artists":{"items":[]}}""").toDS()
    val df = SpotifySearch.firstArtistMatch(
      SpotifySchemas.parse(payloads, SpotifySchemas.artistSearchPayload))
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).toSeq == Seq("a1", "Hit"))
  }

  test("S3 per-artist top-k by popularity with deterministic tie-break") {
    val tracks = Seq(
      ("A", "t1", 90), ("A", "t2", 80), ("A", "t3", 80), ("A", "t4", 10),
      ("B", "t5", 50)).toDF("artist_name", "track_id", "popularity")
    val top = SpotifySearch.topTracksPerArtist(tracks, 3)
    assert(top.filter($"artist_name" === "A").orderBy($"popularity".desc, $"track_id")
      .select("track_id").as[String].collect().toSeq == Seq("t1", "t2", "t3"))
    assert(top.filter($"artist_name" === "B").count() == 1)
  }

  test("EP1 FK chain: matched artists broadcast-joined into tracks") {
    val payloads = Seq("""{"artists":{"items":[{"id":"a1","name":"Ar"}]}}""").toDS()
    val matched = SpotifySearch.firstArtistMatch(
      SpotifySchemas.parse(payloads, SpotifySchemas.artistSearchPayload))
    val tracks = SpotifyFlatten.topTracks(SpotifySchemas.parse(Seq(
      """{"tracks":[{"id":"t9","name":"N","artists":[{"name":"Ar"}]}]}""",
      """{"tracks":[{"id":"t0","name":"M","artists":[{"name":"Other"}]}]}""").toDS(),
      SpotifySchemas.topTracksPayload))
    val joined = SpotifySearch.tracksForMatchedArtists(tracks, matched)
    assert(joined.count() == 1)
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("P11/F11 url_encode matches requests.utils.quote semantics for query terms") {
    // expectations pinned against Python urllib.parse.quote (the
    // function requests.utils.quote re-exports): RFC-3986 percent
    // encoding, '/' and unreserved '-._~' safe, everything else escaped
    val cases = Seq(
      "Mot rhead & Friends" -> "Mot%20rhead%20%26%20Friends",
      "a/b~c*d+e"           -> "a/b~c%2Ad%2Be",
      "Mötley Crüe" -> "M%C3%B6tley%20Cr%C3%BCe",
      "100% legit?"         -> "100%25%20legit%3F")
    val got = cases.map(_._1).toDF("q").select(Ops.urlEncode($"q").as("e"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q3 pushes the time predicate into the parquet scan") {
    assert(plan("q3_recent_events").contains("PushedFilters: ["))
  }

  test("q5 top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q5_top_parts").contains("TakeOrderedAndProject"))
  }

  test("q6 dimension joins are broadcast, not shuffled") {
    val p = plan("q6_region_customers")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q8/q9 plan as anti/semi joins (no row explosion)") {
    assert(plan("q8_customers_without_orders").toLowerCase.contains("anti"))
    assert(plan("q9_big_spender_customers").toLowerCase.contains("semi"))
  }

  test("q8/q9 compile to the same broadcast existence-join shape (r1 bench gap was noise)") {
    assert(plan("q8_customers_without_orders").contains("BroadcastHashJoin"))
    assert(plan("q9_big_spender_customers").contains("BroadcastHashJoin"))
  }

  test("q7 pre-aggregates lineitem per order: no distinct over the join fan-out") {
    val p = plan("q7_order_revenue")
    assert(!p.toLowerCase.contains("distinct"), "q7 reintroduced countDistinct over the fan-out")
    assert(p.contains("partial_sum"), "per-order revenue must combine map-side")
  }

  test("q57/q58 bucketed pair ops join on bucket equality — never all-pairs") {
    for (q <- Seq("q57_top_pairs_lsh", "q58_embedding_neardups_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q fell back to an all-pairs join")
    }
  }

  test("q18 scores with the native codegen'd dot kernel, query side broadcast") {
    val p = plan("q18_cosine_topk")
    assert(p.contains("graft_dot"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q1 aggregates with partial (map-side) hash aggregation") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"))
  }

  test("q12 minhash has no cross join: signatures come from a keyed aggregation") {
    val p = plan("q12_dedup_minhash")
    assert(p.contains("partial_min"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "minhash reintroduced a params cross-join")
  }

  test("q30 salted aggregation is two stages (salt key then real key)") {
    val p = plan("q30_salted_type_stats")
    assert(p.contains("_salt"))
    assert("HashAggregate".r.findAllIn(p).length >= 4) // partial+final per stage
  }

  test("q29 honors the shuffle_hash hint") {
    assert(plan("q29_supplier_nation_shj").contains("ShuffledHashJoin"))
  }
}
