package graft.sources.spotify

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** Protocol behavior of the live fetcher with the network boundary
  * scripted: 429 Retry-After backoff, the refresh-token grant on
  * expiry (the reference's spotipy `.spotify_cache` flow, new.py:
  * 51-81), per-JVM token caching, and the fail-fast paths. The
  * `exchange`/`backoff` overrides are the ONLY seams — everything
  * else runs the production code.
  */
class HttpFetcherProtocolSpec extends AnyFunSuite {

  private def ok(body: String) = SpotifyHttpResponse(200, body)
  private def tokenJson(tok: String) = ok(s"""{"access_token":"$tok","expires_in":3600}""")
  private def rateLimited(after: Option[Long]) =
    SpotifyHttpResponse(429, """{"error":"rate limited"}""", after)
  private val expired = SpotifyHttpResponse(401, """{"error":"token expired"}""")

  /** Replays `script` in order; records every exchange and backoff. */
  private class Scripted(script: SpotifyHttpResponse*) extends HttpPageFetcher {
    private val it = script.iterator
    val calls = mutable.Buffer.empty[(String, String, Option[String], Map[String, String])]
    val waits = mutable.Buffer.empty[Long]
    override protected def exchange(method: String, url: String, body: Option[String],
                                    headers: Map[String, String]): SpotifyHttpResponse = {
      calls += ((method, url, body, headers))
      assert(it.hasNext, s"script exhausted at $method $url")
      it.next()
    }
    override protected def backoff(seconds: Long): Unit = waits += seconds
  }

  private val creds = Map("client_id" -> "cid", "client_secret" -> "sec")

  private def freshCache(): Unit = {
    HttpPageFetcher.tokenCache.clear()
    HttpPageFetcher.rateLimitedUntil.clear()
    HttpPageFetcher.authCodeGrants.clear()
  }

  test("429 then success: the server-named Retry-After is honored, capped, once per 429") {
    freshCache()
    val f = new Scripted(tokenJson("tokA"), rateLimited(Some(3L)), ok("payload"))
    val out = f.pages("search", "madonna", creds).toSeq
    assert(out === Seq("payload"))
    assert(f.waits.toSeq === Seq(3L))
    assert(f.calls.count(_._1 == "POST") === 1) // one token grant
    assert(f.calls.count(_._1 == "GET") === 2)  // limited attempt + retry
  }

  test("missing or garbled Retry-After waits 1 s; over-cap Retry-After fails the task") {
    freshCache()
    val f = new Scripted(tokenJson("tokA"),
      rateLimited(None), rateLimited(Some(86400L)), ok("payload"))
    // first 429 (no header) waits the 1 s floor and retries; the second
    // names a 24 h backoff — honoring it would park the slot, capping it
    // would retry sooner than the server asked, so the task fails and
    // the scheduler's retry budget owns the wait
    val err = intercept[RuntimeException] { f.pages("search", "cher", creds).toSeq }
    assert(err.getMessage.contains("Retry-After 86400s exceeds"))
    assert(f.waits.toSeq === Seq(1L))
  }

  test("over-cap 429 leaves a standing per-host deadline: a hot task retry fails fast without contacting the server") {
    freshCache()
    val f = new Scripted(tokenJson("tokA"), rateLimited(Some(86400L)))
    intercept[RuntimeException](f.pages("search", "cher", creds).toSeq)
    val callsAfterFirst = f.calls.size
    // Spark's task-retry re-runs the failed task IMMEDIATELY in the
    // same executor JVM — sooner than the server's Retry-After. The
    // standing deadline makes that retry fail WITHOUT any exchange
    // (token comes from the cache; the GET host is under deadline),
    // so the limiter never sees traffic before its own deadline.
    val e2 = intercept[RuntimeException](f.pages("search", "cher", creds).toSeq)
    assert(e2.getMessage.contains("WITHOUT contacting the server"), e2.getMessage)
    assert(f.calls.size === callsAfterFirst, "hot retry must not reach exchange()")
    // an expired deadline is cleared and traffic resumes normally
    HttpPageFetcher.rateLimitedUntil.replaceAll((_, v) => System.currentTimeMillis() - 1)
    val f2 = new Scripted(ok("payload")) // token still cached: GET only
    assert(f2.pages("search", "cher", creds).toSeq === Seq("payload"))
  }

  test("429 retries are bounded: persistent rate-limiting fails the task with the status") {
    freshCache()
    val f = new Scripted(
      tokenJson("tokA") +: Seq.fill(HttpPageFetcher.Max429Retries + 1)(rateLimited(Some(1L))): _*)
    val e = intercept[RuntimeException](f.pages("search", "adele", creds).toSeq)
    assert(e.getMessage.contains("429"), e.getMessage)
    assert(f.waits.size === HttpPageFetcher.Max429Retries)
    // the exhausted request's LAST Retry-After leaves a standing
    // deadline exactly like the over-cap branch — a hot task retry in
    // this JVM must not re-contact the still-limited host
    val callsBefore = f.calls.size
    val e2 = intercept[RuntimeException](f.pages("search", "adele", creds).toSeq)
    assert(e2.getMessage.contains("WITHOUT contacting the server"), e2.getMessage)
    assert(f.calls.size === callsBefore)
  }

  test("expired user token is refreshed via the refresh-token grant and the GET retried once") {
    freshCache()
    val opts = creds + ("refresh_token" -> "rt-1")
    val f = new Scripted(tokenJson("user-tokA"), expired, tokenJson("user-tokB"), ok("played"))
    assert(f.pages("recently-played", "0", opts).toSeq === Seq("played"))
    val posts = f.calls.filter(_._1 == "POST")
    assert(posts.size === 2)
    assert(posts.forall(_._3.get.contains("grant_type=refresh_token")))
    assert(posts.forall(_._3.get.contains("refresh_token=rt-1")))
    val gets = f.calls.filter(_._1 == "GET").map(_._4("Authorization"))
    assert(gets === Seq("Bearer user-tokA", "Bearer user-tokB"))
  }

  test("a second 401 after a refresh is surfaced, not retried forever") {
    freshCache()
    val opts = creds + ("refresh_token" -> "rt-2")
    val f = new Scripted(tokenJson("tokA"), expired, tokenJson("tokB"), expired)
    val e = intercept[RuntimeException](f.pages("recently-played", "0", opts).toSeq)
    assert(e.getMessage.contains("401"), e.getMessage)
  }

  test("a STATIC user token that 401s fails with the status — no refresh loop to hide in") {
    freshCache()
    val opts = creds + ("user_token" -> "static-tok")
    val f = new Scripted(expired)
    val e = intercept[RuntimeException](f.pages("recently-played", "0", opts).toSeq)
    assert(e.getMessage.contains("401"), e.getMessage)
    assert(f.calls.count(_._1 == "POST") === 0) // nothing to refresh with
  }

  test("recently-played without any user credential fails fast with the actionable message") {
    freshCache()
    val f = new Scripted()
    val e = intercept[RuntimeException](f.pages("recently-played", "0", creds).toSeq)
    assert(e.getMessage.contains("refresh_token"), e.getMessage)
    assert(e.getMessage.contains("auth_code"), e.getMessage) // names the first-run path too
  }

  private def codeTokenJson(tok: String, refresh: String) =
    ok(s"""{"access_token":"$tok","refresh_token":"$refresh","expires_in":3600}""")

  test("first-run authorization-code grant: code->token exchange, cache write, then the refresh path (new.py:51-81)") {
    freshCache()
    val cache = java.nio.file.Files.createTempDirectory("graft_oauth").toString + "/.spotify_cache"
    val opts = creds ++ Map("auth_code" -> "the-code", "token_cache_path" -> cache,
      "redirect_uri" -> "http://localhost:9090/cb")
    // FIRST run: only the one-time code. One authorization_code POST
    // (carrying the redirect_uri the code was minted for), then the GET
    // rides the access token from the SAME response — no refresh grant.
    val f = new Scripted(codeTokenJson("user-tokA", "rt-new"), ok("played"))
    assert(f.pages("recently-played", "0", opts).toSeq === Seq("played"))
    val posts = f.calls.filter(_._1 == "POST").map(_._3.get)
    assert(posts.size === 1)
    assert(posts.head.contains("grant_type=authorization_code"))
    assert(posts.head.contains("code=the-code"))
    assert(posts.head.contains("redirect_uri=" +
      java.net.URLEncoder.encode("http://localhost:9090/cb", "UTF-8")))
    assert(f.calls.filter(_._1 == "GET").map(_._4("Authorization")) === Seq("Bearer user-tokA"))
    // the grant persisted: the cache file carries the refresh token
    val written = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cache)), "UTF-8")
    assert(written.contains("\"refresh_token\":\"rt-new\""))

    // LATER run (fresh JVM: token cache cleared), same cache file, NO
    // auth_code: the cached refresh token drives the normal refresh
    // grant — the single-use code is never re-exchanged.
    freshCache()
    val f2 = new Scripted(tokenJson("user-tokB"), ok("played2"))
    assert(f2.pages("recently-played", "0",
      creds + ("token_cache_path" -> cache)).toSeq === Seq("played2"))
    val posts2 = f2.calls.filter(_._1 == "POST").map(_._3.get)
    assert(posts2.size === 1)
    assert(posts2.head.contains("grant_type=refresh_token"))
    assert(posts2.head.contains("refresh_token=rt-new"))

    // EXPIRY mid-run: 401 -> one refresh off the cached refresh token
    val f3 = new Scripted(expired, tokenJson("user-tokC"), ok("played3"))
    assert(f3.pages("recently-played", "0",
      creds ++ Map("auth_code" -> "the-code", "token_cache_path" -> cache)).toSeq
      === Seq("played3"))
    // cache file BEATS the supplied code, exactly as spotipy consults
    // .spotify_cache first (re-exchanging a consumed code would 400)
    assert(f3.calls.filter(_._1 == "POST").map(_._3.get)
      .forall(_.contains("grant_type=refresh_token")))
  }

  test("auth_code without a cache file: the consumed code is never re-exchanged in the same JVM") {
    freshCache()
    val opts = creds + ("auth_code" -> "one-shot-code")
    val f = new Scripted(codeTokenJson("tokA", "rt-memo"), ok("p1"), ok("p2"))
    assert(f.pages("recently-played", "0", opts).toSeq === Seq("p1"))
    // SECOND read in the same run: with no token_cache_path to win the
    // credential resolution, this used to re-POST the consumed
    // single-use code — a real server 400s that even though the JVM
    // already holds a valid grant. The per-JVM memo returns the grant
    // instead, and the access token rides the TTL cache: zero new POSTs.
    assert(f.pages("recently-played", "0", opts).toSeq === Seq("p2"))
    val posts = f.calls.filter(_._1 == "POST").map(_._3.get)
    assert(posts.size === 1, posts.mkString("; "))
    assert(posts.head.contains("grant_type=authorization_code"))
    // a FAILED exchange is not memoized: the retry may still spend the
    // code (transient 5xx never reached the grant server's consumer)
    freshCache()
    val f2 = new Scripted(SpotifyHttpResponse(500, """{"error":"boom"}"""),
      codeTokenJson("tokB", "rt-2"), ok("p3"))
    intercept[RuntimeException](f2.pages("recently-played", "0", opts).toSeq)
    assert(f2.pages("recently-played", "0", opts).toSeq === Seq("p3"))
  }

  test("a refresh token needing JSON escaping round-trips the cache file byte-identical") {
    freshCache()
    // server-minted token carrying a quote and a backslash: the writer
    // escapes it into the cache file; the reader must UNESCAPE it back,
    // or the next run sends a corrupted refresh token AFTER the
    // single-use code is consumed (a silent 400 with no recovery path)
    val raw = """rt"quote\slash"""
    val escaped = raw.replace("\\", "\\\\").replace("\"", "\\\"")
    val cache = java.nio.file.Files.createTempDirectory("graft_oauth_esc").toString + "/.c"
    val f = new Scripted(
      ok(s"""{"access_token":"tokA","refresh_token":"$escaped","expires_in":3600}"""),
      ok("played"))
    assert(f.pages("recently-played", "0",
      creds ++ Map("auth_code" -> "c", "token_cache_path" -> cache)).toSeq === Seq("played"))
    // later run: the refresh grant carries the RAW token, URL-encoded
    freshCache()
    val f2 = new Scripted(tokenJson("tokB"), ok("played2"))
    assert(f2.pages("recently-played", "0",
      creds + ("token_cache_path" -> cache)).toSeq === Seq("played2"))
    val post = f2.calls.filter(_._1 == "POST").map(_._3.get).head
    assert(post.contains("refresh_token=" + java.net.URLEncoder.encode(raw, "UTF-8")),
      post)
  }

  test("a malformed unicode escape in a cache file degrades to literal text, never throws") {
    // a hand-edited or torn cache file must not crash the credential
    // fallback chain — jsonField recovers what it can
    val got = HttpPageFetcher.jsonField(
      "{\"refresh_token\":\"a\\" + "uZZZZb\"}", "refresh_token")
    assert(got === Some("auZZZZb"), got) // backslash dropped, text kept
    val ok = HttpPageFetcher.jsonField(
      "{\"refresh_token\":\"a\\" + "u0041b\"}", "refresh_token")
    assert(ok === Some("aAb"), ok) // well-formed A decodes to 'A'
  }

  test("authorization-code response without a refresh token fails with the actionable cause") {
    freshCache()
    val f = new Scripted(tokenJson("short-lived")) // no refresh_token field
    val e = intercept[RuntimeException](
      f.pages("recently-played", "0", creds + ("auth_code" -> "c")).toSeq)
    assert(e.getMessage.contains("lacked refresh_token"), e.getMessage)
  }

  test("authorizeUrl builds the browser step with encoded client id, redirect and scope") {
    val u = HttpPageFetcher.authorizeUrl("my client", "http://localhost:8080/callback")
    assert(u.startsWith("https://accounts.spotify.com/authorize?"))
    assert(u.contains("client_id=my+client"))
    assert(u.contains("response_type=code"))
    assert(u.contains("redirect_uri=http%3A%2F%2Flocalhost%3A8080%2Fcallback"))
    assert(u.contains("scope=user-read-recently-played"))
    // the accounts host honors the same override the token grants do
    // (the egress-proxy knob) — no hardcoded endpoint left behind
    val p = HttpPageFetcher.authorizeUrl("id", "http://cb",
      accountsBase = "http://127.0.0.1:9/")
    assert(p.startsWith("http://127.0.0.1:9/authorize?"), p)
  }

  test("app token is cached per JVM: a second request issues no second grant") {
    freshCache()
    val f = new Scripted(tokenJson("tokA"), ok("p1"), ok("p2"))
    assert(f.pages("search", "a", creds).toSeq === Seq("p1"))
    assert(f.pages("top-tracks", "artist1", creds).toSeq === Seq("p2"))
    assert(f.calls.count(_._1 == "POST") === 1)
  }

  test("an expired APP token mid-run re-grants once and retries (the >1 h executor)") {
    freshCache()
    val f = new Scripted(tokenJson("tokA"), expired, tokenJson("tokB"), ok("tracks"))
    assert(f.pages("top-tracks", "artist9", creds).toSeq === Seq("tracks"))
    val gets = f.calls.filter(_._1 == "GET").map(_._4("Authorization"))
    assert(gets === Seq("Bearer tokA", "Bearer tokB"))
  }
}
