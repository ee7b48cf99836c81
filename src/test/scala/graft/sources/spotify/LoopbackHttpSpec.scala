package graft.sources.spotify

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** The LAST seam, closed: [[HttpPageFetcher]]'s real socket exchange —
  * the shared `java.net.http.HttpClient`, real TCP, real header
  * parsing — driven end-to-end against a loopback
  * `com.sun.net.httpserver.HttpServer` on 127.0.0.1 (zero egress).
  * HttpFetcherProtocolSpec scripts the protocol STATE MACHINE through
  * the `exchange` override; this spec removes the override and proves
  * the same behavior through the production transport, including the
  * full `format("spotify-api")` DSv2 read whose flatten must equal the
  * fixture-fetcher read of the same payloads (the q114 shape).
  * `api_base`/`accounts_base` point the fetcher at the loopback server
  * — the same knob a deployment uses for an egress proxy.
  */
class LoopbackHttpSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def freshCache(): Unit = {
    HttpPageFetcher.tokenCache.clear()
    HttpPageFetcher.rateLimitedUntil.clear()
    HttpPageFetcher.authCodeGrants.clear()
  }

  private def respond(ex: HttpExchange, status: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  /** One ephemeral-port loopback server for the block's lifetime. */
  private def withServer[T](register: HttpServer => Unit)(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    register(server)
    val pool = java.util.concurrent.Executors.newCachedThreadPool()
    server.setExecutor(pool)
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally {
      server.stop(0)
      pool.shutdown() // stop(0) does not shut down a user-supplied executor
    }
  }

  // q114's top-tracks payload shapes, one page per artist (the live
  // endpoint returns exactly one payload per request)
  private val payloads = Map(
    "a1" -> ("""{"tracks":[{"id":"t1","name":"Song One","popularity":90,"duration_ms":200000,""" +
      """"explicit":false,"preview_url":"https://p/t1","external_urls":{"spotify":"https://open/t1"},""" +
      """"album":{"id":"al1","name":"Album One","release_date":"2001-01-01"},""" +
      """"artists":[{"id":"ar1","name":"Artist One"}]},""" +
      """{"id":"t2","name":"Song Two","duration_ms":180000,""" +
      """"album":{"id":"al2","name":"Album Two","release_date":"2002-02-02"},""" +
      """"artists":[{"id":"ar1","name":"Artist One"}]}]}"""),
    "a2" -> ("""{"tracks":[{"id":"t4","name":"Song Four","popularity":70,"duration_ms":240000,""" +
      """"explicit":true,"preview_url":"https://p/t4","external_urls":{"spotify":"https://open/t4"},""" +
      """"album":{"id":"al4","name":"Album Four","release_date":"2004-04-04"},""" +
      """"artists":[{"id":"ar2","name":"Artist Two"}]}]}"""))

  test("format(spotify-api) through the REAL HTTP client: the q114 flatten equals the fixture read") {
    freshCache()
    val cid = "cid-loop-e2e"
    val sec = "s3cr3t"
    val basic = java.util.Base64.getEncoder.encodeToString(s"$cid:$sec".getBytes(UTF_8))
    val tokenHits = new AtomicInteger
    val trackHits = new AtomicInteger
    val badRequests = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer { srv =>
      srv.createContext("/api/token", (ex: HttpExchange) => {
        tokenHits.incrementAndGet()
        if (ex.getRequestMethod != "POST") badRequests.add(s"token method ${ex.getRequestMethod}")
        if (ex.getRequestHeaders.getFirst("Authorization") != s"Basic $basic")
          badRequests.add("token basic-auth header mismatch")
        val body = readBody(ex)
        if (body != "grant_type=client_credentials") badRequests.add(s"token form: $body")
        respond(ex, 200, """{"access_token":"tokLive","token_type":"Bearer","expires_in":3600}""")
      })
      srv.createContext("/v1/artists/", (ex: HttpExchange) => {
        trackHits.incrementAndGet()
        if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer tokLive")
          badRequests.add("tracks bearer mismatch")
        if (ex.getRequestURI.getQuery != "market=US")
          badRequests.add(s"tracks query: ${ex.getRequestURI.getQuery}")
        val artist = ex.getRequestURI.getPath
          .stripPrefix("/v1/artists/").stripSuffix("/top-tracks")
        respond(ex, 200, payloads(artist))
      })
    } { base =>
      import spark.implicits._
      def flattened(extra: (String, String)*) = {
        var r = spark.read.format("spotify-api")
          .option("endpoint", "top-tracks").option("requests", "a1,a2")
        extra.foreach { case (k, v) => r = r.option(k, v) }
        // sorted driver-side, NOT orderBy: range partitioning's
        // sampling pass re-executes the scan, which would double every
        // API call — exactly the kind of plan fact this connector's
        // users should know, so the spec pins one GET per partition
        graft.operators.SpotifyFlatten.topTracks(
          graft.sources.SpotifySchemas.parse(
            r.load().select($"payload").as[String],
            graft.sources.SpotifySchemas.topTracksPayload))
          .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      }
      val fixtureDir = java.nio.file.Files.createTempDirectory("graft_loopfix")
      java.nio.file.Files.createDirectories(fixtureDir.resolve("top-tracks"))
      payloads.foreach { case (artist, body) =>
        java.nio.file.Files.write(
          fixtureDir.resolve(s"top-tracks/$artist.jsonl"), body.getBytes(UTF_8))
      }
      val viaHttp = flattened(
        "fetcher" -> classOf[HttpPageFetcher].getName,
        "api_base" -> base, "accounts_base" -> base,
        "client_id" -> cid, "client_secret" -> sec)
      val viaFixture = flattened(
        "fetcher" -> classOf[FixturePageFetcher].getName,
        "fixtureDir" -> fixtureDir.toString)
      assert(badRequests.isEmpty, badRequests.toArray.mkString("; "))
      assert(viaHttp.nonEmpty)
      assert(viaHttp === viaFixture,
        "the real-socket read must flatten identically to the fixture read of the same payloads")
      assert(trackHits.get === 2, "one GET per planned partition, no retries")
      // per-JVM TTL cache: 2 concurrent partitions may race at most 2
      // token POSTs, but never one per request forever after
      assert(tokenHits.get >= 1 && tokenHits.get <= 2, s"token POSTs: ${tokenHits.get}")
    }
  }

  test("real-socket 429: the server-named Retry-After header is parsed and honored, then the retry succeeds") {
    freshCache()
    val hits = new AtomicInteger
    withServer { srv =>
      srv.createContext("/api/token", (ex: HttpExchange) =>
        respond(ex, 200, """{"access_token":"tok429","expires_in":3600}"""))
      srv.createContext("/v1/search", (ex: HttpExchange) => {
        if (hits.incrementAndGet() == 1)
          respond(ex, 429, """{"error":"rate limited"}""", Map("Retry-After" -> "1"))
        else respond(ex, 200, """{"artists":{"items":[{"id":"ar1"}]}}""")
      })
    } { base =>
      val waits = mutable.Buffer.empty[Long]
      // exchange() stays the production transport; only the sleep is
      // captured so the test doesn't stall
      val f = new HttpPageFetcher {
        override protected def backoff(seconds: Long): Unit = waits += seconds
      }
      val out = f.pages("search", "madonna", Map(
        "api_base" -> base, "accounts_base" -> base,
        "client_id" -> "cid-loop-429", "client_secret" -> "x")).toSeq
      assert(out === Seq("""{"artists":{"items":[{"id":"ar1"}]}}"""))
      assert(hits.get === 2, "the limited attempt plus exactly one retry")
      assert(waits.toSeq === Seq(1L), "the Retry-After header must round-trip the real parser")
    }
  }

  test("real-socket 401: the cached app token is refreshed once via a second grant and the GET retried") {
    freshCache()
    val tokenSeq = new AtomicInteger
    val getHits = new AtomicInteger
    withServer { srv =>
      srv.createContext("/api/token", (ex: HttpExchange) =>
        respond(ex, 200,
          s"""{"access_token":"tok${tokenSeq.incrementAndGet()}","expires_in":3600}"""))
      srv.createContext("/v1/search", (ex: HttpExchange) => {
        getHits.incrementAndGet()
        if (ex.getRequestHeaders.getFirst("Authorization") == "Bearer tok2")
          respond(ex, 200, "payload-after-refresh")
        else respond(ex, 401, """{"error":"token expired"}""")
      })
    } { base =>
      val out = new HttpPageFetcher().pages("search", "cher", Map(
        "api_base" -> base, "accounts_base" -> base,
        "client_id" -> "cid-loop-401", "client_secret" -> "x")).toSeq
      assert(out === Seq("payload-after-refresh"))
      assert(tokenSeq.get === 2, "exactly one refresh grant after the 401")
      assert(getHits.get === 2, "the expired attempt plus the refreshed retry")
    }
  }

  test("real-socket recently-played: the refresh-token grant mints the user token over the wire") {
    freshCache()
    val grants = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer { srv =>
      srv.createContext("/api/token", (ex: HttpExchange) => {
        grants.add(readBody(ex))
        respond(ex, 200, """{"access_token":"tokUser","expires_in":3600}""")
      })
      srv.createContext("/v1/me/player/recently-played", (ex: HttpExchange) => {
        if (ex.getRequestHeaders.getFirst("Authorization") == "Bearer tokUser" &&
            ex.getRequestURI.getQuery == "limit=50&after=1700000000")
          respond(ex, 200, """{"items":[]}""")
        else respond(ex, 403, "bad auth or cursor")
      })
    } { base =>
      val out = new HttpPageFetcher().pages("recently-played", "1700000000", Map(
        "api_base" -> base, "accounts_base" -> base,
        "client_id" -> "cid-loop-rp", "client_secret" -> "x",
        "refresh_token" -> "rt-abc")).toSeq
      assert(out === Seq("""{"items":[]}"""))
      assert(grants.toArray.toSeq === Seq("grant_type=refresh_token&refresh_token=rt-abc"))
    }
  }
}
