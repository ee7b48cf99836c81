package graft.sources.spotify

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the Spotify Web API pulls the reference
  * makes imperatively (spotify_etl.py:46-87 search + top-tracks,
  * spotify_etl2.py:89-132 recently-played) — restated as a first-class
  * Spark batch source so a cluster can fan the API calls out instead
  * of looping on the driver.
  *
  * Design:
  *  - One **InputPartition per request** (search term / artist id /
  *    user cursor): the unit of API parallelism. 10k artists on 1000
  *    executors = 10 requests each, no driver loop, retries are task
  *    retries (idempotent GETs), and a slow endpoint stalls one task,
  *    not the job.
  *  - The page fetch is a pluggable [[PageFetcher]] picked by class
  *    name — `option("fetcher", ...)` — so the I/O boundary is swap-
  *    able: [[FixturePageFetcher]] replays recorded payloads offline
  *    (this sandbox is zero-egress), [[HttpPageFetcher]] is the live
  *    OAuth client-credentials implementation — driven end-to-end
  *    through a real 127.0.0.1 HTTP server in LoopbackHttpSpec
  *    (`api_base`/`accounts_base` options), so the real socket
  *    exchange is tested without egress.
  *  - The scan emits RAW payload strings, one row per page:
  *    `(endpoint, request, page, payload)`. Parsing stays in the
  *    declared-schema `from_json` path ([[graft.sources.SpotifySchemas
  *    .parse]]) where Catalyst codegens it and PERMISSIVE nulls feed
  *    the P5 malformed-row rule — the connector is I/O only.
  *
  * Usage:
  * {{{
  * spark.read.format("spotify-api")
  *   .option("endpoint", "search")           // search | top-tracks | recently-played
  *   .option("requests", "madonna,cher")     // one partition each
  *   .option("fetcher", classOf[FixturePageFetcher].getName)
  *   .option("fixtureDir", "/path/to/payloads")
  *   .load()
  * }}}
  */
class SpotifyApiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "spotify-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpotifyApiSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SpotifyApiTable(properties.asScala.toMap)
}

object SpotifyApiSource {
  /** Fixed scan schema — raw pages, parse downstream with the declared
    * payload StructTypes.
    */
  val schema: StructType = StructType(Seq(
    StructField("endpoint", StringType, nullable = false),
    StructField("request", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("payload", StringType)))
}

/** The page-fetch boundary. Implementations MUST be serializable with
  * a no-arg constructor (instantiated by class name on executors) and
  * read their connection/auth settings from the passed options — task
  * retries re-fetch the same request, so fetches should be idempotent.
  */
trait PageFetcher extends Serializable {
  /** All payload pages for one request against one endpoint. */
  def pages(endpoint: String, request: String, options: Map[String, String]): Iterator[String]
}

/** Offline fetcher: replays payloads recorded under
  * `<fixtureDir>/<endpoint>/<request>.jsonl` — one JSON payload per
  * line = one page. Missing file = zero pages (an API miss), matching
  * the reference's empty-items behavior, not an error.
  */
final class FixturePageFetcher extends PageFetcher {
  override def pages(endpoint: String, request: String,
                     options: Map[String, String]): Iterator[String] = {
    val dir = options.getOrElse("fixturedir",
      sys.error("fixtureDir option is required for FixturePageFetcher"))
    val f = java.nio.file.Paths.get(dir, endpoint, s"$request.jsonl")
    if (!java.nio.file.Files.exists(f)) Iterator.empty
    else java.nio.file.Files.readAllLines(f).asScala.iterator.filter(_.nonEmpty)
  }
}

/** One HTTP exchange as the fetcher sees it — the mockable transport
  * unit ([[HttpPageFetcher.exchange]] is the only method that touches
  * the network, so rate-limit and token-expiry behavior is unit-
  * testable offline with a scripted subclass).
  */
private[spotify] case class SpotifyHttpResponse(
    status: Int, body: String, retryAfterSec: Option[Long] = None)

/** Live HTTP fetcher: OAuth token management (reference
  * spotify_etl.py:46-60 client-credentials; new.py:51-81 the spotipy
  * `.spotify_cache` user-token refresh) then paged GETs. Protocol
  * behavior (retry, refresh, caching) is scripted through
  * [[exchange]] in HttpFetcherProtocolSpec; the REAL network exchange
  * — this client, real sockets — is driven end-to-end against a
  * loopback `com.sun.net.httpserver` in LoopbackHttpSpec via the
  * `api_base`/`accounts_base` options (zero egress needed). Swap-in
  * point for a real deployment: `option("fetcher",
  * classOf[HttpPageFetcher].getName)` plus client_id/client_secret
  * options (or env, per Config's S6 override -> env -> default rule).
  *
  * Auth model per endpoint: search and top-tracks run on an app
  * (client-credentials) token; `/v1/me/player/recently-played` is a
  * USER-scoped endpoint (user-read-recently-played — the reference's
  * spotify_etl2.py/new.py pass a user-authorized bearer) and a
  * client-credentials token always gets 401 there, so that endpoint
  * requires either a static `user_token` (SPOTIFY_USER_TOKEN) or —
  * the production shape, since static tokens die after an hour — a
  * `refresh_token` (SPOTIFY_REFRESH_TOKEN), exchanged for fresh
  * user tokens via the refresh-token grant exactly as the reference's
  * spotipy cache does, and re-exchanged on expiry mid-run.
  *
  * Robustness:
  *  - Every response is status-checked — non-2xx (after the retries
  *    below) raises with the status and body head instead of emitting
  *    the error JSON as a payload row (where it would decay into null
  *    structs downstream, indistinguishable from malformed data).
  *  - **429**: Spotify's rate limiter names its backoff in
  *    `Retry-After` seconds; short waits (≤
  *    [[HttpPageFetcher.MaxRetryAfterSec]], at most
  *    [[HttpPageFetcher.Max429Retries]] attempts) are honored
  *    in-task — failing on every blip would re-issue the call sooner
  *    and make the limiter angrier — while a Retry-After ABOVE the
  *    cap fails the task immediately: sleeping a capped 30 s and
  *    retrying would both violate the server's named backoff and
  *    park an executor slot; the scheduler's retry budget (the
  *    reference's 2×5 min, spotify_dag.py:15-16) owns long waits.
  *  - **401 with a refreshable token**: the cached token is dropped,
  *    refreshed once via the grant, and the GET retried — the >1 h
  *    run surviving token expiry. A static user token gets the clear
  *    actionable error instead of a 401 loop.
  *  - Tokens are cached per (credential, executor JVM) with a 50-min
  *    TTL: a 10k-request fan-out issues one token POST per executor,
  *    not 10k, and hour-old executors re-fetch instead of 401-looping.
  */
class HttpPageFetcher extends PageFetcher {

  /** The raw network boundary — overridden with a script in tests. */
  protected def exchange(method: String, url: String, body: Option[String],
                         headers: Map[String, String]): SpotifyHttpResponse = {
    // explicit timeouts: a black-holed connection would otherwise park
    // the executor slot FOREVER — neither the 429/401 retry logic nor
    // the scheduler's task-retry budget ever fires on a hang, defeating
    // the same fail-the-task principle as the Retry-After cap. (The
    // reference sets timeout=30 on every requests call for the same
    // reason, spotify_etl.py:69.) The client is shared per JVM: one
    // selector thread + keep-alive pool per executor, not per request.
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30))
    val withMethod = body match {
      case Some(payload) =>
        b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
      case None => b.GET()
    }
    headers.foreach { case (k, v) => withMethod.header(k, v) }
    val resp = HttpPageFetcher.sharedClient
      .send(withMethod.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    val retryAfter = resp.headers().firstValue("Retry-After")
      .map[Option[Long]](v => v.toLongOption).orElse(None)
    SpotifyHttpResponse(resp.statusCode(), resp.body(), retryAfter)
  }

  /** Overridden in tests so scripted 429 sequences don't sleep. */
  protected def backoff(seconds: Long): Unit = Thread.sleep(seconds * 1000)

  /** Send with 429 Retry-After handling; `onUnauthorized` (when set)
    * is invoked on the FIRST 401 to produce a replacement Authorization
    * header (token refresh), after which the request is retried once.
    */
  private def send(method: String, url: String, body: Option[String],
                   headers: Map[String, String], what: String,
                   onUnauthorized: Option[() => String] = None): String = {
    var tries429 = 0
    var hdrs = headers
    var refresh = onUnauthorized
    val host = java.net.URI.create(url).getHost
    // fail fast if a prior over-cap 429 left a standing deadline for
    // this host: an immediate Spark task retry must not re-contact the
    // server sooner than its own Retry-After asked
    val standing = HttpPageFetcher.rateLimitedUntil.get(host)
    if (standing != null) {
      val leftMs = standing - System.currentTimeMillis()
      if (leftMs > 0)
        sys.error(s"$what rate-limited: host $host under a server-named " +
          s"Retry-After deadline for another ${leftMs / 1000 + 1}s — failing " +
          "fast WITHOUT contacting the server (hot task retries burn out " +
          "offline; the DAG-level retry budget owns the wait)")
      else HttpPageFetcher.rateLimitedUntil.remove(host, standing)
    }
    while (true) {
      val r = exchange(method, url, body, hdrs)
      if (r.status / 100 == 2) return r.body
      else if (r.status == 429 && tries429 < HttpPageFetcher.Max429Retries) {
        val wait = r.retryAfterSec.getOrElse(1L) max 1L
        if (wait > HttpPageFetcher.MaxRetryAfterSec) {
          HttpPageFetcher.rateLimitedUntil.put(
            host, System.currentTimeMillis() + wait * 1000)
          sys.error(s"$what rate-limited: HTTP 429 Retry-After ${wait}s exceeds " +
            s"the ${HttpPageFetcher.MaxRetryAfterSec}s cap — failing the task so the " +
            "scheduler's retry budget owns the wait instead of parking an executor slot")
        }
        backoff(wait)
        tries429 += 1
      } else if (r.status == 401 && refresh.isDefined) {
        hdrs = hdrs + ("Authorization" -> s"Bearer ${refresh.get.apply()}")
        refresh = None // one refresh per request: a second 401 is real
      } else {
        // retry-EXHAUSTED 429s record a standing deadline too: the
        // server's last Retry-After must outlive this task, or the hot
        // task retry re-contacts the still-limited host immediately —
        // the same gap the over-cap branch closes
        if (r.status == 429)
          HttpPageFetcher.rateLimitedUntil.put(host,
            System.currentTimeMillis() + (r.retryAfterSec.getOrElse(1L) max 1L) * 1000)
        sys.error(s"$what failed: HTTP ${r.status} ${r.body.take(200)}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def post(url: String, body: String, headers: Map[String, String]): String =
    send("POST", url, Some(body), headers, s"POST $url")

  /** Base URLs for the data and token hosts, overridable per read
    * (`option("api_base", ...)` / `option("accounts_base", ...)`) —
    * the deployment knob for an egress proxy, and what lets the
    * LoopbackHttpSpec drive this exact class (real sockets, real
    * java.net.http client) against a 127.0.0.1 server instead of
    * leaving the network exchange untested.
    */
  private def apiBase(options: Map[String, String]): String =
    options.getOrElse("api_base", "https://api.spotify.com").stripSuffix("/")
  private def accountsBase(options: Map[String, String]): String =
    options.getOrElse("accounts_base", "https://accounts.spotify.com").stripSuffix("/")

  private def basicAuth(options: Map[String, String]): String = {
    val id = options.getOrElse("client_id", sys.env.getOrElse("SPOTIFY_CLIENT_ID", ""))
    val secret = options.getOrElse("client_secret", sys.env.getOrElse("SPOTIFY_CLIENT_SECRET", ""))
    // fail with the ACTIONABLE cause, like the recently-played path's
    // missing-user-token error — an empty ":" credential would instead
    // surface as an opaque HTTP 400 invalid_client on every task
    require(id.nonEmpty && secret.nonEmpty,
      "spotify-api needs client credentials: set the client_id/client_secret " +
        "options or SPOTIFY_CLIENT_ID/SPOTIFY_CLIENT_SECRET in the environment")
    java.util.Base64.getEncoder.encodeToString(s"$id:$secret".getBytes("UTF-8"))
  }

  /** One token-endpoint POST; `form` picks the grant. Returns the raw
    * response body (the authorization-code grant needs refresh_token
    * out of the same response).
    */
  private def tokenGrantRaw(options: Map[String, String], form: String): String =
    post(s"${accountsBase(options)}/api/token", form,
      Map("Authorization" -> s"Basic ${basicAuth(options)}",
        "Content-Type" -> "application/x-www-form-urlencoded"))

  private def tokenGrant(options: Map[String, String], form: String): String =
    HttpPageFetcher.jsonField(tokenGrantRaw(options, form), "access_token")
      .getOrElse(sys.error("no access_token in token response"))

  /** TTL-cached token fetch: client-credentials tokens expire after
    * 3600 s, so a long-lived executor (the microbatch tier's normal
    * shape) must re-fetch — caching forever turns hour-old executors
    * into permanent 401 loops. 50 min leaves comfortable slack;
    * `force` drops the cached entry first (the 401-refresh path).
    */
  private def cachedToken(cacheKey: String, force: Boolean)(fetch: => String): String = {
    val now = System.currentTimeMillis()
    if (force) HttpPageFetcher.tokenCache.remove(cacheKey)
    val cached = HttpPageFetcher.tokenCache.get(cacheKey)
    if (cached != null && now - cached._2 < HttpPageFetcher.TokenTtlMs) cached._1
    else {
      val token = fetch
      HttpPageFetcher.tokenCache.put(cacheKey, (token, now))
      token
    }
  }

  private def appToken(options: Map[String, String], force: Boolean = false): String = {
    val id = options.getOrElse("client_id", sys.env.getOrElse("SPOTIFY_CLIENT_ID", ""))
    cachedToken(s"app:$id", force)(tokenGrant(options, "grant_type=client_credentials"))
  }

  /** User token via the refresh-token grant (the spotipy-cache flow,
    * reference new.py:51-81): the long-lived refresh token is the
    * credential; access tokens are derived, cached, and re-derived on
    * expiry.
    */
  private def refreshedUserToken(options: Map[String, String], refreshToken: String,
                                 force: Boolean = false): String =
    cachedToken(s"user:$refreshToken", force)(tokenGrant(options,
      s"grant_type=refresh_token&refresh_token=${java.net.URLEncoder.encode(refreshToken, "UTF-8")}"))

  /** The INITIAL authorization-code exchange — the missing first step
    * of the spotipy flow (reference new.py:51-81): the user visits
    * [[HttpPageFetcher.authorizeUrl]] in a browser, approves the
    * scope, and hands the one-time `code` from the redirect to this
    * connector (`option("auth_code", ...)`); the exchange yields an
    * access token AND the long-lived refresh token, both cached — the
    * access token in the per-JVM cache (no immediate re-grant) and the
    * refresh token in the `token_cache_path` file when set, the model
    * of spotipy's `.spotify_cache` (new.py:68) so LATER runs need
    * neither the code (single-use) nor a hand-supplied refresh token.
    * Returns the refresh token; callers then ride the normal
    * refresh-grant path.
    *
    * Deployment caveat: the code is SINGLE-USE, so on a multi-executor
    * cluster the first-run exchange belongs in a one-task driver-side
    * job (or the cache file on a shared filesystem) — two executors
    * racing the same code means the loser gets a 400. Steady-state
    * fan-out is unaffected: it rides the refresh token, which is
    * reusable, and the per-JVM TTL cache bounds token POSTs to one
    * per executor.
    */
  private def exchangeAuthCode(options: Map[String, String], code: String): String =
    // computeIfAbsent memoizes per JVM: the code is single-use, so a
    // second pages() call in the same run must reuse the grant it
    // already holds instead of re-POSTing the consumed code (400).
    // Exceptions propagate without caching — a failed exchange may be
    // retried (e.g. after a transient 5xx) with the code still unspent.
    HttpPageFetcher.authCodeGrants.computeIfAbsent(code,
      c => exchangeAuthCodeUncached(options, c))

  private def exchangeAuthCodeUncached(options: Map[String, String], code: String): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val redirect = options.getOrElse("redirect_uri",
      sys.env.getOrElse("SPOTIFY_REDIRECT_URI", "http://localhost:8080/callback"))
    val body = tokenGrantRaw(options,
      s"grant_type=authorization_code&code=${enc(code)}&redirect_uri=${enc(redirect)}")
    val access = HttpPageFetcher.jsonField(body, "access_token")
      .getOrElse(sys.error("no access_token in authorization-code response"))
    val refresh = HttpPageFetcher.jsonField(body, "refresh_token")
      .getOrElse(sys.error("authorization-code response lacked refresh_token — " +
        "cannot survive token expiry; check the grant and scope"))
    HttpPageFetcher.tokenCache.put(s"user:$refresh", (access, System.currentTimeMillis()))
    options.get("token_cache_path").foreach { p =>
      val path = java.nio.file.Paths.get(p)
      if (path.getParent != null) java.nio.file.Files.createDirectories(path.getParent)
      // escape the (server-minted, unvalidated) token for the JSON
      // string literal — an embedded quote would otherwise corrupt the
      // file and silently truncate the recovered token AFTER the
      // single-use code is already consumed; scope is recorded from
      // the RESPONSE when the server names one, never assumed
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val scopeField = HttpPageFetcher.jsonField(body, "scope")
        .map(sc => s""","scope":"${esc(sc)}"""").getOrElse("")
      java.nio.file.Files.write(path,
        s"""{"refresh_token":"${esc(refresh)}"$scopeField}""".getBytes("UTF-8"))
    }
    refresh
  }

  /** Refresh token recovered from a prior run's `token_cache_path`
    * file, if any — checked BEFORE `auth_code` exactly as spotipy
    * consults `.spotify_cache` before re-running the browser flow
    * (the code is single-use; re-exchanging a consumed code 400s).
    */
  private def cachedRefreshToken(options: Map[String, String]): Option[String] =
    options.get("token_cache_path").flatMap { p =>
      val path = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(path)) None
      // jsonField is escape-aware and unescapes, matching the writer's
      // escaping — a hostile token round-trips byte-identical
      else HttpPageFetcher.jsonField(
        new String(java.nio.file.Files.readAllBytes(path), "UTF-8"), "refresh_token")
    }

  override def pages(endpoint: String, request: String,
                     options: Map[String, String]): Iterator[String] = {
    val market = options.getOrElse("market", "US")
    // (url, current token, refresh-on-401 if the credential allows it)
    val (url, token, onUnauthorized) = endpoint match {
      case "search" =>
        (s"${apiBase(options)}/v1/search?q=${java.net.URLEncoder.encode(request, "UTF-8")}&type=artist&limit=1",
          appToken(options), Some(() => appToken(options, force = true)))
      case "top-tracks" =>
        (s"${apiBase(options)}/v1/artists/$request/top-tracks?market=$market",
          appToken(options), Some(() => appToken(options, force = true)))
      case "recently-played" =>
        val url = s"${apiBase(options)}/v1/me/player/recently-played?limit=50&after=$request"
        // credential resolution, spotipy-ordered: explicit refresh
        // token -> prior run's token-cache file (.spotify_cache model)
        // -> one-time authorization code (first run; writes the cache)
        // -> static user token -> actionable error
        val refreshTok = options.get("refresh_token")
          .orElse(sys.env.get("SPOTIFY_REFRESH_TOKEN"))
          .orElse(cachedRefreshToken(options))
          .orElse(options.get("auth_code").map(exchangeAuthCode(options, _)))
        refreshTok match {
          case Some(rt) =>
            (url, refreshedUserToken(options, rt),
              Some(() => refreshedUserToken(options, rt, force = true)))
          case None =>
            (url, options.getOrElse("user_token", sys.env.getOrElse("SPOTIFY_USER_TOKEN",
              sys.error("recently-played requires a user-authorized token " +
                "(user-read-recently-played scope): pass option(\"refresh_token\", ...) " +
                "(or SPOTIFY_REFRESH_TOKEN) for runs longer than a token lifetime; " +
                "for a FIRST run visit HttpPageFetcher.authorizeUrl(...) in a browser " +
                "and pass the redirect's code as option(\"auth_code\", ...) (plus " +
                "option(\"token_cache_path\", ...) to persist the grant); " +
                "or a static option(\"user_token\", ...) / SPOTIFY_USER_TOKEN — " +
                "a client-credentials token gets 401 here"))),
              None) // static token: a 401 means expired/invalid — surface it
        }
      case other => sys.error(s"unknown endpoint: $other")
    }
    Iterator.single(send("GET", url, None,
      Map("Authorization" -> s"Bearer $token"), s"GET $url", onUnauthorized))
  }
}

private[spotify] object HttpPageFetcher {
  /** Per-JVM (= per-executor) token cache keyed by credential
    * (`app:<client_id>` / `user:<refresh_token>`):
    * (token, fetchedAtMillis). Entries older than [[TokenTtlMs]] are
    * re-fetched (Spotify tokens live 3600 s).
    */
  val tokenCache = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  val TokenTtlMs: Long = 50L * 60 * 1000

  /** Per-JVM memo of completed authorization-code exchanges
    * (code → refresh token), NO TTL — the refresh token a code minted
    * stays valid for the JVM's life. Without this, `auth_code` given
    * WITHOUT `token_cache_path` re-POSTs the consumed single-use code
    * on the second `pages()` call and the server 400s a read that
    * already holds a perfectly valid grant; the cache-file path never
    * hit this only because `cachedRefreshToken` wins the credential
    * resolution on the second call.
    */
  val authCodeGrants = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One HTTP client per executor JVM (connect timeout 10 s; per-
    * request timeout set at the call). Building a client per request
    * would spin up a selector thread and connection pool each time
    * and defeat keep-alive across a 10k-request fan-out.
    */
  lazy val sharedClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()
  /** At most this many 429 retries per request, each waiting the
    * server-named Retry-After (missing/garbled header → 1 s).
    */
  val Max429Retries: Int = 5
  /** Cap on a single honored Retry-After wait — a limiter asking for
    * more than this fails the task immediately (send() raises), so the
    * scheduler's retry budget owns the wait instead of an executor
    * slot silently parking (and instead of retrying sooner than the
    * server asked).
    */
  val MaxRetryAfterSec: Long = 30L

  /** Minimal JSON string-field extractor (the token endpoint's flat
    * responses only — not a general parser, same trade the reference
    * makes by trusting spotipy's parsed dicts). Escape-AWARE: the
    * value pattern steps over `\"` and `\\` and the capture is
    * unescaped, so a token the cache writer had to escape reads back
    * byte-identical instead of truncated at the escaped quote or with
    * a doubled backslash — the silent-corruption path that would send
    * a wrong refresh token AFTER the single-use auth code is consumed.
    */
  def jsonField(json: String, field: String): Option[String] =
    (s""""${java.util.regex.Pattern.quote(field)}"\\s*:\\s*"((?:[^"\\\\]|\\\\.)+)"""").r
      .findFirstMatchIn(json).map(m => unescapeJson(m.group(1)))

  private def unescapeJson(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'u' if i + 5 < s.length &&
              s.substring(i + 2, i + 6).forall(c =>
                Character.digit(c, 16) >= 0) =>
            // malformed \uXXXX falls through to the literal branch —
            // a hand-edited or torn cache file must DEGRADE (regex
            // miss / wrong token handled upstream), never crash the
            // credential-resolution fallback chain
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 4
          case other => sb.append(other) // \" \\ \/ and any literal
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The browser step of the authorization-code grant (reference
    * new.py:51-81, spotipy SpotifyOAuth): the user visits this URL,
    * approves the scope, and the redirect lands on
    * `redirect_uri?code=...` — that one-time code goes to
    * `option("auth_code", ...)`. Pure URL construction; the browser
    * interaction itself is inherently out-of-band (spotipy opens a
    * local server for it; an executor cannot).
    */
  def authorizeUrl(clientId: String,
                   redirectUri: String = "http://localhost:8080/callback",
                   scope: String = "user-read-recently-played",
                   accountsBase: String = "https://accounts.spotify.com"): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    s"${accountsBase.stripSuffix("/")}/authorize?client_id=${enc(clientId)}" +
      s"&response_type=code&redirect_uri=${enc(redirectUri)}&scope=${enc(scope)}"
  }

  /** Per-JVM rate-limit deadline by host, recorded when an over-cap
    * Retry-After fails the task. Spark's task-retry machinery re-runs
    * a failed task IMMEDIATELY (up to spark.task.maxFailures), sooner
    * than the server asked — so a retried task in the same executor
    * checks this first and fails FAST without contacting the server,
    * burning the hot retries offline until the job-level failure hands
    * the wait to the DAG scheduler's retry budget (the reference's
    * 2×5 min, spotify_dag.py:15-16). Fresh executors start clean —
    * acceptable: the goal is not a distributed limiter, just never
    * hammering the server faster than its own Retry-After from the
    * same JVM.
    */
  val rateLimitedUntil = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
}

private[spotify] class SpotifyApiTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"spotify-api(${props.getOrElse("endpoint", "?")})"
  override def schema(): StructType = SpotifyApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpotifyApiScanBuilder(props ++ options.asScala)
}

/** Predicate pushdown into the API fan-out: an equality/IN filter on
  * `request` prunes whole InputPartitions — i.e., whole API CALLS —
  * before any fetch happens. At fleet scale this is the difference
  * between "fetch 10k artists then discard 9,990 rows" and "fetch 10".
  * The filters are reported back as residual (Spark re-applies them),
  * so pruning is purely an optimization and can never change results.
  */
private[spotify] class SpotifyApiScanBuilder(opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {
  private var requestFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val wanted = filters.collect {
      case EqualTo("request", v: String) => Set(v)
      case In("request", vs) => vs.collect { case s: String => s }.toSet
    }
    if (wanted.nonEmpty) {
      requestFilter = Some(wanted.reduce(_ intersect _))
      pushed = filters.filter {
        case EqualTo("request", _) | In("request", _) => true
        case _ => false
      }
    }
    filters // all residual: pruning is an optimization, not evaluation
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SpotifyApiScan(opts, requestFilter)
}

private[spotify] case class SpotifyRequestPartition(endpoint: String, request: String)
    extends InputPartition

private[spotify] class SpotifyApiScan(opts: Map[String, String],
                                      requestFilter: Option[Set[String]] = None)
    extends Scan with Batch {
  private val endpoint = opts.getOrElse("endpoint", sys.error("endpoint option is required"))
  private val requests = opts.getOrElse("requests", sys.error("requests option is required"))
    .split(",").map(_.trim).filter(_.nonEmpty)
    .filter(r => requestFilter.forall(_.contains(r)))
  // lower-cased keys: CaseInsensitiveStringMap flattens case anyway
  private val lowered = opts.map { case (k, v) => k.toLowerCase -> v }

  override def readSchema(): StructType = SpotifyApiSource.schema
  // surfaces partition pruning in .explain: "PushedRequests: [...]"
  override def description(): String =
    s"endpoint=$endpoint, PushedRequests: ${requestFilter.fold("none")(_.toSeq.sorted.mkString("[", ",", "]"))}, " +
      s"plannedPartitions=${requests.length}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    requests.map(r => SpotifyRequestPartition(endpoint, r): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new SpotifyReaderFactory(
      lowered.getOrElse("fetcher", classOf[FixturePageFetcher].getName), lowered)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SpotifyApiMicroBatchStream(endpoint, requests, lowered)
}

/** Offset = position in the request-cursor sequence. The reference's
  * daily pull (spotify_etl2.py:102-117) is exactly this: each Airflow
  * run computes the next `after` cursor and issues one more request;
  * here the cursor sequence is the `requests` option and the
  * CHECKPOINT — not a recomputed wall-clock heuristic — records how
  * far ingestion got, so a crashed run resumes at the first unpulled
  * cursor instead of re-pulling or skipping a day.
  *
  * CONTRACT the positional offset imposes: across restarts of the same
  * checkpoint, the `requests` option must be an APPEND-ONLY extension
  * of the previous run's list (yesterday's cursors in place, new days
  * appended — the natural daily shape). Replacing the list (e.g.
  * supplying only the new day's cursor) remaps indices: a committed
  * offset of 3 against a 1-element list slices nothing and the stream
  * silently stalls, and editing pushed request-filters between runs
  * shifts positions the same way. A value-keyed offset (committed
  * cursor STRING rather than index) would lift the restriction at the
  * cost of ordering assumptions on the cursor values; with the
  * append-only discipline the positional form is exactly-once.
  */
private[spotify] case class SpotifyCursorOffset(idx: Int) extends Offset {
  override def json(): String = idx.toString
}

/** Microbatch tier of the connector: each micro-batch fans out the
  * next `maxRequestsPerBatch` request cursors (default: all available)
  * as one InputPartition per request — the same unit of API
  * parallelism as the batch scan, now with exactly-once progress
  * tracking. Commit is a no-op because the GETs are idempotent and
  * the checkpointed offset IS the durable state; replaying a batch
  * after a crash re-fetches the same cursors (task-retry semantics,
  * unchanged results downstream of the P5 malformed-row rule).
  */
private[spotify] class SpotifyApiMicroBatchStream(endpoint: String,
    requests: Array[String], lowered: Map[String, String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val perBatch =
    lowered.get("maxrequestsperbatch").map(_.toInt).getOrElse(math.max(requests.length, 1))

  // AvailableNow contract: drain everything known at prepare time,
  // still slice by perBatch per micro-batch. The cursor list is
  // static, so "known now" is always the whole list.
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): Offset = SpotifyCursorOffset(0)
  override def deserializeOffset(json: String): Offset =
    SpotifyCursorOffset(json.trim.toInt)
  override def latestOffset(): Offset = SpotifyCursorOffset(requests.length)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SpotifyCursorOffset].idx
    SpotifyCursorOffset(math.min(s + perBatch, requests.length))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    requests.slice(start.asInstanceOf[SpotifyCursorOffset].idx,
        end.asInstanceOf[SpotifyCursorOffset].idx)
      .map(r => SpotifyRequestPartition(endpoint, r): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new SpotifyReaderFactory(
      lowered.getOrElse("fetcher", classOf[FixturePageFetcher].getName), lowered)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[spotify] class SpotifyReaderFactory(fetcherClass: String, opts: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SpotifyRequestPartition]
    val fetcher = Class.forName(fetcherClass).getDeclaredConstructor()
      .newInstance().asInstanceOf[PageFetcher]
    new PartitionReader[InternalRow] {
      private val it = fetcher.pages(p.endpoint, p.request, opts).zipWithIndex
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val (payload, i) = it.next()
          current = InternalRow(
            UTF8String.fromString(p.endpoint), UTF8String.fromString(p.request),
            i, UTF8String.fromString(payload))
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
