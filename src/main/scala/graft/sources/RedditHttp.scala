package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.json4s.jackson.JsonMethods
import org.json4s.{JInt, JString}

/** Live-HTTP connector core for the reddit listing source (SURVEY §2.1
  * S1 online path + S2 OAuth): the userless client-credentials token
  * fetch/cache and the listing-GET retry state machine, mirroring
  * /root/reference/dags/Fetch_reddit.py:66-100 (token) and :103-204
  * (retry loop). The sandbox has no network, so the transport, clock,
  * sleeper and jitter source are injected — RedditHttpSpec drives every
  * branch against a localhost stub server; production wiring is
  * [[JdkHttpTransport]] + real time.
  *
  * State machine (Fetch_reddit.py:116-204, reproduced exactly):
  *  - endpoint chosen ONCE per fetch: OAuth host when a token is
  *    available at entry, public host otherwise;
  *  - up to 8 attempts; backoff starts at 2s, doubles per retry, capped
  *    at 64s; jitter U(0, 1.7) on top (U(0, 1.5) after invalid JSON);
  *  - network error → sleep, double, retry;
  *  - 200 with unparseable JSON → sleep, double, retry;
  *  - 429/403/500/502/503/504 → wait = max(backoff, Retry-After) when
  *    the header parses, sleep, double; a 403 while holding a token
  *    additionally invalidates the cache and refreshes the
  *    Authorization header before the next attempt;
  *  - any other non-200 (401 without the retryable set, 404, …) raises
  *    immediately;
  *  - attempts exhausted → error carrying the last status.
  */
object RedditHttp {

  final case class Response(status: Int, body: String, headers: Map[String, String]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  }

  /** Minimal injectable transport; network failures surface as
    * IOException (the analog of requests' RequestException family).
    */
  trait Transport extends Serializable {
    def get(url: String, headers: Map[String, String]): Response
    def postForm(url: String, headers: Map[String, String],
        form: Map[String, String]): Response
  }

  /** JDK HttpURLConnection transport, 20s timeouts like the reference. */
  object JdkHttpTransport extends Transport {
    private def open(url: String): HttpURLConnection = {
      val c = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      c.setConnectTimeout(20000)
      c.setReadTimeout(20000)
      c
    }

    private def finish(c: HttpURLConnection): Response = {
      val status = c.getResponseCode
      val in = if (status >= 400) c.getErrorStream else c.getInputStream
      val body =
        if (in == null) ""
        else try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      val headers = c.getHeaderFields.asScala.collect {
        case (k, vs) if k != null && !vs.isEmpty => k -> vs.get(0)
      }.toMap
      Response(status, body, headers)
    }

    override def get(url: String, headers: Map[String, String]): Response = {
      val c = open(url)
      headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
      finish(c)
    }

    override def postForm(url: String, headers: Map[String, String],
        form: Map[String, String]): Response = {
      val c = open(url)
      c.setRequestMethod("POST")
      c.setDoOutput(true)
      headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
      c.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
      val payload = form.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val out = c.getOutputStream
      try out.write(payload.getBytes(StandardCharsets.UTF_8)) finally out.close()
      finish(c)
    }
  }

  final case class Config(
      clientId: Option[String] = None,
      clientSecret: Option[String] = None,
      userAgent: String = "graft/0.1",
      tokenUrl: String = "https://www.reddit.com/api/v1/access_token",
      oauthApiBase: String = "https://oauth.reddit.com",
      publicApiBase: String = "https://www.reddit.com",
      maxAttempts: Int = 8,
      backoffStart: Double = 2.0,
      backoffCap: Double = 64.0)

  /** Raised for non-retryable HTTP statuses (requests'
    * raise_for_status analog, Fetch_reddit.py:198-202).
    */
  final class HttpStatusException(val status: Int, body: String)
    extends RuntimeException(s"HTTP $status: ${body.take(200)}")

  /** Raised when all attempts are exhausted (Fetch_reddit.py:204). */
  final class RetriesExhaustedException(val lastStatus: Option[Int])
    extends RuntimeException(
      s"Reddit API failed after retries; last_status=${lastStatus.map(_.toString).getOrElse("None")}")

  /** Fetch_reddit.py:176. */
  val RetryableStatuses: Set[Int] = Set(429, 403, 500, 502, 503, 504)
}

/** One client instance = one token cache (the reference's module-global
  * `_token_cache`, Fetch_reddit.py:47). `sleepSeconds` receives the full
  * computed wait; `jitterUpTo(u)` must return a value in [0, u) —
  * injected so tests are deterministic and instant.
  */
class RedditHttpClient(
    val config: RedditHttp.Config,
    transport: RedditHttp.Transport,
    sleepSeconds: Double => Unit = s => Thread.sleep((s * 1000).toLong),
    jitterUpTo: Double => Double = u => scala.util.Random.nextDouble() * u,
    nowSeconds: () => Double = () => System.currentTimeMillis() / 1000.0)
  extends Serializable {

  import RedditHttp._

  private var cachedToken: Option[String] = None
  private var expiresAt: Double = 0.0

  /** Fetch-or-cache the userless OAuth token (Fetch_reddit.py:66-100):
    * None without credentials, cached while >60s from expiry, and every
    * failure mode (non-200, missing token, network error) degrades to
    * None — the caller falls back to the public endpoint.
    */
  def token(): Option[String] = synchronized {
    if (config.clientId.isEmpty || config.clientSecret.isEmpty) None
    else {
      val now = nowSeconds()
      if (cachedToken.isDefined && now < expiresAt - 60) cachedToken
      else {
        val basic = Base64.getEncoder.encodeToString(
          s"${config.clientId.get}:${config.clientSecret.get}".getBytes(StandardCharsets.UTF_8))
        val resp =
          try transport.postForm(config.tokenUrl,
            Map("User-Agent" -> config.userAgent, "Authorization" -> s"Basic $basic"),
            Map("grant_type" -> "client_credentials"))
          catch { case _: IOException => return None }
        if (resp.status != 200) None
        else Try(JsonMethods.parse(resp.body)).toOption.flatMap { j =>
          val tok = j \ "access_token" match {
            case JString(t) if t.nonEmpty => Some(t)
            case _ => None
          }
          val expiresIn = j \ "expires_in" match {
            case JInt(n) => n.toLong
            case _ => 3600L
          }
          tok.foreach { t =>
            cachedToken = Some(t)
            expiresAt = now + expiresIn
          }
          tok
        }
      }
    }
  }

  def invalidateToken(): Unit = synchronized {
    cachedToken = None
    expiresAt = 0.0
  }

  /** One listing fetch through the full retry state machine; returns the
    * RAW listing JSON body, which feeds the existing S1 parsers
    * ([[ListingSource]] / the DSv2 reader) unchanged.
    */
  def fetchListingJson(subreddit: String, limit: Int): String = {
    var tok = token()
    val useOAuth = tok.isDefined // endpoint pinned at entry, like base_url
    val cappedLimit = math.min(limit, 100)
    var backoff = config.backoffStart
    var lastStatus: Option[Int] = None
    def bump(): Unit = backoff = math.min(backoff * 2, config.backoffCap)
    def url: String =
      if (useOAuth) s"${config.oauthApiBase}/r/$subreddit/new?limit=$cappedLimit&raw_json=1"
      else s"${config.publicApiBase}/r/$subreddit/new.json?limit=$cappedLimit&raw_json=1"
    def headers: Map[String, String] = {
      val base = Map("User-Agent" -> config.userAgent, "Accept" -> "application/json")
      tok.fold(base)(t => base + ("Authorization" -> s"bearer $t"))
    }

    var attempt = 0
    while (attempt < config.maxAttempts) {
      val resp =
        try Some(transport.get(url, headers))
        catch {
          case _: IOException =>
            sleepSeconds(backoff + jitterUpTo(1.7))
            bump()
            None
        }
      resp.foreach { r =>
        lastStatus = Some(r.status)
        if (r.status == 200) {
          if (Try(JsonMethods.parse(r.body)).isSuccess) return r.body
          sleepSeconds(backoff + jitterUpTo(1.5))
          bump()
        } else if (RetryableStatuses(r.status)) {
          val wait = r.header("Retry-After")
            .flatMap(v => Try(v.toDouble).toOption)
            .fold(backoff)(ra => math.max(backoff, ra))
          sleepSeconds(wait + jitterUpTo(1.7))
          bump()
          if ((r.status == 401 || r.status == 403) && tok.isDefined) {
            invalidateToken()
            tok = token() // refreshed Authorization on the next attempt
          }
        } else {
          throw new HttpStatusException(r.status, r.body)
        }
      }
      attempt += 1
    }
    throw new RetriesExhaustedException(lastStatus)
  }
}
