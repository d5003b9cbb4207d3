package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{RedditHttp, RedditHttpClient}

/** The live-HTTP connector's OAuth token cache and retry state machine
  * (/root/reference/dags/Fetch_reddit.py:66-204 semantics), driven
  * against a localhost stub server branch by branch: token caching and
  * expiry, public-endpoint fallback, exponential backoff with the 64s
  * cap, Retry-After, 403 token invalidation + header refresh, immediate
  * raise on non-retryable statuses, network-error retries, invalid-JSON
  * retries, attempt exhaustion — plus the DSv2 `mode=online` read end
  * to end.
  */
class RedditHttpSpec extends SparkSpec {

  private val listingBody =
    """{"data": {"children": [
      |  {"kind": "t3", "data": {"name": "t3_a1", "id": "a1", "created_utc": 1700000000.0,
      |    "score": 5, "num_comments": 2, "title": "hello", "author": "u1",
      |    "permalink": "/r/x/comments/a1/", "subreddit": "x", "link_flair_text": "f"}},
      |  {"kind": "t3", "data": {"name": "t3_a2", "id": "a2", "created_utc": 1700000100.0,
      |    "score": 7, "num_comments": 0, "title": "world", "author": "u2",
      |    "permalink": "/r/x/comments/a2/", "subreddit": "x", "link_flair_text": null}}
      |]}}""".stripMargin

  /** A scripted stub: each GET consumes the next (status, body, headers)
    * step; records every request's path + headers.
    */
  private class Stub {
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = mutable.Buffer[(String, Map[String, String])]()
    val tokenHits = new AtomicInteger(0)
    @volatile var tokenResponses: List[(Int, String)] =
      List((200, """{"access_token": "tok1", "expires_in": 3600}"""))
    @volatile var listingSteps: List[(Int, String, Map[String, String])] =
      List((200, listingBody, Map.empty))

    private def headersOf(ex: HttpExchange): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      ex.getRequestHeaders.asScala.map { case (k, v) => k -> v.get(0) }.toMap
    }

    private def reply(ex: HttpExchange, status: Int, body: String,
        extra: Map[String, String] = Map.empty): Unit = {
      extra.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) {
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
      ex.close()
    }

    server.createContext("/api/v1/access_token", (ex: HttpExchange) => {
      tokenHits.incrementAndGet()
      requests += ((ex.getRequestURI.toString, headersOf(ex)))
      val (status, body) = tokenResponses.head
      if (tokenResponses.tail.nonEmpty) tokenResponses = tokenResponses.tail
      reply(ex, status, body)
    })
    server.createContext("/r/", (ex: HttpExchange) => {
      requests += ((ex.getRequestURI.toString, headersOf(ex)))
      val (status, body, hs) = listingSteps.head
      if (listingSteps.tail.nonEmpty) listingSteps = listingSteps.tail
      reply(ex, status, body, hs)
    })
    server.start()

    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  /** Deterministic client: zero jitter, recorded sleeps, fake clock. */
  private def client(stub: Stub, creds: Boolean, clock: () => Double = () => 1000.0)
      : (RedditHttpClient, mutable.Buffer[Double]) = {
    val sleeps = mutable.Buffer[Double]()
    val cfg = RedditHttp.Config(
      clientId = if (creds) Some("cid") else None,
      clientSecret = if (creds) Some("csec") else None,
      userAgent = "graft-test/0",
      tokenUrl = s"${stub.base}/api/v1/access_token",
      oauthApiBase = stub.base,
      publicApiBase = stub.base)
    (new RedditHttpClient(cfg, RedditHttp.JdkHttpTransport,
      sleepSeconds = sleeps += _, jitterUpTo = _ => 0.0, nowSeconds = clock), sleeps)
  }

  private def withStub[T](f: Stub => T): T = {
    val s = new Stub
    try f(s) finally s.stop()
  }

  test("token: fetched once, cached until 60s before expiry, then refreshed") {
    withStub { stub =>
      stub.tokenResponses = List(
        (200, """{"access_token": "tok1", "expires_in": 3600}"""),
        (200, """{"access_token": "tok2", "expires_in": 3600}"""))
      var now = 1000.0
      val (c, _) = client(stub, creds = true, clock = () => now)
      assert(c.token().contains("tok1"))
      now += 3000 // still >60s from expiry (1000+3600-60 = 4540)
      assert(c.token().contains("tok1"))
      assert(stub.tokenHits.get() == 1)
      now = 4545.0 // inside the 60s slack window
      assert(c.token().contains("tok2"))
      assert(stub.tokenHits.get() == 2)
      // basic auth carried cid:csec
      val auth = stub.requests.head._2.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Authorization") => v
      }
      val expected = java.util.Base64.getEncoder.encodeToString("cid:csec".getBytes("UTF-8"))
      assert(auth.contains(s"Basic $expected"))
    }
  }

  test("token: no credentials → None; non-200 and network errors degrade to None") {
    withStub { stub =>
      val (noCreds, _) = client(stub, creds = false)
      assert(noCreds.token().isEmpty)
      stub.tokenResponses = List((500, "boom"))
      val (c, _) = client(stub, creds = true)
      assert(c.token().isEmpty)
    }
    // network error: nothing listens on the stub's port anymore
    withStub { stub =>
      val (c, _) = client(stub, creds = true)
      stub.stop()
      assert(c.token().isEmpty)
    }
  }

  test("fetch without token uses the public .json endpoint, no Authorization") {
    withStub { stub =>
      val (c, _) = client(stub, creds = false)
      val body = c.fetchListingJson("x", 50)
      assert(body == listingBody)
      val (path, headers) = stub.requests.head
      assert(path.startsWith("/r/x/new.json?"), path)
      assert(path.contains("limit=50") && path.contains("raw_json=1"))
      assert(!headers.keys.exists(_.equalsIgnoreCase("Authorization")))
    }
  }

  test("fetch with token uses the OAuth endpoint and bearer header; limit capped at 100") {
    withStub { stub =>
      val (c, _) = client(stub, creds = true)
      c.fetchListingJson("x", 500)
      val (path, headers) = stub.requests.last
      assert(path.startsWith("/r/x/new?"), path)
      assert(path.contains("limit=100"))
      val auth = headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Authorization") => v }
      assert(auth.contains("bearer tok1"))
    }
  }

  test("retryable statuses back off exponentially, capped at 64s, then exhaust") {
    withStub { stub =>
      stub.listingSteps = List((503, "unavailable", Map.empty)) // repeats forever
      val (c, sleeps) = client(stub, creds = false)
      val e = intercept[RedditHttp.RetriesExhaustedException] {
        c.fetchListingJson("x", 10)
      }
      assert(e.lastStatus.contains(503))
      assert(sleeps.toSeq == Seq(2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 64.0, 64.0))
    }
  }

  test("Retry-After raises the wait but never lowers it below the backoff") {
    withStub { stub =>
      stub.listingSteps = List(
        (429, "slow down", Map("Retry-After" -> "10")),
        (429, "slow down", Map("Retry-After" -> "1")), // below backoff 4 → 4 wins
        (429, "slow down", Map("Retry-After" -> "nonsense")), // unparseable → backoff
        (200, listingBody, Map.empty))
      val (c, sleeps) = client(stub, creds = false)
      c.fetchListingJson("x", 10)
      assert(sleeps.toSeq == Seq(10.0, 4.0, 8.0))
    }
  }

  test("403 while holding a token invalidates the cache and refreshes the bearer") {
    withStub { stub =>
      stub.tokenResponses = List(
        (200, """{"access_token": "tok1", "expires_in": 3600}"""),
        (200, """{"access_token": "tok2", "expires_in": 3600}"""))
      stub.listingSteps = List(
        (403, "forbidden", Map.empty),
        (200, listingBody, Map.empty))
      val (c, _) = client(stub, creds = true)
      c.fetchListingJson("x", 10)
      assert(stub.tokenHits.get() == 2, "403 must force a token refetch")
      val bearers = stub.requests.collect {
        case (p, hs) if p.startsWith("/r/") =>
          hs.collectFirst { case (k, v) if k.equalsIgnoreCase("Authorization") => v }.orNull
      }
      assert(bearers.toSeq == Seq("bearer tok1", "bearer tok2"))
    }
  }

  test("non-retryable statuses raise immediately (no sleeps)") {
    withStub { stub =>
      stub.listingSteps = List((404, "no such subreddit", Map.empty))
      val (c, sleeps) = client(stub, creds = false)
      val e = intercept[RedditHttp.HttpStatusException] { c.fetchListingJson("x", 10) }
      assert(e.status == 404)
      assert(sleeps.isEmpty)
      assert(stub.requests.size == 1)
    }
  }

  test("network errors retry with backoff and exhaust with last_status=None") {
    withStub { stub =>
      val (c, sleeps) = client(stub, creds = false)
      stub.stop() // connection refused from now on
      val e = intercept[RedditHttp.RetriesExhaustedException] {
        c.fetchListingJson("x", 10)
      }
      assert(e.lastStatus.isEmpty)
      assert(sleeps.toSeq == Seq(2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 64.0, 64.0))
    }
  }

  test("invalid JSON on 200 sleeps and retries until a parseable page arrives") {
    withStub { stub =>
      stub.listingSteps = List(
        (200, "<html>not json</html>", Map.empty),
        (200, listingBody, Map.empty))
      val (c, sleeps) = client(stub, creds = false)
      assert(c.fetchListingJson("x", 10) == listingBody)
      assert(sleeps.toSeq == Seq(2.0))
    }
  }

  test("DSv2 mode=online reads exploded posts straight off the stub server") {
    withStub { stub =>
      val df = spark.read.format("reddit-listing")
        .option("mode", "online")
        .option("subreddit", "x")
        .option("limit", "10")
        .option("publicApiBase", stub.base)
        .load()
      val rows = df.collect().map(r => (r.getString(0), r.getLong(3))).toSeq
      assert(rows == Seq(("t3_a1", 5L), ("t3_a2", 7L)))
    }
  }
}
