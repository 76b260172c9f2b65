package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

/** Live-mode OpenSky ingest against a localhost stub (no network egress):
  * OAuth2 client-credentials handshake, bearer-authenticated states GET,
  * and — the load-bearing part — the DataFrame's lat/lon filters arriving
  * at the server as lamin/lomin/lamax/lomax query params (source-level
  * pushdown over HTTP, reference functions.py:42-50).
  */
class OpenSkyLiveSpec extends SparkTestBase {

  private val payload =
    """{"time": 1757059200, "states": [
      ["39c4a1", "AFR123  ", "France", 1757059190, 1757059195,
       -1.6100, 47.1600, 310.5, false, 82.3, 184.2, 4.2, null,
       335.2, "1000", false, 0],
      ["4ca7b3", "RYR45Q  ", "Ireland", 1757059188, 1757059195,
       -1.5800, 47.1400, null, true, 4.1, 90.0, 0.0, "[1,2]",
       27.0, "7000", false, 0]]}"""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("live mode authenticates and pushes the bbox to the server as query params") {
    val tokenForm = new AtomicReference[String]()
    val statesQuery = new AtomicReference[String]()
    val statesAuth = new AtomicReference[String]()

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", (ex: HttpExchange) => {
      tokenForm.set(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      respond(ex, 200, """{"access_token": "tok-42", "token_type": "Bearer"}""")
    })
    server.createContext("/states", (ex: HttpExchange) => {
      statesQuery.set(ex.getRequestURI.getQuery)
      statesAuth.set(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, payload)
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = spark.read.format("graft.sources.OpenSkyTableProvider")
        .option("mode", "live")
        .option("url", s"http://127.0.0.1:$port/states")
        .option("tokenUrl", s"http://127.0.0.1:$port/token")
        .option("clientId", "cid").option("clientSecret", "sec ret")
        .load()
        .filter(col("latitude") >= 47.0 && col("latitude") <= 48.0 &&
          col("longitude") >= -2.0 && col("longitude") <= -1.0)
        .select("icao24", "callsign", "on_ground")

      val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      assert(rows.toSet == Set(("39c4a1", "AFR123", false), ("4ca7b3", "RYR45Q", true)))

      assert(tokenForm.get.contains("grant_type=client_credentials"))
      assert(tokenForm.get.contains("client_id=cid"))
      assert(tokenForm.get.contains("client_secret=sec+ret"), tokenForm.get)
      assert(statesAuth.get == "Bearer tok-42")
      val params = statesQuery.get.split("&").toSet
      assert(params == Set("lamin=47.0", "lamax=48.0", "lomin=-2.0", "lomax=-1.0"),
        statesQuery.get)
    } finally server.stop(0)
  }

  test("a revoked CACHED token triggers one re-auth and self-heals; fresh rejections don't loop") {
    val tokenCalls = new AtomicInteger(0)
    val statesCalls = new AtomicInteger(0)
    val revoked = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      val n = tokenCalls.incrementAndGet()
      respond(ex, 200, s"""{"access_token": "tok-$n", "expires_in": 3600}""")
    })
    server.createContext("/states", (ex: HttpExchange) => {
      statesCalls.incrementAndGet()
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      if (revoked.containsKey(auth)) respond(ex, 401, "revoked")
      else respond(ex, 200, payload)
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val opts = Map(
        "url" -> s"http://127.0.0.1:$port/states",
        "tokenUrl" -> s"http://127.0.0.1:$port/token",
        // unique creds so this test never reuses another test's cached token
        "clientId" -> "cid-retry", "clientSecret" -> "s-retry")
      // fetch 1: fresh handshake (tok-1), accepted — primes the cache
      assert(graft.ingest.OpenSkyLive.fetch(opts, Array.empty).contains("39c4a1"))
      assert(tokenCalls.get == 1 && statesCalls.get == 1)
      // the server now revokes tok-1; the next fetch hits 401 on the CACHED
      // token, re-authenticates once (tok-2), and succeeds
      revoked.put("Bearer tok-1", true)
      assert(graft.ingest.OpenSkyLive.fetch(opts, Array.empty).contains("39c4a1"))
      assert(tokenCalls.get == 2, s"expected one re-auth, got ${tokenCalls.get}")
      assert(statesCalls.get == 3, s"expected 401 + retry, got ${statesCalls.get}")
    } finally server.stop(0)
  }

  test("live mode surfaces a non-2xx token response as an error, not empty data") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", (ex: HttpExchange) => respond(ex, 403, "denied"))
    server.start()
    try {
      val port = server.getAddress.getPort
      val e = intercept[Exception] {
        spark.read.format("graft.sources.OpenSkyTableProvider")
          .option("mode", "live")
          .option("url", s"http://127.0.0.1:$port/states")
          .option("tokenUrl", s"http://127.0.0.1:$port/token")
          .option("clientId", "cid").option("clientSecret", "s")
          .load().collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("403")), e)
    } finally server.stop(0)
  }
}
