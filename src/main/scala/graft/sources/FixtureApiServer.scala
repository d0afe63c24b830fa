package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetAddress, InetSocketAddress, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Loopback test double for the three source APIs the reference extracts
  * from. The container has zero egress, so the HTTP CONTRACTS — pagination,
  * auth, rate-limit/retry signalling — are reproduced here from the
  * reference's own client code (cited per endpoint) and served from the
  * bundled fixture JSONL. The connector under test ([[RestSource]]/[[Http]])
  * is the real production path; only the host is fake.
  *
  * Every endpoint requires auth (401 without it) and can inject
  * `failFirst` leading failures (429 with `Retry-After: 0`, then 500) to
  * exercise the retry policy on the real wire.
  */
final class FixtureApiServer private[sources] (server: HttpServer) {
  val port: Int    = server.getAddress.getPort
  def base: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)
  private[sources] val requests = new AtomicInteger(0)
  private[sources] val uriAttempts =
    new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
  /** Total data requests served (for fetch-once assertions in specs). */
  def requestCount: Int = requests.get()
}

object FixtureApiServer {

  /** One fixture record: the raw JSONL line plus the field a date-range
    * filter applies to (`created_at` / `TxnDate`).
    */
  private final case class Rec(line: String, ts: String)

  private def load(jsonlPath: String, tsField: String): Vector[Rec] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    Files
      .readAllLines(Paths.get(jsonlPath), UTF_8)
      .asScala
      .iterator
      .filter(_.trim.nonEmpty)
      .map { line =>
        val node = mapper.readTree(line)
        Rec(line.trim, Option(node.get(tsField)).map(_.asText).getOrElse(""))
      }
      .toVector
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery)
      .map(_.split('&').iterator.map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else URLDecoder.decode(kv.take(i), UTF_8) -> URLDecoder.decode(kv.drop(i + 1), UTF_8)
      }.toMap)
      .getOrElse(Map.empty)

  private def respond(ex: HttpExchange, status: Int, body: String, headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def start(routes: (String, (FixtureApiServer, HttpExchange) => Unit)*): FixtureApiServer = {
    val server = HttpServer.create(new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    val wrapped = new FixtureApiServer(server)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) =>
        try h(wrapped, ex)
        catch { case e: Exception => respond(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""") })
    }
    server.setExecutor(null)
    server.start()
    wrapped
  }

  /** Failure injection, keyed PER URI: the first `failFirst` attempts at
    * each distinct request URI get 429 (Retry-After: 0) alternating with
    * 500 — both classes the client must retry. Per-URI (not a global
    * prefix) so EVERY request path exercises the retry policy: a global
    * prefix would be fully consumed by whichever request arrives first
    * (the driver-side count call), leaving the executor-side page
    * fetches — the path whose serialization/retry behavior most needs
    * coverage — served clean (r5 self-review).
    */
  private def injectFailure(srv: FixtureApiServer, ex: HttpExchange, failFirst: Int): Boolean = {
    srv.requests.incrementAndGet()
    val n = srv.uriAttempts
      .computeIfAbsent(ex.getRequestURI.toString, _ => new AtomicInteger(0))
      .incrementAndGet()
    if (n <= failFirst) {
      if (n % 2 == 1) respond(ex, 429, """{"error":"rate limited"}""", Map("Retry-After" -> "0"))
      else respond(ex, 500, """{"error":"transient"}""")
      true
    } else false
  }

  private def authorized(ex: HttpExchange, expect: String): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expect)

  private def inRange(rec: Rec, begin: Option[String], end: Option[String]): Boolean =
    begin.forall(rec.ts >= _) && end.forall(rec.ts < _)

  // ---- Square Connect v1 ------------------------------------------------

  /** `GET /v1/{location}/payments?begin_time=..&end_time=..[&batch_token=..]`
    * → body = JSON array of payments (≤ pageSize); while more pages remain,
    * a `Link` header carries the next batch token in EXACTLY the shape the
    * reference scrapes with `batch_token=(.*?)&begin_time=`
    * (`square_ETL.py:88-91`). Bearer-token auth (`square_ETL.py:70`).
    */
  /** Chaos injection (r8, adversarial REST server): `malformedAt` serves
    * 200 with a TRUNCATED JSON body for that 0-based page ordinal (a
    * proxy/server fault the HTTP retry budget cannot see); `badLinkAt`
    * emits a `Link` header whose shape the reference's batch-token regex
    * cannot scrape at that ordinal (a contract break that must not
    * silently truncate the chain).
    */
  def squareV1(
      jsonlPath: String,
      locationId: String,
      token: String,
      pageSize: Int,
      failFirst: Int = 0,
      malformedAt: Int = -1,
      badLinkAt: Int = -1,
      benignFinalLink: Boolean = false): FixtureApiServer = {
    val recs = load(jsonlPath, "created_at")
    start(s"/v1/$locationId/payments" -> { (srv, ex) =>
      if (!injectFailure(srv, ex, failFirst)) {
        if (!authorized(ex, s"Bearer $token")) respond(ex, 401, """{"error":"unauthorized"}""")
        else {
          val p     = params(ex)
          val begin = p.get("begin_time")
          val end   = p.get("end_time")
          val window = recs.filter(inRange(_, begin, end))
          val off    = p.get("batch_token").flatMap(_.toIntOption).getOrElse(0)
          val ordinal = off / math.max(1, pageSize)
          val page   = window.slice(off, off + pageSize)
          val hdrs =
            if (off + pageSize >= window.size && benignFinalLink)
              // a REAL API shape: the last page still carries a Link
              // header, just without a rel="next" leg — must read as a
              // normal end of chain, not a truncation fault (chaos r8)
              Map("Link" ->
                s"""<${srv.base}/v1/$locationId/payments?begin_time=x>;rel="first"""")
            else if (off + pageSize < window.size) {
              val nextTok = (off + pageSize).toString
              val b       = begin.map(URLEncoder.encode(_, UTF_8)).getOrElse("")
              val e       = end.map(URLEncoder.encode(_, UTF_8)).getOrElse("")
              if (ordinal == badLinkAt)
                Map("Link" ->
                  s"""<${srv.base}/v1/$locationId/payments?cursor=$nextTok&opaque=1>;rel="next"""")
              else
                Map("Link" ->
                  s"""<${srv.base}/v1/$locationId/payments?batch_token=$nextTok&begin_time=$b&end_time=$e>;rel="next"""")
            } else Map.empty[String, String]
          if (ordinal == malformedAt)
            respond(ex, 200, page.map(_.line).mkString("[", ",", "]").dropRight(17), hdrs)
          else
            respond(ex, 200, page.map(_.line).mkString("[", ",", "]"), hdrs)
        }
      }
    })
  }

  // ---- Shopify admin ----------------------------------------------------

  /** `GET /admin/orders/count.json?created_at_min=..&created_at_max=..` →
    * `{"count": N}`; `GET /admin/orders.json?...&limit=L&page=K` (1-based)
    * → `{"orders":[...]}` (`shopify_ETL.py:70-88`). Basic auth — the
    * reference embeds `key:password` in the URL (`:70-73`); the connector
    * sends the equivalent `Authorization: Basic` header.
    */
  /** Chaos injection (r8): `countDrift` shifts the reported count away
    * from the actual window size (clamped ≥ 0) — the plan-time snapshot
    * race every count-then-pages API has; `malformedAt` serves a
    * truncated body for that 1-based page; `malformedCount` makes the
    * count endpoint itself return garbage JSON.
    */
  def shopifyAdmin(
      jsonlPath: String,
      user: String,
      pass: String,
      failFirst: Int = 0,
      countDrift: Int = 0,
      malformedAt: Int = -1,
      malformedCount: Boolean = false): FixtureApiServer = {
    val recs = load(jsonlPath, "created_at")
    val expect = "Basic " + java.util.Base64.getEncoder.encodeToString(s"$user:$pass".getBytes(UTF_8))
    def window(p: Map[String, String]) =
      recs.filter(inRange(_, p.get("created_at_min"), p.get("created_at_max")))
    start(
      "/admin/orders/count.json" -> { (srv, ex) =>
        if (!injectFailure(srv, ex, failFirst)) {
          if (!authorized(ex, expect)) respond(ex, 401, """{"error":"unauthorized"}""")
          else if (malformedCount) respond(ex, 200, """{"count": "oops""")
          else respond(ex, 200, s"""{"count":${math.max(0, window(params(ex)).size + countDrift)}}""")
        }
      },
      "/admin/orders.json" -> { (srv, ex) =>
        if (!injectFailure(srv, ex, failFirst)) {
          if (!authorized(ex, expect)) respond(ex, 401, """{"error":"unauthorized"}""")
          else {
            val p     = params(ex)
            val limit = p.get("limit").flatMap(_.toIntOption).getOrElse(50)
            val page  = p.get("page").flatMap(_.toIntOption).getOrElse(1)
            val slice = window(p).slice((page - 1) * limit, page * limit)
            if (page == malformedAt)
              respond(ex, 200, slice.map(_.line).mkString("""{"orders":[""", ",", "]}").dropRight(9))
            else
              respond(ex, 200, slice.map(_.line).mkString("""{"orders":[""", ",", "]}"))
          }
        }
      }
    )
  }

  // ---- QuickBooks query API ----------------------------------------------

  /** `GET /v3/company/{realm}/query?query=<sql>` — `select count(*) from
    * Invoice where TxnDate > '..' and TxnDate < '..'` →
    * `{"QueryResponse":{"totalCount":N}}`; with `STARTPOSITION S MAXRESULTS
    * M` (1-based) → `{"QueryResponse":{"Invoice":[...]}}`
    * (`quickbooks_ETL.py:92-113`). Bearer auth (OAuth2 access token,
    * `quickbooks_ETL.py:70-82`).
    */
  /** Chaos injection (r8): `countDrift` shifts the reported totalCount
    * (clamped ≥ 0); `malformedAt` truncates the body of that 0-based
    * page ordinal (ordinal = (STARTPOSITION−1) / MAXRESULTS). Empty
    * pages keep QB's real contract: the entity key is OMITTED from
    * QueryResponse, not an empty array.
    */
  def qbQuery(
      jsonlPath: String,
      realmId: String,
      token: String,
      failFirst: Int = 0,
      entity: String = "Invoice",
      countDrift: Int = 0,
      malformedAt: Int = -1): FixtureApiServer = {
    val recs     = load(jsonlPath, "TxnDate")
    val startPos = """STARTPOSITION\s+(\d+)\s+MAXRESULTS\s+(\d+)""".r
    val range    = """TxnDate\s*>\s*'([^']*)'\s*and\s*TxnDate\s*<\s*'([^']*)'""".r
    start(s"/v3/company/$realmId/query" -> { (srv, ex) =>
      if (!injectFailure(srv, ex, failFirst)) {
        if (!authorized(ex, s"Bearer $token")) respond(ex, 401, """{"error":"unauthorized"}""")
        else {
          val q = params(ex).getOrElse("query", "")
          val window = range.findFirstMatchIn(q) match {
            // QB SQL range is exclusive on both ends (TxnDate > a and < b)
            case Some(m) => recs.filter(r => r.ts > m.group(1) && r.ts < m.group(2))
            case None    => recs
          }
          if (q.toLowerCase.contains("count(*)"))
            respond(ex, 200, s"""{"QueryResponse":{"totalCount":${math.max(0, window.size + countDrift)}}}""")
          else {
            val (s, m) = startPos.findFirstMatchIn(q) match {
              case Some(g) => (g.group(1).toInt, g.group(2).toInt)
              case None    => (1, window.size)
            }
            val slice = window.slice(s - 1, s - 1 + m)
            val body =
              if (slice.isEmpty) """{"QueryResponse":{}}"""
              else slice.map(_.line).mkString(s"""{"QueryResponse":{"$entity":[""", ",", "]}}")
            if ((s - 1) / math.max(1, m) == malformedAt)
              respond(ex, 200, body.dropRight(11))
            else
              respond(ex, 200, body)
          }
        }
      }
    })
  }
}
