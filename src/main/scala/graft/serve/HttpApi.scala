package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Minimal HTTP binding over [[Serve]], mirroring the reference's FastAPI
  * app (/root/reference/api/main.py:14-51):
  *
  *  - `GET /`            → welcome message
  *  - `GET /health`      → `{"status":"healthy","timestamp":…}`
  *  - `GET /reports`     → `[{"id":0,"report":"nyc_salary_matches"},…]`
  *  - `GET /reports/{id}?offset=0&limit=N` → JSON array of row objects
  *    (the reference hardcodes offset 0 / limit 750000, main.py:45; the
  *    query params expose the pagination fetch_single_dataset already
  *    takes, fetch_data.py:28).
  *  - `GET /dashboard`, `GET /dashboard/data` → the viewer ([[Dashboard]]).
  *  - `GET /privacy/k-anonymity?id=N&quasi=c1,c2&k=10` → the p1
  *    disclosure-risk report over a registered gold table (summary +
  *    a bounded riskiest-first page) — the pre-release check the
  *    reference's public hiring data never runs.
  *
  * Status mapping follows fetch_data.py:72-80: malformed/unknown id and
  * bad parameters (negative offsets, half-specified ranges, undecodable
  * query strings) → 400, empty page → 404 ("Report not found",
  * main.py:46-47).
  *
  * Uses the JDK's built-in `com.sun.net.httpserver` — no extra
  * dependencies; a handful of serving threads is plenty because each
  * request fans out into a distributed Spark job anyway (the HTTP layer
  * is not the parallelism boundary).
  */
object HttpApi {

  final case class Api(server: HttpServer,
      pool: java.util.concurrent.ExecutorService) {
    def port: Int = server.getAddress.getPort
    /** Stops the listener AND its worker pool — the pool's threads are
      * non-daemon, so leaving them running would keep the embedding JVM
      * alive after main() returns. */
    def stop(): Unit = {
      server.stop(0)
      pool.shutdown()
    }
  }

  /** Start serving on `host:port` (port 0 = ephemeral, for tests).
    *
    * Binds LOOPBACK by default: the API serves unauthenticated full-table
    * paging of the gold layer, so exposing it on every interface must be
    * an explicit decision — pass `host = "0.0.0.0"` to serve externally
    * (and put an authenticating proxy in front, as the reference deploys
    * FastAPI behind its own ingress). */
  def start(spark: SparkSession, port: Int = 8000,
      maxPageRows: Int = Serve.defaultMaxPageRows,
      host: String = "127.0.0.1"): Api = {
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(spark, ex, maxPageRows))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    server.start()
    Api(server, pool)
  }

  private val ReportPath = "/reports/([^/]+)".r

  /** Client-input errors that must map to 400, not 500. */
  private final class BadRequest(msg: String) extends RuntimeException(msg)

  private def handle(spark: SparkSession, ex: HttpExchange,
      maxPageRows: Int): Unit = {
    // handler-local: HttpExchange.setAttribute writes to the CONTEXT's
    // shared attribute map (one streamed page would poison every later
    // exchange), so committed-ness must live on this call's stack
    var headersCommitted = false
    try {
      if (ex.getRequestMethod != "GET") send(ex, 405, jsonDetail("Method Not Allowed"))
      else ex.getRequestURI.getPath.stripSuffix("/") match {
        case "" =>
          send(ex, 200, """{"message":"Welcome to the NYC Jobs Audit API."}""")
        case "/health" =>
          send(ex, 200,
            s"""{"status":"healthy","timestamp":"${java.time.Instant.now()}"}""")
        case "/reports" =>
          val items = Serve.reportsList
            .map { case (id, name) => s"""{"id":$id,"report":"$name"}""" }
          send(ex, 200, items.mkString("[", ",", "]"))
        case "/dashboard" =>
          sendHtml(ex, 200, Dashboard.html)
        case "/dashboard/data" =>
          val p = queryParams(ex)
          val id = p.get("id").flatMap(_.toIntOption)
            .getOrElse(throw new BadRequest("id must be an integer"))
          val ds = Serve.registry.find(_.id == id)
            .getOrElse(throw new BadRequest(s"Invalid dataset_id: $id"))
          val lo = p.get("lo").map(_.toDoubleOption
            .getOrElse(throw new BadRequest("lo must be numeric")))
          val hi = p.get("hi").map(_.toDoubleOption
            .getOrElse(throw new BadRequest("hi must be numeric")))
          // a half-specified range must fail, not silently unfilter
          if (lo.isDefined != hi.isDefined)
            throw new BadRequest("lo and hi must be given together")
          val maxRows = p.get("max_rows")
            .map(_.toIntOption.filter(_ >= 0)
              .getOrElse(throw new BadRequest("max_rows must be a non-negative integer")))
            .getOrElse(1000)
          // score_col is client input — resolve it against the dataset's
          // actual columns here so a typo (or probing) is a 400, not an
          // AnalysisException-turned-500 aggregating arbitrary columns;
          // resolution is case-insensitive like Spark's own analyzer
          val requested = p.getOrElse("score_col", ds.sortKey)
          val scoreCol = spark.table(ds.table).columns
            .find(_.equalsIgnoreCase(requested))
            .getOrElse(throw new BadRequest(s"Invalid score_col: $requested"))
          val s = Serve.dashboardSection(spark, id, scoreCol, lo, hi,
            math.min(maxRows, maxPageRows))
          val statsJson = s.stats.fold("null") { case (mean, mn, mx) =>
            s"""{"mean":$mean,"min":$mn,"max":$mx}"""
          }
          send(ex, 200,
            s"""{"total":${s.total},"filtered":${s.filtered},""" +
              s""""stats":$statsJson,"rows":${s.rows.mkString("[", ",", "]")}}""")
        case "/privacy/k-anonymity" =>
          // the p1 disclosure-risk report over a REGISTERED gold table:
          // quasi columns are client input, resolved case-insensitively
          // against the table's real columns (a typo or a probe is a
          // 400, never an AnalysisException-turned-500)
          import org.apache.spark.sql.functions.{col, count, lit, sum, when}
          val p = queryParams(ex)
          val id = p.get("id").flatMap(_.toIntOption)
            .getOrElse(throw new BadRequest("id must be an integer"))
          val ds = Serve.registry.find(_.id == id)
            .getOrElse(throw new BadRequest(s"Invalid dataset_id: $id"))
          val cols = spark.table(ds.table).columns
          val quasi = p.get("quasi")
            .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
            .filter(_.nonEmpty)
            .getOrElse(throw new BadRequest(
              "quasi must name at least one column"))
            .map(q => cols.find(_.equalsIgnoreCase(q))
              .getOrElse(throw new BadRequest(s"Invalid quasi column: $q")))
          val k = p.get("k")
            .map(_.toIntOption.filter(_ >= 2)
              .getOrElse(throw new BadRequest("k must be an integer >= 2")))
            .getOrElse(10)
          val rep = graft.operators.Privacy
            .kAnonymityReport(spark.table(ds.table), quasi, k)
          val sm = rep.agg(count(lit(1)).as("g"),
              sum(col("at_risk")).as("rg"),
              sum(when(col("at_risk") === 1, col("group_n"))
                .otherwise(lit(0L))).as("rr"))
            .head()
          // riskiest groups first, quasi tie-break: a stable, bounded page
          val rows = rep
            .orderBy(col("group_n").asc +: quasi.map(col(_).asc): _*)
            .limit(maxPageRows).toJSON.collect()
          send(ex, 200,
            s"""{"k":$k,"quasi":${quasi.map(q => "\"" + q + "\"")
              .mkString("[", ",", "]")},""" +
              s""""groups":${sm.getLong(0)},""" +
              s""""at_risk_groups":${Option(sm.get(1)).getOrElse(0L)},""" +
              s""""at_risk_rows":${Option(sm.get(2)).getOrElse(0L)},""" +
              s""""rows":${rows.mkString("[", ",", "]")}}""")
        case ReportPath(idStr) =>
          val params = queryParams(ex)
          val id = idStr.toIntOption
            .getOrElse(throw new BadRequest("id must be an integer"))
          if (!Serve.registry.exists(_.id == id))
            throw new BadRequest(s"Invalid dataset_id: $idStr")
          def nonNeg(name: String, default: Int): Int =
            params.get(name)
              .map(_.toIntOption.filter(_ >= 0).getOrElse(
                throw new BadRequest(s"$name must be a non-negative integer")))
              .getOrElse(default)
          val rows = Serve.fetchJsonIterator(spark, id,
            nonNeg("offset", 0), nonNeg("limit", maxPageRows), maxPageRows)
          if (!rows.hasNext) send(ex, 404, jsonDetail("Report not found"))
          else sendJsonArray(ex, rows, onCommit = () => headersCommitted = true)
        case _ =>
          send(ex, 404, jsonDetail("Not Found"))
      }
    } catch {
      // once a chunked 200 is committed (streaming page), headers cannot
      // be resent, and the JDK HttpExchange offers no way to abort the
      // connection without a clean terminal chunk (no socket access;
      // sun.net.httpserver is strongly encapsulated). The documented
      // failure signal is therefore the BODY: the closing ']' is written
      // only after the iterator is exhausted, so an interrupted page is
      // never well-formed JSON — clients detect truncation as a parse
      // failure. Log the real cause here so the Spark error isn't masked
      // by a secondary "headers already sent" throw.
      case scala.util.control.NonFatal(e) if headersCommitted =>
        org.slf4j.LoggerFactory.getLogger(getClass).error(
          s"mid-stream failure after headers committed: ${e.getMessage}", e)
      case e: BadRequest => send(ex, 400, jsonDetail(e.getMessage))
      case e: IllegalArgumentException => // undecodable %-escapes, bad args
        send(ex, 400, jsonDetail(s"Bad Request: ${e.getMessage}"))
      case scala.util.control.NonFatal(e) =>
        send(ex, 500, jsonDetail(s"Internal Server Error: ${e.getMessage}"))
    } finally ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.contains('='))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  /** Full JSON string escaping — error text routinely embeds Spark
    * exception messages with newlines, backslashes, and quotes; a 500
    * body must still parse as JSON. */
  private[serve] def jsonString(msg: String): String = {
    val sb = new StringBuilder("\"")
    Option(msg).getOrElse("null").foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def jsonDetail(msg: String): String =
    s"""{"detail":${jsonString(msg)}}"""

  private def send(ex: HttpExchange, status: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  /** Stream a JSON array of pre-serialized rows as a chunked response
    * (length 0 → Transfer-Encoding: chunked). A 750k-row report page is
    * ~100 MB of JSON; writing rows as they arrive from `toLocalIterator`
    * means the driver never assembles that page as one `String` — peak
    * extra heap is one row plus the 64 KiB write buffer. */
  private def sendJsonArray(ex: HttpExchange, rows: Iterator[String],
      onCommit: () => Unit): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/json")
    onCommit()
    ex.sendResponseHeaders(200, 0L)
    val out = new java.io.BufferedOutputStream(ex.getResponseBody, 64 * 1024)
    out.write('[')
    var first = true
    rows.foreach { r =>
      if (!first) out.write(',')
      first = false
      out.write(r.getBytes(StandardCharsets.UTF_8))
    }
    out.write(']')
    out.flush()
  }

  private def sendHtml(ex: HttpExchange, status: Int, body: String): Unit =
    send(ex, status, body, "text/html; charset=utf-8")
}
