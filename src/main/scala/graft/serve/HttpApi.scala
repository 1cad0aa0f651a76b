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
  *
  * Status mapping follows fetch_data.py:72-80: malformed/unknown id → 400,
  * empty page → 404 ("Report not found", main.py:46-47).
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

  /** Start serving on `port` (0 = ephemeral, for tests). */
  def start(spark: SparkSession, port: Int = 8000,
      maxPageRows: Int = Serve.defaultMaxPageRows): Api = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(spark, ex, maxPageRows))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    server.start()
    Api(server, pool)
  }

  private val ReportPath = "/reports/([^/]+)".r

  private def handle(spark: SparkSession, ex: HttpExchange,
      maxPageRows: Int): Unit =
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
          (p.get("id").flatMap(_.toIntOption),
            p.get("lo").map(_.toDoubleOption), p.get("hi").map(_.toDoubleOption)) match {
            case (Some(id), lo, hi)
                if Serve.registry.exists(_.id == id) &&
                  !lo.contains(None) && !hi.contains(None) =>
              val scoreCol = p.getOrElse("score_col",
                Serve.registry.find(_.id == id).get.sortKey)
              val s = Serve.dashboardSection(spark, id, scoreCol,
                lo.flatten, hi.flatten,
                math.min(p.get("max_rows").flatMap(_.toIntOption).getOrElse(1000),
                  maxPageRows))
              val statsJson = s.stats.fold("null") { case (mean, mn, mx) =>
                s"""{"mean":$mean,"min":$mn,"max":$mx}"""
              }
              send(ex, 200,
                s"""{"total":${s.total},"filtered":${s.filtered},""" +
                  s""""stats":$statsJson,"rows":${s.rows.mkString("[", ",", "]")}}""")
            case _ =>
              send(ex, 400, jsonDetail("id must be a known dataset; lo/hi/max_rows numeric"))
          }
        case ReportPath(idStr) =>
          val params = queryParams(ex)
          val id = idStr.toIntOption
          val offset = params.get("offset").fold(Option(0))(_.toIntOption)
          val limit = params.get("limit").fold(Option(maxPageRows))(_.toIntOption)
          (id, offset, limit) match {
            case (None, _, _) | (_, None, _) | (_, _, None) =>
              send(ex, 400, jsonDetail("id/offset/limit must be integers"))
            case (Some(i), _, _) if !Serve.registry.exists(_.id == i) =>
              send(ex, 400, jsonDetail(s"Invalid dataset_id: $idStr"))
            case (Some(i), Some(o), Some(l)) =>
              val rows = Serve.fetchJson(spark, i, o, l, maxPageRows)
              if (rows.isEmpty) send(ex, 404, jsonDetail("Report not found"))
              else send(ex, 200, rows.mkString("[", ",", "]"))
          }
        case _ =>
          send(ex, 404, jsonDetail("Not Found"))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        send(ex, 500, jsonDetail(s"Internal Server Error: ${e.getMessage}"))
    } finally ex.close()

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.contains('='))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def jsonDetail(msg: String): String =
    s"""{"detail":"${msg.replace("\"", "\\\"")}"}"""

  private def send(ex: HttpExchange, status: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def sendHtml(ex: HttpExchange, status: Int, body: String): Unit =
    send(ex, status, body, "text/html; charset=utf-8")
}
