package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.streaming.MetricsReader

/** The dashboard's REST face — the reference's five endpoints
  * (reference: dashboard/.../TimeseriesMetricsController.java:45-142)
  * served over any [[MetricsReader]] — the in-memory
  * [[graft.streaming.MetricsStore]] or a live Redis via
  * [[graft.store.RedisMetricsSink]], which closes the reference
  * topology end-to-end (Spark writes Redis, dashboard reads Redis):
  *
  *  - `GET /metrics/timeseries/visits?lastMinutes=N` — MGET over
  *    visitCounter keys, nil→0 (controller :45-67)
  *  - `GET /metrics/timeseries/users?lastMinutes=N` — PFCOUNT face
  *    (:69-86; the pipeline upserts the materialized HLL count)
  *  - `GET /metrics/timeseries/experiments?lastMinutes=N` — SCARD face
  *    (:88-107)
  *  - `GET /metrics/timeseries/variantsOverlap` — pairwise
  *    SINTERSTORE/SCARD over the variant sets (:109-136)
  *  - `GET /metrics/timeseries/times?lastMinutes=N` — the closed-minute
  *    spine (:138-152)
  *
  * Times are RECENT-FIRST (now-1 … now-N), matching the controller's
  * `timePatternForLastMinutes`; `lastMinutes` defaults to 10. JSON is
  * rendered by hand — the payloads are flat arrays of
  * `{"timestamp": …, "metric": …}` / `{"dimensions": […], "metric": …}`
  * objects, so no serializer dependency is warranted.
  *
  * Built on the JDK's `com.sun.net.httpserver` (zero added
  * dependencies); `clock` is injectable so tests pin "now" — the
  * reference reads wall clock (`DateTime.now`), which is what the
  * default does.
  */
class DashboardServer(store: MetricsReader, port: Int = 0,
    clock: () => LocalDateTime = () => LocalDateTime.now(java.time.ZoneOffset.UTC)) {

  private val MinuteKeyFmt = DateTimeFormatter.ofPattern("yyyy_MM_dd'T'HH_mm")
  private val IsoFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:00'Z'")

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** now-1 … now-N floored to the minute, recent-first
    * (controller `timePatternForLastMinutes`, :144-152). */
  private def closedMinutes(lastMinutes: Int): Seq[LocalDateTime] = {
    val nowM = clock().truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
    (1 to lastMinutes).map(nowM.minusMinutes(_))
  }

  private def lastMinutesParam(ex: HttpExchange): Int = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    q.split("&").collectFirst {
      case p if p.startsWith("lastMinutes=") =>
        p.stripPrefix("lastMinutes=").toInt
    }.getOrElse(10)
  }

  private def timeseriesJson(minutes: Seq[LocalDateTime],
      metric: LocalDateTime => Long): String =
    minutes.map { m =>
      s"""{"timestamp":"${IsoFmt.format(m)}","metric":${metric(m)}}"""
    }.mkString("[", ",", "]")

  private def respond(ex: HttpExchange, body: String, status: Int = 200,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def route(path: String)(handler: HttpExchange => String): Unit =
    server.createContext(path, (ex: HttpExchange) =>
      try respond(ex, handler(ex))
      catch { case t: Throwable =>
        respond(ex, s"""{"error":"${t.getClass.getSimpleName}"}""", 500)
      })

  route("/metrics/timeseries/visits") { ex =>
    timeseriesJson(closedMinutes(lastMinutesParam(ex)),
      m => store.counter(s"visitCounter_${MinuteKeyFmt.format(m)}"))
  }
  route("/metrics/timeseries/users") { ex =>
    timeseriesJson(closedMinutes(lastMinutesParam(ex)),
      m => store.hllCount(s"hll_dthr_${MinuteKeyFmt.format(m)}"))
  }
  route("/metrics/timeseries/experiments") { ex =>
    timeseriesJson(closedMinutes(lastMinutesParam(ex)),
      m => store.scard(s"set_experiments_${MinuteKeyFmt.format(m)}"))
  }
  route("/metrics/timeseries/variantsOverlap") { _ =>
    store.overlap("set_var_").map { case (a, b, n) =>
      s"""{"dimensions":["$a","$b"],"metric":$n}"""
    }.mkString("[", ",", "]")
  }
  // scale twin of /variantsOverlap: theta-sketch intersection reads
  // (the store keeps KB sketches instead of raw uid sets — the only
  // serving shape that survives 100 TB of distinct users)
  route("/metrics/timeseries/variantsOverlapApprox") { _ =>
    store.overlapApprox("theta_var_").map { case (a, b, n) =>
      s"""{"dimensions":["$a","$b"],"metric":$n}"""
    }.mkString("[", ",", "]")
  }
  route("/metrics/timeseries/times") { ex =>
    closedMinutes(lastMinutesParam(ex))
      .map(m => s""""${IsoFmt.format(m)}"""").mkString("[", ",", "]")
  }

  // The browser face (reference: static/index.html + metrics_ui.js):
  // one self-contained page — inline vanilla-JS SVG charts + the 1 Hz
  // auto-update toggle — served from the jar, so the dashboard works
  // with zero egress (the reference pulls Google Charts off a CDN).
  // "/" is also httpserver's fallback context, so unknown paths 404
  // here instead of leaking the page.
  private lazy val indexHtml: String = {
    val in = getClass.getResourceAsStream("/graft/dashboard/index.html")
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }
  server.createContext("/", (ex: HttpExchange) =>
    ex.getRequestURI.getPath match {
      case "/" | "/index.html" => respond(ex, indexHtml, 200, "text/html")
      case p => respond(ex, s"""{"error":"no such path: $p"}""", 404)
    })

  def start(): DashboardServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
  /** Bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort
}
