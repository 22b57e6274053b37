package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite
import graft.serving.DashboardServer
import graft.streaming.MetricsStore

/** The five REST endpoints against a populated store, with a pinned
  * clock — response shape and values mirror the reference controller
  * (nil→0 zero-fill, recent-first times, pairwise overlap). */
class DashboardServerSpec extends AnyFunSuite {

  private def get(port: Int, path: String): String = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
  }

  test("all five endpoints serve the store with reference semantics") {
    val store = new MetricsStore
    // two closed minutes of state; 10:17 is "now" (stays incomplete)
    store.incrBy("visitCounter_2026_08_12T10_15", 3L)
    store.incrBy("visitCounter_2026_08_12T10_16", 2L)
    store.put("hll_dthr_2026_08_12T10_15", 2L)
    store.sadd("set_experiments_2026_08_12T10_16", Seq("e1", "e2"))
    store.sadd("set_var_1", Seq("u1", "u2"))
    store.sadd("set_var_2", Seq("u2", "u3"))
    def sketchOf(ids: String*): Array[Byte] = {
      val s = org.apache.datasketches.theta.UpdateSketch.builder().build()
      ids.foreach(s.update)
      s.compact().toByteArray
    }
    store.putSketch("theta_var_1", sketchOf("u1", "u2"))
    store.putSketch("theta_var_2", sketchOf("u2", "u3"))
    val clock = () => java.time.LocalDateTime.of(2026, 8, 12, 10, 17, 42)
    val srv = new DashboardServer(store, port = 0, clock = clock).start()
    try {
      val port = srv.boundPort
      // visits: recent-first, nil -> 0 for the unseen 10:14
      assert(get(port, "/metrics/timeseries/visits?lastMinutes=3") ===
        """[{"timestamp":"2026-08-12T10:16:00Z","metric":2},""" +
        """{"timestamp":"2026-08-12T10:15:00Z","metric":3},""" +
        """{"timestamp":"2026-08-12T10:14:00Z","metric":0}]""")
      // users: the PFCOUNT upsert face
      assert(get(port, "/metrics/timeseries/users?lastMinutes=2") ===
        """[{"timestamp":"2026-08-12T10:16:00Z","metric":0},""" +
        """{"timestamp":"2026-08-12T10:15:00Z","metric":2}]""")
      // experiments: SCARD face
      assert(get(port, "/metrics/timeseries/experiments?lastMinutes=2") ===
        """[{"timestamp":"2026-08-12T10:16:00Z","metric":2},""" +
        """{"timestamp":"2026-08-12T10:15:00Z","metric":0}]""")
      // variant overlap: one shared user between variants 1 and 2
      assert(get(port, "/metrics/timeseries/variantsOverlap") ===
        """[{"dimensions":["1","2"],"metric":1}]""")
      // times: the spine itself, default lastMinutes=10
      val times = get(port, "/metrics/timeseries/times")
      assert(times.startsWith("""["2026-08-12T10:16:00Z","2026-08-12T10:15:00Z""""))
      assert(times.split(",").length === 10)
      // sketch twin of the overlap endpoint: u2 shared
      assert(get(port, "/metrics/timeseries/variantsOverlapApprox") ===
        """[{"dimensions":["1","2"],"metric":1}]""")
      // malformed query param: a JSON error payload, not a hung socket
      val bad = get(port, "/metrics/timeseries/visits?lastMinutes=abc")
      assert(bad.contains("\"error\""), s"expected error payload, got: $bad")
      // the browser face: self-contained page wired to every endpoint
      val page = get(port, "/")
      assert(page.startsWith("<!DOCTYPE html>"))
      Seq("/metrics/timeseries/visits", "/metrics/timeseries/users",
        "/metrics/timeseries/experiments", "/metrics/timeseries/variantsOverlap",
        "/metrics/timeseries/variantsOverlapApprox")
        .foreach(e => assert(page.contains(e), s"page does not poll $e"))
      // self-contained: no external script/style fetch
      assert(!page.contains("src=\"http"), "page must not pull external scripts")
      assert(get(port, "/index.html") === page)
      // the "/" fallback context must 404 unknown paths, not serve the page
      assert(get(port, "/no/such/path").contains("\"error\""))
    } finally srv.stop()
  }

  test("the same endpoints serve from a live Redis store — the full reference topology") {
    val redis = new RespTestServer
    val sink = new graft.store.RedisMetricsSink("127.0.0.1", redis.port)
    // populate through the SINK verbs — exactly what the streaming
    // pipeline writes (INCRBY / PFADD members / SADD), then read the
    // same five endpoint shapes back through Redis commands
    sink.incrBy("visitCounter_2026_08_12T10_15", 3L)
    sink.incrBy("visitCounter_2026_08_12T10_16", 2L)
    sink.pfadd("hll_dthr_2026_08_12T10_15", Seq("u1", "u2"))
    sink.sadd("set_experiments_2026_08_12T10_16", Seq("e1", "e2"))
    sink.sadd("set_var_1", Seq("u1", "u2"))
    sink.sadd("set_var_2", Seq("u2", "u3"))
    val clock = () => java.time.LocalDateTime.of(2026, 8, 12, 10, 17, 42)
    val srv = new DashboardServer(sink, port = 0, clock = clock).start()
    try {
      val port = srv.boundPort
      assert(get(port, "/metrics/timeseries/visits?lastMinutes=3") ===
        """[{"timestamp":"2026-08-12T10:16:00Z","metric":2},""" +
        """{"timestamp":"2026-08-12T10:15:00Z","metric":3},""" +
        """{"timestamp":"2026-08-12T10:14:00Z","metric":0}]""")
      // users: PFCOUNT over the PFADDed members
      assert(get(port, "/metrics/timeseries/users?lastMinutes=2") ===
        """[{"timestamp":"2026-08-12T10:16:00Z","metric":0},""" +
        """{"timestamp":"2026-08-12T10:15:00Z","metric":2}]""")
      assert(get(port, "/metrics/timeseries/experiments?lastMinutes=2") ===
        """[{"timestamp":"2026-08-12T10:16:00Z","metric":2},""" +
        """{"timestamp":"2026-08-12T10:15:00Z","metric":0}]""")
      // overlap: SINTERSTORE/SCARD server-side, like the reference
      assert(get(port, "/metrics/timeseries/variantsOverlap") ===
        """[{"dimensions":["1","2"],"metric":1}]""")
      val times = get(port, "/metrics/timeseries/times")
      assert(times.startsWith("""["2026-08-12T10:16:00Z","2026-08-12T10:15:00Z""""))
      // the sketch twin needs engine-held theta sketches — a plain
      // Redis store keeps none, and the endpoint degrades to empty
      assert(get(port, "/metrics/timeseries/variantsOverlapApprox") === "[]")
    } finally { srv.stop(); sink.close(); redis.close() }
  }
}
