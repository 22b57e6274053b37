package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.store.{RedisMetricsSink, RespClient, RespReply}
import graft.streaming.StreamingMetrics

class RedisSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withServer(f: (RespTestServer, RedisMetricsSink) => Unit): Unit = {
    val srv = new RespTestServer
    val sink = new RedisMetricsSink("127.0.0.1", srv.port)
    try f(srv, sink)
    finally { sink.close(); srv.close() }
  }

  test("RESP client speaks the public wire format (independent server parser)") {
    val srv = new RespTestServer
    val c = new RespClient("127.0.0.1", srv.port)
    try {
      assert(c.command("PING") === RespReply.Simple("PONG"))
      assert(c.command("INCRBY", "k", "5") === RespReply.Num(5L))
      assert(c.command("GET", "k") match {
        case b: RespReply.Bulk => b.asString.contains("5"); case _ => false
      })
      assert(c.command("GET", "missing") === RespReply.Bulk(None))
      assert(c.command("NOSUCH").isInstanceOf[RespReply.Err])
      // pipelining: three commands, one flush, replies in order
      val rs = c.pipeline(Seq(Seq("INCRBY", "p", "1"), Seq("INCRBY", "p", "2"),
        Seq("GET", "p")))
      assert(rs(0) === RespReply.Num(1L) && rs(1) === RespReply.Num(3L))
    } finally { c.close(); srv.close() }
  }

  test("sink verbs map to INCRBY/SET/SADD with Redis merge semantics") {
    withServer { (srv, sink) =>
      sink.incrBy("visits", 2); sink.incrBy("visits", 3)
      assert(sink.counter("visits") === 5L)
      sink.put("hll_users", 7); sink.put("hll_users", 9) // last-write-wins
      assert(sink.counter("hll_users") === 9L)
      assert(sink.counter("never_written") === 0L)
      sink.sadd("s", Seq("a", "b")); sink.sadd("s", Seq("b", "c"))
      assert(sink.scard("s") === 3L)
      sink.sadd("s", Nil) // no-op, no protocol error
      // binary-awkward member (whitespace, would break an inline protocol)
      sink.sadd("s2", Seq("two words", "tab\tsep"))
      assert(srv.sets("s2") === Set("two words", "tab\tsep"))
    }
  }

  test("writeBatch applies a whole micro-batch in one pipelined flush") {
    withServer { (srv, sink) =>
      sink.writeBatch(
        incrs = Seq("c1" -> 4L, "c1" -> 6L, "c2" -> 1L),
        puts = Seq("g1" -> 42L),
        sadds = Seq("s1" -> Seq("x", "y"), "empty" -> Nil))
      assert(sink.counter("c1") === 10L && sink.counter("c2") === 1L)
      assert(sink.counter("g1") === 42L && sink.scard("s1") === 2L)
      assert(!srv.sets.contains("empty"))
    }
  }

  test("applyBatchOnce: SET NX ledger skips redelivery, clears marker on failure") {
    withServer { (_, sink) =>
      var runs = 0
      assert(sink.applyBatchOnce("q", 0L) { runs += 1 })
      assert(!sink.applyBatchOnce("q", 0L) { runs += 1 }) // redelivery skipped
      assert(runs === 1)
      intercept[RuntimeException] {
        sink.applyBatchOnce("q", 1L) { throw new RuntimeException("boom") }
      }
      assert(sink.applyBatchOnce("q", 1L) { runs += 1 }) // marker was cleared
      assert(runs === 2)
    }
  }

  test("sink survives java serialization (foreachBatch closure contract)") {
    withServer { (_, sink) =>
      sink.incrBy("pre", 1)
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(sink)
      val copy = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[RedisMetricsSink]
      try {
        copy.incrBy("pre", 2) // fresh transient connection
        assert(copy.counter("pre") === 3L)
      } finally copy.close()
    }
  }

  test("end-to-end: the streaming pipeline writes to Redis over the wire") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def ev(uid: String, exp: String, variant: String, ts: String) =
      LogEvent(uid, exp, variant, java.sql.Timestamp.valueOf(ts))
    withServer { (srv, sink) =>
      val input = MemoryStream[LogEvent]
      val queries = StreamingMetrics.startPipeline(input.toDS(), sink)
      try {
        input.addData(
          ev("u1", "e1", "1", "2026-08-12 10:15:03"),
          ev("u2", "e1", "2", "2026-08-12 10:15:30"),
          ev("u1", "e1", "1", "2026-08-12 10:16:01"))
        queries.foreach(_.processAllAvailable())
        // same assertions as the in-memory store run — Redis is a drop-in
        assert(sink.counter("visitCounter_2026_08_12T10_15") === 2L)
        assert(sink.counter("visitCounter_2026_08_12T10_16") === 1L)
        assert(sink.scard("set_dthr_2026_08_12T10_15") === 2L)
        assert(sink.scard("set_var_1") === 1L)
        assert(sink.scard("set_var_2") === 1L)
        assert(sink.counter("hll_dthr_2026_08_12T10_15") === 2L)
        assert(srv.commandsServed > 0)
      } finally queries.foreach(_.stop())
    }
  }
}
