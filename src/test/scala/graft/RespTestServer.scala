package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.concurrent.TrieMap

/** An in-process RESP2 server implementing just the verbs the engine's
  * Redis adapter issues (INCRBY / SET[ NX] / GET / DEL / SADD / SCARD /
  * PING). The parser is written independently of [[graft.store.RespClient]]
  * on purpose: a shared codec would let a symmetric encode/decode bug
  * pass both sides — this way the spec exercises the actual public wire
  * format. Thread-per-connection; state in concurrent maps. */
final class RespTestServer {
  val strings = TrieMap.empty[String, String]
  val sets = TrieMap.empty[String, Set[String]]
  @volatile var commandsServed = 0

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock))
      t.setDaemon(true); t.start()
    } catch { case _: java.io.IOException => /* closed */ }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = server.close()

  private def serve(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    def line(): String = {
      val sb = new java.lang.StringBuilder
      var c = in.read()
      if (c < 0) return null
      while (c != '\r') { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString
    }
    def reply(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }
    try {
      var l = line()
      while (l != null) {
        require(l.startsWith("*"), s"expected array, got: $l")
        val n = l.substring(1).toInt
        val args = (0 until n).map { _ =>
          val hdr = line()
          require(hdr.startsWith("$"), s"expected bulk, got: $hdr")
          val len = hdr.substring(1).toInt
          val buf = in.readNBytes(len)
          in.read(); in.read() // trailing CRLF
          new String(buf, UTF_8)
        }
        commandsServed += 1
        args.head.toUpperCase match {
          case "PING" => reply("+PONG\r\n")
          case "GET" =>
            strings.get(args(1)) match {
              case Some(v) =>
                val b = v.getBytes(UTF_8)
                reply(s"$$${b.length}\r\n$v\r\n")
              case None => reply("$-1\r\n")
            }
          case "SET" =>
            val nx = args.drop(3).exists(_.equalsIgnoreCase("NX"))
            if (nx) {
              if (strings.putIfAbsent(args(1), args(2)).isEmpty) reply("+OK\r\n")
              else reply("$-1\r\n")
            } else { strings.put(args(1), args(2)); reply("+OK\r\n") }
          case "DEL" =>
            val removed = args.tail.count(k =>
              strings.remove(k).isDefined || sets.remove(k).isDefined)
            reply(s":$removed\r\n")
          case "INCRBY" =>
            val v = strings.updateWith(args(1)) { prev =>
              Some((prev.map(_.toLong).getOrElse(0L) + args(2).toLong).toString)
            }.get
            reply(s":$v\r\n")
          case "SADD" =>
            val members = args.drop(2).toSet
            var added = 0
            sets.updateWith(args(1)) { prev =>
              val before = prev.getOrElse(Set.empty)
              added = (members -- before).size
              Some(before ++ members)
            }
            reply(s":$added\r\n")
          case "SCARD" =>
            reply(s":${sets.get(args(1)).map(_.size).getOrElse(0)}\r\n")
          case other => reply(s"-ERR unknown command '$other'\r\n")
        }
        l = line()
      }
    } catch {
      case _: java.io.IOException => // connection dropped
    } finally sock.close()
  }
}
