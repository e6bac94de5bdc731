package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import org.scalatest.funsuite.AnyFunSuite

/** Wire entry point: statements over TCP run through the same Pipeline as
  * every other entry point; sessions are per-connection; errors are
  * per-statement. */
class ServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def makePipeline(): Pipeline = {
    val cat = new Catalog(spark)
    cat.register("t_nation", Tables.df(spark, SparkTestBase.sf, "nation"))
    new Pipeline(cat)
  }

  private def roundtrip(sock: Socket, sql: String): (String, Seq[String]) = {
    val out = new PrintWriter(sock.getOutputStream, false)
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
    out.println(sql); out.flush()
    val status = in.readLine()
    val rows = Iterator.continually(in.readLine()).takeWhile(l => l != null && l.nonEmpty).toSeq
    (status, rows)
  }

  test("SELECT over the wire returns JSON rows; errors are per-statement; session survives") {
    val server = new Server(makePipeline _)
    val port = server.start()
    try {
      val sock = new Socket("127.0.0.1", port)
      try {
        val (st1, rows1) = roundtrip(sock, "SELECT COUNT(*) AS n FROM t_nation")
        assert(st1 == "ok 1" && rows1.head.contains("\"n\":25"))

        val (st2, _) = roundtrip(sock, "SELECT * FROM missing_table")
        assert(st2.startsWith("error"))

        // the same connection keeps working after an error, and sees its own DDL
        val (st3, _) = roundtrip(sock, "CREATE TABLE wired AS SELECT * FROM t_nation WHERE n_regionkey = 0")
        assert(st3 == "ok 0")
        val (st4, rows4) = roundtrip(sock, "SELECT COUNT(*) AS n FROM wired")
        assert(st4 == "ok 1" && rows4.head.contains("\"n\":5"))
      } finally sock.close()
    } finally server.stop()
  }

  test("results larger than maxRows are capped and flagged truncated") {
    val server = new Server(makePipeline _, maxRows = 10)
    val port = server.start()
    try {
      val sock = new Socket("127.0.0.1", port)
      try {
        val (st, rows) = roundtrip(sock, "SELECT * FROM t_nation") // 25 rows > cap
        assert(st == "ok 10 truncated", st)
        assert(rows.length == 10)
        // capped fetch, not capped correctness: aggregates still see all rows
        val (st2, rows2) = roundtrip(sock, "SELECT COUNT(*) AS n FROM t_nation")
        assert(st2 == "ok 1" && rows2.head.contains("\"n\":25"))
      } finally sock.close()
    } finally server.stop()
  }

  test("two concurrent connections are independent sessions") {
    val server = new Server(makePipeline _)
    val port = server.start()
    try {
      val a = new Socket("127.0.0.1", port)
      val b = new Socket("127.0.0.1", port)
      try {
        val (sa, _) = roundtrip(a, "PREPARE p1 AS SELECT COUNT(*) AS n FROM t_nation WHERE n_regionkey = ?")
        assert(sa == "ok 0")
        // connection b must not see a's prepared statement (separate pipeline)
        val (sb, _) = roundtrip(b, "EXECUTE p1 (1)")
        assert(sb.startsWith("error"))
        val (sa2, rows) = roundtrip(a, "EXECUTE p1 (1)")
        assert(sa2 == "ok 1" && rows.nonEmpty)
      } finally { a.close(); b.close() }
    } finally server.stop()
  }
}
