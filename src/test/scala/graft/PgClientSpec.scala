package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** The pgwire server driven by a REAL PostgreSQL client (`psql`), not
  * hand-rolled frames: startup negotiation with libpq's parameter set,
  * simple-protocol queries, result rendering, per-statement errors, and
  * multi-statement scripts — the interoperability proof the raw-socket
  * PgServerSpec cannot give. Tests cancel (not fail) if the container has
  * no psql binary. */
class PgClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def psqlBin: Option[String] =
    Seq("/usr/bin/psql", "/usr/local/bin/psql").find(new java.io.File(_).exists)

  private def makePipeline(): Pipeline = {
    val cat = new Catalog(spark)
    cat.register("pgc_nation", Tables.df(spark, SparkTestBase.sf, "nation"))
    cat.register("pgc_region", Tables.df(spark, SparkTestBase.sf, "region"))
    new Pipeline(cat)
  }

  /** Run psql against the in-process server; returns (exit, stdout, stderr). */
  private def psql(port: Int, args: String*): (Int, String, String) = {
    val outB = new StringBuilder; val errB = new StringBuilder
    val cmd = Seq(psqlBin.get, "-h", "127.0.0.1", "-p", port.toString,
      "-U", "graft", "-d", "graft", "-X", "-v", "ON_ERROR_STOP=0",
      "-A", "-t") ++ args
    val code = Process(cmd, None, "PGCONNECT_TIMEOUT" -> "10")
      .!(ProcessLogger(l => outB.append(l).append('\n'),
        l => errB.append(l).append('\n')))
    (code, outB.toString, errB.toString)
  }

  private def withServer(f: Int => Unit): Unit = {
    val server = new PgServer(makePipeline _)
    val port = server.start()
    try f(port) finally server.stop()
  }

  test("psql: aggregate query round-trips through a real libpq client") {
    assume(psqlBin.isDefined, "container has no psql binary")
    withServer { port =>
      val (code, out, err) = psql(port, "-c", "SELECT COUNT(*) AS n FROM pgc_nation")
      assert(code === 0, s"psql exited $code: $err")
      assert(out.trim === "25", s"unexpected psql output: $out")
    }
  }

  test("psql: multi-row projection with join arrives row-per-line") {
    assume(psqlBin.isDefined, "container has no psql binary")
    withServer { port =>
      val (code, out, err) = psql(port, "-c",
        "SELECT n_name FROM pgc_nation JOIN pgc_region ON n_regionkey = r_regionkey " +
          "WHERE r_name = 'ASIA' ORDER BY n_name")
      assert(code === 0, s"psql exited $code: $err")
      val rows = out.linesIterator.filter(_.nonEmpty).toSeq
      assert(rows.size === 5, s"ASIA has 5 nations, psql printed: $out")
    }
  }

  test("psql: materialized view lifecycle rides the wire; DML maintains it") {
    assume(psqlBin.isDefined, "container has no psql binary")
    withServer { port =>
      val (code, out, err) = psql(port, "-c",
        "CREATE MATERIALIZED VIEW pgc_mv AS SELECT n_regionkey, COUNT(*) AS n " +
          "FROM pgc_nation GROUP BY n_regionkey; " +
          "INSERT INTO pgc_nation VALUES (990, 'WIRE_N', 4); " +
          "SELECT n FROM pgc_mv WHERE n_regionkey = 4; " +
          "SELECT view_name FROM meta_materialized_views")
      assert(code === 0, s"psql exited $code: $err")
      assert(out.contains("6"), s"region 4 grew to 6 after the wire INSERT: $out")
      assert(out.contains("pgc_mv"), s"meta table lists the view over the wire: $out")
    }
  }

  test("psql: VISUALIZE and ASOF ride the wire like any statement") {
    assume(psqlBin.isDefined, "container has no psql binary")
    withServer { port =>
      val (c1, viz, e1) = psql(port, "-c", "VISUALIZE SELECT COUNT(*) FROM pgc_nation")
      assert(c1 === 0, s"psql exited $c1: $e1")
      assert(viz.contains("digraph"), s"DOT over the wire: $viz")
      val (c2, out, e2) = psql(port, "-c",
        "UPDATE pgc_region SET r_name = 'ZED' WHERE r_regionkey = 0", "-c",
        "ASOF 2 SELECT r_name FROM pgc_region WHERE r_regionkey = 0", "-c",
        "SELECT r_name FROM pgc_region WHERE r_regionkey = 0")
      assert(c2 === 0, s"psql exited $c2: $e2")
      val rows = out.linesIterator.filter(_.nonEmpty).toSeq
      // register(pgc_nation)=cid1, register(pgc_region)=cid2 → ASOF 2 is pre-UPDATE
      assert(rows.contains("AFRICA") && rows.contains("ZED"),
        s"time-travel read (AFRICA) and head read (ZED) both served: $out")
    }
  }

  test("psql: error statement reports ERROR and the session recovers") {
    assume(psqlBin.isDefined, "container has no psql binary")
    withServer { port =>
      val (code, out, err) = psql(port,
        "-c", "SELECT * FROM missing_table",
        "-c", "SELECT COUNT(*) AS n FROM pgc_region")
      // ON_ERROR_STOP=0: psql continues after the server's ERROR frame
      assert(err.toLowerCase.contains("error"), s"expected an ERROR frame: $err")
      assert(out.trim.endsWith("5"), s"post-error statement must run: $out")
      assert(code === 0, s"psql exited $code: $err")
    }
  }

  test("psql: one -c script with multiple statements returns each result") {
    assume(psqlBin.isDefined, "container has no psql binary")
    withServer { port =>
      val (code, out, err) = psql(port, "-c",
        "SELECT COUNT(*) AS a FROM pgc_region; SELECT COUNT(*) AS b FROM pgc_nation")
      assert(code === 0, s"psql exited $code: $err")
      val rows = out.linesIterator.filter(_.nonEmpty).toSeq
      assert(rows === Seq("5", "25"), s"expected both result sets: $out")
    }
  }
}
