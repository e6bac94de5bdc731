package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}
import org.scalatest.funsuite.AnyFunSuite

/** Console REPL parity (reference: src/bin/console/console.cpp): meta
  * commands, SQL through the shared Pipeline, bounded row printing,
  * VISUALIZE passthrough, transaction bracket across lines. */
class ConsoleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def session(script: String*): String = {
    val out = new StringWriter()
    val console = new Console(spark,
      new BufferedReader(new StringReader(script.mkString("\n"))),
      new PrintWriter(out))
    console.repl()
    out.toString
  }

  test("load, list, query, truncate, quit") {
    val o = session(
      s".load ${SparkTestBase.sf}",
      ".tables",
      ".maxrows 3",
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
      ".quit")
    assert(o.contains("loaded 10 tables"))
    assert(o.contains("nation (25 rows)"))
    assert(o.contains("truncated at 3 rows"))
    assert(o.contains("n_nationkey | n_name"))
  }

  test("SQL errors recover the session; meta typos are reported") {
    val o = session(
      s".load ${SparkTestBase.sf}",
      "SELECT * FROM no_such_table",
      ".bogus",
      "SELECT COUNT(*) AS n FROM region",
      ".quit")
    assert(o.contains("error:"))
    assert(o.contains("unknown command: .bogus"))
    assert(o.contains("(1 row)"))
  }

  test("malformed meta-command arguments keep the REPL alive (r6 ADVICE)") {
    val o = session(
      s".load ${SparkTestBase.sf}",
      ".maxrows foo", // NumberFormatException must print an error, not kill handle()
      "SELECT COUNT(*) AS n FROM region",
      ".quit")
    assert(o.contains("error:"), "bad .maxrows arg must be reported")
    assert(o.contains("(1 row)"), "the session must continue past the bad command")
  }

  test("BEGIN/COMMIT spans console lines; VISUALIZE renders DOT") {
    val o = session(
      s".load ${SparkTestBase.sf}",
      "BEGIN",
      "UPDATE region SET r_name = 'X' WHERE r_regionkey = 0",
      "COMMIT",
      "SELECT r_name FROM region WHERE r_regionkey = 0",
      "VISUALIZE SELECT COUNT(*) FROM nation",
      ".quit")
    assert(o.contains("X"))
    assert(o.contains("digraph"))
  }
}
