package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the oracle-canonicalization helpers in Verify — these run
  * driver-side against DuckDB, so a malformed wrap silently fails a query's
  * oracle instead of erroring loudly. */
class VerifySpec extends AnyFunSuite {

  private val longSchema = StructType(Seq(StructField("n", LongType)))

  test("splitLastStatement: single statement passes through") {
    assert(Verify.splitLastStatement("SELECT 1") === (("", "SELECT 1")))
  }

  test("splitLastStatement: preamble split at top-level semicolon") {
    val (pre, fin) = Verify.splitLastStatement("CREATE TABLE t AS SELECT 1; SELECT * FROM t")
    assert(pre === "CREATE TABLE t AS SELECT 1;")
    assert(fin.trim === "SELECT * FROM t")
  }

  test("splitLastStatement: semicolon inside string literal is not a split") {
    val sql = "SELECT ';' AS c FROM t"
    assert(Verify.splitLastStatement(sql) === (("", sql)))
  }

  test("splitLastStatement: semicolon inside -- comment is not a split") {
    val sql = "SELECT 1 -- trailing; comment\nFROM t"
    assert(Verify.splitLastStatement(sql) === (("", sql)))
  }

  test("splitLastStatement: final ';' followed only by a -- comment terminates the script") {
    val sql = "SELECT n FROM t; -- done"
    assert(Verify.splitLastStatement(sql) === (("", sql)))
    val wrapped = Verify.canonOracle(sql, Some(longSchema))
    assert(wrapped.contains("""FROM (SELECT n FROM t) __typed"""), wrapped)
  }

  test("canonOracle: trailing semicolon on final statement is stripped") {
    val out = Verify.canonOracle("SELECT n FROM t;", Some(longSchema))
    assert(!out.contains(";"))
    assert(out.contains("""FROM (SELECT n FROM t) __typed"""))
  }

  test("canonOracle: duplicate output names fall back to unwrapped SQL") {
    val dup = StructType(Seq(StructField("n", LongType), StructField("n", LongType)))
    assert(Verify.canonOracle("SELECT a AS n, b AS n FROM t", Some(dup)) ===
      "SELECT a AS n, b AS n FROM t")
  }

  test("canonOracle: no numeric columns leaves SQL untouched") {
    val s = StructType(Seq(StructField("s", StringType)))
    assert(Verify.canonOracle("SELECT s FROM t", Some(s)) === "SELECT s FROM t")
  }

  test("canonOracle: numeric columns wrapped with BIGINT casts") {
    val out = Verify.canonOracle("SELECT n FROM t", Some(longSchema))
    assert(out === """ SELECT CAST("n" AS BIGINT) AS "n" FROM (SELECT n FROM t) __typed""")
  }
}
