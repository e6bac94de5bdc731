package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.scalatest.funsuite.AnyFunSuite

/** [[EagerAggregation]]: the round-12 measured heuristic as a Catalyst rule.
  * Positive tests are the SQL shapes the SF100 A/Bs proved (q18 2 levels,
  * q10 below its nation join); negative tests are the three shapes round 12
  * REVERTED after measuring — the rule must refuse them from statistics and
  * structure alone. Catalog tables carry ANALYZE row counts; declared
  * PK/FK/UNIQUE constraints license uniqueness and bound group counts. */
class EagerAggregationSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark

  private val tables =
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")

  private lazy val setup: Unit = {
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS eag_$t")
      spark.sql(
        s"CREATE TABLE eag_$t USING PARQUET LOCATION '/root/testdata/sf0.01/$t.parquet'")
      spark.sql(s"ANALYZE TABLE eag_$t COMPUTE STATISTICS")
    }
    ConstraintRegistry.put("eag_customer", Seq(KeyConstraint("eag_customer", "PRIMARY KEY", Seq("c_custkey"))))
    ConstraintRegistry.put("eag_nation", Seq(KeyConstraint("eag_nation", "PRIMARY KEY", Seq("n_nationkey"))))
    ConstraintRegistry.put("eag_region", Seq(KeyConstraint("eag_region", "PRIMARY KEY", Seq("r_regionkey"))))
    ConstraintRegistry.put("eag_supplier", Seq(KeyConstraint("eag_supplier", "PRIMARY KEY", Seq("s_suppkey"))))
    ConstraintRegistry.put("eag_part", Seq(KeyConstraint("eag_part", "PRIMARY KEY", Seq("p_partkey"))))
    ConstraintRegistry.put("eag_orders", Seq(
      KeyConstraint("eag_orders", "PRIMARY KEY", Seq("o_orderkey")),
      KeyConstraint("eag_orders", "FOREIGN KEY", Seq("o_custkey"), Some("eag_customer"), Seq("c_custkey"))))
    // junk dimension with a COMPOSITE key (the partsupp shape): the distinct
    // (suppkey, returnflag) pairs, lineitem carrying a composite FK to it
    spark.sql("DROP TABLE IF EXISTS eag_flagdim")
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .selectExpr("l_suppkey AS d_suppkey", "l_returnflag AS d_flag")
      .distinct()
      .write.mode("overwrite").parquet("/tmp/graft_eag_flagdim")
    spark.sql(
      "CREATE TABLE eag_flagdim USING PARQUET LOCATION '/tmp/graft_eag_flagdim'")
    spark.sql("ANALYZE TABLE eag_flagdim COMPUTE STATISTICS")
    ConstraintRegistry.put("eag_flagdim",
      Seq(KeyConstraint("eag_flagdim", "PRIMARY KEY", Seq("d_suppkey", "d_flag"))))
    ConstraintRegistry.put("eag_lineitem", Seq(
      KeyConstraint("eag_lineitem", "PRIMARY KEY", Seq("l_orderkey", "l_linenumber")),
      KeyConstraint("eag_lineitem", "FOREIGN KEY", Seq("l_orderkey"), Some("eag_orders"), Seq("o_orderkey")),
      KeyConstraint("eag_lineitem", "FOREIGN KEY", Seq("l_partkey"), Some("eag_part"), Seq("p_partkey")),
      KeyConstraint("eag_lineitem", "FOREIGN KEY", Seq("l_suppkey"), Some("eag_supplier"), Seq("s_suppkey")),
      KeyConstraint("eag_lineitem", "FOREIGN KEY", Seq("l_suppkey", "l_returnflag"),
        Some("eag_flagdim"), Seq("d_suppkey", "d_flag"))))
  }

  private def aggCount(df: DataFrame): Int =
    df.queryExecution.analyzed.collect { case a: Aggregate => a }.size

  /** Run `sql` with the rule active, and again with it disabled (the rule is
    * CBO-gated); results must agree exactly. Returns the active DataFrame. */
  private def checkedAgainstBaseline(sql: String): DataFrame = {
    setup
    val active = spark.sql(sql)
    val activeRows = active.collect().toSeq
    spark.conf.set("spark.sql.cbo.enabled", "false")
    try {
      val base = spark.sql(sql)
      assert(aggCount(base) === 1, "baseline must be unrewritten")
      assert(activeRows === base.collect().toSeq)
    } finally spark.conf.set("spark.sql.cbo.enabled", "true")
    active
  }

  private val q18Sql =
    """SELECT c_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM eag_orders
      |JOIN eag_lineitem ON o_orderkey = l_orderkey
      |JOIN eag_customer ON c_custkey = o_custkey
      |GROUP BY c_custkey, o_orderkey, o_orderdate
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  test("q18 shape: fires at both join levels (true collapse 4.07)") {
    val df = checkedAgainstBaseline(q18Sql)
    // one pre-agg per l_orderkey, one per-order level, one final = 3
    assert(aggCount(df) === 3, df.queryExecution.analyzed.toString)
  }

  test("q10 shape: fires below the nation join only (true collapse 9.35 there, 1.81 inside)") {
    val df = checkedAgainstBaseline(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM eag_customer
        |JOIN eag_orders ON c_custkey = o_custkey
        |JOIN eag_lineitem ON l_orderkey = o_orderkey
        |JOIN eag_nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
    // the filtered orders side blocks the inner level (its runtime prune
    // would be forfeited): exactly one pre-aggregate, below the nation join
    assert(aggCount(df) === 2, df.queryExecution.analyzed.toString)
  }

  test("tpch_q4 shape (reverted r12): EXISTS/semi never matches") {
    val df = checkedAgainstBaseline(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM eag_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM eag_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(aggCount(df) === 1)
  }

  test("ssb_q3_1 shape (reverted r12): refused — filtered dims forfeit runtime prunes, nation-name key unboundable") {
    val df = checkedAgainstBaseline(
      """SELECT c_nation, s_nation, year(o_orderdate) AS d_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM eag_lineitem
        |JOIN eag_orders ON l_orderkey = o_orderkey
        |JOIN (SELECT c_custkey, n_name AS c_nation, r_name AS c_region
        |      FROM eag_customer JOIN eag_nation ON c_nationkey = n_nationkey
        |      JOIN eag_region ON n_regionkey = r_regionkey) c ON o_custkey = c_custkey
        |JOIN (SELECT s_suppkey, n_name AS s_nation, r_name AS s_region
        |      FROM eag_supplier JOIN eag_nation ON s_nationkey = n_nationkey
        |      JOIN eag_region ON n_regionkey = r_regionkey) s ON l_suppkey = s_suppkey
        |WHERE c_region = 'ASIA' AND s_region = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY c_nation, s_nation, d_year
        |ORDER BY d_year, revenue DESC, c_nation, s_nation""".stripMargin)
    assert(aggCount(df) === 1)
  }

  test("tpcds_q5 channel-branch shape (reverted r12): refused on stats (est collapse 1.3 < 3)") {
    val df = checkedAgainstBaseline(
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM eag_lineitem JOIN eag_orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag <> 'R'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(aggCount(df) === 1)
  }

  test("ssb_q4_1 shape: refused (documented conservative divergence — true collapse 1.42)") {
    val df = checkedAgainstBaseline(
      """SELECT year(o_orderdate) AS d_year, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM eag_lineitem
        |JOIN eag_orders ON l_orderkey = o_orderkey
        |JOIN eag_customer ON o_custkey = c_custkey
        |GROUP BY d_year ORDER BY d_year""".stripMargin)
    // grouping (d_year) × join key bound: customer-rows × 16 ≥ input → refuse
    // at the customer level; at the orders level the keys are (d_year from
    // orders ⇒ other-side) so pre-agg keys collapse to l_orderkey: THAT level
    // may fire (collapse 4.07) — assert no pre-agg keyed on o_custkey exists
    val pre = df.queryExecution.analyzed.collect { case a: Aggregate => a }
    assert(!pre.exists(_.groupingExpressions.exists(
      _.references.exists(_.name.equalsIgnoreCase("o_custkey")))),
      df.queryExecution.analyzed.toString)
  }

  test("multi-conjunct composite-key dim fires (r14): junk-dimension join, composite FK bounds the keys") {
    val df = checkedAgainstBaseline(
      """SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM eag_lineitem JOIN eag_flagdim
        |  ON l_suppkey = d_suppkey AND l_returnflag = d_flag
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)
    // pre-agg keys (l_suppkey, l_returnflag) bounded by the composite FK at
    // flagdim's ~300 rows → collapse ≈ 200 ≥ 3: one pre-agg + final
    assert(aggCount(df) === 2, df.queryExecution.analyzed.toString)
  }

  test("multi-conjunct refused when the dim's unique key is not covered by the join keys") {
    val df = checkedAgainstBaseline(
      """SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM eag_lineitem JOIN eag_flagdim ON l_suppkey = d_suppkey
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)
    // flagdim is unique on (d_suppkey, d_flag), not d_suppkey alone → refuse
    assert(aggCount(df) === 1, df.queryExecution.analyzed.toString)
  }

  test("AVG decomposes as SUM/COUNT partials (r14, non-decimal input)") {
    val df = checkedAgainstBaseline(
      """SELECT o_orderkey, AVG(CAST(l_quantity AS BIGINT)) AS avg_qty, COUNT(*) AS n
        |FROM eag_orders JOIN eag_lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)
    assert(aggCount(df) === 2, df.queryExecution.analyzed.toString)
  }

  test("AVG over DECIMAL refused (Average's single rounding is not re-mergeable)") {
    val df = checkedAgainstBaseline(
      """SELECT o_orderkey, AVG(CAST(l_quantity AS DECIMAL(18,2))) AS avg_qty
        |FROM eag_orders JOIN eag_lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)
    assert(aggCount(df) === 1, df.queryExecution.analyzed.toString)
  }

  test("empty GLOBAL COUNT returns 0, not NULL (r13 advice: coalesced merged count)") {
    val df = checkedAgainstBaseline(
      """SELECT COUNT(*) AS n
        |FROM eag_lineitem JOIN eag_supplier ON l_suppkey = s_suppkey
        |WHERE l_quantity < -5""".stripMargin)
    // the rewrite must actually fire (est collapse 20000/100 = 200) for the
    // coalesce to be load-bearing
    assert(aggCount(df) === 2, df.queryExecution.analyzed.toString)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("no statistics, no firing: temp views leave every plan untouched") {
    setup
    graft.Tables.registerAll(spark, SparkTestBase.sf)
    val df = spark.sql(q18Sql
      .replace("eag_orders", "orders").replace("eag_lineitem", "lineitem")
      .replace("eag_customer", "customer"))
    assert(aggCount(df) === 1)
  }
}
