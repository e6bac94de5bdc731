package graft

import org.scalatest.funsuite.AnyFunSuite

/** CBO is real only if ANALYZE-computed statistics change plans: a
  * deliberately mis-ordered 3-way join must be reordered by
  * CostBasedJoinReorder using row counts (the functional counterpart of the
  * reference's join_ordering_rule + cardinality_estimator). */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def setup(): Unit = Stats.register(spark, SparkTestBase.sf)

  test("ANALYZE gives the optimizer exact row counts and column stats") {
    setup()
    val expected = Tables.df(spark, SparkTestBase.sf, "nation").count()
    assert(Stats.rowCount(spark, "nation").contains(BigInt(expected)))
    val desc = spark.sql("DESC EXTENDED lineitem l_orderkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("distinct_count").toLong > 0, s"NDV must be computed: $desc")
  }

  test("CBO reorders a mis-ordered lineitem-first join to start from the small side") {
    setup()
    // Syntactic order pairs lineitem (largest) first; with stats the reorderer
    // must start from orders ⋈ customer (intermediate |orders| rows) and join
    // lineitem last.
    val df = spark.sql(
      """SELECT c.c_name, SUM(l.l_quantity) AS q
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |               JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_name""".stripMargin)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val optimized = df.queryExecution.optimizedPlan
    val joins = optimized.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // the innermost join (no Join children) must NOT involve lineitem
    val innermost = joins.filter(j => j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    assert(innermost.nonEmpty)
    innermost.foreach { j =>
      assert(!j.toString.contains("lineitem"),
        s"stats-driven reorder must join orders⋈customer first:\n$optimized")
    }
  }
}
