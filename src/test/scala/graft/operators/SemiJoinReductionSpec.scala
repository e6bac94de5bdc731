package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q5/q7/q8 semi-join pre-reduction (reference:
  * src/lib/optimizer/strategy/semi_join_reduction_rule.cpp) is a pure plan
  * rewrite — these tests pin the semantics by comparing each rewritten query
  * against the naive join order it replaced, row for row. The DuckDB oracle
  * gates the same queries at sf0.01; this spec keeps the equivalence local
  * and fast so a future re-ordering can't silently change results.
  */
class SemiJoinReductionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf
  import graft.Det._

  private def t(n: String): DataFrame = Tables.df(spark, sf, n)
  private val net = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  private def assertSameRows(name: String, got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val w = want.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(g.toSeq == w.toSeq, s"$name: reduced plan diverges from naive join order")
    assert(got.columns.toSeq == want.columns.toSeq, s"$name: schema drift")
  }

  test("q5: pre-reduced plan matches the naive join order") {
    val c = t("customer")
    val o = t("orders")
      .filter(col("o_orderdate") >= "1996-01-01 00:00:00" && col("o_orderdate") < "1998-01-01 00:00:00")
    val l = t("lineitem")
    val sup = t("supplier")
    val n = t("nation")
    val r = t("region").filter(col("r_name") === "ASIA")
    val naive = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(asDouble(sum(net)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
    val reduced = TpchQueries.q5LocalSupplier.run(spark, sf)
    assert(reduced.count() > 0, "q5 must be non-vacuous at sf0.001")
    assertSameRows("q5", reduced, naive)
  }

  test("q7: pre-reduced plan matches the naive join order") {
    val n1 = t("nation").select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t("nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val l = t("lineitem")
      .filter(col("l_shipdate") >= "1996-01-01 00:00:00" && col("l_shipdate") < "1998-01-01 00:00:00")
    val naive = l.join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(asDouble(sum(net)).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
    val reduced = TpchFullQueries.q7VolumeShipping.run(spark, sf)
    assertSameRows("q7", reduced, naive)
  }

  test("q8: pre-reduced plan matches the naive join order") {
    val p = t("part").filter(col("p_type") === "STANDARD")
    val n1 = t("nation").select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = t("nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    val r = t("region").filter(col("r_name") === "ASIA")
    val o = t("orders")
      .filter(col("o_orderdate") >= "1996-01-01 00:00:00" && col("o_orderdate") < "1998-01-01 00:00:00")
    val naive = t("lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(r), col("n1_region") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select(year(col("o_orderdate")).as("o_year"), net.as("volume"), col("nation"))
      .groupBy("o_year")
      .agg((asDouble(sum(when(col("nation") === "NATION_5", col("volume"))
          .otherwise(lit(0).cast("decimal(28,4)"))))
        / asDouble(sum(col("volume")))).as("mkt_share"))
      .orderBy("o_year")
    val reduced = TpchFullQueries.q8MarketShare.run(spark, sf)
    assert(reduced.count() > 0, "q8 must be non-vacuous at sf0.001")
    assertSameRows("q8", reduced, naive)
  }
}
