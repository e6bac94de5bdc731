package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semi-join pre-reduction probe — the measured counterpart of the
  * reference's SemiJoinReductionRule (reference:
  * src/lib/optimizer/strategy/semi_join_reduction_rule.cpp), which plants a
  * semi-join that shrinks a join input by the OTHER side's selective
  * predicate before the expensive join runs.
  *
  * In q5/q7/q8 the geography restriction (region/nation filters) enters the
  * plan only through broadcast joins AFTER the two fact shuffles, so the
  * orders⋈customer and lineitem⋈orders intermediates carry every region's
  * rows. The pre-reduced variants filter `customer` (and for q7 `supplier`)
  * by the restricted nation-key set FIRST — a broadcast join against ≤5 key
  * rows, the Spark form of the reference's semi-join reducer — then join
  * orders to the reduced customer before the lineitem shuffle, so both fact
  * shuffles carry ~1/5 (q5/q8) or ~2/25 (q7) of the baseline rows. The
  * declarative tail (broadcast dims, decimal-exact aggregation) is unchanged,
  * so results are value-identical; the run asserts that.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.BenchSemiReduce` — prints
  * one JSON line with per-query base/reduced seconds and the speedup ratio.
  * Bench-evidence tooling, not part of the driver contract.
  */
object BenchSemiReduce {
  import Det._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)
  private def net = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** q5 with customer pre-reduced to ASIA-region nation keys before the fact joins. */
  private def q5Reduced(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val asiaKeys = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey").as("asia_key"))
    val cRed = t(s, dir, "customer")
      .join(broadcast(asiaKeys), col("c_nationkey") === col("asia_key")).drop("asia_key")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01 00:00:00" && col("o_orderdate") < "1998-01-01 00:00:00")
    val oc = o.join(cRed, col("o_custkey") === col("c_custkey"))
    t(s, dir, "lineitem")
      .join(oc, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(asDouble(sum(net)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q7 with customer AND supplier pre-reduced to the two traded nations. */
  private def q7Reduced(s: SparkSession, dir: String): DataFrame = {
    val nat2 = t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
    val cRed = t(s, dir, "customer").join(
      broadcast(nat2.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))),
      col("c_nationkey") === col("n2_key"))
    val supRed = t(s, dir, "supplier").join(
      broadcast(nat2.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))),
      col("s_nationkey") === col("n1_key"))
    val o = t(s, dir, "orders")
    val oc = o.join(cRed, col("o_custkey") === col("c_custkey"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01 00:00:00" && col("l_shipdate") < "1998-01-01 00:00:00")
      .join(oc, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supRed), col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(asDouble(sum(net)).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q8 with customer pre-reduced to ASIA before orders, orders before lineitem. */
  private def q8Reduced(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val asiaKeys = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey").as("asia_key"))
    val cRed = t(s, dir, "customer")
      .join(broadcast(asiaKeys), col("c_nationkey") === col("asia_key")).drop("asia_key")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01 00:00:00" && col("o_orderdate") < "1998-01-01 00:00:00")
    val oc = o.join(cRed, col("o_custkey") === col("c_custkey"))
    val p = t(s, dir, "part").filter(col("p_type") === "STANDARD")
    val n2 = n.select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    t(s, dir, "lineitem")
      .join(oc, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select(year(col("o_orderdate")).as("o_year"), net.as("volume"), col("nation"))
      .groupBy("o_year")
      .agg((asDouble(sum(when(col("nation") === "NATION_5", col("volume"))
          .otherwise(lit(0).cast("decimal(28,4)"))))
        / asDouble(sum(col("volume")))).as("mkt_share"))
      .orderBy("o_year")
  }

  val reduced: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q5_local_supplier" -> (q5Reduced _),
    "tpch_q7_volume_shipping" -> (q7Reduced _),
    "tpch_q8_market_share" -> (q8Reduced _))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-semireduce"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

    val entries = reduced.toSeq.sortBy(_._1).map { case (name, red) =>
      val base = SparkEntry.queries(name)
      // value-identity guard: the rewrite must be an equivalence, not a tweak
      val (bv, rv) = (canon(base(spark, sfDir)), canon(red(spark, sfDir)))
      require(bv == rv, s"$name: reduced variant changed the result!\n$bv\nvs\n$rv")
      time(base(spark, sfDir)); time(red(spark, sfDir)) // warmup both
      val b = (1 to nRuns).map(_ => time(base(spark, sfDir))).min
      val r = (1 to nRuns).map(_ => time(red(spark, sfDir))).min
      (name, b, r)
    }
    val qjson = entries.map { case (n, b, r) =>
      f""""$n":{"base_sec":$b%.3f,"reduced_sec":$r%.3f,"speedup":${b / r}%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"semijoin_prereduction","unit":"sec","sf":"$sfDir","queries":{$qjson}}""")
    spark.stop()
  }
}
