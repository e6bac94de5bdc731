package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join Order Benchmark — GENERATED join-graph stressors. JOB's point (Leis
  * et al., VLDB 2015) is breadth: many distinct join topologies × predicate
  * placements, so a planner cannot be tuned to a handful of shapes. The
  * reference runs all 113 stock queries (third_party/join-order-benchmark;
  * runner src/benchmark/join_order_benchmark.cpp); [[JobQueries]] and
  * [[JobVariantQueries]] hand-cover the distinctive families — this file adds
  * the volume tier mechanically: a seeded deterministic generator draws 20
  * random acyclic subgraphs of the fixture's join tree, attaches predicates
  * from a per-table pool, and emits BOTH the Spark program and the DuckDB
  * oracle from the SAME drawn structure, so the two sides cannot drift.
  *
  * The join tree (child → parent; `nation`/`region` reachable twice, via
  * customer and via supplier, so aliased instances appear in one query):
  *
  *   lineitem ─ orders ─ customer ─ nation(c) ─ region(c)
  *        ├──── part
  *        └──── supplier ─ nation(s) ─ region(s)
  *
  * Every generated query is a pure star/snowflake equi-join plan: filtered
  * dims broadcast, the fact is reduced before any shuffle, and the global
  * aggregate is one partial+final pass — `PlanSpec`'s job_* sweep asserts no
  * generated plan ever contains a cartesian or an unkeyed nested loop.
  * Aggregates are a COUNT(*) plus an exact-decimal revenue sum cast to double
  * (single-row result, order-free, bit-identical across engines). */
object JobGenQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** One candidate join edge: how to attach `alias` given its parent is
    * already in the query. `sparkDim` loads the (possibly column-renamed)
    * dimension; join keys are (existing column, new column). */
  private final case class Edge(
      alias: String,
      requires: Option[String],
      leftKey: String, rightKey: String,
      sqlJoin: String,
      sparkDim: (SparkSession, String) => DataFrame)

  private def renamed(df: DataFrame, prefix: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${prefix}_$c"))

  private val edges: Seq[Edge] = Seq(
    Edge("orders", None, "l_orderkey", "o_orderkey",
      "JOIN orders ON l_orderkey = o_orderkey", (s, d) => t(s, d, "orders")),
    Edge("customer", Some("orders"), "o_custkey", "c_custkey",
      "JOIN customer ON o_custkey = c_custkey", (s, d) => t(s, d, "customer")),
    Edge("cnation", Some("customer"), "c_nationkey", "cn_n_nationkey",
      "JOIN nation cn ON c_nationkey = cn.n_nationkey",
      (s, d) => renamed(t(s, d, "nation"), "cn")),
    Edge("cregion", Some("cnation"), "cn_n_regionkey", "cr_r_regionkey",
      "JOIN region cr ON cn.n_regionkey = cr.r_regionkey",
      (s, d) => renamed(t(s, d, "region"), "cr")),
    Edge("part", None, "l_partkey", "p_partkey",
      "JOIN part ON l_partkey = p_partkey", (s, d) => t(s, d, "part")),
    Edge("supplier", None, "l_suppkey", "s_suppkey",
      "JOIN supplier ON l_suppkey = s_suppkey", (s, d) => t(s, d, "supplier")),
    Edge("snation", Some("supplier"), "s_nationkey", "sn_n_nationkey",
      "JOIN nation sn ON s_nationkey = sn.n_nationkey",
      (s, d) => renamed(t(s, d, "nation"), "sn")),
    Edge("sregion", Some("snation"), "sn_n_regionkey", "sr_r_regionkey",
      "JOIN region sr ON sn.n_regionkey = sr.r_regionkey",
      (s, d) => renamed(t(s, d, "region"), "sr")))

  /** A drawn predicate: Spark Column + SQL text built from the same constant. */
  private final case class Pred(sparkCol: Column, sql: String)

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Per-node predicate pool; each call draws one predicate from the node's
    * pool using `rng` (so the draw itself is part of the seeded structure). */
  private def drawPred(alias: String, rng: scala.util.Random): Pred = alias match {
    case "lineitem" =>
      if (rng.nextBoolean()) {
        val rf = Seq("A", "N", "R")(rng.nextInt(3))
        Pred(col("l_returnflag") === rf, s"l_returnflag = '$rf'")
      } else {
        val k = 10 + rng.nextInt(31)
        Pred(col("l_quantity") < k, s"l_quantity < $k")
      }
    case "orders" =>
      if (rng.nextBoolean()) {
        val y = 1995 + rng.nextInt(6)
        Pred(col("o_orderdate") >= s"$y-01-01" && col("o_orderdate") < s"${y + 1}-01-01",
          s"o_orderdate >= TIMESTAMP '$y-01-01 00:00:00' AND " +
            s"o_orderdate < TIMESTAMP '${y + 1}-01-01 00:00:00'")
      } else {
        val p = priorities(rng.nextInt(priorities.size))
        Pred(col("o_orderpriority") === p, s"o_orderpriority = '$p'")
      }
    case "customer" =>
      val m = segments(rng.nextInt(segments.size))
      Pred(col("c_mktsegment") === m, s"c_mktsegment = '$m'")
    case "part" =>
      val k = 5 + rng.nextInt(41)
      Pred(col("p_size") < k, s"p_size < $k")
    case "supplier" =>
      val k = rng.nextInt(50) * 100
      Pred(col("s_acctbal") > k, s"s_acctbal > $k")
    case "cnation" =>
      val k = 5 + rng.nextInt(16)
      Pred(col("cn_n_nationkey") < k, s"cn.n_nationkey < $k")
    case "snation" =>
      val k = 5 + rng.nextInt(16)
      Pred(col("sn_n_nationkey") < k, s"sn.n_nationkey < $k")
    case "cregion" =>
      val r = regions(rng.nextInt(regions.size))
      Pred(col("cr_r_name") === r, s"cr.r_name = '$r'")
    case "sregion" =>
      val r = regions(rng.nextInt(regions.size))
      Pred(col("sr_r_name") === r, s"sr.r_name = '$r'")
  }

  /** One drawn query: which edges are in, and each node's optional predicate. */
  private final case class Drawn(
      idx: Int, included: Seq[Edge], preds: Map[String, Pred])

  private def draw(idx: Int, rng: scala.util.Random): Drawn = {
    // branch depths: orders-chain 0..4, part 0..1, supplier-chain 0..3 —
    // redraw until the graph has at least 2 joins (JOB never runs a bare scan)
    var in: Seq[Edge] = Nil
    while (in.size < 2) {
      val oDepth = rng.nextInt(5)
      val pDepth = rng.nextInt(2)
      val sDepth = rng.nextInt(4)
      in = edges.filter { e =>
        e.alias match {
          case "orders" => oDepth >= 1
          case "customer" => oDepth >= 2
          case "cnation" => oDepth >= 3
          case "cregion" => oDepth >= 4
          case "part" => pDepth >= 1
          case "supplier" => sDepth >= 1
          case "snation" => sDepth >= 2
          case "sregion" => sDepth >= 3
        }
      }
    }
    // each present node draws a predicate with p=1/2 (fact with p=1/2 too);
    // at least one predicate overall, else the densest node gets one
    val nodes = "lineitem" +: in.map(_.alias)
    var preds = nodes.flatMap { n =>
      if (rng.nextBoolean()) Some(n -> drawPred(n, rng)) else None
    }.toMap
    if (preds.isEmpty) preds = Map("lineitem" -> drawPred("lineitem", rng))
    Drawn(idx, in, preds)
  }

  private def toQ(d: Drawn): Q = {
    val wherePart = ("lineitem" +: d.included.map(_.alias))
      .flatMap(n => d.preds.get(n).map(_.sql))
    val sql =
      s"""SELECT COUNT(*) AS n,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem
         |${d.included.map(_.sqlJoin).mkString("\n")}
         |${if (wherePart.isEmpty) "" else wherePart.mkString("WHERE ", "\n  AND ", "")}"""
        .stripMargin
    Q(f"job_gen_${d.idx}%02d", sql) { (s, dir) =>
      // filters go on each dim BEFORE its join, so a selective dim arrives
      // at the join already reduced (and broadcastable); the fact filter is
      // the scan predicate
      val fact0 = t(s, dir, "lineitem")
      val fact = d.preds.get("lineitem").map(p => fact0.filter(p.sparkCol)).getOrElse(fact0)
      val joined = d.included.foldLeft(fact) { (acc, e) =>
        val dim0 = e.sparkDim(s, dir)
        val dim = d.preds.get(e.alias).map(p => dim0.filter(p.sparkCol)).getOrElse(dim0)
        acc.join(dim, col(e.leftKey) === col(e.rightKey))
      }
      joined.agg(
        count(lit(1)).as("n"),
        graft.Det.asDouble(sum(graft.Det.dec(col("l_extendedprice")) *
          (lit(1) - graft.Det.dec(col("l_discount"))))).as("revenue"))
    }
  }

  /** 20 seeded draws — the volume tier. The seed is part of the test surface:
    * changing it changes every query, so it stays fixed. */
  val all: Seq[Q] = {
    val rng = new scala.util.Random(90120815L)
    (0 until 20).map(i => toQ(draw(i, rng)))
  }
}
