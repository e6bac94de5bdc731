package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join Order Benchmark — selectivity VARIANTS. The reference ships 113 JOB
  * queries that are really 33 join-graph templates, each instantiated at
  * several predicate selectivities (1a/1b/1c…, third_party/join-order-benchmark;
  * runner src/benchmark/join_order_benchmark.cpp). [[JobQueries]] covers the
  * graph shapes; this file mirrors the a/b/c structure — the SAME graph, with
  * constants shifted to land the optimizer in a different cardinality regime —
  * because JOB's finding is that a planner good at one selectivity point is
  * often wrong one decade away (Leis et al., "How Good Are Query Optimizers,
  * Really?", VLDB 2015).
  *
  * Each builder takes the constants as parameters so a variant is data, not
  * copied code. Scale contract is inherited from the template: one orderkey
  * shuffle on the fact spine, every filtered dim broadcast, θ-residuals never
  * degenerate to nested-loop over the cross space. Three extra stressors JOB
  * exercises that the shape file doesn't: an empty-intermediate dim (estimator
  * must survive cardinality 0 and AQE should short-circuit the probe), the
  * single-row MIN-probe at a second selectivity point, and cross-table
  * correlated date bands (o_orderdate vs l_shipdate — independence assumption
  * breaks across tables, not only within one). */
object JobVariantQueries {
  import Det._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** chain7 template (JobQueries.chain7) at a given (region, p_type, date) point. */
  private def chain7Variant(suffix: String, region: String, pType: String,
                            dateLo: String, dateHi: String): Q = Q(
    s"job_chain_7way_$suffix",
    s"""SELECT n_name, p_type,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE r_name = '$region' AND p_type = '$pType'
       |  AND o_orderdate >= TIMESTAMP '$dateLo 00:00:00'
       |  AND o_orderdate < TIMESTAMP '$dateHi 00:00:00'
       |GROUP BY n_name, p_type ORDER BY n_name, p_type""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= dateLo && col("o_orderdate") < dateHi),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region").filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "part").filter(col("p_type") === pType),
        col("l_partkey") === col("p_partkey"))
      .groupBy("n_name", "p_type")
      .agg(asDouble(sum(dec(col("l_extendedprice"))
        * (lit(1) - dec(col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("n_name", "p_type")
  }

  /** Year-wide medium-selectivity point (the template's `a` is 1997/ASIA/STANDARD). */
  val chain7B: Q = chain7Variant("b", "EUROPE", "PROMO", "1995-01-01", "1996-01-01")
  /** One-quarter tight point: date band 4× narrower, small region. */
  val chain7C: Q = chain7Variant("c", "AFRICA", "MEDIUM", "1996-01-01", "1996-04-01")

  /** star9Way template at a given (cust region, supp region, part predicate) point. */
  private def star9Variant(suffix: String, custRegion: String, suppRegion: String,
                           partPredSql: String, partPred: Column): Q = Q(
    s"job_star_9way_$suffix",
    s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation, COUNT(*) AS n,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
       |WHERE cr.r_name = '$custRegion' AND sr.r_name = '$suppRegion' AND $partPredSql
       |GROUP BY cust_nation, supp_nation
       |ORDER BY cust_nation, supp_nation""".stripMargin) { (s, dir) =>
    val cn = t(s, dir, "nation").select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"), col("n_regionkey").as("cn_reg"))
    val sn = t(s, dir, "nation").select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"), col("n_regionkey").as("sn_reg"))
    val cr = t(s, dir, "region").filter(col("r_name") === custRegion)
      .select(col("r_regionkey").as("cr_key"))
    val sr = t(s, dir, "region").filter(col("r_name") === suppRegion)
      .select(col("r_regionkey").as("sr_key"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "part").filter(partPred), col("l_partkey") === col("p_partkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(broadcast(cr), col("cn_reg") === col("cr_key"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(broadcast(sr), col("sn_reg") === col("sr_key"))
      .groupBy("cust_nation", "supp_nation")
      .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("l_quantity")))).as("qty"))
      .orderBy("cust_nation", "supp_nation")
  }

  /** Regions swapped to the template's complement, cheapest part tier. */
  val star9B: Q = star9Variant("b", "EUROPE", "AFRICA",
    "p_type = 'ECONOMY'", col("p_type") === "ECONOMY")
  /** Weak part predicate (~20% of p_size domain): the part dim is NOT tiny
    * after filtering, so blindly broadcasting it is wrong — the regression
    * this variant guards is the planner over-trusting the template's `a`
    * point where the dim shrank 6×. */
  val star9C: Q = star9Variant("c", "ASIA", "AMERICA",
    "p_size >= 41", col("p_size") >= 41)

  /** bushy template at a given (build-side returnflag, probe-side linestatus). */
  private def bushyVariant(suffix: String, flag: String, status: String): Q = Q(
    s"job_bushy_$suffix",
    s"""SELECT a.p_brand, CAST(SUM(CAST(a.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_air,
       |  CAST(SUM(CAST(b.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_reg
       |FROM (SELECT p_brand, l_quantity, l_partkey FROM lineitem
       |      JOIN part ON l_partkey = p_partkey WHERE l_returnflag = '$flag') a
       |JOIN (SELECT l_partkey, l_quantity FROM lineitem WHERE l_linestatus = '$status') b
       |  ON a.l_partkey = b.l_partkey
       |GROUP BY a.p_brand ORDER BY a.p_brand""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "lineitem").filter(col("l_returnflag") === flag)
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity").as("qa"), col("l_partkey").as("ka"))
    val b = t(s, dir, "lineitem").filter(col("l_linestatus") === status)
      .select(col("l_partkey").as("kb"), col("l_quantity").as("qb"))
    a.join(b, col("ka") === col("kb"))
      .groupBy("p_brand")
      .agg(asDouble(sum(dec(col("qa")))).as("qty_air"),
        asDouble(sum(dec(col("qb")))).as("qty_reg"))
      .orderBy("p_brand")
  }

  /** Both slices flipped to the complementary flag/status regime. */
  val bushyB: Q = bushyVariant("b", "A", "F")

  /** thetaResidual template with the inequality REVERSED and a high balance
    * floor — the residual now passes the complementary fraction of each
    * nation bucket, so a planner that hard-codes "θ keeps ~half" is off 2×. */
  val thetaResidualB: Q = Q(
    "job_theta_residual_b",
    s"""SELECT n_name, COUNT(*) AS n_pairs
       |FROM supplier
       |JOIN customer ON c_nationkey = s_nationkey AND c_acctbal < s_acctbal
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE s_acctbal > 5000
       |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
      .join(t(s, dir, "customer"),
        col("c_nationkey") === col("s_nationkey") && col("c_acctbal") < col("s_acctbal"))
      .join(broadcast(t(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("n_name")
  }

  /** disjunctiveDim template widened to a THREE-column OR — per-column
    * histograms under-estimate a 2-branch OR; a 3-branch OR across type,
    * size, and brand compounds the error (JOB's hardest selectivity class). */
  val disjunctiveDimB: Q = Q(
    "job_disjunctive_dim_b",
    s"""SELECT p_type, COUNT(*) AS n,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_type = 'ECONOMY' OR p_size <= 3 OR p_brand = 'Brand#11'
       |GROUP BY p_type ORDER BY p_type""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_type") === "ECONOMY" ||
        col("p_size") <= 3 || col("p_brand") === "Brand#11"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("l_extendedprice")))).as("rev"))
      .orderBy("p_type")
  }

  /** correlatedPred template at the ANTI-correlated point: open orders
    * (status 'O') whose lines are already finished ('F') are rare, so the
    * independence estimate now OVER-provisions instead of under — the
    * opposite failure mode of the template's `a` point. AQE's runtime row
    * counts shrink the join at execution either way. */
  val correlatedPredB: Q = Q(
    "job_correlated_pred_b",
    s"""SELECT month(o_orderdate) AS m, COUNT(*) AS n,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderstatus = 'O' AND l_linestatus = 'F' AND year(o_orderdate) = 2000
       |GROUP BY m ORDER BY m""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").filter(col("l_linestatus") === "F")
      .join(t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" && year(col("o_orderdate")) === 2000),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("l_quantity")))).as("qty"))
      .orderBy("m")
  }

  /** cycleSameKey template on the second line of each order and the
    * complementary (returnflag, linestatus) slice. */
  val cycleSameKeyB: Q = Q(
    "job_cycle_same_key_b",
    s"""SELECT o_orderpriority, COUNT(*) AS n,
       |  CAST(SUM(CAST(a.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |FROM lineitem a
       |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |JOIN orders ON a.l_orderkey = o_orderkey AND b.l_orderkey = o_orderkey
       |WHERE a.l_linenumber = 2 AND b.l_returnflag = 'A' AND b.l_linestatus = 'O'
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "lineitem").filter(col("l_linenumber") === 2)
      .select(col("l_orderkey").as("ka"), col("l_extendedprice").as("price_a"))
    val b = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "O")
      .select(col("l_orderkey").as("kb"))
    b.join(t(s, dir, "orders"), col("kb") === col("o_orderkey"))
      .join(a, col("ka") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("price_a")))).as("rev"))
      .orderBy("o_orderpriority")
  }

  /** likeMinProbe template at a second substring point — a rarer pattern and
    * a different market segment, landing the LIKE estimate a decade lower. */
  val likeMinProbeB: Q = Q(
    "job_like_min_probe_b",
    """SELECT MIN(p.p_name) AS min_part, MIN(s.s_name) AS min_supp,
      |  MIN(o.o_orderpriority) AS min_prio, COUNT(*) AS n
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE p.p_name LIKE '%crank%' AND o.o_orderpriority LIKE '3%'
      |  AND c.c_mktsegment = 'MACHINERY'""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_name").like("%crank%")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders").filter(col("o_orderpriority").like("3%")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").filter(col("c_mktsegment") === "MACHINERY"),
        col("o_custkey") === col("c_custkey"))
      .agg(min(col("p_name")).as("min_part"), min(col("s_name")).as("min_supp"),
        min(col("o_orderpriority")).as("min_prio"), count(lit(1)).as("n"))
  }

  /** Empty-intermediate stressor: the part predicate matches ZERO rows, so
    * every join above it is empty. The estimator must survive cardinality 0
    * without dividing by it, and AQE's empty-relation propagation should
    * collapse the probe side instead of scanning lineitem into a dead hash
    * join. Output is the empty grouped set (not a NULL-aggregate row — the
    * GROUP BY makes both engines agree on zero rows). */
  val emptyIntermediate: Q = Q(
    "job_empty_intermediate",
    s"""SELECT p_brand, COUNT(*) AS n
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE p_type = 'NO-SUCH-TYPE'
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_type") === "NO-SUCH-TYPE"),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** Cross-TABLE correlated date bands: o_orderdate and l_shipdate move
    * together (a line ships days after its order), so banding both to the
    * same quarter keeps ~all lines of surviving orders, while independence
    * predicts the product of the two band selectivities — an estimate off by
    * the band width. JOB's correlation lesson applied across the join edge,
    * where single-table multi-column stats cannot see it. */
  val dateBandCorrelated: Q = Q(
    "job_date_band_correlated",
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
       |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1998-01-01" && col("l_shipdate") < "1998-07-01")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1998-01-01" && col("o_orderdate") < "1998-04-01"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("l_extendedprice")))).as("rev"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(
    chain7B, chain7C, star9B, star9C, bushyB, thetaResidualB, disjunctiveDimB,
    correlatedPredB, cycleSameKeyB, likeMinProbeB, emptyIntermediate,
    dateBandCorrelated)
}
