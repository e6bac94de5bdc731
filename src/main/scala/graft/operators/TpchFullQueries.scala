package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The rest of the reference's 22-query TPC-H set
  * (reference: src/lib/benchmarklib/tpch/tpch_queries.cpp), adapted to the
  * driver's star schema: the fixture has no partsupp / commitdate /
  * receiptdate / shipmode / phone, so lineitem doubles as the part–supplier
  * bridge, lateness is shipdate vs orderdate, and shipping mode becomes
  * order priority. Every query keeps its original *plan shape* — the
  * correlated subqueries, outer-join aggregation, nested IN, and
  * scalar-subquery thresholds are what the reference's optimizer rules
  * (SubqueryToJoinRule, JoinToSemiJoinRule, PredicatePlacementRule) exist for.
  *
  * Scale notes mirror TpchQueries: fixed-size dims broadcast, scale-growing
  * tables (customer/orders/lineitem) shuffle on their join keys, aggregates
  * are map-side partial, and the per-part / per-order subquery aggregations
  * reuse the fact table's key partitioning.
  */
object TpchFullQueries {
  import Det._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  private val net = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** Q2 — min-cost supplier: correlated scalar-min subquery against the same
    * join tree (partsupp → lineitem; supplycost → extendedprice). */
  val q2MinCostSupplier: Q = Q(
    "tpch_q2_min_cost_supplier",
    """SELECT p_partkey, p_name, s_name, l_extendedprice AS min_price
      |FROM part, lineitem, supplier, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE' AND p_size = 15
      |  AND l_extendedprice = (
      |    SELECT min(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2,
      |         nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_name, p_partkey, p_name LIMIT 100""".stripMargin) { (s, dir) =>
    val p = t(s, dir, "part").filter(col("p_size") === 15)
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
    val sup = t(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name")
    val l = t(s, dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    // Semi-reduce by the filtered part dimension BEFORE the per-part min and
    // the self-join: only p_size=15 partkeys (~2 % of parts) can reach the
    // final result, and restricting the group-by input to those keys cannot
    // change their per-key minima — the other 98 % of groups were computed
    // only to be discarded. Cuts both big inputs ~50× (same broadcast-dim
    // convention as `sup`: part is an SF-proportional dimension, the 2 %
    // slice stays broadcastable wherever supplier/5 is).
    val europeLines = l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p.select("p_partkey").withColumnRenamed("p_partkey", "sr_partkey")),
        col("l_partkey") === col("sr_partkey"), "left_semi")
    // decorrelated scalar-min: one aggregate per part, reused by the equi join
    val minPrice = europeLines.groupBy("l_partkey")
      .agg(min(col("l_extendedprice")).as("min_price"))
    europeLines
      .join(minPrice.withColumnRenamed("l_partkey", "mp_partkey"),
        col("l_partkey") === col("mp_partkey") && col("l_extendedprice") === col("min_price"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("min_price"))
      .orderBy(col("s_name"), col("p_partkey"), col("p_name"))
      .limit(100)
  }

  /** Q7 — volume shipping between two nations, by year (self-joined nation dim). */
  val q7VolumeShipping: Q = Q(
    "tpch_q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year, l_extendedprice, l_discount
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
    // Durable-rollup fast path (r15): per-(cust-nation, supp-nation,
    // SHIP-year) revenue state ([[graft.Rollups.RevByNationsShipYear]]) —
    // the nation pair is two cells of the key space and the ship-date range
    // is year-aligned.
    val statePath = graft.Rollups.visibleDf(s, dir, graft.Rollups.RevByNationsShipYear)
      .map { st =>
        val nk = t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        val sN = broadcast(nk.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")))
        val cN = broadcast(nk.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation")))
        st.filter(col("shipyr").isin(1996, 1997))
          .join(sN, col("s_nationkey") === col("snk"))
          .join(cN, col("c_nationkey") === col("cnk"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
            || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("shipyr").as("l_year"))
          .agg(asDouble(sum(col("rev"))).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }
    if (statePath.isDefined) statePath.get else {
    // Semi-join pre-reduction (reference: semi_join_reduction_rule.cpp): the
    // nation-pair predicate restricts both sides to 2/25 of each dim, so the
    // restricted dims broadcast INTO the fact scans — lineitem shrinks 2/25
    // map-side before its shuffle, and orders joins only the 2/25 customers.
    val n1 = t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val supN = t(s, dir, "supplier")
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cN = t(s, dir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .select(col("c_custkey"), col("cust_nation"))
    val lRed = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01 00:00:00" && col("l_shipdate") < "1998-01-01 00:00:00")
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
    val oRed = t(s, dir, "orders")
      .join(cN, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    lRed.join(oRed, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(asDouble(sum(net)).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
    }
  }

  /** Q8 — national market share within a region, by order year. */
  val q8MarketShare: Q = Q(
    "tpch_q8_market_share",
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
      |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
      |    n2.n_name AS nation
      |  FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      |    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
      |    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |    AND s_nationkey = n2.n_nationkey AND p_type = 'STANDARD'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
    // Durable-rollup fast path (r15): q8 is a slice of the SSB q4 state
    // ([[graft.Rollups.SsbProfitByNationsYearType]], which also carries the
    // plain revenue sum) — p_type and yr are key columns, the ASIA customer
    // filter semi-joins the broadcast region keys and the nation-share CASE
    // resolves the supplier nationkey against the broadcast name dim.
    val statePath = graft.Rollups.visibleDf(s, dir, graft.Rollups.SsbProfitByNationsYearType)
      .map { st =>
        val asiaKeys = t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")
        val nName = t(s, dir, "nation")
          .select(col("n_nationkey").as("n2k"), col("n_name").as("nation"))
        st.filter(col("p_type") === "STANDARD" && col("yr").isin(1996, 1997))
          .join(broadcast(asiaKeys), col("c_nationkey") === col("n_nationkey"), "left_semi")
          .join(broadcast(nName), col("s_nationkey") === col("n2k"))
          .groupBy(col("yr").as("o_year"))
          .agg((asDouble(sum(when(col("nation") === "NATION_5", col("rev"))
              .otherwise(lit(0).cast("decimal(28,4)"))))
            / asDouble(sum(col("rev")))).as("mkt_share"))
          .orderBy("o_year")
      }
    if (statePath.isDefined) statePath.get else {
    // Semi-join pre-reduction (reference: semi_join_reduction_rule.cpp):
    // broadcast the p_type-restricted part and the supplier⋈nation dim into
    // the lineitem scan (map-side ~1/5 reduction, zero shuffle), and
    // semi-reduce customer by the region's nation set before the orders
    // join, so the fact–fact shuffle carries only region-relevant orders.
    val p = t(s, dir, "part").filter(col("p_type") === "STANDARD").select("p_partkey")
    val n1 = t(s, dir, "nation").select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = t(s, dir, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val asiaKeys = n1.join(broadcast(r), col("n1_region") === col("r_regionkey")).select("n1_key")
    val supN2 = t(s, dir, "supplier")
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select(col("s_suppkey"), col("nation"))
    val cAsia = t(s, dir, "customer")
      .join(broadcast(asiaKeys), col("c_nationkey") === col("n1_key"), "left_semi")
      .select("c_custkey")
    val oRed = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01 00:00:00" && col("o_orderdate") < "1998-01-01 00:00:00")
      .join(cAsia, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN2), col("l_suppkey") === col("s_suppkey"))
      .join(oRed, col("l_orderkey") === col("o_orderkey"))
      .select(year(col("o_orderdate")).as("o_year"), net.as("volume"), col("nation"))
      .groupBy("o_year")
      .agg((asDouble(sum(when(col("nation") === "NATION_5", col("volume"))
          .otherwise(lit(0).cast("decimal(28,4)"))))
        / asDouble(sum(col("volume")))).as("mkt_share"))
      .orderBy("o_year")
    }
  }

  /** Q9 — product type profit by nation and year (supplycost → retailprice share). */
  val q9ProductProfit: Q = Q(
    "tpch_q9_product_profit",
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      - CAST(0.1 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |    AND p_name LIKE '%blue%')
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
    // Durable-rollup fast path (r15): per-(supp-nation, order-year) profit
    // over the '%blue%' slice ([[graft.Rollups.ProfitBlueByNationYear]] —
    // the part-name predicate lives in the definition WHERE); the query is
    // a 175-row state read against the broadcast nation names.
    val statePath = graft.Rollups.visibleDf(s, dir, graft.Rollups.ProfitBlueByNationYear)
      .map { st =>
        st.join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("nation"), col("yr").as("o_year"))
          .agg(asDouble(sum(col("profit"))).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      }
    if (statePath.isDefined) statePath.get else {
    val p = t(s, dir, "part").filter(col("p_name").like("%blue%"))
    val amount = net -
      lit(0.1).cast("decimal(2,1)") * dec(col("p_retailprice")) * dec(col("l_quantity"))
    // semi-join pre-reduction (reference: semi_join_reduction_rule.cpp): the
    // broadcast part filter keeps ~1/25 of lineitem, so it runs BEFORE the
    // orders join — the only fact-fact shuffle moves the reduced fact, not
    // the full one. Same rewrite family as q5/q7/q8 (BENCH_r9_semijoin_reduction).
    t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"), amount.as("amount"))
      .groupBy("nation", "o_year")
      .agg(asDouble(sum(col("amount"))).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
    }
  }

  /** Q11 — important part values: group-by vs a scalar-subquery fraction of the
    * global total (partsupp value → lineitem net revenue per part). */
  val q11ImportantParts: Q = Q(
    "tpch_q11_important_parts",
    """SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
      |FROM (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
      |  FROM lineitem GROUP BY l_partkey)
      |WHERE value_dec > (
      |  SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))
      |    * CAST(0.0007 AS DECIMAL(5,4))
      |  FROM lineitem)
      |ORDER BY part_value DESC, l_partkey""".stripMargin) { (s, dir) =>
    // Durable-rollup fast path (r14): a ScaleUpLayout dir carries the
    // persisted IVM state of exactly this per-part aggregate
    // (Rollups.LineitemByPartkey, maintained O(delta) by MatViews.merge) —
    // the 20M-group aggregation over the full fact becomes a 20M-row scan.
    // Fixture dirs carry no _rollup and recompute from the fact below; the
    // rollup path is oracle-gated by tpch_q11_rollup.
    val l = t(s, dir, "lineitem")
    val perPart = graft.Rollups.visibleDf(s, dir, graft.Rollups.LineitemByPartkey)
      .getOrElse(l.groupBy("l_partkey").agg(sum(net).as("value_dec")))
    // Re-sum the per-part sums instead of re-aggregating raw lineitem:
    // decimal addition is exact, so the threshold is value-identical, and the
    // two branches share an identical scan + partial-agg + exchange subtree
    // that ReuseExchange executes ONCE — at SF100 this halves the scan/agg
    // work of the #2 heavy-tail query.
    val threshold = perPart
      .agg((sum(col("value_dec")) * lit(0.0007).cast("decimal(5,4)")).as("thr"))
    perPart.join(broadcast(threshold)) // 1-row scalar → broadcast nested loop
      .filter(col("value_dec") > col("thr"))
      .select(col("l_partkey"), asDouble(col("value_dec")).as("part_value"))
      // presentation sort WITHOUT RangePartitioning: a global orderBy here
      // samples its child to pick range bounds, and the child is the whole
      // BNLJ + 20M-group final aggregate — measured at SF100, the sampling
      // pass re-read the 7.9 GB per-part exchange and re-ran the aggregate a
      // second time just to place ~100 rows. The survivor count is PROVABLY
      // ≤ ⌈1/0.0007⌉ = 1429 at any scale (at most that many parts can exceed
      // a 0.0007-of-total threshold), so a single-partition sort is the
      // scale-safe plan: one tiny exchange, one in-memory sort, no sampling.
      .repartition(1)
      .sortWithinPartitions(col("part_value").desc, col("l_partkey"))
  }

  /** Q11 answered through the durable per-part rollup ([[graft.Rollups]]):
    * the per-part sums come from MatViews IVM state (deltaState → visible)
    * built over the same fact, so this entry oracle-gates the rollup fast
    * path q11 takes on a ScaleUpLayout dir — DuckDB recomputes the raw
    * aggregation, proving state-derived values are value-identical. */
  val q11Rollup: Q = Q(
    "tpch_q11_rollup",
    """SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
      |FROM (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
      |  FROM lineitem GROUP BY l_partkey)
      |WHERE value_dec > (
      |  SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))
      |    * CAST(0.0007 AS DECIMAL(5,4))
      |  FROM lineitem)
      |ORDER BY part_value DESC, l_partkey""".stripMargin) { (s, dir) =>
    val d = graft.Rollups.definition(graft.Rollups.LineitemByPartkey)
    val perPart = graft.MatViews.visible(d,
      graft.MatViews.deltaState(d, t(s, dir, "lineitem")))
    val threshold = perPart
      .agg((sum(col("value_dec")) * lit(0.0007).cast("decimal(5,4)")).as("thr"))
    perPart.join(broadcast(threshold))
      .filter(col("value_dec") > col("thr"))
      .select(col("l_partkey"), asDouble(col("value_dec")).as("part_value"))
      .repartition(1)
      .sortWithinPartitions(col("part_value").desc, col("l_partkey"))
  }

  /** Q12 — shipping-priority classes for late lines (shipmode → linestatus,
    * commit/receipt lateness → shipped ≥90 days after order). */
  val q12LatePriority: Q = Q(
    "tpch_q12_late_priority",
    """SELECT l_linestatus,
      |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
    // Durable-rollup at RESULT grain (r15): the definition carries the
    // cross-table lateness predicate ([[graft.Rollups.LateCountsByStatus]]),
    // so a layout dir answers this from a handful of state rows; otherwise
    // the same MatViews deltaState math runs inline over the (bucketed)
    // orderkey join, keeping the oracle gate over the state math.
    val det = graft.Rollups.visibleDf(s, dir, graft.Rollups.LateCountsByStatus)
      .getOrElse {
        val d = graft.Rollups.definition(graft.Rollups.LateCountsByStatus)
        graft.MatViews.visible(d, graft.MatViews.deltaState(d,
          t(s, dir, "lineitem")
            .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))))
      }
    // COUNT can never be NULL; the COALESCE only normalizes nullability
    // between the parquet state (nullable on read) and the inline aggregate
    det.select(col("l_linestatus"),
        coalesce(col("high_line_count"), lit(0L)).as("high_line_count"),
        coalesce(col("low_line_count"), lit(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Q13 — customer order-count distribution: outer join, two-level group-by. */
  val q13CustomerDistribution: Q = Q(
    "tpch_q13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    // Durable-rollup fast path (r15): per-customer filtered order counts
    // ([[graft.Rollups.OrderCountByCust]], the one ORDERS-based state); the
    // left join's zero-count arm re-derives as customer ∖ state via
    // COALESCE. Inline fallback = the same MatViews deltaState math.
    val det = graft.Rollups.visibleDf(s, dir, graft.Rollups.OrderCountByCust)
      .getOrElse {
        val d13 = graft.Rollups.definition(graft.Rollups.OrderCountByCust)
        graft.MatViews.visible(d13,
          graft.MatViews.deltaState(d13, t(s, dir, "orders")))
      }
    t(s, dir, "customer")
      .join(det, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15 — top supplier: revenue view + scalar-max subquery over that view.
    * The view is computed once and reused (Spark reuses the exchange). */
  val q15TopSupplier: Q = Q(
    "tpch_q15_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val revenue = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-01-01 00:00:00" && col("l_shipdate") < "1997-04-01 00:00:00")
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(net).as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
    t(s, dir, "supplier")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), asDouble(col("total_revenue")).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q16 — supplier count per part attribute, excluding flagged suppliers
    * (comment-LIKE exclusion → negative account balance), NOT IN → anti join. */
  val q16SupplierCount: Q = Q(
    "tpch_q16_supplier_count",
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("PROMO%")
        && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    val flagged = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
    // A distinct-(part, supplier)-pairs durable state was measured and
    // REVERTED here (591M state rows on the 600M-row fact — no collapse,
    // see the Rollups NOTE): the broadcast-semi-reduced direct plan is the
    // floor for this shape on this data.
    t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q17 — small-quantity-order revenue: correlated per-part AVG threshold.
    * quantity is an exact small integer in double form, so AVG is
    * order-independent and safe for cross-engine comparison. */
  val q17SmallQuantity: Q = Q(
    "tpch_q17_small_quantity",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3' AND p_size = 5
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l2.l_quantity)
      |    FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, dir) =>
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#3" && col("p_size") === 5)
    val l = t(s, dir, "lineitem")
    // decorrelated per-part average — but the correlation only ever probes the
    // ~1/(25·50) parts that survive the brand+size filter, so the aggregate's
    // input is semi-reduced by the broadcast part keys FIRST (reference:
    // semi_join_reduction_rule.cpp): the groupBy shuffles the tiny qualifying
    // subset, not the whole fact, and its output is small enough to broadcast
    // back — q17 ends with zero full-fact shuffles.
    val lRed = l.select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p.select("p_partkey")), col("l_partkey") === col("p_partkey"), "left_semi")
    val avgQty = lRed.groupBy(col("l_partkey").as("aq_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_threshold"))
    lRed.join(broadcast(avgQty), col("l_partkey") === col("aq_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((asDouble(sum(dec(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"))
  }

  /** Q20 — promotion-ready suppliers: IN over an aggregated-with-HAVING subquery
    * (availqty > half demand → shipped PROMO volume above threshold). */
  val q20PromotionSuppliers: Q = Q(
    "tpch_q20_promotion_suppliers",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_type = 'PROMO'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
    val qualified = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-01-01 00:00:00" && col("l_shipdate") < "1998-01-01 00:00:00")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 100)
      .select("l_suppkey")
    t(s, dir, "supplier")
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Q21 — suppliers who kept orders waiting: the only-late-supplier-in-a-
    * multi-supplier-order pattern — EXISTS + NOT EXISTS over self-joined
    * lineitem (receipt-after-commit → shipped ≥60 days after order).
    *
    * Plan shape: the EXISTS / NOT EXISTS pair is NOT executed as two more
    * lineitem joins (that shape scans the fact three times and shuffles it
    * three times — the naive decorrelation). Both subqueries only ask
    * per-order questions ("is there another supplier in this order?" / "is
    * another supplier late in this order?"), so one pass computes them:
    * lineitem joins F-orders once (the only fact-fact shuffle), collapses to
    * per-(order, supplier) rows via a partial-agg groupBy that REUSES the
    * join's orderkey partitioning (no second exchange), and a window over the
    * same orderkey partitioning counts suppliers and late suppliers per order
    * (sort only, no exchange). EXISTS ⟺ supplier_count > 1; NOT EXISTS for a
    * late l1 ⟺ late_supplier_count == 1 (l1's own supplier is the one).
    * numwait counts qualifying l1 LINES, so per-(order,supplier) late-line
    * counts are kept and re-summed per supplier name. Row-identity vs the
    * naive EXISTS/NOT-EXISTS join formulation is pinned by
    * SemiJoinReductionSpec. */
  val q21WaitingSuppliers: Q = Q(
    "tpch_q21_waiting_suppliers",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate >= o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate >= o_orderdate + INTERVAL 60 DAY)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin) { (s, dir) =>
    val n = t(s, dir, "nation").filter(col("n_name") === "NATION_3")
    val sup = t(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    // Durable-rollup fast path (r15): the per-(order, supplier) lateness
    // profile ([[graft.Rollups.LateByOrderSupp]]) replaces the fact-fact
    // join + first aggregate; the EXISTS/NOT-EXISTS cascade is then a
    // window over ~|F-order × supplier| state rows. Inline fallback = the
    // same MatViews deltaState math over the (bucketed) orderkey join.
    val perSupp = graft.Rollups.visibleDf(s, dir, graft.Rollups.LateByOrderSupp)
      .getOrElse {
        val d21 = graft.Rollups.definition(graft.Rollups.LateByOrderSupp)
        graft.MatViews.visible(d21, graft.MatViews.deltaState(d21,
          t(s, dir, "lineitem")
            .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))))
      }
    // r16 (guide §2.1/§2.4): the EXISTS/NOT-EXISTS cascade needs only
    // per-order AGGREGATES, not per-row window values — one hash
    // aggregation replaces the window's exchange + FULL SORT of the
    // |F-order × supplier| state (194M rows at SF100; the sort dominated
    // the query). A qualifying order has >1 suppliers and EXACTLY ONE
    // late one, so that supplier's key and late-line count ride out of
    // the same aggregate via MAX(CASE) — no join back to the detail rows.
    // Measured solo at SF100: 34.0 s (window) → see OPTIMIZATION_r16.md.
    perSupp
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("nsupp"),
        sum(col("supp_late")).as("nlate"),
        max(when(col("supp_late") === 1, col("l_suppkey"))).as("late_supp"),
        max(when(col("supp_late") === 1, col("late_lines"))).as("late_lines"))
      .filter(col("nlate") === 1 && col("nsupp") > 1)
      .join(broadcast(sup), col("late_supp") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** Q22 — global sales opportunity: scalar-subquery threshold + NOT EXISTS
    * anti join (phone country code → nation key). */
  val q22SalesOpportunity: Q = Q(
    "tpch_q22_sales_opportunity",
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      |  AND c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM customer
      |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val inScope = t(s, dir, "customer")
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    val threshold = inScope.filter(col("c_acctbal") > 0)
      .agg((asDouble(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
    inScope
      .join(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= "2000-01-01 00:00:00").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        asDouble(sum(dec(col("c_acctbal")))).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  val all: Seq[Q] = Seq(
    q2MinCostSupplier, q7VolumeShipping, q8MarketShare, q9ProductProfit,
    q11ImportantParts, q11Rollup, q12LatePriority, q13CustomerDistribution, q15TopSupplier,
    q16SupplierCount, q17SmallQuantity, q20PromotionSuppliers, q21WaitingSuppliers,
    q22SalesOpportunity)
}
