package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions. The reference parses and plans the full OVER(...) surface —
  * ranking set {CumeDist, DenseRank, PercentRank, Rank, RowNumber} + aggregates
  * over ROWS/RANGE frames (reference: src/lib/expression/window_function_expression.hpp:19-33,
  * window_expression.hpp:11,30) — but its physical translator rejects it
  * (reference: src/lib/logical_query_plan/lqp_translator.cpp:523-526, "does not yet
  * support window functions"). We implement the declared capability natively via
  * `org.apache.spark.sql.expressions.Window`.
  *
  * Scale note: every window here partitions by a key before ordering, so Spark
  * shuffles once on the partition key and sorts within partitions — no global
  * sort, no driver involvement.
  */
object WindowQueries {
  import Det._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** RANK + DENSE_RANK over a partitioned ordering (ties rank identically). */
  val windowRank: Q = Q(
    "window_rank",
    """SELECT o_orderkey, o_orderpriority,
      |  RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
      |  DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
      |FROM orders
      |QUALIFY rnk <= 10
      |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)
    t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .filter(col("rnk") <= 10)
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  /** ROW_NUMBER with a total order in the frame spec (deterministic). */
  val windowRowNumber: Q = Q(
    "window_row_number",
    """SELECT c_custkey, c_mktsegment, rn FROM (
      |  SELECT c_custkey, c_mktsegment,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .orderBy("c_mktsegment", "rn")
  }

  /** PERCENT_RANK + CUME_DIST — integer-ratio doubles, deterministic across engines. */
  val windowPercentRank: Q = Q(
    "window_percent_rank",
    """SELECT s_suppkey,
      |  PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS pr,
      |  CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey) AS cd
      |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(col("s_acctbal"), col("s_suppkey"))
    t(s, dir, "supplier")
      .select(
        col("s_suppkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("s_suppkey")
  }

  /** Aggregate over a running ROWS frame (decimal sum → deterministic double). */
  val windowRunningSum: Q = Q(
    "window_running_sum",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_orderkey ORDER BY l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        asDouble(sum(dec(col("l_quantity"))).over(w)).as("running_qty"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** RANGE frame over an integer ordering key (value-based bounds). */
  val windowRangeFrame: Q = Q(
    "window_range_frame",
    """SELECT n_nationkey,
      |  COUNT(*) OVER (ORDER BY n_nationkey RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS neighbors
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(col("n_nationkey").cast("long")).rangeBetween(-2, 2)
    t(s, dir, "nation")
      .select(col("n_nationkey"), count(lit(1)).over(w).as("neighbors"))
      .orderBy("n_nationkey")
  }

  /** LAG/LEAD — beyond the reference's parsed set, native in Spark (superset,
    * same spirit as SURVEY §2.5's "exceeds executable surface"). */
  val windowLagLead: Q = Q(
    "window_lag_lead",
    """SELECT o_orderkey, o_custkey,
      |  LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
      |  LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
      |FROM orders WHERE o_custkey < 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(
        col("o_orderkey"), col("o_custkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Global ranking WITHOUT a single-partition window — the scale path for
    * the global-ORDER-BY windows above (window_percent_rank et al. are
    * capability probes; a global window funnels 100 TB through one task).
    * Two-pass distributed ranking: (1) repartitionByRange on the sort key so
    * partitions hold disjoint key ranges, (2) row_number within each
    * partition (parallel), (3) add per-partition row-count offsets — a
    * partition-count-sized table (32 rows, driver-collected, broadcast back)
    * — to make local ranks global. The ordering key is made unique
    * (orderkey, linenumber tie-break), so the result equals the oracle's
    * plain ROW_NUMBER() regardless of where range boundaries land. */
  val windowGlobalRank: Q = Q(
    "window_global_rank_scalable",
    """SELECT l_orderkey, l_linenumber, rn FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    ROW_NUMBER() OVER (ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn % 1000 = 1
      |ORDER BY rn""".stripMargin) { (s, dir) =>
    val keyed = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .repartitionByRange(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    // materialize ONCE: the offsets pass and the final pass must see the same
    // range boundaries (RangePartitioner samples per execution)
    val local = keyed.withColumn("local_rn", row_number().over(wLocal))
      .localCheckpoint(true)
    // partition sizes: one row per partition — collecting 32 rows is O(cluster
    // width), not O(data); the offsets broadcast-join back
    val counts = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L) { case (acc, (_, cnt)) => acc + cnt }.init)
    val offDf = broadcast(s.createDataFrame(offsets.toSeq).toDF("pid2", "offset"))
    local.join(offDf, col("pid") === col("pid2"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("local_rn") + col("offset")).as("rn"))
      .filter(col("rn") % 1000 === 1)
      .orderBy("rn")
  }

  /** NTILE bucketing + FIRST_VALUE / LAST_VALUE / NTH_VALUE over an explicit
    * full-partition frame (reference window surface:
    * src/lib/expression/window_function_expression.hpp:19-33). The ORDER BY
    * carries a unique tiebreaker (c_custkey) so NTILE's bucket boundaries and
    * the value functions are deterministic in both engines; the frame is
    * pinned to UNBOUNDED..UNBOUNDED because LAST_VALUE/NTH_VALUE over the
    * default frame (..CURRENT ROW) is a classic cross-engine trap. */
  val windowNtileValue: Q = Q(
    "window_ntile_value",
    """SELECT c_custkey, c_mktsegment,
      |  NTILE(4) OVER w AS quartile,
      |  FIRST_VALUE(c_custkey) OVER w AS richest,
      |  LAST_VALUE(c_custkey) OVER w AS poorest,
      |  NTH_VALUE(c_custkey, 2) OVER w AS runner_up
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY c_mktsegment, quartile, c_custkey""".stripMargin) { (s, dir) =>
    val ord = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(ord).as("quartile"),
        first(col("c_custkey")).over(full).as("richest"),
        last(col("c_custkey")).over(full).as("poorest"),
        nth_value(col("c_custkey"), 2).over(full).as("runner_up"))
      .orderBy("c_mktsegment", "quartile", "c_custkey")
  }

  /** GROUPS frame, EXECUTED — beyond both engines. The reference parses
    * `GROUPS BETWEEN …` but cannot execute any window (lqp_translator.cpp:523),
    * and neither Spark nor (this) DuckDB implements GROUPS mode natively.
    * SQL:2011 GROUPS frames count in units of PEER GROUPS (rows tied on the
    * ORDER BY key), and dense_rank assigns consecutive integers per peer
    * group — so `GROUPS BETWEEN n PRECEDING AND m FOLLOWING` is exactly
    * `RANGE BETWEEN n PRECEDING AND m FOLLOWING` over the dense_rank value.
    * The rewrite is proven against hand-computed GROUPS semantics in
    * AdvancedSpec; both engines run the same rewrite for the exact-hash gate.
    * Two keyed windows, one shuffle on the partition key — scales. */
  val windowGroupsFrame: Q = Q(
    "window_groups_frame",
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      |  FROM lineitem WHERE l_partkey < 50),
      |ranked AS (
      |  SELECT *, DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY qty) AS g
      |  FROM base)
      |SELECT l_orderkey, l_linenumber, l_returnflag, qty,
      |  CAST(SUM(price) OVER (PARTITION BY l_returnflag ORDER BY g
      |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS grp_sum
      |FROM ranked ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val base = t(s, dir, "lineitem").filter(col("l_partkey") < 50)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("qty"),
        dec(col("l_extendedprice")).as("price"))
    val peers = Window.partitionBy("l_returnflag").orderBy("qty")
    val groups = Window.partitionBy("l_returnflag").orderBy("g").rangeBetween(-1, 1)
    base.withColumn("g", dense_rank().over(peers))
      .withColumn("grp_sum", sum("price").over(groups).cast("double"))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "qty", "grp_sum")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val all: Seq[Q] = Seq(
    windowRank, windowRowNumber, windowPercentRank,
    windowRunningSum, windowRangeFrame, windowLagLead, windowGlobalRank,
    windowNtileValue, windowGroupsFrame)
}
