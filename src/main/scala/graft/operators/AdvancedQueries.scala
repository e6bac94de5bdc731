package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining §2 inventory rows + deliberate supersets of the reference's
  * executable surface (SURVEY §2.4 "free supersets we expose anyway"). */
object AdvancedQueries {
  import Det._

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.df(s, dir, n)

  /** ROLLUP — grouping-set aggregation the reference lacks entirely
    * (SURVEY §2.4: no GROUPING SETS/CUBE/ROLLUP in the translator). */
  val aggRollup: Q = Q(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"))
      .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** CUBE — full grouping-set lattice. */
  val aggCube: Q = Q(
    "agg_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** ANY aggregate — the reference's internal pick-any used by its dependent-
    * group-by reduction (reference: src/lib/expression/window_function_expression.hpp,
    * WindowFunction::Any; rule reference: src/lib/optimizer/strategy/
    * dependent_group_by_reduction_rule.cpp). Deterministic here because the
    * picked column is functionally dependent on the group key. */
  val aggAny: Q = Q(
    "agg_any",
    """SELECT n_regionkey, ANY_VALUE(r_name) AS region_name, COUNT(*) AS n
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_regionkey")
      .agg(any_value(col("r_name")).as("region_name"), count(lit(1)).as("n"))
      .orderBy("n_regionkey")
  }

  /** Three-valued logic (reference: src/lib/expression/logical_expression.hpp:12,
    * NULL-propagating AND/OR) — the truth-table corners as one verifiable row. */
  val expr3vl: Q = {
    val text =
      """SELECT
        |  (NULL AND FALSE) AS null_and_false,
        |  (NULL AND TRUE) IS NULL AS null_and_true_is_null,
        |  (NULL OR TRUE) AS null_or_true,
        |  (NULL OR FALSE) IS NULL AS null_or_false_is_null,
        |  (NOT NULL) IS NULL AS not_null_is_null""".stripMargin
    Q("expr_3vl", text)((s, _) => s.sql(text))
  }

  /** EXCEPT ALL / INTERSECT ALL — bag-semantics set ops (beyond the reference's
    * parsed-but-unexecutable set operations, SURVEY §2.7). */
  val setExceptAll: Q = Q(
    "set_except_all",
    """SELECT k FROM (
      |  SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 49
      |  EXCEPT ALL
      |  SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 0
      |) ORDER BY k""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "lineitem").filter(col("l_quantity") >= 49).select(col("l_suppkey").as("k"))
    val b = t(s, dir, "supplier").filter(col("s_acctbal") > 0).select(col("s_suppkey").as("k"))
    a.exceptAll(b).orderBy("k")
  }

  val setIntersectAll: Q = Q(
    "set_intersect_all",
    """SELECT k FROM (
      |  SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 100
      |  INTERSECT ALL
      |  SELECT s_nationkey AS k FROM supplier
      |) ORDER BY k""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "customer").filter(col("c_custkey") <= 100).select(col("c_nationkey").as("k"))
    val b = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
    a.intersectAll(b).orderBy("k")
  }

  /** LIMIT ... OFFSET — the reference asserts no OFFSET support
    * (reference: src/lib/sql/sql_translator.cpp:1578); native superset here. */
  val limitOffset: Q = Q(
    "limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 15""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(15)
      .limit(10)
  }

  /** Point lookup — the IndexScan capability (reference:
    * src/lib/operators/index_scan.hpp:22): an exact-key predicate answered by
    * data skipping (parquet min/max + dictionary) instead of an index object. */
  val indexScanPointLookup: Q = Q(
    "index_scan_point_lookup",
    """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
      |WHERE l_orderkey = 1042 ORDER BY l_linenumber""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") === 1042)
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .orderBy("l_linenumber")
  }

  /** TableWrapper — an in-memory relation as a plan leaf
    * (reference: src/lib/operators/table_wrapper.hpp:16), joined to a real scan. */
  val tableWrapperValues: Q = Q(
    "table_wrapper_values",
    """SELECT v.rk, r_name, v.tag
      |FROM (VALUES (0, 'alpha'), (2, 'beta'), (4, 'gamma')) v(rk, tag)
      |JOIN region ON r_regionkey = v.rk
      |ORDER BY v.rk""".stripMargin) { (s, dir) =>
    val wrapper = s.createDataFrame(
      java.util.Arrays.asList(Row(0, "alpha"), Row(2, "beta"), Row(4, "gamma")),
      StructType(Seq(
        StructField("rk", IntegerType, nullable = false),
        StructField("tag", StringType, nullable = false))))
    wrapper.join(t(s, dir, "region"), col("r_regionkey") === col("rk"))
      .select(col("rk"), col("r_name"), col("tag"))
      .orderBy("rk")
  }

  /** EXTRACT time components (reference DatetimeComponent includes
    * Hour/Minute/Second, src/lib/types.hpp:237) — computed from the events
    * nanosecond epoch with integer math shared by both engines. */
  val extractTime: Q = Q(
    "extract_time",
    """SELECT event_id,
      |  CAST(floor(epoch_us(ts) / 3600000000) % 24 AS BIGINT) AS h,
      |  CAST(floor(epoch_us(ts) / 60000000) % 60 AS BIGINT) AS m,
      |  CAST(floor(epoch_us(ts) / 1000000) % 60 AS BIGINT) AS sec
      |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_id") < 100)
      .select(
        col("event_id"),
        expr("((ts DIV 1000) DIV 3600000000) % 24").as("h"),
        expr("((ts DIV 1000) DIV 60000000) % 60").as("m"),
        expr("((ts DIV 1000) DIV 1000000) % 60").as("sec"))
      .orderBy("event_id")
  }

  /** Sorted-run aggregation (reference AggregateSort,
    * src/lib/operators/aggregate_sort.hpp — chosen when input is pre-sorted
    * or the aggregate isn't hashable). Spark's counterpart is SortAggregate,
    * picked by the planner for object aggregation buffers (collect_list);
    * the PlanSpec probe asserts the physical operator choice. Output is the
    * sorted per-group run serialized to a string so the oracle compare is
    * order-exact. */
  val aggSortCollect: Q = Q(
    "agg_sort_collect",
    """SELECT l_orderkey,
      |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
      |  COUNT(*) AS n
      |FROM lineitem WHERE l_orderkey < 50
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").filter(col("l_orderkey") < 50)
      .groupBy("l_orderkey")
      .agg(
        array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("lines"),
        count(lit(1)).as("n"))
      .orderBy("l_orderkey")
  }

  /** Exact interpolated percentiles (median/p25/p90) — absent from the
    * reference's aggregate set (reference: window_function_expression.hpp
    * lists Min/Max/Sum/Avg/Count/StdDev only); a native OLAP superset. Spark
    * `percentile` and DuckDB `quantile_cont` both linearly interpolate over
    * the sorted values with the same arithmetic — verified bit-identical. */
  val aggPercentile: Q = Q(
    "agg_percentile_exact",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
      |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Approximate sketches — the 100 TB path where exact percentile/distinct
    * (full sort / full hash set per group) stop being affordable: HyperLogLog++
    * distinct counting and GK-sketch quantiles, both mergeable map-side
    * partial aggregates with bounded state. No SQL oracle (sketch internals
    * are engine-specific) → driver records rows-only; AdvancedSpec bounds the
    * error against the exact answers instead. */
  val aggApproxSketches: Q = Q.noOracle("agg_approx_sketches") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("nd_partkey_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("med_price_approx"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Large×large RANGE JOIN via interval binning — the scale path for the
    * reference's non-equi JoinNestedLoop (join_nested_loop.hpp): a BETWEEN
    * join of two big sides is quadratic as a nested loop, but binning the
    * value axis turns it into an EQUI join: each interval explodes to the
    * (few) bins it overlaps, each point lands in exactly one bin (so no
    * dedup), the bin equi-join prunes to candidates, and the exact BETWEEN
    * re-check keeps semantics. Same inverted-index trick as MinHash-LSH —
    * 4.4M matching pairs at sf0.01 without a single nested-loop comparison.
    * Bin width 5000 ≥ max interval length, so an interval spans ≤ 2 bins. */
  val joinRangeBinned: Q = Q(
    "join_range_binned",
    """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_decile,
      |  COUNT(*) AS n_matches, COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM orders JOIN lineitem
      |  ON l_extendedprice BETWEEN o_totalprice * 0.05 AND o_totalprice * 0.06
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY price_decile ORDER BY price_decile""".stripMargin) { (s, dir) =>
    val binW = 5000
    val ords = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("o_totalprice") * 0.05).as("lo"), (col("o_totalprice") * 0.06).as("hi"))
      .withColumn("bin",
        explode(sequence(floor(col("lo") / binW).cast("long"),
          floor(col("hi") / binW).cast("long"))))
    val pts = t(s, dir, "lineitem")
      .select(col("l_extendedprice"),
        floor(col("l_extendedprice") / binW).cast("long").as("pbin"))
    ords.join(pts, col("bin") === col("pbin")
        && col("l_extendedprice").between(col("lo"), col("hi")))
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("price_decile"))
      .agg(count(lit(1)).as("n_matches"), countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("price_decile")
  }

  /** Semi-structured extraction: events.props carries a JSON payload; pull a
    * typed field out and aggregate. Map-only extraction (codegen'd JSON path)
    * before a keyed agg — the schema-on-read shape every event pipeline has.
    * The reference has no JSON type at all (string only) — native superset. */
  val projectJsonExtract: Q = Q(
    "project_json_extract",
    """SELECT event_type,
      |  SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_sum,
      |  COUNT(json_extract_string(props, '$.k')) AS k_n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
        count(get_json_object(col("props"), "$.k")).as("k_n"))
      .orderBy("event_type")
  }

  /** PIVOT: event counts per user decile × event type — wide-format report
    * shape. Spark's pivot with an explicit value list stays a single keyed
    * aggregate (no second pass to discover columns); the oracle spells the
    * same thing as FILTERed aggregates. */
  val aggPivot: Q = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val filterSql = types.map(tp =>
      s"COUNT(*) FILTER (WHERE event_type = '$tp') AS $tp").mkString(",\n      |  ")
    Q(
      "agg_pivot",
      s"""SELECT user_id % 10 AS user_decile,
         |  $filterSql
         |FROM events GROUP BY user_decile ORDER BY user_decile""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("user_decile"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .orderBy("user_decile")
    }
  }

  /** UNPIVOT (melt): wide numeric columns to long (metric, value) rows —
    * Spark's unpivot operator; the oracle is the standard UNION ALL
    * formulation. Map-only row expansion. */
  val projectUnpivot: Q = Q(
    "project_unpivot",
    """SELECT s_suppkey, metric, value FROM (
      |  SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
      |  UNION ALL
      |  SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value FROM supplier)
      |ORDER BY s_suppkey, metric""".stripMargin) { (s, dir) =>
    t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"),
        col("s_nationkey").cast("double").as("s_nationkey_d"))
      .unpivot(Array(col("s_suppkey")),
        Array(col("s_acctbal").as("acctbal"), col("s_nationkey_d").as("nationkey")),
        "metric", "value")
      .orderBy("s_suppkey", "metric")
  }

  /** UNNEST / LATERAL VIEW: explode a per-row array into rows (the relational
    * face of the tokenizer) — token frequencies over a document slice. */
  val projectUnnest: Q = Q(
    "project_unnest",
    """SELECT w, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents WHERE doc_id < 5)
      |GROUP BY w HAVING COUNT(*) >= 3 ORDER BY w""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .filter(col("doc_id") < 5)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
      .orderBy("w")
  }

  /** Two-phase skew-safe aggregation: GROUP BY a 3-value key means 3 reducers
    * own ALL the data at the final stage — at 100 TB those 3 tasks straggle.
    * Salting the key for a PARTIAL aggregate spreads phase one over
    * (key × salt) reducers; the final aggregate then combines a tiny
    * (|keys| × salt) intermediate. Decimal sums make the two-phase result
    * bit-equal to the oracle's single GROUP BY in any order. (Spark's own
    * map-side partial aggregation already gives much of this — the explicit
    * salt guards the case where the MERGE stage itself is the bottleneck.) */
  val aggSkewTwoPhase: Q = Q(
    "agg_skew_two_phase",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val salted = t(s, dir, "lineitem")
      .withColumn("__salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(8)))
    val partial = salted.groupBy("l_returnflag", "__salt")
      .agg(sum(dec(col("l_quantity"))).as("ps"), count(lit(1)).as("pn"))
    partial.groupBy("l_returnflag")
      .agg(asDouble(sum(col("ps"))).as("sum_qty"), sum(col("pn")).as("n"))
      .orderBy("l_returnflag")
  }

  /** Explicit GROUPING SETS (beyond the ROLLUP/CUBE shorthands): an arbitrary
    * set list, including the grand total and a non-prefix set — the form the
    * shorthands can't express. */
  val aggGroupingSets: Q = Q(
    "agg_grouping_sets",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** Date arithmetic probe: day-granular add/diff/trunc agree across engines
    * (month-granular interval arithmetic deliberately avoided — engines
    * disagree on end-of-month clamping). */
  val projectDateArith: Q = Q(
    "project_date_arith",
    """SELECT o_orderkey,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
      |  date_diff('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_97,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
      |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 200)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(col("o_orderdate").cast("date"), lit("1997-01-01").cast("date"))
          .as("days_since_epoch_97"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(
    aggRollup, aggCube, aggAny, expr3vl, setExceptAll, setIntersectAll,
    limitOffset, indexScanPointLookup, tableWrapperValues, extractTime,
    aggSortCollect, aggPercentile, aggApproxSketches, joinRangeBinned,
    projectJsonExtract, aggPivot, projectUnpivot, projectUnnest, aggSkewTwoPhase,
    aggGroupingSets, projectDateArith)
}
