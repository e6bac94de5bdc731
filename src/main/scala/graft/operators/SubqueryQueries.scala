package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery surface: scalar (correlated + uncorrelated), IN/EXISTS rewrites, CTEs.
  * The reference decorrelates these into semi/anti joins at optimization time
  * (reference: src/lib/optimizer/strategy/subquery_to_join_rule.cpp, 674 LoC) and
  * evaluates correlated scalars row-wise in the ExpressionEvaluator
  * (reference: src/lib/expression/evaluation/expression_evaluator.cpp,
  * _evaluate_subquery_expression_for_row). Catalyst performs the same rewrites
  * (RewritePredicateSubquery / DecorrelateInnerQuery), so these run as SQL text —
  * the capability under test IS the translator+optimizer path.
  *
  * Determinism: every scalar aggregate is an exact decimal sum divided in double,
  * so the subquery boundary value is bit-identical to DuckDB's (see graft.Det).
  */
object SubqueryQueries {

  private def sql(s: SparkSession, dir: String, tables: Seq[String], text: String): DataFrame = {
    tables.foreach(n => Tables.df(s, dir, n).createOrReplaceTempView(n))
    s.sql(text)
  }

  /** Uncorrelated scalar subquery as a predicate boundary. */
  val subqueryScalar: Q = {
    val text =
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1.8 FROM orders)
        |ORDER BY o_orderkey""".stripMargin
    Q("subquery_scalar", text)((s, dir) => sql(s, dir, Seq("orders"), text))
  }

  /** Correlated scalar subquery (per-group average compared per row). */
  val subqueryCorrelated: Q = {
    val text =
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l
        |WHERE l_quantity > 2 *
        |  (SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |   FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    Q("subquery_correlated", text)((s, dir) => sql(s, dir, Seq("lineitem"), text))
  }

  /** IN (subquery) → semi join (reference: src/lib/expression/in_expression.hpp). */
  val subqueryIn: Q = {
    val text =
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.5)
        |ORDER BY p_partkey""".stripMargin
    Q("subquery_in", text)((s, dir) => sql(s, dir, Seq("part", "lineitem"), text))
  }

  /** WITH CTE (reference: src/lib/sql/sql_translator.cpp:120, with_descriptions). */
  val cte: Q = {
    val text =
      """WITH big_orders AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
        |), seg AS (
        |  SELECT c_custkey, c_mktsegment FROM customer
        |)
        |SELECT c_mktsegment, SUM(n) AS total_big
        |FROM big_orders JOIN seg ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    Q("cte", text)((s, dir) => sql(s, dir, Seq("orders", "customer"), text))
  }

  /** EXISTS inside a disjunction — exercises the evaluator-side EXISTS path
    * (reference: src/lib/expression/exists_expression.hpp:11) rather than the pure
    * semi-join rewrite. */
  val subqueryExistsOr: Q = {
    val text =
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE s_acctbal > 9000 OR EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity = 50)
        |ORDER BY s_suppkey""".stripMargin
    Q("subquery_exists_or", text)((s, dir) => sql(s, dir, Seq("supplier", "lineitem"), text))
  }

  val all: Seq[Q] = Seq(subqueryScalar, subqueryCorrelated, subqueryIn, cte, subqueryExistsOr)
}
