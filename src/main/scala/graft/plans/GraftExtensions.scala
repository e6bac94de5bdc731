package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Catalyst extension point for graft's native expressions — the Spark-idiomatic
  * counterpart of the reference registering operators with its LQP translator
  * (reference: src/lib/logical_query_plan/lqp_translator.cpp). Installed via the
  * public `spark.sql.extensions` conf (see [[graft.GraftSession]]), so the
  * functions are available to `spark.sql(...)` text and to
  * `functions.call_function` alike, and participate in whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Post-hoc resolution (not optimizer): the rewrite needs SubqueryAlias
    // nodes to map plans back to constrained catalog tables, and the
    // optimizer's Finish-Analysis batch strips those before custom optimizer
    // rules run.
    ext.injectPostHocResolutionRule(session => new RemoveRedundantDistinct(session))
    ext.injectPostHocResolutionRule(session => new JoinToSemiJoin(session))
    ext.injectPostHocResolutionRule(session => new DependentGroupByReduction(session))
    // after JoinToSemiJoin: it canonicalizes the prunable inner join into the
    // LeftSemi shape this rule's first case consumes
    ext.injectPostHocResolutionRule(session => new JoinToPredicateRewrite(session))
    // after the key-driven rewrites: a shrunk grouping list gives the eager
    // pre-aggregate fewer keys, and the stats gate sees the final shape
    ext.injectPostHocResolutionRule(session => new EagerAggregation(session))
    // grouping-sets Expand elimination over associative aggregates (the
    // packaged q67/q5 rewrite); independent of the join-shaped rules above
    ext.injectPostHocResolutionRule(session => new RollupFromBase(session))
    // last: turns >=1024-element literal IN lists into broadcast semi joins;
    // running after the others keeps their Filter pattern-matches intact
    ext.injectPostHocResolutionRule(session => new InListToJoin(session))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, s"graft_vec_dot expects 2 arguments, got ${args.length}")
        FloatVectorDot(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dotl"),
      new ExpressionInfo(classOf[LongVectorDot].getName, "graft_vec_dotl"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, s"graft_vec_dotl expects 2 arguments, got ${args.length}")
        LongVectorDot(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_adc_sum"),
      new ExpressionInfo(classOf[AdcLookupSum].getName, "graft_adc_sum"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, s"graft_adc_sum expects 2 arguments, got ${args.length}")
        AdcLookupSum(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dbits"),
      new ExpressionInfo(classOf[DoubleOrderBits].getName, "graft_dbits"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, s"graft_dbits expects 1 argument, got ${args.length}")
        DoubleOrderBits(args.head)
      }))
  }
}
