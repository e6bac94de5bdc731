package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import scala.collection.concurrent.TrieMap

/** Declared key constraints, kept as optimizer metadata (the reference stores
  * them on the table and feeds dependency-based rewrites — reference:
  * src/lib/storage/constraints/table_key_constraint.hpp,
  * optimizer/strategy/dependent_group_by_reduction_rule.cpp). Constraints are
  * TRUSTED, not enforced — same contract as the reference (and as
  * warehouse-grade `RELY` constraints): they exist to license rewrites.
  * Consequence of a FALSE declaration: uniqueness-licensed rewrites can
  * change results — [[RemoveRedundantDistinct]] keeps duplicates, and
  * [[JoinToPredicateRewrite]] surfaces the violation loudly (its scalar
  * subquery throws "more than one row" where the join returned rows). Callers
  * registering data-backed tables can check a declaration once with
  * [[ConstraintRegistry.holdsFor]] before trusting it. */
final case class KeyConstraint(
    table: String, kind: String, cols: Seq[String],
    refTable: Option[String] = None, refCols: Seq[String] = Nil)

object ConstraintRegistry {
  private val byTable = TrieMap.empty[String, Seq[KeyConstraint]]

  def put(table: String, cs: Seq[KeyConstraint]): Unit =
    if (cs.nonEmpty) byTable.put(table.toLowerCase, cs) else byTable.remove(table.toLowerCase)
  def drop(table: String): Unit = byTable.remove(table.toLowerCase)
  def of(table: String): Seq[KeyConstraint] = byTable.getOrElse(table.toLowerCase, Nil)
  def all: Seq[KeyConstraint] = byTable.values.flatten.toSeq

  /** Unique column sets (PRIMARY KEY and UNIQUE) declared for `table`. */
  def uniqueKeys(table: String): Seq[Set[String]] =
    of(table).filter(c => c.kind == "PRIMARY KEY" || c.kind == "UNIQUE")
      .map(_.cols.map(_.toLowerCase).toSet)

  /** One-scan check that a declared unique key actually holds on `df` —
    * opt-in validation for callers that register data they did not produce
    * (declarations are otherwise trusted axioms, see [[KeyConstraint]]).
    * Distributed: a single hash aggregate, no collect of data rows. */
  def holdsFor(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Boolean = {
    import org.apache.spark.sql.functions.{count, lit, max}
    val top = df.groupBy(cols.map(df.col): _*).agg(count(lit(1)).as("c"))
      .agg(max("c")).head
    top.isNullAt(0) || top.getLong(0) <= 1L
  }
}

/** Removes DISTINCT when the input is already provably unique via a declared
  * key — the UCC-driven rewrite family of the reference
  * (dependent_group_by_reduction_rule.cpp's spirit: use unique column
  * combinations to drop redundant dedup work). At scale this deletes an
  * entire hash-aggregate shuffle. Injected via [[GraftExtensions]]. */
class RemoveRedundantDistinct(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Distinct(child) if keyCovered(child, visibleNames(child)) => child
    case Deduplicate(keys, child)
        if keys.map(_.name.toLowerCase).toSet == visibleNames(child)
          && keyCovered(child, visibleNames(child)) => child
    // ReplaceDistinctWithAggregate has usually run first: a pure-distinct
    // aggregate is Aggregate(out, out, child) with no aggregate functions.
    case a: Aggregate
        if a.aggregateExpressions.forall(_.isInstanceOf[AttributeReference])
          && a.groupingExpressions == a.aggregateExpressions
          && a.aggregateExpressions.map(_.name.toLowerCase).toSet == visibleNames(a.child)
          && keyCovered(a.child, visibleNames(a.child)) => a.child
  }

  private def visibleNames(plan: LogicalPlan): Set[String] =
    plan.output.map(_.name.toLowerCase).toSet

  /** True if `plan` exposes, unduplicated, all columns of some declared unique
    * key. Only shapes that provably preserve row identity are traversed:
    * aliases, filters, and simple column projections. */
  private def keyCovered(plan: LogicalPlan, visible: Set[String]): Boolean = plan match {
    case SubqueryAlias(ident, child) =>
      ConstraintRegistry.uniqueKeys(ident.name).exists(_.subsetOf(visible)) ||
        keyCovered(child, visible)
    case Project(ps, child) =>
      // only same-name column passthrough keeps key identity (renames are
      // conservatively treated as losing the key)
      val passthrough = ps.collect { case a: AttributeReference => a.name.toLowerCase }.toSet
      keyCovered(child, visible.intersect(passthrough))
    case f: Filter => keyCovered(f.child, visible)
    case _ => false
  }
}

/** Inner joins used only as an EXISTENCE probe — no column of one side is
  * referenced above, and that side's equi-join keys form a declared unique
  * key — become semi joins (the reference's JoinToSemiJoinRule,
  * optimizer/strategy/join_to_semi_join_rule.cpp: "SELECT c_name FROM
  * customer, nation WHERE c_nationkey = n_nationkey AND n_name = 'GERMANY'").
  * Uniqueness is what licenses it: a non-unique probe side could emit a left
  * row more than once, a semi join never does. At scale the win is the hash
  * table: a semi join stores only probe keys and short-circuits on first
  * match. Only plain `=` conjuncts qualify (`<=>` would match NULL keys,
  * which a standard UNIQUE constraint does not make unique). */
class JoinToSemiJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, j @ Join(left, right, Inner, Some(cond), _))
        if p.references.subsetOf(left.outputSet)
          && rightEquiKeys(cond, j).exists(ks => uniqueCovered(right, ks)) =>
      p.copy(child = j.copy(joinType = LeftSemi))
    case p @ Project(_, j @ Join(left, right, Inner, Some(cond), hint))
        if p.references.subsetOf(right.outputSet)
          && leftEquiKeys(cond, j).exists(ks => uniqueCovered(left, ks)) =>
      // mirrored: probe side is the LEFT input; semi join keeps its left, so
      // swap the children (condition attributes are side-agnostic)
      p.copy(child = Join(right, left, LeftSemi, Some(cond), hint))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** If EVERY conjunct is `leftAttr = rightAttr`, the probe-side key names. */
  private def rightEquiKeys(cond: Expression, j: Join): Option[Set[String]] = {
    val pairs = conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) => Some(b.name.toLowerCase)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if j.right.outputSet.contains(a) && j.left.outputSet.contains(b) => Some(a.name.toLowerCase)
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten.toSet) else None
  }

  private def leftEquiKeys(cond: Expression, j: Join): Option[Set[String]] = {
    val mirrored = j.copy(left = j.right, right = j.left)
    rightEquiKeys(cond, mirrored)
  }

  /** The join keys cover a declared unique key of the probe-side table
    * (traversing only row-identity-preserving shapes, as in keyCovered). */
  private def uniqueCovered(plan: LogicalPlan, keys: Set[String]): Boolean = plan match {
    case SubqueryAlias(ident, child) =>
      ConstraintRegistry.uniqueKeys(ident.name).exists(_.subsetOf(keys)) ||
        uniqueCovered(child, keys)
    case Project(ps, child) =>
      val passthrough = ps.collect { case a: AttributeReference => a.name.toLowerCase }.toSet
      keys.subsetOf(passthrough) && uniqueCovered(child, keys)
    case f: Filter => uniqueCovered(f.child, keys)
    case _ => false
  }
}

/** Shrinks GROUP BY lists via declared PRIMARY KEYs (the reference's
  * DependentGroupByReductionRule,
  * optimizer/strategy/dependent_group_by_reduction_rule.cpp): when the
  * grouping columns include a full PK of some table instance, every OTHER
  * grouping column from that same instance is functionally dependent — it is
  * removed from the grouping and re-attached as FIRST over the (constant
  * within each group) values, keeping the output schema and exprIds intact.
  * At scale this narrows the shuffle rows of every wide "group by key +
  * describing columns" aggregation (the reference's motivating TPC-H q10
  * shape: GROUP BY c_custkey, c_name, c_acctbal, ...).
  *
  * PRIMARY KEY only — a UNIQUE constraint admits multiple NULL rows, whose
  * distinct dependent values a key-only grouping would incorrectly merge.
  * Outer-join null-extension is safe: an extended row nulls the whole table
  * side, so dependents stay constant within each (possibly NULL) key group.
  * Conservative bails: any non-column grouping expression; any dependent
  * column referenced inside a non-aggregate expression of the select list;
  * renames (a Project alias drops the source mapping). */
class DependentGroupByReduction(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{ExprId, NamedExpression}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a: Aggregate if a.groupingExpressions.size > 1 => reduce(a)
  }

  /** exprId → (table-instance id, table name) for columns that trace to a
    * catalog table through row-identity-preserving shapes. Distinct instance
    * ids keep a self-join's two sides apart: a PK from instance 1 never
    * licenses dropping columns of instance 2. */
  private def tableSources(plan: LogicalPlan): Map[ExprId, (Int, String)] = {
    var nextId = 0
    // An alias that merely SHADOWS a constrained name must not inherit its
    // constraints: `FROM other_table AS dgbq` or a derived subquery aliased
    // to `dgbq` resolves to SubqueryAlias(dgbq, ...) over the OTHER source's
    // plan, and attributing dgbq's PRIMARY KEY there would unsoundly shrink
    // the grouping list (this rule changes returned rows, unlike the
    // keyCovered lookups). This rule runs post-hoc in the analyzer, where a
    // genuine catalog reference still carries its View node — so constraints
    // attach ONLY when the alias directly wraps the resolved View OF THE SAME
    // NAME. A shadowing alias wraps the other table's own SubqueryAlias (or a
    // derived Project/Aggregate), never this view, and stays transparent so
    // the real tables beneath still resolve their own constraints.
    def isOwnView(child: LogicalPlan, name: String): Boolean = child match {
      case v: org.apache.spark.sql.catalyst.plans.logical.View =>
        v.desc.identifier.table.toLowerCase == name
      case _ => false
    }
    def walk(p: LogicalPlan): Map[ExprId, (Int, String)] = p match {
      case SubqueryAlias(ident, child) =>
        val name = ident.name.toLowerCase
        if (ConstraintRegistry.of(ident.name).nonEmpty && isOwnView(child, name)) {
          nextId += 1
          val me = nextId
          p.output.map(o => o.exprId -> (me, name)).toMap
        } else walk(child) // transparent alias (no constraints at this name)
      case Project(ps, child) =>
        val below = walk(child)
        ps.collect {
          case ar: AttributeReference if below.contains(ar.exprId) =>
            ar.exprId -> below(ar.exprId)
        }.toMap
      case f: Filter => walk(f.child)
      case v: org.apache.spark.sql.catalyst.plans.logical.View => walk(v.child)
      case j: Join => walk(j.left) ++ walk(j.right)
      case _ => Map.empty
    }
    walk(plan)
  }

  /** References of `e` OUTSIDE aggregate functions (an aggregate's argument
    * may freely read a dropped column — it still sees the group's rows). */
  private def refsOutsideAgg(e: Expression): Set[ExprId] = e match {
    case _: AggregateExpression => Set.empty
    case ar: AttributeReference => Set(ar.exprId)
    case other => other.children.flatMap(refsOutsideAgg).toSet
  }

  private def reduce(a: Aggregate): LogicalPlan = {
    val groupAttrs = a.groupingExpressions.collect { case ar: AttributeReference => ar }
    if (groupAttrs.size != a.groupingExpressions.size) return a // expression keys: bail
    val sources = tableSources(a.child)
    val depIds: Set[ExprId] = groupAttrs
      .filter(g => sources.contains(g.exprId))
      .groupBy(g => sources(g.exprId))
      .flatMap { case ((_, table), attrs) =>
        val names = attrs.map(_.name.toLowerCase).toSet
        ConstraintRegistry.of(table)
          .filter(_.kind == "PRIMARY KEY")
          .map(_.cols.map(_.toLowerCase).toSet)
          .find(pk => pk.nonEmpty && pk.subsetOf(names))
          .map(pk => attrs.filterNot(x => pk.contains(x.name.toLowerCase)).map(_.exprId))
          .getOrElse(Nil)
      }.toSet
    if (depIds.isEmpty) return a
    // a dependent column read inside a non-aggregate select expression would
    // dangle once dropped from the grouping — bail unless it is a bare
    // pass-through entry (which becomes FIRST below)
    val safe = a.aggregateExpressions.forall {
      case ar: AttributeReference => true
      case e => refsOutsideAgg(e).intersect(depIds).isEmpty
    }
    val newGroupings = a.groupingExpressions.filter {
      case ar: AttributeReference => !depIds.contains(ar.exprId)
      case _ => true
    }
    if (!safe || newGroupings.isEmpty) return a
    val newAggs: Seq[NamedExpression] = a.aggregateExpressions.map {
      case ar: AttributeReference if depIds.contains(ar.exprId) =>
        // same name AND same exprId: parents keep resolving unchanged
        Alias(First(ar, ignoreNulls = false).toAggregateExpression(), ar.name)(
          exprId = ar.exprId)
      case other => other
    }
    a.copy(groupingExpressions = newGroupings, aggregateExpressions = newAggs)
  }
}

/** Replaces a join whose prunable side is guaranteed AT MOST ONE ROW — an
  * `unique_col = literal` filter over a declared single-column unique key —
  * with a scalar-subquery equality predicate (the reference's
  * JoinToPredicateRewriteRule,
  * optimizer/strategy/join_to_predicate_rewrite_rule.cpp:192): the join
  * disappears entirely; the kept side is filtered by
  * `join_col = (SELECT other_join_col FROM prunable_side WHERE ucc = lit)`.
  *
  * Two shapes, mirroring the reference's inner+semi coverage:
  *  - a LeftSemi join with a single equi-predicate whose build side carries
  *    the singleton-guaranteeing filter internally (the shape
  *    [[JoinToSemiJoin]] produces, and DataFrame-API semi joins);
  *  - the raw SQL shape `Project(Filter(cond, Join(Inner)))` where the
  *    projection uses only the kept side and `cond`'s prunable-side
  *    conjuncts contain the unique equality — pre-pushdown, the WHERE still
  *    sits above the join at post-hoc-resolution time, so the rule splits
  *    the conjunction itself (kept-side conjuncts stay in the rewritten
  *    filter, prunable-side conjuncts move into the subquery).
  *
  * Correctness: the unique equality leaves ≤1 build row, so an inner join
  * cannot duplicate kept rows and semi/inner keep-sets coincide; an empty
  * build side makes the scalar subquery NULL and `col = NULL` keeps nothing,
  * exactly the empty-join result. Uniqueness is View-verified like
  * [[DependentGroupByReduction]] — a shadowing alias never licenses the
  * rewrite, and only a singleton declared key column (PRIMARY KEY or UNIQUE
  * of that one column) traced through row-preserving shapes qualifies, so
  * the subquery can never raise a more-than-one-row error.
  *
  * At scale the win is plan shape: no build-side exchange at all — the
  * subquery executes once during preparation and the remaining predicate is
  * a codegen'd literal comparison on the probe side instead of a per-row
  * hash probe. Injected after [[JoinToSemiJoin]] via [[GraftExtensions]]. */
class JoinToPredicateRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Literal, ScalarSubquery}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, LeftSemi, Some(EqualTo(x: AttributeReference, y: AttributeReference)), _)
        if planDeterministic(right) =>
      sidePair(left, right, x, y).collect {
        case (lk, rk) if singletonGuaranteed(right) =>
          Filter(EqualTo(lk, ScalarSubquery(Project(Seq(rk), right))), left)
      }.getOrElse(j)
    case p @ Project(_, Filter(cond,
        j @ Join(left, right, Inner, Some(EqualTo(x: AttributeReference, y: AttributeReference)), _)))
        if p.references.subsetOf(left.outputSet) && planDeterministic(right) =>
      rewriteInner(p, cond, left, right, x, y).getOrElse(p)
  }

  /** No node in the subtree evaluates a nondeterministic expression — the
    * rewrite changes how many times the build side's predicates run (once in
    * the scalar subquery vs once per materialized build row), which is only
    * sound when every expression is deterministic. Mirrors the `.deterministic`
    * guard Spark's own pushdown rules apply. */
  private def planDeterministic(p: LogicalPlan): Boolean =
    p.find(n => !n.expressions.forall(_.deterministic)).isEmpty

  private def rewriteInner(p: Project, cond: Expression, left: LogicalPlan,
      right: LogicalPlan, x: AttributeReference, y: AttributeReference): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    if (!cs.forall(_.deterministic)) return None // a rand()<0.5 conjunct must
    // keep filtering per joined row; moving it into a once-evaluated scalar
    // subquery (or leaving it beside the probe predicate with a different
    // evaluation count) would keep all-or-none of the fact rows instead.
    val (rightCs, restCs) = cs.partition(_.references.subsetOf(right.outputSet))
    for {
      (lk, rk) <- sidePair(left, right, x, y)
      if restCs.forall(_.references.subsetOf(left.outputSet)) // no mixed conjuncts
      filteredRight = rightCs.reduceOption(And).map(Filter(_, right)).getOrElse(right)
      if singletonGuaranteed(filteredRight)
    } yield {
      val probe = EqualTo(lk, ScalarSubquery(Project(Seq(rk), filteredRight)))
      p.copy(child = Filter((restCs :+ (probe: Expression)).reduce(And), left))
    }
  }

  private def sidePair(left: LogicalPlan, right: LogicalPlan,
      x: AttributeReference, y: AttributeReference): Option[(AttributeReference, AttributeReference)] =
    if (left.outputSet.contains(x) && right.outputSet.contains(y)) Some((x, y))
    else if (left.outputSet.contains(y) && right.outputSet.contains(x)) Some((y, x))
    else None

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** Some filter inside `plan` (through row-preserving shapes only — a
    * union or join in between would invalidate the key, reference
    * join_to_predicate_rewrite_rule.cpp:108-118) pins a declared
    * single-column unique key to one literal → at most one row survives. */
  private def singletonGuaranteed(plan: LogicalPlan): Boolean = plan match {
    case f: Filter =>
      conjuncts(f.condition).exists {
        case EqualTo(a: AttributeReference, _: Literal) => uniqueOn(f.child, a)
        case EqualTo(_: Literal, a: AttributeReference) => uniqueOn(f.child, a)
        case _ => false
      } || singletonGuaranteed(f.child)
    case Project(_, child) => singletonGuaranteed(child)
    case SubqueryAlias(_, child) => singletonGuaranteed(child)
    case v: View => singletonGuaranteed(v.child)
    case _ => false
  }

  /** `a` alone is a declared unique key of the genuine catalog table it
    * traces to (View-verified, exprId-preserving pass-throughs only). */
  private def uniqueOn(plan: LogicalPlan, a: AttributeReference): Boolean = plan match {
    case SubqueryAlias(ident, child) =>
      (child match {
        case v: View =>
          v.desc.identifier.table.equalsIgnoreCase(ident.name) &&
            plan.outputSet.contains(a) &&
            ConstraintRegistry.uniqueKeys(ident.name).contains(Set(a.name.toLowerCase))
        case _ => false
      }) || uniqueOn(child, a)
    case Project(ps, child) =>
      ps.exists {
        case ar: AttributeReference => ar.exprId == a.exprId
        case _ => false
      } && uniqueOn(child, a)
    case f: Filter => uniqueOn(f.child, a)
    case v: View => uniqueOn(v.child, a)
    case _ => false
  }
}
