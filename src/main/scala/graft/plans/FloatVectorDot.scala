package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_vec_dot(a, b)` — dot product of two numeric arrays as a native
  * codegen'd Catalyst expression: the hot scalar kernel of the similarity /
  * ANN path (SURVEY.md §2.8 "custom Expression with codegen for hot scalar
  * kernels").
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions allocate an
  * intermediate array and bind a lambda per row — per-element closure calls
  * that sit outside whole-stage codegen's fused loop. At 100 TB the dot
  * product runs once per (query, candidate) pair, so it must compile to a
  * tight primitive loop. This expression participates in whole-stage codegen
  * via `doGenCode`.
  *
  * Semantics (kept bit-identical to the `aggregate`/`zip_with` formulation, so
  * oracle hashes still match):
  *   - elements are cast to double, multiplied, and summed LEFT-TO-RIGHT
  *     starting from 0.0d (IEEE addition order fixed);
  *   - NULL array, length mismatch, or any NULL element → NULL.
  * Note: this diverges from DuckDB's `list_sum` on NULL elements (SUM skips
  * NULLs there); oracle SQL for vector ops must use explicit per-element
  * NULL propagation, which `SimilarityQueries` already does.
  *
  * Input typing is validated in `checkInputDataTypes()` rather than
  * `ExpectsInputTypes.inputTypes` because `AbstractDataType`/`TypeCollection`
  * are `private[sql]` in the shipped Spark 4.1.2 (round-1 VERDICT item 1).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = lt match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv = rt match {
        case FloatType => y.getFloat(i).toDouble
        case _ => y.getDouble(i)
      }
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, t: DataType): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, i, elemType(left))} * ${get(b, i, elemType(right))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}
