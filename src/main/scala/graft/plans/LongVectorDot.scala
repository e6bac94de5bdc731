package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_vec_dotl(a, b)` — integer dot product of two long arrays as a
  * native codegen'd Catalyst expression: the hot kernel of the QUANTIZED
  * similarity path (k-means assign/train, IVF cell routing), sibling of
  * [[FloatVectorDot]].
  *
  * Why it exists: the k-means assignment is a corpus × centroids argmax —
  * at the 2M-vector store with the scaled √N-cell layout that is ~2.8
  * BILLION dot products per build pass. The previous
  * `aggregate(zip_with(...))` formulation binds a boxed lambda per element
  * outside whole-stage codegen's fused loop and was the measured wall of the
  * scaled-index build; this expression compiles to a tight primitive long
  * loop inside codegen.
  *
  * Semantics are EXACTLY the lambda formulation's (the gated IVF k-means
  * queries share this kernel with their DuckDB twins, so nothing may drift):
  *   - long × long products summed into a long accumulator; integer
  *     addition is associative, so any evaluation order gives the same
  *     bits (and deliberate 64-bit wrap-around on overflow matches the
  *     lambda's `acc + v` exactly);
  *   - NULL array, length mismatch, or any NULL element → NULL (zip_with
  *     pads a length mismatch with NULL and `acc + NULL` poisons the fold —
  *     same observable result).
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dotl"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}
