package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_adc_sum(codes, lut)` — the PQ asymmetric-distance table lookup
  * (Jégou et al., TPAMI 2011 §IV "ADC") as a native codegen'd expression:
  * given a corpus vector's M code bytes and the query's flattened M×K
  * distance table (entry `m·K + k` = the exact integer sub-distance between
  * the query's m-th sub-vector and codebook entry k of subspace m), the
  * distance is `Σ_m lut[m·K + codes[m]]` — M primitive lookups per candidate.
  *
  * Why it exists: the previous ADC formulation materialized one row per
  * (candidate, subspace), joined each against the codebook, and hash-
  * aggregated the M-way sums — M× the row work plus a shuffle-side aggregate
  * over candidates×M rows (measured: the pure-ADC probe at the 2M store spent
  * 83.5 s vs 4.2 s for the exact scan it exists to undercut). With the codes
  * packed per candidate and the query's table built once (M×K rows, query-side
  * only), scoring is one codegen'd expression eval per candidate row: no
  * per-subspace join, no scoring aggregate at all.
  *
  * Semantics (shared with the DuckDB oracle's per-subspace SUM formulation —
  * integer addition is order-independent, so the values are bit-identical):
  *   - K is inferred as `lut.length / codes.length` (lut length must be a
  *     non-zero multiple of codes length, else NULL);
  *   - NULL array, NULL element, or a code outside [0, K) → NULL (the join
  *     formulation would have dropped/poisoned such rows; codes are produced
  *     by `argmin % K` so this only guards corrupt stored state);
  *   - 64-bit wrap-around on overflow, matching the SUM(long) twin.
  */
case class AdcLookupSum(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_adc_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (codes, lut) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val m = codes.numElements()
    val t = lut.numElements()
    if (m == 0 || t == 0 || t % m != 0) return null
    val k = t / m
    var acc = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getLong(i)
      if (c < 0 || c >= k) return null
      val idx = i * k + c.toInt
      if (lut.isNullAt(idx)) return null
      acc += lut.getLong(idx)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (m, t, k, i, c, idx, acc) = (ctx.freshName("m"), ctx.freshName("t"),
        ctx.freshName("k"), ctx.freshName("i"), ctx.freshName("c"),
        ctx.freshName("idx"), ctx.freshName("acc"))
      s"""
         |final int $m = $a.numElements();
         |final int $t = $b.numElements();
         |if ($m == 0 || $t == 0 || $t % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $k = $t / $m;
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $c = $a.getLong($i);
         |    if ($c < 0 || $c >= $k) { ${ev.isNull} = true; break; }
         |    final int $idx = $i * $k + (int) $c;
         |    if ($b.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |    $acc += $b.getLong($idx);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}
