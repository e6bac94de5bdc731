package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `graft_dbits(d)` — the IEEE-754 total-order trick: maps a double to a
  * signed long whose `<` order equals the double's, BIT-EXACTLY (no
  * quantization): `bits ^ ((bits >> 63) & Long.MaxValue)` flips the mantissa
  * order of negatives while keeping their sign bit, so
  * `-Inf < … < -0.0 < 0.0 < … < +Inf < NaN` — NaN maps above +Inf, matching
  * Spark's NaN-greatest ordering for MAX and ORDER BY.
  *
  * Why it exists: argmax-with-tie-break over a double score (k-means
  * assignment: max cosine, then min centroid id) has no shuffle-free
  * single-aggregate form on doubles — a struct-ordered max_by drops the agg
  * to SortAggregateExec (sorts the N×nlist scored stream; the measured
  * >60 GB ENOSPC at the 2M store), and the two-pass MAX + rejoin either
  * broadcasts an O(N)-row table or reshuffles the scored stream. Mapping the
  * score to order-preserving long bits lets the score and the tie-break key
  * pack into ONE decimal whose plain MAX is a codegen'd hash aggregate with
  * map-side partials — exactly the packed-argmin pattern the integer-L2
  * paths already use, now available to double-scored paths without changing
  * a single comparison outcome.
  *
  * NULL → NULL. The inverse is not provided: packers decode only the
  * tie-break id, never the score.
  */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_dbits"

  override def nullSafeEval(d: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(d.asInstanceOf[Double])
    bits ^ ((bits >> 63) & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val bits = ctx.freshName("bits")
      s"""
         |final long $bits = Double.doubleToLongBits($d);
         |${ev.value} = $bits ^ (($bits >> 63) & Long.MAX_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderBits =
    copy(child = newChild)
}
