package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 bit transform:
  * `double_order_bits(v)` → LONG `t` such that `v1 < v2 ⇔ t1 < t2`
  * (signed long comparison) for all finite doubles and infinities.
  * Positive doubles keep their raw bits (raw-bit order IS value order
  * for positives); negative doubles flip their 63 value bits, which
  * reverses their raw-bit order back into value order while the sign
  * bit keeps them below every positive.
  *
  * This is what lets a HISTOGRAM be built over arbitrary doubles with
  * deterministic, order-contiguous buckets — `t >> k` groups values
  * by sign+exponent+mantissa-prefix exactly the way `cents >> 8`
  * groups fixed-precision money ([[graft.ops.Percentiles]]'s
  * bits-histogram regime). NaN maps above +Inf (raw NaN bits are
  * ≥ 0x7FF0…1), matching Spark's NaN-greatest sort order; -0.0 maps
  * one below +0.0 (callers grouping by the VALUE still see one 0.0
  * group — Spark normalizes -0.0 = 0.0 in grouping keys).
  */
case class DoubleOrderBits(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"double_order_bits needs DOUBLE input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DoubleOrderBits.orderBits(input.asInstanceOf[Double])

  // Codegen'd, not CodegenFallback: the bits-histogram percentile
  // regime evaluates this per row over full-column scans, and a
  // fallback would break that scan's whole-stage-codegen span.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.DoubleOrderBits.orderBits($v)")

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderBits =
    copy(child = newChild)
  override def prettyName: String = "double_order_bits"
}

object DoubleOrderBits {

  /** Shared by the interpreted and generated paths. */
  def orderBits(d: Double): Long = {
    val bits = java.lang.Double.doubleToRawLongBits(d)
    if (bits >= 0L) bits else bits ^ 0x7FFFFFFFFFFFFFFFL
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("double_order_bits"),
    new ExpressionInfo(classOf[DoubleOrderBits].getName, "double_order_bits"),
    (children: Seq[Expression]) => DoubleOrderBits(children.head))
}
