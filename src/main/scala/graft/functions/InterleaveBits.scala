package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order interleave: `interleave_bits(x, y)` → LONG with the
  * low 32 bits of `x` and `y` bit-interleaved (x on even positions,
  * y on odd). Sorting or range-bucketing by the z-value clusters
  * 2-D-close cells into 1-D-close file ranges — the standard layout
  * trick that lets a lat/lon box predicate prune most files of a
  * z-ordered table (the scale path for the reference's spatial box
  * queries, `cache_manager.py`'s nearby lookup, P7/O4). Inputs must
  * be non-negative grid indices (the engine's lat/lon index domain is
  * 0..90 × 0..60); values above 2³²−1 lose their high bits by design.
  *
  * Codegen'd (a static-call `doGenCode`, not `CodegenFallback`): the
  * expression sits in per-row projections over full fact scans (q71
  * buckets 10M+ events; the zland write path evaluates it per landed
  * row), and a fallback expression would split the whole-stage-codegen
  * span every scan pays for.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits needs (BIGINT, BIGINT), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(xAny: Any, yAny: Any): Any =
    InterleaveBits.interleave(xAny.asInstanceOf[Long], yAny.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.InterleaveBits.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "interleave_bits"
}

object InterleaveBits {

  /** Classic magic-mask bit spread: `v`'s low 32 bits moved to the
    * even positions of a 64-bit word (5 shuffle steps). */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** The interpreted and generated paths share this one body. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("interleave_bits"),
    new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
    (children: Seq[Expression]) => InterleaveBits(children(0), children(1)))
}
