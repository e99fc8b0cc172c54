package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** `argmax_dot(vec, matrix)` → STRUCT<idx: INT, dot: DOUBLE>: the row
  * index of `matrix` (ARRAY<ARRAY<DOUBLE>>, normally a broadcast-sized
  * literal of k centroids) whose dot product with `vec` is largest,
  * plus that dot product. Ties keep the LOWEST index — the same winner
  * as `ORDER BY dot DESC, idx ASC ... rank 1`.
  *
  * This is the scale-correct IVF/k-means assignment shape: ONE output
  * row per vector from one pass over the centroid matrix — versus the
  * crossJoin(broadcast(centroids)) + window-top-1 plan, which
  * materializes and shuffles an n·k row expansion of the corpus (a
  * 10,000× blowup at a real coarse quantizer's k ≈ √n). Same
  * O(n·k·dim) multiply count, no expansion, no window exchange.
  *
  * Each dot accumulates left-to-right over the common prefix (zip
  * semantics), matching [[ArrayDot]] and DuckDB's `list_dot_product`
  * bit-for-bit. The matrix operand is expected foldable (a
  * `typedlit`); it is decoded to primitive arrays once per task and
  * cached, so per-row work is the pure multiply loop. CodegenFallback
  * for the same reason as [[HyperplaneLSH]]: the loop dominates, and
  * the expression sits in a projection without breaking surrounding
  * WholeStageCodegen spans. An empty or null matrix yields null.
  */
case class ArgMaxDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dot", DoubleType, nullable = false)))

  // an empty matrix evaluates to null even when both children are
  // non-null, so nullability cannot be children-derived
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"argmax_dot needs (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  private def decode(m: ArrayData): Array[Array[Double]] = {
    val k = m.numElements()
    val out = new Array[Array[Double]](k)
    var i = 0
    while (i < k) {
      out(i) = m.getArray(i).toDoubleArray()
      i += 1
    }
    out
  }

  // decoded once per task for the foldable (literal) matrix operand —
  // the common case; a non-foldable matrix decodes per row (correct,
  // just slower)
  @transient private lazy val foldableMatrix: Option[Array[Array[Double]]] =
    if (right.foldable) Option(right.eval(null)).map(m => decode(m.asInstanceOf[ArrayData]))
    else None

  override protected def nullSafeEval(vec: Any, matrix: Any): Any = {
    val v = vec.asInstanceOf[ArrayData].toDoubleArray()
    val m = foldableMatrix.getOrElse(decode(matrix.asInstanceOf[ArrayData]))
    if (m.length == 0) return null
    var bestIdx = -1
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < m.length) {
      val c = m(i)
      val n = math.min(v.length, c.length)
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += v(d) * c(d)
        d += 1
      }
      // NaN ranks GREATEST, matching ORDER BY dot DESC in both Spark
      // and DuckDB (the window formulation this replaces); ties keep
      // the lowest index
      val wins = bestIdx < 0 || acc > bestDot ||
        (acc.isNaN && !bestDot.isNaN)
      if (wins) { bestIdx = i; bestDot = acc }
      i += 1
    }
    val row = new GenericInternalRow(2)
    row.setInt(0, bestIdx)
    row.setDouble(1, bestDot)
    row: InternalRow
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "argmax_dot"
}

object ArgMaxDot {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("argmax_dot"),
    new ExpressionInfo(classOf[ArgMaxDot].getName, "argmax_dot"),
    (children: Seq[Expression]) => ArgMaxDot(children.head, children(1)))
}
