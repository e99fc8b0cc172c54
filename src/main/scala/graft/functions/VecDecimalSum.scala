package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.{Decimal => SDecimal}

/** `vec_decimal_sum(v)` over ARRAY<DOUBLE> rows → ARRAY<DECIMAL(38,30)>
  * of EXACT element-wise sums — the vector-valued twin of
  * `sum(cast(x as decimal(38,30)))`, producing bit-identical totals to
  * the dimension-exploded formulation (each element is lifted to
  * decimal exactly as Spark's double→decimal cast does: the canonical
  * `BigDecimal.valueOf` representation, ≤17 significant digits, scaled
  * to 30) while updating ONE per-group buffer per vector instead of
  * shuffling dim× exploded scalar rows through the aggregate.
  *
  * Decimal addition is exact, associative and commutative, so the sum
  * is order- and partitioning-independent — the property the k-means
  * update step needs for cross-engine/re-run determinism
  * ([[graft.ops.Similarity.ivfUpdate]]). Null arrays are skipped like
  * `sum` skips nulls; an empty group evaluates to NULL. Vectors are
  * assumed fixed-dimension per group (the embedding-table contract);
  * a shorter vector simply contributes nothing to the tail dimensions.
  */
case class VecDecimalSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[JBigDecimal]] {

  private val ResultType = DecimalType(38, 30)

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecDecimalSum =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(ResultType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_decimal_sum needs ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  // empty array = "no input yet" (a real zero-dim vector is not a thing
  // this engine produces)
  override def createAggregationBuffer(): Array[JBigDecimal] = Array.empty

  private def grow(buf: Array[JBigDecimal], n: Int): Array[JBigDecimal] =
    if (buf.length >= n) buf
    else buf ++ Array.fill(n - buf.length)(JBigDecimal.ZERO)

  override def update(buffer: Array[JBigDecimal], input: InternalRow): Array[JBigDecimal] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return buffer
    val n = arr.numElements()
    val buf = grow(buffer, n)
    var i = 0
    while (i < n) {
      // exactly Spark's double→decimal lift: canonical valueOf repr
      buf(i) = buf(i).add(JBigDecimal.valueOf(arr.getDouble(i)))
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[JBigDecimal],
                     other: Array[JBigDecimal]): Array[JBigDecimal] = {
    val buf = grow(buffer, other.length)
    var i = 0
    while (i < other.length) { buf(i) = buf(i).add(other(i)); i += 1 }
    buf
  }

  override def eval(buffer: Array[JBigDecimal]): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(buffer.map { b =>
      val d = SDecimal(b)
      if (!d.changePrecision(38, 30)) {
        throw new ArithmeticException(
          "vec_decimal_sum overflowed DECIMAL(38,30) — sum magnitude exceeds 10^8")
      }
      d: Any
    })

  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](ArrayType(StringType, containsNull = false)))

  // serialize as plain-string decimals: exact, schema-free, and the
  // buffer crosses the wire once per (group × map task), not per row
  override def serialize(buffer: Array[JBigDecimal]): Array[Byte] = {
    val strs = buffer.map(b =>
      org.apache.spark.unsafe.types.UTF8String.fromString(b.toPlainString): Any)
    serProjection(InternalRow(new GenericArrayData(strs))).getBytes.clone()
  }

  override def deserialize(bytes: Array[Byte]): Array[JBigDecimal] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    Array.tabulate(arr.numElements())(i => new JBigDecimal(arr.getUTF8String(i).toString))
  }

  override def prettyName: String = "vec_decimal_sum"
}

object VecDecimalSum {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_decimal_sum"),
    new ExpressionInfo(classOf[VecDecimalSum].getName, "vec_decimal_sum"),
    (children: Seq[Expression]) => VecDecimalSum(children.head))
}
