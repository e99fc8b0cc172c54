package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `bounded_topk(payload, order, tie, k)` → ARRAY<payload>: the k best
  * payload structs of the group, best-first — "best" = largest `order`
  * (nulls last), ties broken by smallest `tie` (nulls last), i.e. the
  * first k rows of `ORDER BY order DESC NULLS LAST, tie ASC NULLS
  * LAST` per group.
  *
  * This is the Tungsten-native grouped top-k: as a
  * [[TypedImperativeAggregate]] it runs inside ObjectHashAggregateExec
  * with map-side PARTIAL aggregation, so every input partition reduces
  * each group to at most k buffered rows BEFORE the exchange — the
  * bounded-heap pre-prune property — and the shuffle carries
  * serialized k-entry buffers, not rows. Unlike the previous
  * `df.rdd.mapPartitions` formulation this never leaves the
  * InternalRow world (no external-Row boxing, no
  * DataFrame→RDD→DataFrame round-trip severing codegen/columnar
  * input), and the final merge replaces the follow-up window sort
  * entirely: the array position IS the rank.
  *
  * Per-group state is one bounded priority queue (worst entry at the
  * head, evicted on overflow), so memory is k × (groups per map task)
  * regardless of data volume. Entry admission compares through
  * Catalyst's interpreted ordering for the column's type, which is
  * exactly the total order the window sort would have used (UTF8String
  * binary order for strings — not Java UTF-16 — Decimal, timestamp
  * micros, etc.). Among rows fully tied on (order, tie) the incumbent
  * wins, matching the arbitrary-among-ties pick of `row_number`.
  */
case class BoundedTopK(
    payload: Expression, order: Expression, tie: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[BoundedTopK.Entry]] {

  import BoundedTopK.Entry

  override def children: Seq[Expression] = Seq(payload, order, tie, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(payload = newChildren(0), order = newChildren(1),
         tie = newChildren(2), kExpr = newChildren(3))

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!payload.dataType.isInstanceOf[StructType])
      return TypeCheckResult.TypeCheckFailure(
        s"bounded_topk payload must be a struct, got ${payload.dataType.catalogString}")
    val ord = TypeUtils.checkForOrderingExpr(order.dataType, "bounded_topk order")
    if (!ord.isSuccess) return ord
    val tieCheck = TypeUtils.checkForOrderingExpr(tie.dataType, "bounded_topk tie")
    if (!tieCheck.isSuccess) return tieCheck
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      return TypeCheckResult.TypeCheckFailure(
        s"bounded_topk k must be a foldable INT, got ${kExpr.sql}")
    if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] < 1)
      return TypeCheckResult.TypeCheckFailure("bounded_topk k must be >= 1")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  @transient private lazy val ordAsc = TypeUtils.getInterpretedOrdering(order.dataType)
  @transient private lazy val tieAsc = TypeUtils.getInterpretedOrdering(tie.dataType)

  /** Returns >0 iff x is WORSE than y (so a max-queue head is the
    * eviction candidate): worse = smaller order (null order worst),
    * then larger tie (null tie worst) — the exact reverse of the
    * (desc_nulls_last, asc_nulls_last) goodness order. */
  private def compareWorse(xo: Any, xt: Any, yo: Any, yt: Any): Int = {
    val c = (xo, yo) match {
      case (null, null) => 0
      case (null, _)    => 1
      case (_, null)    => -1
      case (a, b)       => ordAsc.compare(b, a)
    }
    if (c != 0) c
    else (xt, yt) match {
      case (null, null) => 0
      case (null, _)    => 1
      case (_, null)    => -1
      case (a, b)       => tieAsc.compare(a, b)
    }
  }

  @transient private lazy val worstFirst: Ordering[Entry] =
    (x: Entry, y: Entry) => compareWorse(x.ord, x.tie, y.ord, y.tie)

  override def createAggregationBuffer(): mutable.PriorityQueue[Entry] =
    mutable.PriorityQueue.empty[Entry](worstFirst)

  /** Admit (ord, tie) only if the heap is under k or the candidate
    * beats the current worst; values are copied only on admission. */
  private def admit(buffer: mutable.PriorityQueue[Entry],
                    o: Any, t: Any, row: => InternalRow): Unit = {
    if (buffer.size < k) {
      buffer.enqueue(Entry(InternalRow.copyValue(o), InternalRow.copyValue(t), row))
    } else {
      val worst = buffer.head
      if (compareWorse(o, t, worst.ord, worst.tie) < 0) {
        buffer.dequeue()
        buffer.enqueue(Entry(InternalRow.copyValue(o), InternalRow.copyValue(t), row))
      }
    }
  }

  override def update(buffer: mutable.PriorityQueue[Entry],
                      input: InternalRow): mutable.PriorityQueue[Entry] = {
    val p = payload.eval(input).asInstanceOf[InternalRow]
    if (p != null) admit(buffer, order.eval(input), tie.eval(input), p.copy())
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[Entry],
                     other: mutable.PriorityQueue[Entry]): mutable.PriorityQueue[Entry] = {
    other.foreach(e => admit(buffer, e.ord, e.tie, e.row))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[Entry]): Any =
    // sorted by worstFirst ascending = least-worst first = best-first;
    // the array index is the 0-based rank
    new GenericArrayData(buffer.toArray.sorted(worstFirst).map(_.row: Any))

  @transient private lazy val payloadFields =
    payload.dataType.asInstanceOf[StructType].length
  @transient private lazy val entryType: DataType = ArrayType(StructType(Seq(
    StructField("o", order.dataType), StructField("t", tie.dataType),
    StructField("p", payload.dataType))), containsNull = false)
  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](entryType))

  override def serialize(buffer: mutable.PriorityQueue[Entry]): Array[Byte] = {
    val rows = buffer.toArray.map(e => InternalRow(e.ord, e.tie, e.row): Any)
    serProjection(InternalRow(new GenericArrayData(rows))).getBytes.clone()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Entry] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buffer = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 3)
      buffer.enqueue(Entry(
        InternalRow.copyValue(s.get(0, order.dataType)),
        InternalRow.copyValue(s.get(1, tie.dataType)),
        s.getStruct(2, payloadFields).copy()))
      i += 1
    }
    buffer
  }

  override def prettyName: String = "bounded_topk"
}

object BoundedTopK {
  /** One buffered row: order/tie keys in internal form + the payload
    * struct, all owned copies (inputs are reused mutable rows). */
  final case class Entry(ord: Any, tie: Any, row: InternalRow)

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bounded_topk"),
    new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_topk"),
    (children: Seq[Expression]) => {
      require(children.length == 4,
        "bounded_topk(payload, order, tie, k) takes exactly 4 arguments")
      BoundedTopK(children(0), children(1), children(2), children(3))
    })
}
