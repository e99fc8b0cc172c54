package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `kmv_agg(key, k)` → ARRAY<BIGINT>: the K Minimum Values sketch of
  * the group's 64-bit keys — the at-most-`k` smallest DISTINCT key
  * values, sorted ascending (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002). The classic mergeable
  * distinct-count sketch: with keys uniform on [0, M), the k-th
  * smallest value v estimates the distinct count as
  * `(k-1) / (v / M)`; when the group holds fewer than `k` distinct
  * keys the sketch IS the distinct set and its size is the EXACT
  * count. Callers derive the estimate from the returned array (see
  * q88), so the sketch itself stays reusable state: two sketches
  * union by merging arrays and re-trimming to `k` — exactly what the
  * partial-aggregation path below does — which is what lets a
  * 100 TB corpus keep per-partition/per-day sketches and answer
  * "distinct across any subset" without rescanning.
  *
  * Engine shape: a TypedImperativeAggregate (the [[BloomFilterAgg]]
  * discipline), so it runs inside ObjectHashAggregateExec with
  * map-side PARTIAL aggregation — each input partition reduces to at
  * most `k` longs and the exchange carries sketches, never keys. The
  * buffer is a capped TreeSet: add is O(log k), duplicates are free
  * (distinctness is the set property), over-cap trims the LARGEST.
  *
  * Determinism: no RNG anywhere — with md5-derived keys (the q45/q25
  * bridge) the sketch and its estimate are bit-identical across
  * engines, which is what makes q88 DuckDB-oracle-checkable. Null
  * keys are skipped (a null has no identity to count).
  */
case class KmvAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"kmv_agg key must be BIGINT (pass a 64-bit hash), got ${child.dataType.catalogString}")
    // cap k: the buffer is driver/executor heap per group, and a
    // 2^20-long sketch (8 MB) is already far past any sensible
    // estimate precision (relative error ~ 1/sqrt(k))
    if (!kExpr.foldable || kExpr.dataType != IntegerType || kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Int] < 1 || kExpr.eval().asInstanceOf[Int] > (1 << 20))
      return TypeCheckResult.TypeCheckFailure(
        s"kmv_agg k must be a foldable INT in [1, 2^20], got ${kExpr.sql}")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values that cannot enter a full sketch — avoids the
    // add-then-trim churn on the common path of a saturated buffer
    if (buffer.size() < k) { buffer.add(v); () }
    else if (v < buffer.last()) {
      buffer.add(v)
      if (buffer.size() > k) { buffer.pollLast(); () }
    }
  }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size())
    var i = 0
    val it = buffer.iterator() // TreeSet iterates ascending
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size() * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong()); i += 1 }
    set
  }

  override def prettyName: String = "kmv_agg"
}

object KmvAgg {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_agg"),
    new ExpressionInfo(classOf[KmvAgg].getName, "kmv_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "kmv_agg(key, k) takes exactly 2 arguments")
      KmvAgg(children(0), children(1))
    })
}

/** `kmv_union_agg(sketch, k)` → ARRAY<BIGINT>: union many STORED
  * [[KmvAgg]] sketches back into one — the re-aggregation half of the
  * mergeable-sketch contract. A pipeline lands one sketch row per
  * (shard, day, source) next to its data; answering "distinct over
  * any subset" is then `kmv_union_agg` over the SELECTED sketch rows
  * — kilobytes of arrays, zero raw-data rescans. The union of KMV
  * sketches is lossless by construction (keep the k smallest distinct
  * of the merged value sets), so
  * `kmv_union_agg(per_shard_sketches) == kmv_agg(all_raw_keys)`
  * exactly — pinned by KmvSpec, not just approximately true. Inputs
  * must be sketches built with the SAME `k` (arrays longer than `k`
  * are refused); null sketch rows are skipped. */
case class KmvUnionAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val elemOk = child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!elemOk)
      return TypeCheckResult.TypeCheckFailure(
        s"kmv_union_agg input must be ARRAY<BIGINT> sketches, got ${child.dataType.catalogString}")
    if (!kExpr.foldable || kExpr.dataType != IntegerType || kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Int] < 1 || kExpr.eval().asInstanceOf[Int] > (1 << 20))
      return TypeCheckResult.TypeCheckFailure(
        s"kmv_union_agg k must be a foldable INT in [1, 2^20], got ${kExpr.sql}")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  @transient private lazy val inner = KmvAgg(child, kExpr)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buffer.size() < k) { buffer.add(v); () }
    else if (v < buffer.last()) {
      buffer.add(v)
      if (buffer.size() > k) { buffer.pollLast(); () }
    }
  }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() <= k,
        s"kmv_union_agg: input sketch has ${arr.numElements()} entries > k=$k — " +
        "was it built with a different k?")
      var i = 0
      while (i < arr.numElements()) {
        // a null element would read as 0 via getLong, injecting a
        // phantom minimum into the sketch — refuse corrupt input
        require(!arr.isNullAt(i),
          s"kmv_union_agg: input sketch contains a null entry at index $i")
        add(buffer, arr.getLong(i)); i += 1
      }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size())
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  override def prettyName: String = "kmv_union_agg"
}

object KmvUnionAgg {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_union_agg"),
    new ExpressionInfo(classOf[KmvUnionAgg].getName, "kmv_union_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "kmv_union_agg(sketch, k) takes exactly 2 arguments")
      KmvUnionAgg(children(0), children(1))
    })
}
