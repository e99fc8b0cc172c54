package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `mg_agg(item, k)` → ARRAY<STRUCT<item STRING, cnt BIGINT>>: a
  * Misra–Gries frequent-items summary of the group's string items —
  * at most `k` (item, lower-bound-count) pairs with the classic
  * one-pass guarantee: EVERY item whose true count exceeds n/(k+1)
  * is present in the summary (n = items processed), and each kept
  * count is within n/(k+1) below the true count. (Misra & Gries,
  * "Finding repeated elements", 1982; merge rule from Agarwal et al.,
  * "Mergeable summaries", PODS 2012: sum counts, then subtract the
  * (k+1)-th largest and drop non-positives — errors add, the
  * superset guarantee survives.)
  *
  * Engine shape: TypedImperativeAggregate (the [[BloomFilterAgg]] /
  * [[KmvAgg]] discipline) in ObjectHashAggregate with map-side
  * PARTIAL aggregation — each partition reduces its token stream to
  * ≤k entries and the exchange carries summaries, never tokens. That
  * is the 100 TB role: frequent tokens/domains in one pass with
  * bounded state, where a full groupBy would shuffle every token.
  *
  * The summary CONTENTS (exact kept counts, ties) depend on merge
  * order, which Spark does not fix — so consumers must treat it as a
  * CANDIDATE set (guaranteed superset of the true heavy hitters) and
  * confirm with an exact count over just the candidates (q89: the
  * second pass groups only rows matching the ≤k candidate set — a
  * tiny shuffle). Output is sorted by kept count desc, then item, for
  * readability; null items are skipped (no identity to count).
  */
case class MisraGriesAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"mg_agg item must be STRING, got ${child.dataType.catalogString}")
    if (!kExpr.foldable || kExpr.dataType != IntegerType || kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Int] < 1 || kExpr.eval().asInstanceOf[Int] > (1 << 16))
      return TypeCheckResult.TypeCheckFailure(
        s"mg_agg k must be a foldable INT in [1, 2^16], got ${kExpr.sql}")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** The classic MG step: counted items increment; a new item takes a
    * free slot, else EVERY count decrements by one (zeros evicted) —
    * the "pay one from each of k+1 distinct items" argument behind
    * the n/(k+1) bound. The decrement sweep is O(k) but fires at most
    * n/(k+1) times total, so updates stay amortized O(1). */
  private def offer(buf: java.util.HashMap[String, Long], item: String): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) { buf.put(item, cur + 1L); () }
    else if (buf.size() < k) { buf.put(item, 1L); () }
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  /** Mergeable-summaries rule: sum counts item-wise; if over capacity,
    * subtract the (k+1)-th largest combined count from every entry and
    * drop non-positives — at most k survive, and the subtraction
    * only grows each item's undercount (never creates a false miss). */
  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (buf.size() > k) {
      val counts = new Array[Long](buf.size())
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(buf.size() - k - 1) // (k+1)-th largest
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= d) es.remove() else e.setValue(e.getValue - d)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size())
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (a: (String, Long), b: (String, Long)) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    new GenericArrayData(entries.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val entries = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](buf.size())
    var total = 4
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      entries += ((b, e.getValue))
      total += 4 + b.length + 8
    }
    val bb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(entries.size)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong()
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    buf
  }

  override def prettyName: String = "mg_agg"
}

object MisraGriesAgg {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mg_agg"),
    new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "mg_agg(item, k) takes exactly 2 arguments")
      MisraGriesAgg(children(0), children(1))
    })
}

/** `mg_union_agg(summary, k)` → the same ARRAY<STRUCT<item, cnt>>:
  * merge many STORED [[MisraGriesAgg]] summaries into one — the
  * persistence half of the mergeable contract (the [[KmvUnionAgg]]
  * pattern for the frequent-items family). Land one summary row per
  * (shard, day, source); "frequent items over any subset" is then
  * this aggregate over the SELECTED summary rows followed by the
  * usual exact confirm of the ≤k candidates. Each input is folded by
  * the weighted PODS-2012 merge (sum counts item-wise, subtract the
  * (k+1)-th largest, drop non-positives), so the n/(k+1) superset
  * guarantee holds over the COMBINED stream — with the usual additive
  * error across merges, which the confirm pass absorbs. Inputs longer
  * than `k` are refused (built with a different k); null rows skip. */
case class MisraGriesUnionAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesUnionAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = inner.dataType

  override def checkInputDataTypes(): TypeCheckResult = {
    val elemOk = child.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == StringType && f1.dataType == LongType
      case _ => false
    }
    if (!elemOk)
      return TypeCheckResult.TypeCheckFailure(
        "mg_union_agg input must be ARRAY<STRUCT<item STRING, cnt BIGINT>> " +
        s"summaries (mg_agg's output), got ${child.dataType.catalogString}")
    if (!kExpr.foldable || kExpr.dataType != IntegerType || kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Int] < 1 || kExpr.eval().asInstanceOf[Int] > (1 << 16))
      return TypeCheckResult.TypeCheckFailure(
        s"mg_union_agg k must be a foldable INT in [1, 2^16], got ${kExpr.sql}")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  @transient private lazy val inner = MisraGriesAgg(child, kExpr)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() <= k,
        s"mg_union_agg: input summary has ${arr.numElements()} entries > k=$k — " +
        "was it built with a different k?")
      val other = new java.util.HashMap[String, Long](arr.numElements() * 2)
      var i = 0
      while (i < arr.numElements()) {
        require(!arr.isNullAt(i),
          s"mg_union_agg: input summary contains a null entry at index $i")
        val row = arr.getStruct(i, 2)
        // null struct fields would NPE on getUTF8String / read cnt as
        // 0 — refuse hand-crafted corrupt summaries loudly
        require(!row.isNullAt(0) && !row.isNullAt(1),
          s"mg_union_agg: summary entry $i has a null item or cnt field")
        other.put(row.getUTF8String(0).toString, row.getLong(1))
        i += 1
      }
      inner.merge(buf, other)
    } else buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = inner.merge(buf, other)

  override def eval(buf: java.util.HashMap[String, Long]): Any = inner.eval(buf)

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] =
    inner.deserialize(bytes)

  override def prettyName: String = "mg_union_agg"
}

object MisraGriesUnionAgg {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mg_union_agg"),
    new ExpressionInfo(classOf[MisraGriesUnionAgg].getName, "mg_union_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "mg_union_agg(summary, k) takes exactly 2 arguments")
      MisraGriesUnionAgg(children(0), children(1))
    })
}
