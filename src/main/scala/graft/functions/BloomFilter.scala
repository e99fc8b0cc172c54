package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Shared bit math for the engine's Bloom-filter pair
  * (`bloom_agg` / `bloom_might_contain`).
  *
  * Serialized layout (little is deliberate — the blob is opaque to
  * SQL): word 0 = number of probe hashes k, word 1 = number of bits m,
  * words 2.. = the bitset. Probes use Kirsch–Mitzenmacher double
  * hashing over the caller-supplied 64-bit key (pair with the built-in
  * `xxhash64`): h_i = h1 + i·h2 with h2 forced odd, so k probes cost
  * two mixes, not k hash computations.
  */
object BloomBits {
  final val HeaderWords = 2

  def wordsFor(bits: Long): Int = (((bits + 63) >>> 6) + HeaderWords).toInt

  /** splitmix64 finalizer — decorrelates h2 from h1 so the double
    * hashing probes don't degenerate when keys share low bits. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], key: Long): Unit = {
    val k = words(0).toInt
    val m = words(1)
    val h1 = key
    val h2 = mix(key) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      words(HeaderWords + (bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(words: Array[Long], key: Long): Boolean = {
    val k = words(0).toInt
    val m = words(1)
    val h1 = key
    val h2 = mix(key) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((words(HeaderWords + (bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val lb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val words = new Array[Long](lb.remaining())
    lb.get(words)
    words
  }
}

/** `bloom_agg(key, bits, hashes)` → BINARY: a Bloom filter over the
  * group's 64-bit keys (callers pass `xxhash64(col)`), as a
  * TypedImperativeAggregate so it runs inside ObjectHashAggregateExec
  * with map-side PARTIAL aggregation: each input partition builds its
  * own bitset and the exchange carries one `bits/8`-byte buffer per
  * partition — merge is a word-wise OR. The filter has NO false
  * negatives by construction (a key that was added always probes
  * true); false-positive rate is sized by `bits` vs group cardinality
  * (m/n = 16 with k = 3 gives ~0.1%).
  *
  * The scale role is the classic semi-join prefilter: aggregate the
  * 100 TB side's join keys down to megabytes once, broadcast the blob,
  * and let `bloom_might_contain` discard the provably-absent rows
  * before the exact join (q74 — the incremental-dedup carrier; the
  * same shape Spark's own runtime row-level filtering uses, but as a
  * first-class library function the caller can persist/reuse).
  */
case class BloomFilterAgg(
    child: Expression, bitsExpr: Expression, hashesExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, bitsExpr, hashesExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0), bitsExpr = newChildren(1), hashesExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"bloom_agg key must be BIGINT (pass xxhash64(col)), got ${child.dataType.catalogString}")
    for ((e, name) <- Seq((bitsExpr, "bits"), (hashesExpr, "hashes"))) {
      if (!e.foldable || e.dataType != IntegerType || e.eval() == null ||
          e.eval().asInstanceOf[Int] < 1)
        return TypeCheckResult.TypeCheckFailure(
          s"bloom_agg $name must be a foldable positive INT, got ${e.sql}")
    }
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bits: Int = bitsExpr.eval().asInstanceOf[Int]
  @transient private lazy val hashes: Int = hashesExpr.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): Array[Long] = {
    val words = new Array[Long](BloomBits.wordsFor(bits))
    words(0) = hashes
    words(1) = bits
    words
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.set(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = BloomBits.HeaderWords
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomBits.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = BloomBits.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomBits.fromBytes(bytes)

  override def prettyName: String = "bloom_agg"
}

object BloomFilterAgg {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "bloom_agg(key, bits, hashes) takes exactly 3 arguments")
      BloomFilterAgg(children(0), children(1), children(2))
    })
}

/** `bloom_might_contain(filter, key)` → BOOLEAN: probe a
  * [[BloomFilterAgg]] blob (typically a collected literal, like the
  * driver-resident centroid tables of `argmax_dot`) with a 64-bit key.
  * `false` is definitive — the key was never added; `true` means
  * "possibly present", to be confirmed by an exact join over the
  * surviving minority. Null filter or null key → null (three-valued
  * logic like every probe function). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs (BINARY, BIGINT), got ${l.catalogString}, ${r.catalogString}")
    }

  // the filter operand is in practice one literal blob — parse it once
  // per task, not per row
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedWords: Array[Long] = _

  override protected def nullSafeEval(f: Any, key: Any): Any = {
    val bytes = f.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes)) {
      cachedWords = BloomBits.fromBytes(bytes)
      cachedBytes = bytes
    }
    BloomBits.mightContain(cachedWords, key.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
    (children: Seq[Expression]) => BloomMightContain(children.head, children(1)))
}
