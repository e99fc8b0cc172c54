package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-pass scan for the DSIR family ([[graft.ops.Dsir]]):
  * word 1-gram ++ 2-gram md5-bridge buckets of a document in ONE byte
  * scan — the same tokenizer as [[WordTextNgrams]] (ASCII-alnum runs,
  * lowercased into a reused gram buffer) with each gram reduced to
  * `conv(substr(md5(g),1,8),16,10) % buckets` on the spot (the first
  * four digest bytes as an unsigned 32-bit value — bit-identical to
  * the relational md5 bridge, so the DuckDB oracle reproduces every
  * bucket). Gram STRINGS are never allocated; the relational form
  * (`explode(concat(ngrams(1), ngrams(2)))` → md5 → conv → %) built
  * ~n intermediate strings and three expression layers per gram. */
object DsirScan {

  /** Walk the 1- and 2-gram buckets of `text` (1-grams first, then
    * 2-grams — the `concat(ngramsOfText(t,1), ngramsOfText(t,2))`
    * order, though consumers here are order-insensitive folds).
    * Returns the gram count; invokes `onBucket` per gram. */
  def walk(bytes: Array[Byte], buckets: Int, onBucket: Int => Unit): Long = {
    // token spans, the WordTextGramHashes pass
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val alnum = i < bytes.length && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) { starts.add(start); ends.add(i); start = -1 }
      i += 1
    }
    val tokens = starts.size()
    if (tokens == 0) return 0L
    val md = MessageDigest.getInstance("MD5")
    var buf = new Array[Byte](64)
    def gram(g: Int, n: Int): Unit = {
      var len = n - 1
      var j = 0
      while (j < n) { len += ends.get(g + j) - starts.get(g + j); j += 1 }
      if (buf.length < len) buf = new Array[Byte](Integer.highestOneBit(len) << 1)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        var k = starts.get(g + j)
        val e = ends.get(g + j)
        while (k < e) {
          val b = bytes(k)
          buf(p) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          p += 1
          k += 1
        }
        j += 1
      }
      md.update(buf, 0, len)
      val d = md.digest() // resets the digest for the next gram
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      onBucket((v % buckets).toInt)
    }
    var g = 0
    while (g < tokens) { gram(g, 1); g += 1 }
    g = 0
    while (g < tokens - 1) { gram(g, 2); g += 1 }
    tokens.toLong + math.max(tokens - 1, 0).toLong
  }
}

/** `dsir_score(text)` → STRUCT(n_grams BIGINT, logw_micronats BIGINT)
  * — the map-fold scoring arm of [[graft.ops.Dsir.withScores]]: one
  * byte scan probes the frozen model's delta table per gram and folds
  * the exact fixed-point log-weight inline (the [[LmScore]] pattern).
  * NULL text scores as an empty document (0 grams, 0 logw — the
  * relational `coalesce(text, '')` twin), so the output struct is
  * never null. Model arrays are constructor arguments (driver-built,
  * B+1 longs — bounded by the bucket constant, embedded in the task
  * binary, not registry-registered). Codegen'd via a direct call to
  * [[score]] so the projection stays inside one whole-stage span. */
case class DsirScore(child: Expression, delta: Array[Long],
                     constPerGram: Long, buckets: Int)
    extends UnaryExpression {

  require(delta.length == buckets,
    s"delta table has ${delta.length} entries for $buckets buckets")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("logw_micronats", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dsir_score needs STRING text, got ${t.catalogString}")
  }

  // NULL input still yields a non-null struct, so eval is overridden
  override protected def nullSafeEval(t: Any): Any =
    throw new IllegalStateException("unreachable: eval is overridden")

  override def eval(input: InternalRow): Any =
    score(child.eval(input).asInstanceOf[UTF8String])

  /** One shared body behind interpreted eval and the generated code. */
  def score(text: UTF8String): InternalRow = {
    if (text == null) return new GenericInternalRow(Array[Any](0L, 0L))
    var logw = 0L
    val n = DsirScan.walk(text.getBytes, buckets, b => logw += delta(b))
    new GenericInternalRow(Array[Any](n, logw + n * constPerGram))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
    val rowCls = classOf[InternalRow].getName
    val u8 = classOf[UTF8String].getName
    ev.copy(
      code = code"""
        ${c.code}
        $rowCls ${ev.value} = $ref.score(${c.isNull} ? ($u8) null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
  override def prettyName: String = "dsir_score"

  // Array[Long] is reference-compared by case-class equality; that is
  // fine here (each train() builds one instance) and canonicalization
  // never needs to unify two models.
}

/** `dsir_buckets(text, buckets)` → ARRAY<INT> of md5-bridge bucket ids
  * for all word 1- and 2-grams — the training-pass twin of
  * [[DsirScore]]: [[graft.ops.Dsir.train]] explodes THIS instead of
  * gram strings, so the histogram explode carries 4-byte ints and the
  * md5/conv layers collapse into the same single byte scan. */
case class DsirBuckets(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dsir_buckets needs (STRING, INT), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(textAny: Any, bAny: Any): Any = {
    val out = new java.util.ArrayList[Any]()
    DsirScan.walk(textAny.asInstanceOf[UTF8String].getBytes,
      bAny.asInstanceOf[Int], b => { out.add(b); () })
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirBuckets =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dsir_buckets"
}
