package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-gram generator: `word_text_gram_hashes(text, n)` ≡
  * `transform(word_text_ngrams(text, n), g -> xxhash64(g))` in ONE
  * byte scan — same tokenizer and gram assembly as
  * [[WordTextNgrams]], but each gram's bytes are written into a
  * REUSABLE buffer and reduced to Spark's `xxhash64` (XXH64, seed 42)
  * on the spot, so no gram UTF8String is ever allocated and, more
  * importantly, downstream exchanges carry 8-byte LONGs instead of
  * ~20-byte gram strings.
  *
  * This is the shuffle-slimming half of the contamination (q49) and
  * source-overlap (q66) plans: both only need gram EQUALITY (semi-join
  * membership, bit_or grouping), never the gram text, so they can
  * key every exchange by the 64-bit fingerprint. The standard corpus-
  * pipeline tradeoff applies: two distinct grams colliding in 64 bits
  * would merge (probability ~n²/2⁶⁵ — ~10⁻⁶ at 10⁷ distinct grams,
  * vanishing at test scale). The hash matches the builtin `xxhash64`
  * bit-for-bit (PropertySpec pins it), so an oracle or a downstream
  * system can reproduce the fingerprints from the gram strings.
  */
case class WordTextGramHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_text_gram_hashes needs (STRING, INT), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(textAny: Any, nAny: Any): Any =
    WordTextGramHashes.eval(textAny, nAny, distinct = false)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordTextGramHashes =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_text_gram_hashes"
}

/** `word_text_gram_hashes_distinct(text, n)` ≡
  * `array_distinct(word_text_gram_hashes(text, n))` fused into the
  * SAME byte scan: each gram hash passes through an open-addressing
  * probe set before emission, so within-doc duplicate grams never
  * leave the expression. First-occurrence order is preserved (the
  * `array_distinct` contract — TextSpec pins the equivalence).
  *
  * This is the explode-row-count attack for q49/q66: both plans take
  * per-doc gram SETS (q49's (doc, gram) membership, q66's per-gram
  * source-bit OR are duplicate-insensitive), so emitting distinct
  * hashes shrinks the explode output — and q49's post-semi-join
  * `(doc_id, gram)` rows become unique BY CONSTRUCTION, deleting its
  * whole distinct exchange from the plan. */
case class WordTextGramHashesDistinct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_text_gram_hashes_distinct needs (STRING, INT), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(textAny: Any, nAny: Any): Any =
    WordTextGramHashes.eval(textAny, nAny, distinct = true)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordTextGramHashesDistinct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_text_gram_hashes_distinct"
}

object WordTextGramHashes {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_text_gram_hashes"),
    new ExpressionInfo(classOf[WordTextGramHashes].getName, "word_text_gram_hashes"),
    (children: Seq[Expression]) => WordTextGramHashes(children(0), children(1)))

  val distinctDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_text_gram_hashes_distinct"),
    new ExpressionInfo(classOf[WordTextGramHashesDistinct].getName,
      "word_text_gram_hashes_distinct"),
    (children: Seq[Expression]) => WordTextGramHashesDistinct(children(0), children(1)))

  /** The shared scan: token spans → gram bytes in a reusable buffer →
    * XXH64 per gram; `distinct` threads each hash through an
    * open-addressing (linear-probe) long set and keeps only first
    * occurrences. */
  private[functions] def eval(textAny: Any, nAny: Any, distinct: Boolean): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].getBytes
    val n = nAny.asInstanceOf[Int]
    // token spans as (start, end) offset pairs — same pass as WordTextNgrams
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
    if (tokens < n) return new GenericArrayData(Array.empty[Any])
    val total = tokens - n + 1
    // open-addressing set: power-of-two capacity, load ≤ 0.5; slot 0L
    // means empty, so a genuine 0L hash is tracked by a flag
    var table: Array[Long] = null
    var mask = 0
    var seenZero = false
    if (distinct) {
      // capacity computed in Long then clamped to 2^30: the Int form
      // `highestOneBit(total) << 2` wraps negative once total ≥ 2^29,
      // and a wrong (small) capacity silently degrades the set to
      // O(n²) probing rather than failing loudly
      val cap = math.min(
        java.lang.Long.highestOneBit(math.max(total, 4).toLong) << 2,
        1L << 30).toInt
      table = new Array[Long](cap)
      mask = cap - 1
    }
    val out = new Array[Any](total)
    var m = 0 // emitted count
    var buf = new Array[Byte](64) // grown on demand, reused across grams
    var g = 0
    while (g <= tokens - n) {
      var len = n - 1 // separators
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
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      val fresh = !distinct || {
        if (h == 0L) { val f = !seenZero; seenZero = true; f }
        else {
          var idx = (h ^ (h >>> 32)).toInt & mask
          while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & mask
          if (table(idx) == h) false else { table(idx) = h; true }
        }
      }
      if (fresh) { out(m) = h; m += 1 }
      g += 1
    }
    new GenericArrayData(
      if (m == total) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m).asInstanceOf[Array[Any]])
  }
}
