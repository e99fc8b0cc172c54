package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `word_lm_entries(text, prefix_only)` — the fused per-document gram
  * generator behind [[graft.ops.NgramLm]]: the (kind, hash) entries of
  * the bigram-LM surface in ONE byte scan, where the compositional
  * form paid TWO (`word_text_gram_hashes(text, 1)` and `(text, 2)`
  * each re-tokenize) plus a `concat`/`transform`/`slice` pipeline
  * allocating an intermediate array per step (the construction cost
  * of a 10⁸-row explode at the q93 sf10 probe).
  *
  * kind 0 = unigram hashes, kind 1 = bigram hashes — the same
  * tokenizer (ASCII-alnum runs, lowercased) and XXH64(seed 42) gram
  * hashing as [[WordTextGramHashes]], so fingerprints are identical
  * to the compositional form (NgramLmSpec pins the equivalence).
  * `prefix_only = true` (the scoring side) emits unigrams for tokens
  * 0..t−2 only — each bigram position's conditioning token;
  * `false` (the LM-build side) emits ALL unigram occurrences — the
  * textbook add-one denominator. Under 2 tokens: prefix form emits
  * nothing (no positions), full form emits the lone unigram if any. */
case class LmEntries(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("kind", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, BooleanType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_lm_entries needs (STRING, BOOLEAN), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(textAny: Any, prefixAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].getBytes
    val prefixOnly = prefixAny.asInstanceOf[Boolean]
    val s = WordBigramScan.spans(bytes)
    val t = s.t
    val nUni = if (prefixOnly) math.max(t - 1, 0) else t
    val nBig = math.max(t - 1, 0)
    val out = new Array[Any](nUni + nBig)
    var m = 0
    WordBigramScan.walk(bytes, s, prefixOnly,
      onBigram = h => { out(m) = new GenericInternalRow(Array[Any](1, h)); m += 1 },
      onUnigram = h => { out(m) = new GenericInternalRow(Array[Any](0, h)); m += 1 })
    new GenericArrayData(
      if (m == out.length) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LmEntries =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_lm_entries"
}

object LmEntries {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_lm_entries"),
    new ExpressionInfo(classOf[LmEntries].getName, "word_lm_entries"),
    (children: Seq[Expression]) => LmEntries(children(0), children(1)))
}

/** THE bigram-LM byte scan — the single definition of the tokenizer
  * and gram hashing shared by [[LmEntries]] (the relational arm's
  * entry generator) and [[LmScore]] (the map-fold arm). The two arms'
  * equivalence used to rest on two hand-synced copies staying
  * byte-identical; sharing the scanner makes it structural. Tokenizer:
  * ASCII-alnum runs, lowercased (the WordTextGramHashes contract);
  * hashes: XXH64 seed 42, bigram tokens joined by a single ' '. */
private[functions] object WordBigramScan {
  /** Token spans over `bytes` (primitive arrays — the previous
    * ArrayList[Integer] boxed every offset). Only the first `t`
    * entries of `starts`/`ends` are valid. */
  final class Spans(val starts: Array[Int], val ends: Array[Int], val t: Int)

  def spans(bytes: Array[Byte]): Spans = {
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var t = 0
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val alnum = i < bytes.length && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        if (t == cap) {
          cap <<= 1
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(t) = start; ends(t) = i; t += 1; start = -1
      }
      i += 1
    }
    new Spans(starts, ends, t)
  }

  /** Walks the LM surface in position order: for each token j emits
    * the bigram hash of (j−1, j) first (j > 0), then the unigram hash
    * of token j when `!prefixOnly || j < t−1` (prefix form = only the
    * conditioning token of each bigram position). One lowercase copy
    * of each token is reused by its unigram hash and both bigrams it
    * participates in. */
  def walk(bytes: Array[Byte], s: Spans, prefixOnly: Boolean,
           onBigram: Long => Unit, onUnigram: Long => Unit): Unit = {
    val t = s.t
    var buf = new Array[Byte](64)
    def tokenInto(j: Int, at: Int): Int = {
      var k = s.starts(j)
      val e = s.ends(j)
      var p = at
      while (k < e) {
        val b = bytes(k)
        buf(p) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        p += 1
        k += 1
      }
      p
    }
    var j = 0
    var prevLen = 0 // bytes of token j-1 at buf start, for the bigram
    while (j < t) {
      val tokLen = s.ends(j) - s.starts(j)
      if (buf.length < prevLen + 1 + tokLen)
        buf = java.util.Arrays.copyOf(buf, Integer.highestOneBit(prevLen + 1 + tokLen) << 1)
      if (j > 0) {
        // bigram (j-1, j): prev token already sits at buf[0..prevLen)
        buf(prevLen) = ' '
        val end = tokenInto(j, prevLen + 1)
        onBigram(XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, end, 42L))
        // slide the current token to the buffer start for the next pair
        System.arraycopy(buf, prevLen + 1, buf, 0, tokLen)
      } else tokenInto(j, 0)
      if (!prefixOnly || j < t - 1)
        onUnigram(XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, tokLen, 42L))
      prevLen = tokLen
      j += 1
    }
  }
}
