package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenizer + n-grammer: `word_text_ngrams(text, n)` ≡
  * `word_ngrams(word_tokens(text), n)` in ONE byte scan — token spans
  * are tracked as offsets into the input and each gram is assembled
  * directly from the source bytes (lowercased on the fly), so the
  * intermediate ARRAY<STRING> of tokens is never materialized. For
  * the gram-generation-bound queries (contamination q49, source
  * overlap q66) that array was pure overhead: the tokens feed exactly
  * one consumer. Same word definition and ASCII precondition as
  * [[WordTokens]]; same output as [[WordNgrams]] (empty array when
  * fewer than n tokens).
  */
case class WordTextNgrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_text_ngrams needs (STRING, INT), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(textAny: Any, nAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].getBytes
    val n = nAny.asInstanceOf[Int]
    // token spans as (start, end) offset pairs
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
    val out = new Array[Any](tokens - n + 1)
    var g = 0
    while (g <= tokens - n) {
      var len = n - 1 // separators
      var j = 0
      while (j < n) { len += ends.get(g + j) - starts.get(g + j); j += 1 }
      val gram = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { gram(p) = ' '; p += 1 }
        var k = starts.get(g + j)
        val e = ends.get(g + j)
        while (k < e) {
          val b = bytes(k)
          gram(p) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          p += 1
          k += 1
        }
        j += 1
      }
      out(g) = UTF8String.fromBytes(gram)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordTextNgrams =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_text_ngrams"
}

object WordTextNgrams {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_text_ngrams"),
    new ExpressionInfo(classOf[WordTextNgrams].getName, "word_text_ngrams"),
    (children: Seq[Expression]) => WordTextNgrams(children(0), children(1)))
}
