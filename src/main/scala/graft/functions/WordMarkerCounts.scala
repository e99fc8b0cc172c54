package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-word marker counter: `word_marker_counts(text, markers)` →
  * ARRAY<BIGINT> with one count per marker, where a "word" is defined
  * exactly as in [[WordTokens]] (lowercase, maximal runs of
  * [a-z0-9], any other byte a delimiter — same ASCII precondition).
  *
  * Motivation is the language-ID heuristic (reference
  * `pipeline/quality.py`-style marker scoring, carrier q24): the HOF
  * form `size(filter(word_tokens(text), t -> t = marker))` evaluated
  * once per marker costs a token-array materialization plus five
  * interpreted filter lambdas per row. This expression answers all
  * markers in ONE byte scan of the text with zero allocation per
  * token — each candidate span is compared against the marker bytes
  * in place (length first, then lowered bytes).
  *
  * `markers` must be a foldable ARRAY<STRING> of already-lowercase
  * words; duplicate markers are counted independently. Position `i`
  * of the result (1-based via `element_at`) is the count of
  * `markers[i]`.
  */
case class WordMarkerCounts(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (StringType, ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckFailure("word_marker_counts needs a foldable marker array")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_marker_counts needs (STRING, ARRAY<STRING>), got (${l.catalogString}, ${r.catalogString})")
  }

  // Materialized once per task, not per row: the marker list is
  // foldable by contract (checked above).
  @transient private lazy val markerBytes: Array[Array[Byte]] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getUTF8String(i).getBytes)
  }

  override protected def nullSafeEval(textAny: Any, markersAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].getBytes
    val markers = markerBytes
    val counts = new Array[Long](markers.length)
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val alnum = i < bytes.length && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        val tokLen = i - start
        var m = 0
        while (m < markers.length) {
          val mk = markers(m)
          if (mk.length == tokLen) {
            var j = 0
            var eq = true
            while (eq && j < tokLen) {
              val b = bytes(start + j)
              val lowered = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
              if (lowered != mk(j)) eq = false
              j += 1
            }
            if (eq) counts(m) += 1L
          }
          m += 1
        }
        start = -1
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordMarkerCounts =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_marker_counts"
}

object WordMarkerCounts {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_marker_counts"),
    new ExpressionInfo(classOf[WordMarkerCounts].getName, "word_marker_counts"),
    (children: Seq[Expression]) => WordMarkerCounts(children(0), children(1)))
}
