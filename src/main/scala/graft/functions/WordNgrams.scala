package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams over a token array:
  * `word_ngrams(toks, n)` → ARRAY<STRING> (empty when `size < n`).
  *
  * Replaces the HOF composition
  * `transform(sequence(0, size-n), i -> concat_ws(' ', element_at...))`
  * for the same reason as MinHashSigs: beyond the interpreted-lambda
  * overhead, the HOF form is an optimizer hazard — when
  * InferFiltersFromGenerate + CollapseProject inline the expression
  * (e.g. under an `explode`), every `element_at` re-evaluates the
  * whole inlined token expression per gram position, turning a linear
  * scan quadratic (q49 measured 24 s vs <1 s at sf0.1 from exactly
  * this). A native expression has no lambdas to substitute into:
  * worst-case inlining re-evaluates the child ONCE per check.
  *
  * Output is bit-identical to the HOF form and to the DuckDB oracle's
  * `list_transform(range(...), i -> concat_ws(' ', ...))` mirror.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs (ARRAY<STRING>, INT), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(toksAny: Any, nAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val len = toks.numElements()
    if (len < n) new GenericArrayData(Array.empty[Any])
    else {
      val sep = UTF8String.fromString(" ")
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
    (children: Seq[Expression]) => WordNgrams(children(0), children(1)))
}
