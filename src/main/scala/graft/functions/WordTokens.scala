package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-boundary tokenizer: `word_tokens(text)` ≡
  * `filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)` —
  * one byte scan instead of a regex split plus an interpreted filter
  * lambda. The tokenizer feeds ~10 queries (token stats, quality,
  * langid, n-grams, shards), so the constant matters, and like
  * [[WordNgrams]] a native expression leaves the optimizer nothing to
  * inline quadratically.
  *
  * ASCII PRECONDITION (same as the whole text family, see
  * MinHash.scala): any byte ≥ 0x80 is treated as a delimiter. That
  * matches `lower + [^a-z0-9]+` for every character whose lowercase
  * form stays outside [a-z0-9] — i.e. all of Latin-1 and practically
  * everything else — but not for exotic case mappings that lower INTO
  * ascii (e.g. Kelvin sign → 'k'), which the regex form would keep.
  * The synthetic corpus is pure ASCII, where the two are identical.
  */
case class WordTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_tokens needs STRING input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val alnum = i < bytes.length && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        val tok = new Array[Byte](i - start)
        var j = 0
        while (j < tok.length) {
          val b = bytes(start + j)
          tok(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        out += UTF8String.fromBytes(tok)
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
  override def prettyName: String = "word_tokens"
}

object WordTokens {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_tokens"),
    new ExpressionInfo(classOf[WordTokens].getName, "word_tokens"),
    (children: Seq[Expression]) => WordTokens(children.head))
}
