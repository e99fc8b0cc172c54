package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_chunks(text, w)` → ARRAY<STRING>: the text split into
  * consecutive w-word windows on SINGLE-SPACE boundaries, i.e.
  * `transform(sequence(...), i -> array_join(slice(split(text, ' '),
  * i*w+1, w), ' '))` in one byte scan. Because the separator is the
  * single space, every chunk is a LITERAL SUBSTRING of the input
  * (joining w consecutive split-tokens with ' ' reconstructs exactly
  * the bytes between their boundaries — empty tokens from repeated
  * spaces included), so the scan just records every w-th space and
  * copies byte ranges: no token array, no per-token slicing, no join
  * buffers. The composed HOF form materializes all three per row and
  * was the dominant cost of the chunk-dedup explode stage.
  *
  * Split semantics match `split(text, ' ', -1)`: trailing empty
  * tokens are kept, and the empty string is one empty token — every
  * document yields at least one chunk, which chunk-level dedup relies
  * on for its totals. */
case class WordChunks(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_chunks needs (STRING, INT), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(textAny: Any, wAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String]
    val bytes = text.getBytes
    val w = wAny.asInstanceOf[Int]
    if (w < 1) throw new IllegalArgumentException(s"word_chunks window must be >= 1, got $w")
    // chunk boundaries sit at every w-th space (token count = spaces+1)
    val out = new java.util.ArrayList[Any]()
    var chunkStart = 0
    var spaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        spaces += 1
        if (spaces == w) {
          out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, chunkStart, i)))
          chunkStart = i + 1
          spaces = 0
        }
      }
      i += 1
    }
    out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, chunkStart, bytes.length)))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordChunks =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_chunks"
}

object WordChunks {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_chunks"),
    new ExpressionInfo(classOf[WordChunks].getName, "word_chunks"),
    (children: Seq[Expression]) => WordChunks(children(0), children(1)))
}
