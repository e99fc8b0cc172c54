package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_spans(text, w, s)` → ARRAY<STRUCT<block STRING, span STRING>>:
  * [[WordChunks]] generalized to OVERLAPPING windows — the shingle
  * step of exact substring-span dedup (the Lee et al. 2022
  * "Deduplicating Training Data Makes Language Models Better"
  * operator family, re-expressed as stride-s shingles instead of a
  * suffix array). Entry q (one per stride block, q = 0..m−1):
  *
  *   - `block` = words [q·s, (q+1)·s) — the DISJOINT stride block,
  *     identical to `word_chunks(text, s)[q]`;
  *   - `span`  = words [q·s, q·s + w) — the w-word window STARTING at
  *     that block, truncated at the document end (so every word is
  *     covered by ≥1 span and by exactly the blocks that tile it).
  *
  * `w` must be a positive multiple of `s`; r = w/s is the overlap
  * factor (r = 1 degenerates to non-overlapping `word_chunks`). Word
  * boundaries are single spaces with `split(text, ' ', -1)` semantics
  * (empty tokens kept, '' is one empty token), so every block and
  * span is a LITERAL SUBSTRING of the input: one byte scan records
  * every s-th space and each entry is a byte-range copy — no token
  * array, no per-window joins. Span bytes total ~r× the input; the
  * r-materializing HOF composition (`transform(sequence, q ->
  * array_join(slice(split(...)...)))`) builds three intermediates per
  * window on top of that.
  */
case class WordSpans(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("block", StringType, nullable = false),
      StructField("span", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"word_spans needs (STRING, INT, INT), got " +
        s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override protected def nullSafeEval(textAny: Any, wAny: Any, sAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].getBytes
    val w = wAny.asInstanceOf[Int]
    val s = sAny.asInstanceOf[Int]
    if (s < 1 || w < s || w % s != 0)
      throw new IllegalArgumentException(
        s"word_spans width must be a positive multiple of stride, got w=$w s=$s")
    val r = w / s
    // starts(q) = byte offset of block q; one scan over the bytes
    // recording the position after every s-th space
    var starts = new Array[Int](8)
    var m = 0
    def addStart(v: Int): Unit = {
      if (m == starts.length) starts = java.util.Arrays.copyOf(starts, m * 2)
      starts(m) = v; m += 1
    }
    addStart(0)
    var spaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        spaces += 1
        if (spaces == s) { addStart(i + 1); spaces = 0 }
      }
      i += 1
    }
    // end byte (exclusive) of block q: one before the next block's
    // start (that separator space), or the text end for the last
    def blockEnd(q: Int): Int = if (q + 1 < m) starts(q + 1) - 1 else bytes.length
    val out = new Array[Any](m)
    var q = 0
    while (q < m) {
      val block = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(q), blockEnd(q)))
      val spanEnd = blockEnd(math.min(q + r - 1, m - 1))
      val span =
        if (r == 1) block
        else UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, starts(q), spanEnd))
      out(q) = InternalRow(block, span)
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WordSpans =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "word_spans"
}

object WordSpans {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_spans"),
    new ExpressionInfo(classOf[WordSpans].getName, "word_spans"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "word_spans(text, width, stride) takes exactly 3 arguments")
      WordSpans(children(0), children(1), children(2))
    })
}
