package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `clean_spaces(text)` → STRING: replace C0/DEL control characters
  * with spaces, collapse space runs to one, trim — i.e.
  * `trim(regexp_replace(regexp_replace(text, '[\x00-\x1f\x7f]', ' '),
  * '  +', ' '))` as ONE byte scan with no regex machinery and no
  * intermediate strings. Byte-level is safe in UTF-8: every control
  * char and the space are single bytes, and multi-byte sequences'
  * bytes are all ≥ 0x80, so the scan can never split a code point.
  * TextSpec pins the equivalence against the composed regexps. */
case class CleanSpaces(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"clean_spaces needs STRING, got ${t.catalogString}")
  }

  override protected def nullSafeEval(textAny: Any): Any = {
    val u = textAny.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val out = new Array[Byte](bytes.length)
    var p = 0
    var pendingSpace = false
    var sawControl = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isSpace = b == ' ' || (b >= 0 && b < 0x20) || b == 0x7f
      if (isSpace) {
        if (b != ' ') sawControl = true
        // a space run (incl. mapped controls) emits one space, and
        // only if something precedes it (leading-trim); trailing-trim
        // happens by never flushing a pending space at end-of-input
        if (p > 0) pendingSpace = true
      } else {
        if (pendingSpace) { out(p) = ' '; p += 1; pendingSpace = false }
        out(p) = b
        p += 1
      }
      i += 1
    }
    // p == length means nothing was dropped; with no control mapped,
    // every emitted byte is the original — return the input as-is
    if (p == bytes.length && !sawControl) u.copy()
    else UTF8String.fromBytes(java.util.Arrays.copyOfRange(out, 0, p))
  }

  override protected def withNewChildInternal(newChild: Expression): CleanSpaces =
    copy(child = newChild)
  override def prettyName: String = "clean_spaces"
}

object CleanSpaces {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("clean_spaces"),
    new ExpressionInfo(classOf[CleanSpaces].getName, "clean_spaces"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "clean_spaces(text) takes exactly 1 argument")
      CleanSpaces(children.head)
    })
}
