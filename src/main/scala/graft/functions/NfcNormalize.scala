package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` → STRING: Unicode canonical composition
  * (NFC) via `java.text.Normalizer` — the first step of every
  * web-corpus text-cleanup stage (the same codepoint sequence can
  * arrive composed or decomposed from different crawls, and every
  * downstream exact-dedup hash, shingle, and fingerprint treats the
  * two as different documents unless a normalization pass runs
  * first). Spark has no built-in for this; DuckDB's `nfc_normalize`
  * implements the same Unicode algorithm, which is what makes the
  * operator oracle-checkable.
  *
  * ASCII fast path: NFC cannot change pure-ASCII text, and
  * `Normalizer.isNormalized` short-circuits on it — the common case
  * pays one byte scan, no String decode. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs STRING, got ${t.catalogString}")
  }

  override protected def nullSafeEval(textAny: Any): Any = {
    val u = textAny.asInstanceOf[UTF8String]
    // pure ASCII is always NFC — skip the decode entirely
    val bytes = u.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return u.copy()
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u.copy()
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "nfc_normalize(text) takes exactly 1 argument")
      NfcNormalize(children.head)
    })
}
