package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming single-path JSON field extractor:
  * `json_field(doc, key)` ≡ `get_json_object(doc, '$.key')` for
  * TOP-LEVEL keys with scalar or container values — one byte scan, no
  * parser object, no materialized tree. Spark's `get_json_object`
  * runs a full Jackson tokenization per row (~2 s for 5M small docs
  * at sf1, measured); a path extraction of one field only needs
  * string/escape-aware scanning and depth counting, which is what
  * this does. Used by the q19 carrier; the general functions
  * (`from_json`, `get_json_object`, `to_json`) remain the engine's
  * surface for full-document work — and at the 100 TB design point
  * a schema-stable props column should be materialized to typed
  * columns at ingest, not re-extracted per query.
  *
  * Semantics matched to `get_json_object`/DuckDB `json_extract_string`
  * for the supported shapes: string values are returned UNQUOTED (raw
  * content, escapes preserved as written), numbers/booleans/null
  * literals as their token text (JSON `null` → SQL NULL), object or
  * array values as their raw JSON text. First matching key wins.
  * Missing key, non-object document, or malformed input → NULL. Key
  * bytes are compared as written in the document (no unescape) —
  * exact for keys without escape sequences.
  */
case class JsonField(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (StringType, StringType) =>
      TypeCheckResult.TypeCheckFailure("json_field needs a foldable key")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"json_field needs (STRING, STRING), got (${l.catalogString}, ${r.catalogString})")
  }

  @transient private lazy val keyBytes: Array[Byte] =
    right.eval(null).asInstanceOf[UTF8String].getBytes

  override protected def nullSafeEval(docAny: Any, keyAny: Any): Any = {
    val b = docAny.asInstanceOf[UTF8String].getBytes
    val n = b.length
    val key = keyBytes
    var i = 0
    def skipWs(): Unit = {
      while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    }
    // positions [start, end) of the string CONTENT at a '"' opener;
    // returns end-of-content index or -1 on malformed, leaves i after
    // the closing quote
    def scanString(): Int = {
      i += 1 // opening quote
      val start = i
      while (i < n && b(i) != '"') {
        if (b(i) == '\\') i += 1 // skip escaped char (incl. \")
        i += 1
      }
      if (i >= n) return -1
      val end = i
      i += 1 // closing quote
      end // content is [start, end)
    }
    // skip one JSON value of any type; returns false on malformed
    def skipValue(): Boolean = {
      skipWs()
      if (i >= n) return false
      b(i) match {
        case '"' => scanString() >= 0
        case '{' | '[' =>
          var depth = 0
          while (i < n) {
            b(i) match {
              case '"' => if (scanString() < 0) return false; i -= 1
              case '{' | '[' => depth += 1
              case '}' | ']' =>
                depth -= 1
                if (depth == 0) { i += 1; return true }
              case _ =>
            }
            i += 1
          }
          false
        case _ => // number / true / false / null token
          while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
                 b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
          true
      }
    }
    skipWs()
    if (i >= n || b(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      skipWs()
      if (i < n && b(i) == '}') return null // end of object, key absent
      if (!first) {
        if (i >= n || b(i) != ',') return null
        i += 1
        skipWs()
      }
      first = false
      if (i >= n || b(i) != '"') return null
      val kStart = i + 1
      val kEnd = scanString()
      if (kEnd < 0) return null
      skipWs()
      if (i >= n || b(i) != ':') return null
      i += 1
      skipWs()
      val isMatch = (kEnd - kStart) == key.length && {
        var j = 0
        var eq = true
        while (eq && j < key.length) { if (b(kStart + j) != key(j)) eq = false; j += 1 }
        eq
      }
      if (isMatch) {
        if (i >= n) return null
        return b(i) match {
          case '"' =>
            val vStart = i + 1
            val vEnd = scanString()
            if (vEnd < 0) null
            else UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, vStart, vEnd))
          case _ =>
            val vStart = i
            if (!skipValue()) null
            else {
              val tok = java.util.Arrays.copyOfRange(b, vStart, i)
              if (tok.length == 4 && tok(0) == 'n' && tok(1) == 'u' &&
                  tok(2) == 'l' && tok(3) == 'l') null
              else UTF8String.fromBytes(tok)
            }
        }
      } else if (!skipValue()) return null
    }
    null
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonField =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "json_field"
}

object JsonField {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("json_field"),
    new ExpressionInfo(classOf[JsonField].getName, "json_field"),
    (children: Seq[Expression]) => JsonField(children(0), children(1)))
}
