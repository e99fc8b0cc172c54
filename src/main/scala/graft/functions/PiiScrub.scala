package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `pii_scrub(text)` → STRUCT<clean_text STRING, n_emails INT,
  * n_phones INT, n_ips INT>: detect AND mask emails / IPv4s / phone
  * numbers in one pass.
  *
  * Semantically identical to the composed built-in form — three
  * sequential global `regexp_replace` passes (email → IP → phone),
  * each count = the matches that pass replaced (an IP consumed by the
  * email pass is not "an IP found") — but fused: ONE UTF8String→String
  * decode, ONE scan of a combined `(email)|(ip)|(phone)` alternation
  * (the branch that matched picks the sentinel and bumps its
  * counter), ONE encode back. The composed form pays six independent
  * regex passes and five intermediate string materializations per
  * row; on the corpus-sized text column that made the scrub the
  * slowest projection in the suite.
  *
  * The single alternation pass replaces exactly what the sequential
  * passes replace for THESE patterns: every IP/phone character class
  * is a subset of the email local-part class, so any later-priority
  * match adjoining an email candidate is consumed by the email branch
  * in both formulations, and sentinel tokens (`<EMAIL>` etc.) contain
  * no pattern characters, so earlier replacements never create or
  * destroy later matches. PiiSpec pins the equivalence by fuzz
  * against the composed built-ins. */
case class PiiScrub(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_scrub needs STRING, got ${t.catalogString}")
  }

  /** Necessary-condition triggers, one byte scan: an email needs '@',
    * a phone needs '+', an IPv4 needs a digit-dot-digit triple. The
    * returned bitmask (1=email, 2=ip, 4=phone) selects how much regex
    * machinery the row pays: most clean documents trigger nothing and
    * skip it entirely, and a row that only triggers one family runs a
    * single-branch pattern — the full alternation re-tries every
    * branch at every start position, which is the dominant cost on a
    * mostly-clean corpus. Dropping a branch that cannot match
    * anywhere leaves the alternation's matches unchanged, so every
    * variant is exactly the combined pattern's semantics. */
  private def triggerMask(bytes: Array[Byte]): Int = {
    var mask = 0
    var i = 0
    val n = bytes.length
    while (i < n && mask != 7) {
      val b = bytes(i)
      if (b == '@') mask |= 1
      else if (b == '+') mask |= 4
      else if (b == '.' && i > 0 && i + 1 < n &&
          bytes(i - 1) >= '0' && bytes(i - 1) <= '9' &&
          bytes(i + 1) >= '0' && bytes(i + 1) <= '9') mask |= 2
      i += 1
    }
    mask
  }

  override protected def nullSafeEval(textAny: Any): Any = {
    val u = textAny.asInstanceOf[UTF8String]
    val mask = triggerMask(u.getBytes)
    if (mask == 0) return InternalRow(u.copy(), 0, 0, 0)
    val str = u.toString
    val m = PiiScrub.variant(mask).matcher(str)
    var nEmails = 0
    var nPhones = 0
    var nIps = 0
    val sb = new java.lang.StringBuilder(str.length)
    var last = 0
    while (m.find()) {
      sb.append(str, last, m.start())
      if ((mask & 1) != 0 && m.start("e") >= 0) { sb.append("<EMAIL>"); nEmails += 1 }
      else if ((mask & 2) != 0 && m.start("i") >= 0) { sb.append("<IP>"); nIps += 1 }
      else { sb.append("<PHONE>"); nPhones += 1 }
      last = m.end()
    }
    sb.append(str, last, str.length)
    InternalRow(UTF8String.fromString(sb.toString), nEmails, nPhones, nIps)
  }

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
  override def prettyName: String = "pii_scrub"
}

object PiiScrub {
  /** user@host.tld — case-insensitive classes so `User@Example.COM`
    * is masked too (pii_scrub is a general SQL function; the corpus
    * being lowercase is a property of THIS dataset, not a
    * precondition). Mirrored verbatim in the q72 DuckDB oracle. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  /** International-prefix phone shape +C[C]-NNN-NNNN. */
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  /** Dotted-quad IPv4. */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Alternation variants by trigger mask (1=email, 2=ip, 4=phone),
    * branch order email → ip → phone like the sequential passes;
    * index 0 unused (the gate short-circuits). */
  private[functions] val variant: Array[Pattern] = {
    val arr = new Array[Pattern](8)
    for (mask <- 1 to 7) {
      val parts = Seq.newBuilder[String]
      if ((mask & 1) != 0) parts += s"(?<e>$EmailPattern)"
      if ((mask & 2) != 0) parts += s"(?<i>$Ipv4Pattern)"
      if ((mask & 4) != 0) parts += s"(?<p>$PhonePattern)"
      arr(mask) = Pattern.compile(parts.result().mkString("|"))
    }
    arr
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pii_scrub"),
    new ExpressionInfo(classOf[PiiScrub].getName, "pii_scrub"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "pii_scrub(text) takes exactly 1 argument")
      PiiScrub(children.head)
    })
}
