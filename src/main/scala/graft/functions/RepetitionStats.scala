package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused repetition profile: `repetition_stats(text)` →
  * STRUCT<n_tokens, n_distinct, n_bigrams, top_bigram> (all BIGINT),
  * where tokens are [[WordTokens]] words (lowercased maximal
  * [a-z0-9] runs, ASCII precondition) and bigrams are the adjacent
  * space-joined pairs [[WordNgrams]] produces.
  *
  * Motivation is q48's repetition metrics: the composed plan
  * materializes the token array, the bigram string array, an
  * `array_sort` of it, an interpreted `aggregate` lambda over the
  * sorted grams (longest equal run = max bigram multiplicity), and an
  * `array_distinct` of the tokens — five array passes and one string
  * allocation per token AND per bigram, per document. This expression
  * computes the same four counts in one byte scan plus two
  * open-addressing passes over token SPANS (int offsets into the text
  * buffer, no token/bigram strings ever built).
  *
  * EXACT, not probabilistic: hashes only pick the probe slot; every
  * hit is verified by comparing the lowered token bytes (and for
  * bigrams both spans), so a 64-bit collision cannot change a count —
  * the same contract the oracle's sort-based formulation has.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = RepetitionStats.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats needs STRING input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // ---- pass 1: token spans ----------------------------------------
    var starts = new Array[Int](64)
    var ends = new Array[Int](64)
    var nTok = 0
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val alnum = i < bytes.length && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = start; ends(nTok) = i; nTok += 1
        start = -1
      }
      i += 1
    }
    if (nTok == 0) return RepetitionStats.row(0, 0, 0, 0)

    // lowered-byte FNV-1a per token, reused by both tables below
    val hashes = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      var h = 0xcbf29ce484222325L
      var j = starts(t)
      while (j < ends(t)) {
        val b = bytes(j)
        val low = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        h = (h ^ (low & 0xffL)) * 0x100000001b3L
        j += 1
      }
      hashes(t) = h
      t += 1
    }

    def tokEq(a: Int, b: Int): Boolean = {
      val len = ends(a) - starts(a)
      if (ends(b) - starts(b) != len) return false
      var j = 0
      while (j < len) {
        val x = bytes(starts(a) + j); val y = bytes(starts(b) + j)
        val lx = if (x >= 'A' && x <= 'Z') (x + 32).toByte else x
        val ly = if (y >= 'A' && y <= 'Z') (y + 32).toByte else y
        if (lx != ly) return false
        j += 1
      }
      true
    }

    def nextPow2(n: Int): Int = java.lang.Integer.highestOneBit(math.max(4, n * 2) - 1) << 1

    // ---- distinct tokens: open addressing over spans ----------------
    val cap = nextPow2(nTok)
    val mask = cap - 1
    val slots = new Array[Int](cap) // token idx + 1; 0 = empty
    var nDistinct = 0L
    t = 0
    while (t < nTok) {
      var p = (hashes(t).toInt ^ (hashes(t) >>> 32).toInt) & mask
      var done = false
      while (!done) {
        val s = slots(p)
        if (s == 0) { slots(p) = t + 1; nDistinct += 1; done = true }
        else if (hashes(s - 1) == hashes(t) && tokEq(s - 1, t)) done = true
        else p = (p + 1) & mask
      }
      t += 1
    }

    // ---- bigram multiplicities: keyed by adjacent span pair ---------
    val nBg = nTok - 1
    var top = 0L
    if (nBg > 0) {
      val bcap = nextPow2(nBg)
      val bmask = bcap - 1
      val bslots = new Array[Int](bcap)  // first-token idx + 1; 0 = empty
      val bcounts = new Array[Long](bcap)
      var g = 0
      while (g < nBg) {
        val h = hashes(g) * 0x9e3779b97f4a7c15L + hashes(g + 1)
        var p = (h.toInt ^ (h >>> 32).toInt) & bmask
        var done = false
        while (!done) {
          val s = bslots(p)
          if (s == 0) {
            bslots(p) = g + 1; bcounts(p) = 1L
            if (top < 1L) top = 1L
            done = true
          } else if (tokEq(s - 1, g) && tokEq(s, g + 1)) {
            bcounts(p) += 1L
            if (bcounts(p) > top) top = bcounts(p)
            done = true
          } else p = (p + 1) & bmask
        }
        g += 1
      }
    }
    RepetitionStats.row(nTok.toLong, nDistinct, nBg.toLong, top)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false)))

  private[functions] def row(a: Long, b: Long, c: Long, d: Long): InternalRow =
    new GenericInternalRow(Array[Any](a, b, c, d))

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("repetition_stats"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
    (children: Seq[Expression]) => RepetitionStats(children.head))
}
