package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Immutable open-addressing long→long probe map (power-of-2 capacity,
  * linear probing, ≤0.5 load factor) — the per-executor LM table
  * behind [[LmScore]]. Keys are matched EXACTLY on all 64 bits, so a
  * probe agrees bit-for-bit with a relational equi-join on the same
  * key column; 0 is reserved as the empty-slot marker and carried in
  * a side slot. Built once on the driver, shipped once per executor
  * inside a broadcast. */
final class LongLongOpenMap private (keys: Array[Long], vals: Array[Long],
                                     mask: Int, hasZero: Boolean,
                                     zeroVal: Long) extends Serializable {
  /** The stored value, or 0 when absent — exactly the
    * `coalesce(c, 0)` the relational path applies after its left
    * join. */
  def getOrZero(k: Long): Long = {
    if (k == 0L) return if (hasZero) zeroVal else 0L
    var i = LongLongOpenMap.fmix(k).toInt & mask
    var kk = keys(i)
    while (kk != k) {
      if (kk == 0L) return 0L
      i = (i + 1) & mask
      kk = keys(i)
    }
    vals(i)
  }
}

object LongLongOpenMap {
  /** Murmur3 fmix64 — scrambles the (already xxhash64-distributed)
    * keys so linear probing stays O(1) even on adversarial key sets. */
  private[functions] def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  def apply(ks: Array[Long], vs: Array[Long]): LongLongOpenMap = {
    require(ks.length == vs.length, s"${ks.length} keys vs ${vs.length} values")
    var cap = 4
    while (cap < ks.length * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    var zeroVal = 0L
    var n = 0
    while (n < ks.length) {
      val k = ks(n)
      if (k == 0L) { hasZero = true; zeroVal = vs(n) }
      else {
        var i = fmix(k).toInt & mask
        while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
        keys(i) = k; vals(i) = vs(n)
      }
      n += 1
    }
    new LongLongOpenMap(keys, vals, mask, hasZero, zeroVal)
  }
}

/** One language's frozen LM: add-one vocabulary size plus the two
  * count maps ([[graft.ops.NgramLm]]'s kind 0 = unigram c₁,
  * kind 1 = bigram c₂). */
final case class LangLm(v: Long, uni: LongLongOpenMap, bi: LongLongOpenMap)

/** The whole trained LM keyed by language — UTF8String keys so row
  * values probe without a per-row String allocation. */
final case class LmMaps(langs: Map[UTF8String, LangLm])

/** `LmScore(text, lang)` — the map-fold scoring arm of
  * [[graft.ops.NgramLm]]: per document, ONE byte scan (the SHARED
  * [[WordBigramScan]] — the same code object [[LmEntries]] runs, so
  * the arms cannot drift; NgramLmSpec pins the equivalence) probing the
  * broadcast open-addressing maps at each position and folds the
  * exact fixed-point cross-entropy inline. Where the relational path
  * explodes ~2(t−1) entry rows per document through a broadcast hash
  * join and a doc-keyed regroup exchange, this arm materializes
  * NOTHING and exchanges NOTHING — the q93 sf10 A/B winner
  * (BASELINE round 18).
  *
  * Output struct mirrors the relational path row-for-row under the
  * unique-(id,lang) contract [[graft.ops.NgramLm.scoreRows]] states:
  *   - n_pos  = max(t−1, 0), the bigram position count — except 0
  *     when lang or text is NULL (the relational path's reattach join
  *     never matches a NULL key, so such docs read n_pos 0 there);
  *   - xent_micronats = Σ lp(c₁+V) − lp(c₂+1) over positions, NULL
  *     when the language has no LM, text is NULL, or t < 2 (no
  *     positions → no perDoc row relationally).
  * lp uses StrictMath.log — the same libm path as Spark's `log`
  * expression, bit-identical over the swept count domain (BASELINE
  * round 15). Not registered in the function registry: the broadcast
  * handle is a constructor argument, so it is built directly via
  * ExpressionUtils.column.
  *
  * Codegen'd (r19): `doGenCode` emits a direct call to [[score]] via a
  * reference object — same compiled body as the interpreted path, but
  * the projection stays inside ONE whole-stage-codegen span. The
  * previous `CodegenFallback` forced the parent projection to
  * materialize an input row and split the span (the round-7
  * `interleave_bits` precedent). */
case class LmScore(left: Expression, right: Expression,
                   maps: Broadcast[LmMaps])
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pos", LongType, nullable = false),
    StructField("xent_micronats", LongType, nullable = true)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lm_score needs (STRING text, STRING lang), got " +
        s"(${l.catalogString}, ${r.catalogString})")
    }

  /** ⌊ln(k)·10⁶ + 0.5⌋ — [[graft.ops.NgramLm.lpMicroNats]] in Scala. */
  private def lp(k: Long): Long =
    math.floor(StrictMath.log(k.toDouble) * 1e6 + 0.5).toLong

  // null semantics differ from BinaryExpression's null-in-null-out
  // (NULL inputs still yield a non-null struct), so eval is overridden
  // directly and nullSafeEval must never be reached
  override protected def nullSafeEval(t: Any, l: Any): Any =
    throw new IllegalStateException("unreachable: eval is overridden")

  /** Broadcast handle dereferenced once per task, not once per row. */
  @transient private lazy val langs = maps.value.langs

  override def eval(input: InternalRow): Any =
    score(left.eval(input).asInstanceOf[UTF8String],
          right.eval(input).asInstanceOf[UTF8String])

  /** The one shared body behind both the interpreted `eval` and the
    * generated code (which calls it through a reference object), so
    * the two execution modes cannot drift. Public because generated
    * Java must reach it. */
  def score(text: UTF8String, lang: UTF8String): InternalRow = {
    if (text == null || lang == null)
      return new GenericInternalRow(Array[Any](0L, null))
    val lm = langs.getOrElse(lang, null)
    val bytes = text.getBytes
    // token spans + gram hashes — the ONE shared LmEntries scan
    // ([[WordBigramScan]]), so the two arms' tokenizers cannot drift
    val s = WordBigramScan.spans(bytes)
    val t = s.t
    val nPos = math.max(t - 1, 0).toLong
    if (lm == null || t < 2)
      return new GenericInternalRow(Array[Any](nPos, null))
    var xent = 0L
    WordBigramScan.walk(bytes, s, prefixOnly = true,
      // bigram (j−1, j): −lp(c₂ + 1)
      onBigram = h => xent -= lp(lm.bi.getOrZero(h) + 1L),
      // prefix unigram (conditioning token): +lp(c₁ + V)
      onUnigram = h => xent += lp(lm.uni.getOrZero(h) + lm.v))
    new GenericInternalRow(Array[Any](nPos, xent))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val ref = ctx.addReferenceObj("lmScore", this, classOf[LmScore].getName)
    val rowCls = classOf[InternalRow].getName
    val u8 = classOf[UTF8String].getName
    // non-null output struct even for NULL inputs (see the class doc),
    // so isNull is the FALSE literal and only the operands branch
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        $rowCls ${ev.value} = $ref.score(
          ${l.isNull} ? ($u8) null : ${l.value},
          ${r.isNull} ? ($u8) null : ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LmScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "lm_score"
}
