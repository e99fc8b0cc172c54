package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-SPAN dedup — duplicated regions at arbitrary word
  * offsets (the Lee et al. 2022 "Deduplicating Training Data Makes
  * Language Models Better" ExactSubstr operator), where [[ChunkDedup]]
  * (q73) only catches repeats aligned to its fixed chunk grid. Their
  * suffix-array formulation is single-machine; the scale-safe
  * re-expression is overlapping stride-s shingles:
  *
  *   1. one byte scan per document ([[graft.functions.WordSpans]])
  *      emits, per stride block q, the disjoint s-word `block` and the
  *      w-word `span` starting at it (w = r·s, spans overlap r-fold);
  *   2. a first-occurrence keeper per span FINGERPRINT — 60-bit
  *      md5-derived (the q88 hash convention, so a relational oracle
  *      re-derives it bit-for-bit), ordered by (doc_id, pos). Only the
  *      8-byte fingerprint, the block text, and the position cross
  *      this exchange; span text never shuffles. The key is
  *      high-cardinality, so the window parallelizes (not the
  *      few-groups trap);
  *   3. ONE doc-keyed aggregation (the q73 reassembly pattern): block
  *      p survives iff ANY of the r spans covering it — those starting
  *      at q ∈ [p−r+1, p] — is a keeper, i.e. a block is dropped only
  *      when EVERY w-word context it sits in was seen before.
  *      Survivors reassemble in document order; no join back to the
  *      corpus, never doc×doc.
  *
  * Recall shape: two occurrences of a duplicated region are caught
  * when their word offsets agree mod s (each document shingles on its
  * own stride grid), and interior spans of a region of L words yield
  * ~(L−w)/s matchable windows. s is the recall/cost knob — s = 1 is
  * the full arbitrary-offset semantics at w× explode cost; s = w
  * degenerates to [[ChunkDedup]]'s grid (equivalence pinned in
  * SpanDedupSpec). Fingerprint-exact: a 60-bit collision merges two
  * span groups identically in engine and oracle (and with ~2^60 span
  * cardinality is negligible); unlike q73's window the full span text
  * is NOT carried, which is what keeps the shuffle slim at r× explode.
  */
object SpanDedup {

  /** 60-bit md5-derived fingerprint of a string — q88's convention,
    * re-derivable in ANSI SQL as `CAST(('0x' || substr(md5(x), 1, 15))
    * AS BIGINT)`. */
  private def fingerprint(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** (doc_id, pos, block, span_h) rows: block `pos` = words
    * [pos·s, (pos+1)·s), span_h = fingerprint of words
    * [pos·s, pos·s + w). Every document yields ≥1 row (an empty text
    * is one empty block, and a NULL text scores as an empty document —
    * word_spans of a NULL would otherwise explode to a filtered-out
    * null row and silently drop the doc from the report), so
    * fully-deduplicated documents still appear in the report. */
  def spans(docs: DataFrame, textCol: String, idCol: String, w: Int, s: Int): DataFrame =
    docs.select(col(idCol),
        posexplode_outer(call_function("word_spans",
            coalesce(col(textCol), lit("")), lit(w), lit(s)))
          .as(Seq("pos", "sc")))
      .filter(col("pos").isNotNull)
      .select(col(idCol), col("pos"), col("sc.block").as("block"),
              fingerprint(col("sc.span")).as("span_h"))

  /** Per-document span-dedup report: total span/block count, duplicate
    * span count, surviving block count, and the reassembled text of
    * the surviving blocks (empty when every span of the document
    * appeared earlier in the corpus). */
  def dedup(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id", w: Int = 16, s: Int = 8): DataFrame = {
    require(s >= 1 && w >= s && w % s == 0,
      s"span width must be a positive multiple of stride, got w=$w s=$s")
    val r = w / s
    val flagged = spans(docs, textCol, idCol, w, s)
      .withColumn("keep", row_number().over(
        Window.partitionBy(col("span_h")).orderBy(col(idCol), col("pos"))) === 1)
    val report = flagged
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("keep"), 0L).otherwise(1L)).as("n_dup_spans"),
           // survivors are decided per BLOCK below, which needs the r
           // neighboring spans' flags — so (pos, keep, block) structs
           // all enter the buffer; unlike q73 the heavy payload (span
           // text) was already dropped before the exchange
           array_sort(collect_list(struct(col("pos"), col("keep"), col("block"))))
             .as("arr"))
    // block p (0-based transform index) is covered by spans starting
    // at q ∈ [max(0, p−r+1), p]: 1-based slice start max(p−r+2, 1),
    // length min(r, p+1)
    val keptBlocks = filter(
      transform(col("arr"), (x, p) =>
        when(exists(slice(col("arr"), greatest(p - lit(r) + 2, lit(1)),
                          least(lit(r), p + 1)),
                    y => y.getField("keep")),
             x.getField("block"))),
      b => b.isNotNull)
    report.select(col(idCol), col("n_spans"), col("n_dup_spans"),
        size(keptBlocks).cast("bigint").as("n_kept_blocks"),
        array_join(keptBlocks, " ").as("text_dedup"))
  }
}
