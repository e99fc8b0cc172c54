package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) exact dedup: which documents of an
  * incoming batch are new against an already-ingested corpus? The
  * continuous-ingestion twin of the one-shot q21 — a training-data
  * pipeline runs this on every crawl drop, and the corpus side is the
  * 100 TB side.
  *
  * Scale shape — Bloom prefilter, exact confirm:
  *  1. `bloom_agg` folds the corpus's text hashes into ONE bits/8-byte
  *     blob (map-side partial bitsets, word-wise OR on the exchange) —
  *     the corpus is scanned once and never joined wholesale.
  *  2. The blob ships to the batch scan as a literal (like the
  *     driver-resident centroid tables of `argmax_dot`);
  *     `bloom_might_contain` = false is DEFINITIVE absence — those
  *     rows are new with no join at all.
  *  3. Only the bloom-positive minority (true dups + the sized false-
  *     positive rate) joins the corpus for exact text confirmation, so
  *     the join input is bounded by the dup rate, not the batch size.
  *
  * The result is EXACT (bloom has no false negatives; positives are
  * confirmed by equality), which is what makes the operator
  * oracle-checkable — the filter only prunes work.
  */
object IncrementalDedup {

  /** Mark each batch row `is_new` = its `textCol` value appears
    * nowhere in `corpus`. `bits` sizes the prefilter: ~16 bits per
    * corpus row keeps the false-positive confirm traffic ~0.1%. */
  def newDocs(corpus: DataFrame, batch: DataFrame,
              textCol: String = "text", idCol: String = "doc_id",
              bits: Int = 1 << 16, hashes: Int = 3): DataFrame = {
    val blob = corpus
      .agg(call_function("bloom_agg",
        xxhash64(col(textCol)), lit(bits), lit(hashes)).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val probed = batch.withColumn("maybe_dup",
      call_function("bloom_might_contain", lit(blob), xxhash64(col(textCol))))
    // exact confirmation for the bloom-positive minority only
    val confirmed = probed.filter(col("maybe_dup"))
      .join(corpus.select(col(textCol)).distinct(), Seq(textCol), "left_semi")
      .select(col(idCol).as("dup_id"))
    probed
      .join(broadcast(confirmed), col(idCol) === col("dup_id"), "left")
      .select(col(idCol), col("dup_id").isNull.as("is_new"))
  }
}
