package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffle + token-budget shard packing — the
  * "global shuffle" a training pipeline runs per epoch so batches
  * don't replay the corpus's storage order. The single-node form is
  * an in-memory RNG permutation; the scale-safe re-expression is a
  * KEYED one: permutation position = order by a 60-bit md5 of
  * (epoch salt, doc id) — no RNG state, so any engine, any partition
  * count, any retry lands the same permutation (the q45/q50/q64
  * determinism discipline applied to ordering instead of sampling).
  *
  * Packing rides [[PrefixSum.runningTotal]] over the permuted order
  * (range exchange + per-chunk windows + broadcast offsets — never a
  * global single-partition window): shard = exclusive-prefix div
  * budget, i.e. greedy first-fit in permutation order, the q51 rule
  * under a shuffled order. The doc id is the tiebreak column, so the
  * composite order key is exact even on a 60-bit fingerprint
  * collision.
  *
  * At 100 TB this is one range exchange of (id, key, n_tokens) slim
  * rows per epoch — text never moves; the permutation output is a
  * (doc → shard, position) assignment that a writer joins back or
  * feeds to a bucketed sink. */
object EpochShuffle {

  /** 60-bit md5 permutation key (q88/q92 hash convention —
    * re-derivable in ANSI SQL) of a document id under an epoch salt. */
  def epochKey(id: Column, epoch: Int): Column =
    conv(substring(md5(concat(lit(s"epoch$epoch:"), id.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** (id, epoch_key, n_tokens, cum_tokens, shard) for every document:
    * the epoch-`epoch` permutation with greedy `tokensPerShard`
    * packing in permuted order. */
  def shuffleAndPack(docs: DataFrame, epoch: Int, tokensPerShard: Long,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(tokensPerShard >= 1, s"need a positive shard budget, got $tokensPerShard")
    val toks = docs.select(col(idCol),
      epochKey(col(idCol), epoch).as("epoch_key"),
      size(Text.tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_tokens"))
    PrefixSum.runningTotal(toks, Seq("epoch_key", idCol), "n_tokens", "cum_tokens")
      .withColumn("shard",
        expr(s"CAST((cum_tokens - n_tokens) div $tokensPerShard AS BIGINT)"))
  }
}
