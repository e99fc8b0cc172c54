package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{ChunkDedup, NearDupIncremental, Pii, Text}

/** The end-to-end LLM-corpus preparation flow, as one composable
  * operator: cleanup → PII scrub → exact dedup → optional MinHash
  * near-dup dedup → chunk-level boilerplate dedup → quality gate →
  * deterministic split → optional context-window chunking. Each stage
  * is an operator oracled on its own (q77, q72, q21, q82, q73, q23,
  * q45, q85); this object pins how they CHAIN, and [[graft.RunCorpus]]
  * makes the chain drivable from the command line.
  *
  * Scale shape: stages 1–2 are pure projections; exact dedup is one
  * hash aggregation (min-struct keeper — map-side combinable, the q21
  * discipline, never a per-text window); chunk dedup shuffles chunk
  * keys bounded by corpus chunks; the gate is a filter; the split is
  * md5 arithmetic. No stage collects, no stage joins unbounded sides
  * without a broadcast.
  *
  * Input contract: columns `doc_id` (unique id), `text`, plus any
  * passthrough columns (kept on the output). Output adds `n_pii`,
  * `n_chunks`, `n_kept`, `split` and rewrites `text`; with
  * `windowTokens > 0` the grain becomes one row per chunk and
  * `chunk_id`, `n_tokens` are added.
  */
object CorpusPipeline {

  /** Stage toggles + knobs; defaults mirror CorpusPipelineSpec.
    * `windowTokens > 0` enables the final context-window chunking
    * stage (one output row per ≤windowTokens-token piece). */
  case class Config(
      cleanup: Boolean = true,
      pii: Boolean = true,
      exactDedup: Boolean = true,
      nearDup: Boolean = false,
      chunkDedup: Boolean = true,
      chunkW: Int = 8,
      quality: Boolean = true,
      minTokens: Int = 5,
      split: Boolean = true,
      trainPct: Int = 80,
      windowTokens: Int = 0)

  def run(docs: DataFrame, cfg: Config = Config()): DataFrame =
    stages(docs, cfg).last._2

  /** The chain as named intermediates — the frame AFTER each stage
    * (disabled stages pass through, so the list shape is stable and
    * `run` is simply the last frame). `RunCorpus --dry-run` explains
    * each of these without executing anything. */
  def stages(docs: DataFrame, cfg: Config = Config()): Seq[(String, DataFrame)] = {
    val passthrough = docs.columns.toSeq.filterNot(Set("doc_id", "text"))

    // 1. normalize + scrub (projections; n_pii = 0 when the scrub is off)
    val cleaned =
      if (cfg.cleanup) docs.withColumn("text", Text.cleanup(col("text")))
      else docs
    val scrubbed =
      if (cfg.pii)
        cleaned
          .withColumn("p", Pii.scrub(col("text")))
          .withColumn("text", col("p.clean_text"))
          .withColumn("n_pii",
            col("p.n_emails") + col("p.n_phones") + col("p.n_ips"))
          .drop("p")
      else cleaned.withColumn("n_pii", lit(0))

    // 2. exact dedup: lowest doc_id per text (the q21 keeper) as ONE
    // hash aggregation — id leads the struct so min() orders by it
    val exact =
      if (cfg.exactDedup) {
        val fields = col("doc_id") +: (passthrough :+ "n_pii").map(col)
        scrubbed.groupBy(col("text"))
          .agg(min(struct(fields: _*)).as("r"))
          .select(Seq(col("r.*"), col("text")): _*)
      } else scrubbed

    // 3. OPT-IN MinHash near-dup dedup (the Dolma/FineWeb stage):
    // greedy bucket-min keeper — smallest doc_id of each LSH band
    // bucket survives, so a lightly-edited repost of a kept doc
    // drops. Deterministic one-pass rule (the q60 star-hub
    // discipline; exact connected-components clustering remains the
    // standalone q60 operator). Off by default: the near-dup rate of
    // a corpus is a curation decision, not a hygiene invariant like
    // exact dedup.
    val near =
      if (cfg.nearDup)
        NearDupIncremental.keepBucketMins(
            NearDupIncremental.withSigs(exact, "text"), "doc_id")
          .drop("mh1", "mh2", "mh3", "mh4")
      else exact

    // 4. chunk-level boilerplate dedup; drop fully-deduplicated docs
    val chunked =
      if (cfg.chunkDedup) {
        ChunkDedup.dedup(near, "text", "doc_id", w = cfg.chunkW)
          .filter(col("n_kept") > 0)
          .join(near.drop("text"), Seq("doc_id"))
          .drop("text").withColumnRenamed("text_dedup", "text")
      } else near.withColumn("n_chunks", lit(0L)).withColumn("n_kept", lit(0L))

    // 5. quality gate + deterministic split (the q45 discipline:
    // md5-bucket arithmetic, engine-stable, no RNG)
    val gated =
      if (cfg.quality) chunked.filter(size(Text.tokens(col("text"))) >= cfg.minTokens)
      else chunked
    val split =
      if (cfg.split)
        gated.withColumn("split",
          when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
                 .cast("long") % 100 < cfg.trainPct, "train").otherwise("eval"))
      else gated
    // 6. OPT-IN context-window chunking (the q85 operator as the
    // pipeline's last mile): training consumes window-sized pieces,
    // not documents, so each surviving doc explodes into one row per
    // ≤windowTokens-token chunk (greedy whole-word packing; an
    // over-budget single word gets its own chunk). Chunks INHERIT the
    // doc's split and passthrough columns — splitting before chunking
    // is deliberate, or two chunks of one document could land in
    // train AND eval (leakage). A doc with NO word content yields no
    // chunks and is dropped here (it carries zero trainable tokens;
    // with the quality gate on, such docs never reach this stage).
    // posexplode_OUTER + post-filter so the generator runs once per
    // doc (plain posexplode gets an optimizer-inferred size() filter
    // that re-runs the byte scan — the ChunkDedup discipline).
    // Map-only: a projection + generate, no shuffle added.
    val windowed =
      if (cfg.windowTokens > 0)
        split.select(col("*"),
            posexplode_outer(call_function("bpe_chunks", col("text"), lit(cfg.windowTokens)))
              .as(Seq("chunk_id", "chunk_text")))
          .filter(col("chunk_text").isNotNull)
          .drop("text")
          .withColumnRenamed("chunk_text", "text")
          .withColumn("chunk_id", col("chunk_id").cast("long"))
          .withColumn("n_tokens", call_function("bpe_token_count", col("text")))
      else split
    Seq("cleanup" -> cleaned, "pii-scrub" -> scrubbed, "exact-dedup" -> exact,
        "neardup-dedup" -> near, "chunk-dedup" -> chunked,
        "quality-gate" -> gated, "split" -> split, "window-chunk" -> windowed)
  }
}
