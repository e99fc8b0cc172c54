package graft.core

/** File-commit algorithm selection, scoped PER WRITE instead of set
  * session-wide.
  *
  * `FileOutputCommitter` v2 commits task output directly to the final
  * location at TASK commit, instead of v1's sequential driver-side
  * rename of every task directory at JOB commit — a 48-directory
  * dynamic-partition landing pays 48 driver renames under v1 (the
  * measured r8 q59 regression). The v2 trade-off: task commit is not
  * repeatable, so a task RETRY or speculative duplicate attempt can
  * leave duplicate part files, and a failed JOB can leave a partial
  * set of committed task files.
  *
  * That trade is safe ONLY for writes whose consumers absorb partial
  * or duplicated publishes — which is exactly the landing writes:
  *  - deterministic overwrite landings ([[graft.sources.ZOrderLanding]],
  *    [[graft.ops.IvfPqIndex]]): a failed job is re-run with
  *    mode=overwrite, which clears the partial output wholesale;
  *  - the incremental-dedup append landings
  *    ([[graft.streaming.EventStreams]]): the content-dedup confirm
  *    re-reads the landing before every append, so leftover task
  *    files from a failed batch are treated as landed corpus and the
  *    retried batch appends only what is genuinely missing
  *    (self-heal proven by StreamingSpec's crash-retry case).
  *
  * Every OTHER write in the engine (result cache, CTAS, CSV export,
  * verify dumps) stays on the session default (v1, job-side atomic
  * commit): those consumers do not dedup, so correctness there is
  * worth three renames. This is why the setting lives here as a
  * per-write option — `DataFrameWriter.option` entries are merged
  * into the write job's Hadoop conf (`newHadoopConfWithOptions`),
  * giving exactly the blast radius the comment above describes.
  */
object Committers {
  /** Options to merge into a landing write: task-side commit (v2).
    * Assumes no task retries / speculative execution OR a
    * dedup-on-read consumer — see the object doc. */
  val TaskCommitV2: Map[String, String] =
    Map("mapreduce.fileoutputcommitter.algorithm.version" -> "2")

  /** Committer options for a write whose failure recovery is
    * "re-run the same call": v2 only when the re-run OVERWRITES.
    * An overwrite re-run clears a failed job's partially-committed
    * task files wholesale, so v2 is safe; an APPEND re-run does not
    * — v2's committed-task leftovers would survive and the retry
    * would land them a second time — so append stays on the job-side
    * atomic default (v1) unless the consumer deduplicates on read
    * (the [[graft.streaming.EventStreams]] confirm path, which opts
    * into [[TaskCommitV2]] explicitly). */
  def forRerun(overwrite: Boolean): Map[String, String] =
    if (overwrite) TaskCommitV2 else Map.empty
}
