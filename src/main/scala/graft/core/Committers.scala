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
}
