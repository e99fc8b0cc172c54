package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.pipeline.CorpusPipeline

/** CLI driving the end-to-end LLM-corpus pipeline
  * ([[graft.pipeline.CorpusPipeline]]) — the corpus twin of
  * [[RunPipeline]]:
  *
  *   graft.RunCorpus --in PATH --out DIR
  *                   [--dry-run] [--near-dup]
  *                   [--no-cleanup] [--no-pii] [--no-exact-dedup]
  *                   [--no-chunk-dedup] [--no-quality] [--no-split]
  *                   [--chunk-w N] [--min-tokens N] [--train-pct N]
  *                   [--window-tokens N]
  *
  * `--in` is a parquet path: either a documents table file/dir
  * directly, or a testdata sf directory (its `documents.parquet` is
  * used). Output is written as parquet to `--out` and a per-stage
  * summary is printed. `--dry-run` prints each stage's physical plan
  * (the `RunPipeline --validate-only` discipline) and writes nothing.
  *
  * Exit codes: 0 ok, 1 run failure (including EMPTY INPUT — a corpus
  * job that read zero rows almost certainly pointed at the wrong
  * path, and a green exit would let a scheduler march on), 2 usage. */
object RunCorpus {
  private val usage =
    """usage: graft.RunCorpus --in PATH --out DIR
      |  [--dry-run]                   print per-stage plans, write nothing
      |  [--near-dup]                  enable the MinHash near-dup stage
      |  [--no-cleanup] [--no-pii] [--no-exact-dedup]
      |  [--no-chunk-dedup] [--no-quality] [--no-split]
      |  [--chunk-w N] [--min-tokens N] [--train-pct N]
      |  [--window-tokens N]              explode docs into <=N-token chunks (q85 stage)""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-corpus")
    val code = execute(spark, args)
    spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** The whole CLI minus session lifecycle and process exit — returns
    * the exit code so CorpusPipelineSpec can drive it in-JVM. */
  private[graft] def execute(spark: SparkSession, args: Array[String]): Int = {
    val opts =
      try parse(args.toList, Map.empty)
      catch {
        case e: RuntimeException =>
          System.err.println(s"[corpus] ${e.getMessage}\n$usage")
          return 2
      }
    if (!opts.contains("in") || !opts.contains("out")) {
      System.err.println(s"[corpus] --in PATH and --out DIR are required\n$usage")
      return 2
    }
    val in = opts("in")
    val out = opts("out")
    val inPath =
      if (new java.io.File(s"$in/documents.parquet").exists()) s"$in/documents.parquet"
      else in
    // numeric flags: a typo'd value must produce the usage message and
    // exit 2 (the RunIngest --target-files discipline), never a raw
    // NumberFormatException stack; out-of-range values are refused
    // rather than silently disabling a stage (--window-tokens -5 would
    // otherwise skip chunking and exit 0 with un-chunked output)
    def intOpt(name: String, default: Int, min: Int,
               max: Int = Int.MaxValue): Either[String, Int] =
      opts.get(name) match {
        case None => Right(default)
        case Some(v) =>
          v.toIntOption match {
            case Some(n) if n >= min && n <= max => Right(n)
            case Some(n) => Left(s"--$name must be in [$min, " +
              (if (max == Int.MaxValue) "..." else max.toString) + s"], got $n")
            case None => Left(s"--$name must be an integer, got '$v'")
          }
      }
    val parsedCfg = for {
      chunkW <- intOpt("chunk-w", 8, 1)
      minTokens <- intOpt("min-tokens", 5, 0)
      trainPct <- intOpt("train-pct", 80, 0, 100)
      windowTokens <- intOpt("window-tokens", 0, 0)
    } yield CorpusPipeline.Config(
      cleanup = !opts.contains("no-cleanup"),
      pii = !opts.contains("no-pii"),
      exactDedup = !opts.contains("no-exact-dedup"),
      chunkDedup = !opts.contains("no-chunk-dedup"),
      chunkW = chunkW,
      quality = !opts.contains("no-quality"),
      minTokens = minTokens,
      nearDup = opts.contains("near-dup"),
      split = !opts.contains("no-split"),
      trainPct = trainPct,
      windowTokens = windowTokens)
    val cfg = parsedCfg match {
      case Left(msg) =>
        System.err.println(s"[corpus] $msg\n$usage")
        return 2
      case Right(c) => c
    }

    try {
      val docs = spark.read.parquet(inPath)
      require(docs.columns.contains("doc_id") && docs.columns.contains("text"),
        s"input needs doc_id and text columns, got: ${docs.columns.mkString(", ")}")

      if (opts.contains("dry-run")) {
        val stages = CorpusPipeline.stages(docs, cfg)
        stages.foreach { case (name, df) =>
          println(s"== stage: $name ==")
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
        println(s"[corpus] DRY RUN: ${stages.length} stages planned, nothing written")
        return 0
      }

      val nIn = docs.count()
      if (nIn == 0) {
        System.err.println(s"[corpus] FAILED: input $inPath has zero rows")
        return 1
      }
      val result = CorpusPipeline.run(docs, cfg)
      result.write.mode("overwrite").parquet(out)
      // summarize from the LANDED parquet (one extra cheap read) so
      // the printed numbers describe what a consumer will actually see
      val landed = spark.read.parquet(out)
      val nOut = landed.count()
      val bySplit =
        if (cfg.split)
          landed.groupBy("split").count().collect()
            .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
        else "(split off)"
      println(s"[corpus] OK: in=$nIn out=$nOut kept=${"%.1f".format(100.0 * nOut / math.max(nIn, 1))}% $bySplit -> $out")
      0
    } catch {
      case e: Exception =>
        System.err.println(s"[corpus] FAILED: ${e.getMessage}")
        1
    }
  }

  private val flags = Set("dry-run", "near-dup", "no-cleanup", "no-pii", "no-exact-dedup",
    "no-chunk-dedup", "no-quality", "no-split")
  private val valued = Set("in", "out", "chunk-w", "min-tokens", "train-pct",
    "window-tokens")

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case a :: rest if a.startsWith("--") && flags(a.drop(2)) =>
        parse(rest, acc + (a.drop(2) -> "true"))
      case a :: v :: rest if a.startsWith("--") && valued(a.drop(2)) =>
        parse(rest, acc + (a.drop(2) -> v))
      case Nil => acc
      case other :: _ => sys.error(s"unknown argument: $other")
    }
}
