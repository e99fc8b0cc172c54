package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.pipeline.CorpusPipeline

/** CLI driving the end-to-end LLM-corpus pipeline
  * ([[graft.pipeline.CorpusPipeline]]) — the corpus twin of
  * [[RunPipeline]]:
  *
  *   graft.RunCorpus --in PATH --out DIR
  *                   [--no-cleanup] [--no-pii] [--no-exact-dedup]
  *                   [--no-chunk-dedup] [--no-quality] [--no-split]
  *                   [--chunk-w N] [--min-tokens N] [--train-pct N]
  *
  * `--in` is a parquet path: either a documents table file/dir
  * directly, or a testdata sf directory (its `documents.parquet` is
  * used). Output is written as parquet to `--out` and a per-stage
  * summary is printed.
  */
object RunCorpus {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val in = opts.getOrElse("in", sys.error("--in PATH is required"))
    val out = opts.getOrElse("out", sys.error("--out DIR is required"))
    val inPath =
      if (new java.io.File(s"$in/documents.parquet").exists()) s"$in/documents.parquet"
      else in
    val cfg = CorpusPipeline.Config(
      cleanup = !opts.contains("no-cleanup"),
      pii = !opts.contains("no-pii"),
      exactDedup = !opts.contains("no-exact-dedup"),
      chunkDedup = !opts.contains("no-chunk-dedup"),
      chunkW = opts.getOrElse("chunk-w", "8").toInt,
      quality = !opts.contains("no-quality"),
      minTokens = opts.getOrElse("min-tokens", "5").toInt,
      split = !opts.contains("no-split"),
      trainPct = opts.getOrElse("train-pct", "80").toInt)

    val spark = GraftSession.build("graft-corpus")
    try {
      val docs = spark.read.parquet(inPath)
      require(docs.columns.contains("doc_id") && docs.columns.contains("text"),
        s"input needs doc_id and text columns, got: ${docs.columns.mkString(", ")}")
      val nIn = docs.count()
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
      spark.stop()
    } catch {
      case e: Exception =>
        System.err.println(s"[corpus] FAILED: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
  }

  private val flags = Set("no-cleanup", "no-pii", "no-exact-dedup",
    "no-chunk-dedup", "no-quality", "no-split")
  private val valued = Set("in", "out", "chunk-w", "min-tokens", "train-pct")

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
