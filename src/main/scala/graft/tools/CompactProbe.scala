package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Measure what landing compaction is worth: full-corpus scan time on
  * an accreted many-file landing vs the same rows after
  * [[EventStreams.compactLanding]].
  *
  * The ingest appends are batch-bounded (`appendFiles`), but file
  * COUNT still grows linearly with batch count, and every confirm
  * join / reseed scan pays a per-file open (footer read + task
  * setup). This probe puts a number on that: build a synthetic corpus
  * written as `nFiles` part files (the shape of `nFiles/appendFiles`
  * micro-batches), time a two-aggregate full scan min-of-REPS, then
  * compact to `targetFiles` and time the identical scan again.
  *
  *   sbt "runMain graft.tools.CompactProbe [nFiles] [rows] [targetFiles]"
  *   defaults: 128 files, 50000 rows, 4 files
  *
  * A second mode measures the PER-LEAF parallelism payoff on a
  * hive-partitioned landing (the maintenance-window-scales-with-data
  * claim): build `leaves` partition dirs of `filesPerLeaf` files
  * each, compact serially (leafParallelism=1) and concurrently, and
  * report both wall times.
  *
  *   sbt "runMain graft.tools.CompactProbe leaves [nLeaves] [filesPerLeaf] [rows]"
  *   defaults: 24 leaves, 16 files each, 120000 rows
  *
  * Findings land in BASELINE.md (round 14). */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("leaves")) { leavesMode(args.drop(1)); return }
    val nFiles = if (args.length > 0) args(0).toInt else 128
    val rows = if (args.length > 1) args(1).toInt else 50000
    val target = if (args.length > 2) args(2).toInt else 4
    val reps = 5
    val spark = graft.core.GraftSession.build("graft-compact-probe", "32")
    import spark.implicits._

    val landing = java.nio.file.Files
      .createTempDirectory("graft-compact-probe").toString + "/corpus"
    spark.range(rows.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("doc"), col("id"),
          lit("body word salad padding for a realistic row size"),
          md5(col("id").cast("string"))).as("text"))
      .repartition(nFiles)
      .write.parquet(landing)

    def scanMin(): Double = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(landing)
        .agg(count(lit(1)), sum(length(col("text")))).collect()
      (System.nanoTime() - t0) / 1e9
    }.min

    val before = scanMin()
    val t0 = System.nanoTime()
    val stats = EventStreams.compactLanding(spark, landing, target)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val after = scanMin()
    println(f"""{"files_before":${stats.filesBefore},"files_after":${stats.filesAfter},""" +
      f""""rows":${stats.rows},"scan_before_s":$before%.3f,"scan_after_s":$after%.3f,""" +
      f""""compact_s":$compactSec%.3f,"speedup":${before / after}%.2f}""")
    spark.stop()
  }

  private def leavesMode(args: Array[String]): Unit = {
    val nLeaves = if (args.length > 0) args(0).toInt else 24
    val filesPerLeaf = if (args.length > 1) args(1).toInt else 16
    val rows = if (args.length > 2) args(2).toInt else 120000
    val spark = graft.core.GraftSession.build("graft-compact-probe", "32")
    import spark.implicits._

    def build(dir: String): Unit =
      spark.range(rows.toLong)
        .select(col("id").as("doc_id"),
          (col("id") % nLeaves).cast("string").as("leaf"),
          md5(col("id").cast("string")).as("text"))
        // one write per accretion step, like the real per-batch appends
        .repartition(filesPerLeaf)
        .write.partitionBy("leaf").parquet(dir)

    def timedCompact(dir: String, par: Int): Double = {
      val t0 = System.nanoTime()
      val s = EventStreams.compactLanding(spark, dir, targetFiles = 2,
        leafParallelism = par)
      require(s.rows == rows.toLong && s.carriesKept,
        s"probe compaction went wrong: $s")
      (System.nanoTime() - t0) / 1e9
    }

    val serialDir = java.nio.file.Files
      .createTempDirectory("graft-cprobe-ser").toString + "/corpus"
    val parDir = java.nio.file.Files
      .createTempDirectory("graft-cprobe-par").toString + "/corpus"
    val warmDir = java.nio.file.Files
      .createTempDirectory("graft-cprobe-warm").toString + "/corpus"
    build(serialDir); build(parDir); build(warmDir)
    // a throwaway compact first: codegen compilation, FileSystem
    // client init and scheduler warmup must not land in whichever
    // timed measurement happens to run first (serial ran first and
    // was systematically flattered before this)
    timedCompact(warmDir, 2)
    val serialSec = timedCompact(serialDir, 1)
    val parSec = timedCompact(parDir, 4)
    println(f"""{"leaves":$nLeaves,"files_per_leaf":$filesPerLeaf,"rows":$rows,""" +
      f""""serial_s":$serialSec%.3f,"parallel4_s":$parSec%.3f,""" +
      f""""speedup":${serialSec / parSec}%.2f}""")
    spark.stop()
  }
}
