package graft.tools

import graft.core.GraftSession
import graft.pipeline.LandedIngest

/** Phase-timing probe for the q59 ingest-landing carrier: splits the
  * carrier into its phases (plan build / dynamic-partition write /
  * read-back listing / pruned query) so a bench-cell move can be
  * attributed to the phase that moved, not guessed at. This is the
  * probe that localized the round-7 q59 regression to the write phase
  * (48 z-order leaf dirs written from 4 fetch tasks, sequential
  * per-task file creation + v1 job-commit renames + a distributed
  * listing job on every read-back). Args: reps (default 5). */
object Q59Probe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.build("q59-probe")
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm the write path once so committer/codec init is off the clock
    LandedIngest.runAndQuery(spark).collect()
    (1 to reps).foreach { i =>
      // the SAME builder the q59 carrier lands (LandedIngest.land calls
      // it) — the probe cannot silently drift from the measured pipeline
      var cleaned: org.apache.spark.sql.DataFrame = null
      val build = t { cleaned = LandedIngest.cleanedFrame(spark) }
      val write = t(graft.sources.ZOrderLanding.land(
        cleaned, LandedIngest.Q59LandingDir, bucketShift = 6,
        overwrite = true, extraPartitionCols = Seq("month")))
      val list = t(spark.read.parquet(LandedIngest.Q59LandingDir))
      val query = t(LandedIngest.pointQuery(
        spark, LandedIngest.Q59LandingDir, "1960-07", 32.5, -70.0).collect())
      println(f"rep $i: build=$build%.3f write=$write%.3f list=$list%.3f query=$query%.3f")
    }
    spark.stop()
  }
}
