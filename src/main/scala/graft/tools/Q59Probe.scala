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
      import org.apache.spark.sql.functions._
      val fx = LandedIngest.fixtures()
      var cleaned: org.apache.spark.sql.DataFrame = null
      val build = t {
        val fetched = graft.sources.ErddapSource.fetchMany(
          spark, LandedIngest.Points, LandedIngest.StartDate, LandedIngest.EndDate,
          backendFactory = () => new graft.sources.FixtureBackend(fx),
          minIntervalMs = 0L, sleeper = _ => ())
        cleaned = graft.ops.Clean.cleanApiResponse(
          fetched.rows.drop("req_lat", "req_lon"))
          .withColumn("month", date_format(col("time"), "yyyy-MM"))
          .withColumn("lat_idx", graft.core.Grid.latIdxCol(col("latitude")).cast("long"))
          .withColumn("lon_idx", graft.core.Grid.lonIdxCol(col("longitude")).cast("long"))
      }
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
