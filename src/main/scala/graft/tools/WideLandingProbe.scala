package graft.tools

import org.apache.spark.sql.functions._

/** Confirms the r8 session decisions — driver-side partition listing
  * up to 256 leaf dirs (`parallelPartitionDiscovery.threshold`) and
  * the per-write task-side committer — hold PAST the bench layouts'
  * dir counts (q59 lands 48 leaves, q81 sixteen): lands a synthetic
  * frame spread over `months × 2^bucketBits` leaf directories through
  * the real [[graft.sources.ZOrderLanding]] write, then times land /
  * read-back listing / one pruned point query, and asserts the
  * one-file-per-leaf invariant. A regression to distributed listing
  * (or v1's per-dir driver renames) shows up as a step change in the
  * land/list phases as the leaf count crosses the threshold.
  *
  * Usage: WideLandingProbe [months] [rowsPerMonth] [reps]
  *   (defaults 16, 200000, 3 → 16 months × ~12 buckets ≈ 190 leaves)
  */
object WideLandingProbe {
  def main(args: Array[String]): Unit = {
    val months = args.headOption.map(_.toInt).getOrElse(16)
    val rowsPerMonth = if (args.length > 1) args(1).toInt else 200000
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.build("wide-landing-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_wide_landing"

    // lat/lon indices spread over a 4x4 grid quadrant → tens of
    // Morton buckets per month at bucketShift 2
    val df = spark.range(months.toLong * rowsPerMonth).select(
      format_string("1960-%02d", (col("id") % months + 1).cast("int")).as("month"),
      (col("id") % 7).as("lat_idx"), (expr("id div 7") % 7).as("lon_idx"),
      (col("id") % 1000).cast("double").as("v"))

    (1 to reps).foreach { i =>
      def t[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val land = t(graft.sources.ZOrderLanding.land(
        df, dir, bucketShift = 2, overwrite = true,
        extraPartitionCols = Seq("month")))
      var listed: org.apache.spark.sql.DataFrame = null
      val list = t { listed = spark.read.parquet(dir); listed.schema }
      val query = t(listed
        .filter(col("month") === "1960-03" && col("lat_idx") === 2 && col("lon_idx") === 3)
        .agg(count(lit(1)), sum(col("v"))).collect())
      val leaves = {
        val fs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        fs.flatMap(_.listFiles().filter(_.isDirectory))
      }
      val filesPerLeaf = leaves.map(_.listFiles().count(_.getName.endsWith(".parquet")))
      assert(filesPerLeaf.forall(_ == 1),
        s"one-file-per-leaf violated: ${filesPerLeaf.mkString(",")}")
      println(f"rep $i: leaves=${leaves.length} land=$land%.3f list=$list%.3f query=$query%.3f")
    }
    spark.stop()
  }
}
