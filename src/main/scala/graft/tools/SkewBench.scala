package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the q56 skew story: manual salting (Skew.saltedJoin)
  * vs a plain shuffle join left to AQE's skew-join mitigation, on a
  * heavy-tailed key at a bench-scale row count. Prints min-of-3 wall
  * for each strategy plus whether AQE actually marked the join skewed
  * — the measurement behind BASELINE.md's "when do you still salt?"
  * paragraph.
  *
  * Usage: SkewBench [nRows] [hotFraction%]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 5000000
    val hotPct = if (args.length > 1) args(1).toInt else 90
    val spark = graft.core.GraftSession.build("skew-bench")
    // force the shuffle-join regime AQE's skew handling applies to
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // hotPct% of the large side shares key 1; the rest spreads over 997
    val large = spark.range(n).select(
      when(pmod(col("id"), lit(100)) < hotPct, 1L)
        .otherwise(pmod(col("id"), lit(997))).as("k"),
      col("id").as("row_id"))
    val small = spark.range(997).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))

    def time(label: String, df: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = Seq.fill(3)(once()).min
      println(f"$label%s: $best%.2fs")
      best
    }

    val plain = time("plain+AQE", large.join(small, "k")
      .select(col("k"), col("row_id"), length(col("name")).as("w")))
    // confirm whether AQE engaged on this shape — toRdd drives THIS
    // frame's QueryExecution (a noop write, Dataset.foreach, or
    // count() each wrap the plan in their own QE, leaving this one
    // isFinalPlan=false)
    val probe = large.join(small, "k")
      .select(col("k"), col("row_id"), length(col("name")).as("w"))
    probe.queryExecution.toRdd.foreach(_ => ())
    val marked = probe.queryExecution.executedPlan.toString.contains("skew=true")
    println(s"AQE skew=true in plain plan: $marked")

    // tuned AQE: thresholds low enough that the hot partition is
    // actually split (defaults need a 256 MB partition — far above
    // what a bench-scale hot key produces)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    val tuned = time("plain+AQE(tuned)", large.join(small, "k")
      .select(col("k"), col("row_id"), length(col("name")).as("w")))
    val probe2 = large.join(small, "k")
      .select(col("k"), col("row_id"), length(col("name")).as("w"))
    probe2.queryExecution.toRdd.foreach(_ => ())
    val tp = probe2.queryExecution.executedPlan.toString
    println("AQE skew=true in tuned plan: " + tp.contains("skew=true"))
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    val salted = time("salted", graft.ops.Skew.saltedJoin(large, small, "k", "row_id", 32)
      .select(col("k"), col("row_id"), length(col("name")).as("w")))

    println(f"ratio salted/plain = ${salted / plain}%.2f, salted/tuned = ${salted / tuned}%.2f")
    spark.stop()
  }
}
