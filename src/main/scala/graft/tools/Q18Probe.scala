package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** q18 sessionize A/B (round-15 verdict item 2 — the one work-bound
  * sf1 cell above 2×): the `session_window` formulation vs the
  * batch-native lag→cumsum one (`SparkEntry.sessionizeLag`, the
  * oracle's own shape — one user_id exchange serves both windows and
  * the final aggregation). Run each mode in a FRESH JVM, interleaved,
  * min-of-reps per JVM; `check` asserts the two formulations produce
  * identical collected results. Outcome (recorded in BASELINE round
  * 15): parity at sf0.1, lag ahead at sf1, decisive at sf10 (sw's
  * merging-session execs spill; lag stays flat) — lag ACCEPTED as the
  * q18 carrier, so `sw` here rebuilds the rejected form explicitly.
  *
  * Usage: Q18Probe [sw|lag|check] [reps] (env SPARK_GRAFT_SF_DIR).
  */
object Q18Probe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("check")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("q18-probe")
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sw() = {
      import org.apache.spark.sql.functions._
      graft.core.Tables.events(spark, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts")).as("session_start"),
             max(col("ts")).as("session_end"))
        .select(col("user_id"),
                col("session_start").cast("timestamp_ntz").as("session_start"),
                col("session_end").cast("timestamp_ntz").as("session_end"),
                col("n_events"))
        .orderBy("user_id", "session_start")
    }
    def lagF() = SparkEntry.sessionizeLag(spark, dir)

    mode match {
      case "check" =>
        val a = sw().collect()
        val b = lagF().collect()
        require(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
        a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
          require(x == y, s"row $i differs:\n  sw : $x\n  lag: $y")
        }
        println(s"check OK: ${a.length} identical rows")
      case m @ ("sw" | "lag") =>
        val run = if (m == "sw") () => sw().collect() else () => lagF().collect()
        run() // warm
        val times = (1 to reps).map(_ => t(run()))
        println(f"$m%s: min=${times.min}%.3f times=${times.map(x => f"$x%.3f").mkString(",")}")
      case other => sys.error(s"unknown mode $other (sw|lag|check)")
    }
    spark.stop()
  }
}
