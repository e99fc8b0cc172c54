package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** A/B behind BASELINE.md's q56/q100 story: the three plans for
  * "revenue per market segment over orders ⋈ customer", timed on the
  * real tables at SPARK_GRAFT_SF_DIR:
  *
  *  - `salted`  — the q56 carrier (Skew.saltedJoin, 8 sub-keys, then
  *                aggregate): the skew-mitigation DEMO, which pays
  *                explode-replication and a (key, salt) shuffle for
  *                its deterministic hot-key spreading.
  *  - `plain`   — join row-per-order, aggregate after (what the q56
  *                oracle runs; AQE handles moderate skew at runtime).
  *  - `preagg`  — Skew.aggThroughJoin (the q100 carrier): orders
  *                pre-aggregated by custkey BEFORE the join, one
  *                partial row per key through the join, re-aggregate.
  *
  * Each arm min-of-reps through the noop sink (full plan executes).
  *
  *   SPARK_GRAFT_SF_DIR=... graft.tools.Q56Probe [reps]
  */
object Q56Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("graft-q56-probe")

    def cents(c: org.apache.spark.sql.Column) =
      round(c * 100, 0).cast("bigint")
    def large = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
    def small = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))

    def minOf(label: String)(df: => DataFrame): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-8s min ${times.min}%7.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
      times.min
    }

    minOf("salted") {
      graft.ops.Skew.saltedJoin(large, small, "custkey",
          saltSource = "o_orderkey", saltBuckets = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
        .orderBy("c_mktsegment")
    }
    minOf("plain") {
      large.join(small, Seq("custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
        .orderBy("c_mktsegment")
    }
    def preagg = graft.ops.Skew.aggThroughJoin(
        large.select("custkey", "o_totalprice"), small, "custkey",
        partialAggs = Seq(count(lit(1)).as("pn"),
                          sum(cents(col("o_totalprice"))).as("ps")),
        groupCols = Seq("c_mktsegment"),
        finalAggs = Seq(sum(col("pn")).as("n_orders"),
                        (sum(col("ps")).cast("double") / 100.0).as("revenue")))
      .orderBy("c_mktsegment")
    minOf("preagg")(preagg)

    // the 100 TB regime: the dim does NOT broadcast (a 1.5B-row
    // customer table at real scale) — the plain join becomes a full
    // fact-table shuffle into a sort-merge join, which is where the
    // pre-aggregation's 13× volume cut pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    minOf("plainSMJ") {
      large.join(small, Seq("custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
        .orderBy("c_mktsegment")
    }
    minOf("preaggSMJ")(preagg)
    spark.stop()
  }
}
