package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Dev-loop profiler: time named SparkEntry queries (min of N runs,
  * after warm-up) and optionally dump their formatted plans.
  *
  *   graft.tools.Probe q01_pricing_summary q03_join_segment
  *   graft.tools.Probe --explain q32_describe
  *   graft.tools.Probe --adhoc   (runs the inline experiments below)
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe")
    val explain = args.contains("--explain")
    val names = args.filterNot(_.startsWith("--"))

    if (args.contains("--adhoc")) adhoc(spark, sfDir)
    if (args.contains("--entry")) {
      val n = graft.SparkEntry.entry(spark).count()
      println(s"[probe] entry() rows = $n")
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) {
        println(s"==== $name ====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min ${times.min}%6.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }

  /** Scratch space for micro-experiments; edit freely between runs. */
  private def adhoc(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import graft.ops.Text
    // r22: q66/q61 one-task explode+partial-agg scan stages — does the
    // conditional spread pay HERE (expression + explode + partial agg),
    // where the r21 RepartProbe only measured the bare expression?
    val docs = Tables.documents(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[adhoc] $label%-44s min ${ts.min}%6.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def onebit(name: String) =
      expr(s"""CASE WHEN try_cast(substring($name, 4, 2) as int)
               BETWEEN 0 AND 63
               THEN shiftleft(1L, try_cast(substring($name, 4, 2) as int))
               END""")
    def q66masks(src: org.apache.spark.sql.DataFrame) = src
      .select(col("source"), Text.distinctGramHashesOfText(col("text"), 3).as("g3"))
      .select(onebit("source").as("m"), explode_outer(col("g3")).as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy("gram").agg(expr("bit_or(m)").as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("c"))
    time("q66 masks fused") { noop(q66masks(docs)) }
    time("q66 masks spread") { noop(q66masks(docs.repartition(32))) }
    def q61tf(src: org.apache.spark.sql.DataFrame) = src
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("term"))
      .filter(col("term").isNotNull)
      .repartition(col("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    time("q61 tf fused") { noop(q61tf(docs)) }
    time("q61 tf spread") { noop(q61tf(docs.repartition(32))) }
  }
}
