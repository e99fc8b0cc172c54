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
    // r22: q81 encode/write split — where does the 0.4 s landing job go?
    val emb = Tables.embeddings(spark, sfDir)
    val cb = graft.ops.IvfPqIndex.trainCodebooks(emb, 16, 16)
    val (coarseIds, coarse, pq) = cb
    val m = 4; val dim = coarse.head.length; val subLen = dim / m
    def encoded(src: org.apache.spark.sql.DataFrame) = {
      val typed = src.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val assigned = typed
        .select(col("vec_id"), col("v"),
          call_function("argmax_dot", col("v"), typedlit(coarse)).as("amc"))
        .filter(col("amc").isNotNull)
        .select(col("vec_id"), col("v"),
          element_at(typedlit(coarseIds), col("amc.idx") + 1).as("centroid"))
      val ams = (0 until m).map { j =>
        val sub: Seq[Seq[Double]] = pq.map(_.slice(j * subLen, (j + 1) * subLen))
        call_function("argmax_dot",
          slice(col("v"), j * subLen + 1, subLen), typedlit(sub)).as(s"am_$j")
      }
      val codes = (0 until m).map(j =>
        col(s"am_$j").getField("idx").cast("int").as(s"code_$j"))
      assigned.select(col("vec_id") +: col("centroid") +: ams: _*)
        .select(col("vec_id") +: col("centroid") +: codes: _*)
    }
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[adhoc] $label%-44s min ${ts.min}%6.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("encode fused (noop)") { noop(encoded(emb)) }
    time("encode spread (noop)") { noop(encoded(emb.repartition(32))) }
    time("land as-is (parquet, 16 leaves)") {
      encoded(emb).write.partitionBy("centroid")
        .options(graft.core.Committers.forRerun(true))
        .mode("overwrite").parquet("/tmp/q81probe_a")
    }
    time("land spread+centroid-repart") {
      encoded(emb.repartition(32)).repartition(col("centroid"))
        .write.partitionBy("centroid")
        .options(graft.core.Committers.forRerun(true))
        .mode("overwrite").parquet("/tmp/q81probe_b")
    }
    time("land spread only (32x16 files)") {
      encoded(emb.repartition(32)).write.partitionBy("centroid")
        .options(graft.core.Committers.forRerun(true))
        .mode("overwrite").parquet("/tmp/q81probe_c")
    }
  }
}
