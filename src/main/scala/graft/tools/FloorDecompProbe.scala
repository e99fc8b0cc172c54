package graft.tools

import graft.core.GraftSession

/** Decompose the per-query floor constant into its phases.
  *
  * BASELINE.md's round-12 section measures a ~220–320 ms/query floor on
  * the 64 sf0.1 cells where DuckDB finishes under 150 ms — 72 % of the
  * Spark suite total is this constant, not work. The standing account is
  * "Catalyst + AQE + job orchestration"; this probe makes that number
  * concrete per phase so the account is measured, not asserted:
  *
  *   build  — SparkEntry closure → unresolved LogicalPlan (Column DSL)
  *   plan   — analysis + optimization + physical planning
  *            (`queryExecution.executedPlan` forced)
  *   exec   — the noop write minus the above (job scheduling, AQE stage
  *            re-planning, task launch, the actual scan/shuffle work)
  *
  * Steady-state protocol: each query runs REPS times (default 5) and the
  * per-phase MIN is reported — same discipline as Bench (first run pays
  * codegen/JIT that no steady-state workload re-pays). Phases are timed
  * within the same run, so build+plan+exec ≈ the Bench cell for that
  * query.
  *
  *   sbt "runMain graft.tools.FloorDecompProbe q01_pricing_summary q10_distinct_agg ..."
  *   (no args → a representative floor-cell set)
  */
object FloorDecompProbe {
  private val DefaultSet = Seq(
    "q01_pricing_summary", // scan + hash agg
    "q03_join_segment",    // broadcast join
    "q10_distinct_agg",    // distinct + agg
    "q20_grid_cells",      // scalar projection
    "q23_text_quality",    // native text expression
    "q34_simhash",         // native expression + small agg
    "q53_top_per_lang",    // bounded heap agg
    "q62_grouped_describe") // grouped describe

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = GraftSession.build("graft-floor-decomp")
    if (args.contains("--tables")) { tableCost(spark, sfDir, reps); spark.stop(); return }
    if (args.contains("--exec")) {
      execAnatomy(spark, sfDir, args.filterNot(_.startsWith("--")).toSeq, reps)
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else DefaultSet

    // Bench's warm-up: touch the scan + codegen paths once.
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-24s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    var sums = (0.0, 0.0, 0.0)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val phases = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis→physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val b = phases.map(_._1).min
      val p = phases.map(_._2).min
      val e = phases.map(_._3).min
      sums = (sums._1 + b, sums._2 + p, sums._3 + e)
      println(f"$name%-24s $b%8.3f $p%8.3f $e%8.3f ${b + p + e}%8.3f")
    }
    val (sb, sp, se) = sums
    println(f"${"TOTAL"}%-24s $sb%8.3f $sp%8.3f $se%8.3f ${sb + sp + se}%8.3f")
    spark.stop()
  }

  /** `--exec <query...>`: anatomy of the exec phase — per query, the
    * best rep's Spark JOB timeline (start offset, duration, task count
    * per job, and the un-jobbed remainder: driver work between jobs +
    * noop commit). AQE materializes one job per exchange stage, so a
    * two-exchange agg shows 3 jobs; the remainder column is what
    * neither planning nor tasks account for. */
  private def execAnatomy(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String, queries: Seq[String], reps: Int): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
    val names = if (queries.nonEmpty) queries else Seq("q53_top_per_lang", "q01_pricing_summary", "q10_distinct_agg")
    // warm
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      case class Run(total: Double, jobs: Seq[(Double, Double, Int)])
      val runs = (1 to reps).map { _ =>
        val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
        val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
        val l = new SparkListener {
          override def onJobStart(e: SparkListenerJobStart): Unit =
            jobStart.put(e.jobId, System.nanoTime())
          override def onJobEnd(e: SparkListenerJobEnd): Unit =
            Option(jobStart.get(e.jobId)).foreach(s => jobs.add((s, System.nanoTime())))
          override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
            tasks.addAndGet(e.stageInfo.numTasks)
        }
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let the async listener bus drain the job-end events
        spark.sparkContext.removeSparkListener(l)
        import scala.jdk.CollectionConverters._
        Run(total, jobs.asScala.toSeq.sortBy(_._1).map { case (s, e) =>
          ((s - t0) / 1e9, (e - s) / 1e9, tasks.get()) })
      }
      val best = runs.minBy(_.total)
      val jobTime = best.jobs.map(_._2).sum
      println(f"$name%-24s total ${best.total}%6.3f  jobs ${best.jobs.size}  in-job ${jobTime}%6.3f  outside ${best.total - jobTime}%6.3f")
      best.jobs.zipWithIndex.foreach { case ((off, dur, _), i) =>
        println(f"    job$i starts +$off%6.3f runs $dur%6.3f")
      }
    }
  }

  /** `--tables`: isolate the per-call cost of `Tables.load` — fresh
    * `spark.read.parquet` (listing + footer schema inference + relation
    * resolution) vs a read with the schema supplied (no footer read).
    * If the delta is most of the ~70–150 ms/query "build" phase, a
    * session-scoped relation memo (a catalog, in effect) is the fix. */
  private def tableCost(spark: org.apache.spark.sql.SparkSession, sfDir: String, reps: Int): Unit = {
    Seq("lineitem", "orders", "documents", "region").foreach { t =>
      val schema = spark.read.parquet(s"$sfDir/$t.parquet").schema // warm + capture
      def ms(f: => Unit): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
        }.min
      val fresh = ms(spark.read.parquet(s"$sfDir/$t.parquet"))
      val withSchema = ms(spark.read.schema(schema).parquet(s"$sfDir/$t.parquet"))
      println(f"$t%-12s fresh $fresh%7.1f ms   schema-supplied $withSchema%7.1f ms")
    }
  }
}
