package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Text

/** Stage-cost breakdown for the gram-heavy queries (q49/q66): times
  * each pipeline prefix so the next optimization targets the stage
  * that actually pays, instead of a guess. Run:
  * `SPARK_GRAFT_SF_DIR=/tmp/sf1 java … graft.tools.GramProbe` */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.build("graft-gram-probe", "32")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Any): Unit = {
      // warm once, then best of 3
      f
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-40s $best%8.3f s")
    }

    time("scan+tokenize+hash: sum(size(g3))") {
      docs.select(Text.distinctGramHashesOfText(col("text"), 3).as("g3"))
        .agg(sum(size(col("g3")))).head()
    }
    time("…nondistinct variant") {
      docs.select(Text.gramHashesOfText(col("text"), 3).as("g3"))
        .agg(sum(size(col("g3")))).head()
    }
    time("+explode+count(1)") {
      docs.select(explode(Text.distinctGramHashesOfText(col("text"), 3)).as("g"))
        .agg(count(lit(1))).head()
    }
    time("+groupBy(gram).bit_or → count rows") {
      docs.select(expr("shiftleft(1L, cast(substring(source, 4, 2) as int))").as("m"),
          explode(Text.distinctGramHashesOfText(col("text"), 3)).as("gram"))
        .groupBy("gram").agg(expr("bit_or(m)").as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("c"))
        .agg(sum("c")).head()
    }
    time("q49 corpus explode + semi + agg") {
      val grams = docs.select(col("doc_id"),
        Text.distinctGramHashesOfText(col("text"), 3).as("g3"))
      val bench = grams.filter(col("doc_id") % 20 === 0)
        .select(explode(col("g3")).as("gram")).distinct()
      grams.filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), explode(col("g3")).as("gram"))
        .join(broadcast(bench), Seq("gram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .agg(count(lit(1))).head()
    }
    time("q49 bench set alone (explode+distinct)") {
      docs.filter(col("doc_id") % 20 === 0)
        .select(explode(Text.distinctGramHashesOfText(col("text"), 3)).as("gram"))
        .distinct().agg(count(lit(1))).head()
    }
    // the exact carrier queries through the exact bench sink
    time("FULL q49 (SparkEntry, noop write)") {
      graft.SparkEntry.queries("q49_contamination")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("FULL q66 (SparkEntry, noop write)") {
      graft.SparkEntry.queries("q66_source_overlap")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // bisect q66's overhead beyond the mask histogram
    val nMasks = docs
      .select(expr("shiftleft(1L, cast(substring(source, 4, 2) as int))").as("m"),
        explode(Text.distinctGramHashesOfText(col("text"), 3)).as("gram"))
      .groupBy("gram").agg(expr("bit_or(m)").as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("c")).count()
    println(s"mask histogram rows: $nMasks")
    val nGrams = docs
      .select(explode(Text.distinctGramHashesOfText(col("text"), 3)).as("gram"))
      .distinct().count()
    println(s"distinct grams: $nGrams")
    // stage-level truth for one warm q66 execution
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long)]()
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
          wall, si.taskMetrics.executorRunTime))
      }
    }
    for (q <- Seq("q66_source_overlap", "q49_contamination")) {
      stages.clear()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save() // warm
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wallT = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(sl)
      println(f"$q single warm execution: $wallT%.3f s; stages:")
      stages.forEach { case (id, name, n, wall, run) =>
        println(f"  stage $id%4d $name%-60s tasks=$n%3d wall=${wall}%5d ms run=${run}%6d ms")
      }
    }

    println(graft.SparkEntry.queries("q49_contamination")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))

    time("q49 without the benchDocs count gate") {
      val grams = docs.select(col("doc_id"),
        Text.distinctGramHashesOfText(col("text"), 3).as("g3"))
      val bench = grams.filter(col("doc_id") % 20 === 0)
        .select(explode(col("g3")).as("gram")).distinct()
      val corpus = grams.filter(col("doc_id") % 20 =!= 0)
      val hits = corpus
        .select(col("doc_id"), explode(col("g3")).as("gram"))
        .join(broadcast(bench), Seq("gram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      corpus.select("doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
