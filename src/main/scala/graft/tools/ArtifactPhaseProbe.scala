package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Decompose the q97/q98 landed-artifact carriers into LAND (the
  * artifact write — a one-per-suite-version cost in production) vs
  * SERVE (the per-pass probe/read — the recurring cost a cluster
  * pays). The bench cells time land+serve together because the oracle
  * needs the artifact to exist, which makes them write-path cells
  * (the q59/q81 class); this probe records the split so BASELINE can
  * grade the recurring path against DuckDB honestly.
  *
  *   SPARK_GRAFT_SF_DIR=... graft.tools.ArtifactPhaseProbe [reps]
  */
object ArtifactPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.build("graft-artifact-probe")

    def minOf(label: String)(work: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        work
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-16s min ${times.min}%6.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }

    val d = Tables.documents(spark, sfDir)
    val benchDir = graft.ops.Decontaminate.dirFor(sfDir)
    minOf("q97 land") {
      graft.ops.Decontaminate.landBenchmark(
        d.filter(col("doc_id") % 20 === 0), benchDir)
    }
    minOf("q97 probe") {
      graft.ops.Decontaminate.probe(d.filter(col("doc_id") % 20 =!= 0), benchDir)
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    val mDir = graft.ops.EpochShuffle.dirFor(sfDir)
    minOf("q98 land") {
      graft.ops.EpochShuffle.landManifests(
        d, mDir, epochs = Seq(7, 8), tokensPerShard = 2000L)
    }
    minOf("q98 read") {
      graft.ops.EpochShuffle.manifestSummary(spark, mDir)
        .write.format("noop").mode("overwrite").save()
    }
    minOf("q98 fetch1") {
      graft.ops.EpochShuffle.fetchShard(d, mDir, epoch = 7L, shard = 3L)
        .write.format("noop").mode("overwrite").save()
    }

    // q78 (r19 verdict item 4): the jsonl interchange cell is also
    // write-path — decompose the gzip-shard WRITE (the interchange
    // artifact, paid once per export) from the READ-BACK + aggregate
    // (the recurring cost, whose parallelism gzip caps at shard
    // count). `q78 shards` prints the landed file count — the
    // read-parallelism bound — alongside the split.
    val docs78 = d.select("doc_id", "text", "lang", "source", "n_chars")
    val jDir = graft.sources.CorpusJsonl.dirFor(sfDir)
    minOf("q78 write") {
      docs78.write.mode("overwrite").option("compression", "gzip").json(jDir)
    }
    val jPath = new org.apache.hadoop.fs.Path(jDir)
    val shardCount = jPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(jPath).count(_.getPath.getName.endsWith(".gz"))
    println(s"q78 shards: $shardCount (gzip — read parallelism is capped here)")
    minOf("q78 read") {
      spark.read.schema(docs78.schema).json(jDir)
        .groupBy("lang", "source")
        .agg(org.apache.spark.sql.functions.count(
               org.apache.spark.sql.functions.lit(1)).as("n_docs"),
             org.apache.spark.sql.functions.sum(
               org.apache.spark.sql.functions.col("n_chars")).as("sum_chars"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
