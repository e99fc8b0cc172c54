package graft.tools

import org.apache.spark.sql.functions.col

import graft.SparkEntry
import graft.core.GraftSession

/** Phase-timing probe for the q87 full-ingest carrier (the round-14
  * verdict's worst sf0.1 work-bound ratio): splits the cell into its
  * phases — constructed corpus/batch materialization, then each flag
  * chain solo (exact = bloom collect + confirm join, near = MinHash
  * signing + band semi-join, semantic = hyperplane coding + cosine
  * confirm), then the composed three-chain carrier — so the constant
  * can be attributed, not guessed at. `ab` mode measures the whole
  * carrier with and without the corpus localCheckpoint (the corpus is
  * consumed four times across the chains; without the checkpoint each
  * consumer re-runs the documents ⋈ embeddings join).
  *
  * Usage: Q87Probe [phases|ab] [reps] (env SPARK_GRAFT_SF_DIR).
  */
object Q87Probe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("phases")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("q87-probe")
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm scans/codegen once off the clock
    SparkEntry.queries("q87_full_ingest")(spark, dir).collect()

    mode match {
      case "phases" =>
        (1 to reps).foreach { i =>
          var cb: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
          val construct = t { cb = SparkEntry.fullIngestBase(spark, dir) }
          val (corpus, batch) = cb
          val (e, n, m) = SparkEntry.fullIngestFlags(corpus, batch)
          val exact = t(e.collect())
          val near = t(n.collect())
          val sem = t(m.collect())
          val composed = t {
            e.join(n, Seq("doc_id")).join(m, Seq("doc_id"))
              .select(col("doc_id"),
                (col("exact_new") && col("near_new") && col("sem_new")).as("is_new"))
              .orderBy("doc_id").collect()
          }
          val full = t(SparkEntry.queries("q87_full_ingest")(spark, dir).collect())
          println(f"rep $i: construct=$construct%.3f exact=$exact%.3f " +
            f"near=$near%.3f sem=$sem%.3f composed_join=$composed%.3f full=$full%.3f")
        }
      case "ab" =>
        // interleaved A/B: carrier total with vs without the corpus
        // localCheckpoint, fresh frames each rep
        def run(checkpoint: Boolean): Double = t {
          val (corpus, batch) = SparkEntry.fullIngestBase(spark, dir, checkpoint)
          val (e, n, m) = SparkEntry.fullIngestFlags(corpus, batch)
          e.join(n, Seq("doc_id")).join(m, Seq("doc_id"))
            .select(col("doc_id"),
              (col("exact_new") && col("near_new") && col("sem_new")).as("is_new"))
            .orderBy("doc_id").collect()
        }
        (1 to reps).foreach { i =>
          val withCp = run(checkpoint = true)
          val withoutCp = run(checkpoint = false)
          println(f"rep $i: with_corpus_checkpoint=$withCp%.3f without=$withoutCp%.3f")
        }
      case other => sys.error(s"unknown mode $other (phases|ab)")
    }
    spark.stop()
  }
}
