package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Decompose the q74_incremental_dedup cell (flagged 5.6× at sf10 in
  * the r19 verdict): where do the seconds go?
  *
  *  - `bloom`  — the carrier's setup: corpus.count() to size the
  *               filter + the one-scan bloom build. The corpus is the
  *               FIXED doc_id<400 slice, so this should be flat in SF;
  *               the streaming form carries the blob and never re-pays
  *               it, the batch carrier pays it once per run by design.
  *  - `batch`  — constructing the carrier's batch frame alone: the
  *               donor self-join over documents (doc_id>=400 ⋈ shifted
  *               ids), which grows with SF — fixture plumbing, not the
  *               dedup operator.
  *  - `full`   — the whole carrier (newDocs probe + exact confirm on
  *               top of both). full − batch − bloom ≈ the operator.
  *
  *   SPARK_GRAFT_SF_DIR=... graft.tools.Q74Probe [reps]
  */
object Q74Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("graft-q74-probe")

    def minOf(label: String)(work: => Unit): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        work
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-6s min ${times.min}%7.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
      times.min
    }

    def d = Tables.documents(spark, sfDir)
    def corpus = d.filter(col("doc_id") < 400).select("doc_id", "text")
    def batch = {
      val donors = d.select((col("doc_id") + 400).as("doc_id"),
                            col("text").as("donor_text"))
      d.filter(col("doc_id") >= 400)
        .join(donors, Seq("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, col("donor_text"))
            .otherwise(col("text")).as("text"))
    }

    val bloom = minOf("bloom") {
      val n = corpus.count()
      graft.ops.IncrementalDedup.buildBloom(
        corpus, "text", graft.ops.IncrementalDedup.sizedBits(n), 3)
    }
    val batchT = minOf("batch") {
      batch.write.format("noop").mode("overwrite").save()
    }
    val full = minOf("full") {
      graft.ops.IncrementalDedup.newDocs(corpus, batch).orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    println(f"attribution: bloom $bloom%.3f + batch-fixture $batchT%.3f; " +
      f"operator residual ≈ ${full - batchT - bloom}%.3f of full $full%.3f")
    spark.stop()
  }
}
