package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.ChunkDedup

/** A/B for q73's first-occurrence window key (round-13 verdict item):
  * partition by full chunk TEXT (current) vs xxhash64-fingerprint-
  * prefixed (chunk stays in the key — exactness unchanged, sort
  * comparisons resolve on the 8-byte prefix). Times the full q73
  * carrier shape (header-prepended corpus, dedup, doc-order output)
  * through a noop sink, warm JVM, min-of-5 per variant, interleaved
  * so session drift hits both arms equally. Run:
  * `SPARK_GRAFT_SF_DIR=/tmp/sf1 java … graft.tools.ChunkKeyProbe`
  */
object ChunkKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "5").toInt
    val spark = graft.core.GraftSession.build("graft-chunk-key-probe", "32")

    def carrier(fp: Boolean): Unit = {
      val docs = Tables.documents(spark, dir).select(col("doc_id"),
        concat(lit("std header boilerplate for source "), col("source"),
               lit(" v1 end "), col("text")).as("text"))
      ChunkDedup.dedup(docs, "text", "doc_id", w = 8, fingerprintKey = fp)
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    // warm both arms once (codegen, shuffle service, scan cache)
    carrier(fp = false); carrier(fp = true)
    val samples = (1 to reps).flatMap { _ => Seq(false, true) }
    val res = samples.map { fp =>
      val t0 = System.nanoTime()
      carrier(fp)
      (fp, (System.nanoTime() - t0) / 1e9)
    }
    Seq(false, true).foreach { fp =>
      val xs = res.collect { case (`fp`, t) => t }
      println(f"fingerprintKey=$fp%-5s min ${xs.min}%6.3f  median ${xs.sorted.apply(xs.size / 2)}%6.3f  all ${xs.map(t => f"$t%.3f").mkString(", ")}")
    }
    spark.stop()
  }
}
