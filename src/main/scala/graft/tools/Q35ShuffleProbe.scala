package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.core.Tables
import graft.ops.Text

/** A/B for q35's pair-scoring shuffle (round-13 verdict item 3): the
  * suite's largest shuffle (~10–15 GB/rep at sf10) carries each
  * candidate doc's ~2 KB distinct-gram-hash ARRAY through the two
  * pair joins. The alternative re-shapes intersection counting to be
  * gram-KEYED: explode the needed docs' gram hashes once into slim
  * (doc_id, g) rows, fan them onto pairs (pairs × grams-per-doc
  * rows of ~24 B), count per-pair matches with a map-side-combining
  * aggregate, and join back the per-doc set sizes —
  * |A∩B| / (|A|+|B|−|A∩B|) is exactly array_jaccard's value, with the
  * union==0 → 0.0 edge replicated, so the arms are answer-identical
  * (asserted by `check` mode).
  *
  * Run one arm per JVM (fresh-JVM discipline — q35's sf10 cell swings
  * ±2.3× with host state, so arms must alternate across JVMs, not
  * share one):
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 java … graft.tools.Q35ShuffleProbe array|gram [reps]
  *   java … graft.tools.Q35ShuffleProbe check   # answer-equality gate (any SF)
  */
object Q35ShuffleProbe {

  /** The committed q35 form: features as per-doc arrays riding the
    * pair joins. */
  private def arrayCarry(s: SparkSession, dir: String): DataFrame =
    SparkEntry.queries("q35_ngram_jaccard")(s, dir)

  /** Gram-keyed alternative: same pairs, same features, intersection
    * counted over exploded (doc_id, g) rows instead of arrays. */
  private def gramKeyed(s: SparkSession, dir: String): DataFrame = {
    val pairs = SparkEntry.bandedPairs(SparkEntry.minhashSigsFrame(s, dir))
      .select("doc1", "doc2").localCheckpoint()
    val needed = pairs
      .select(explode(array(col("doc1"), col("doc2"))).as("doc_id"))
      .distinct()
    val docs = Tables.documents(s, dir)
      .join(needed, Seq("doc_id"), "left_semi")
      .select(
        col("doc_id"),
        Text.distinctGramHashesOfText(col("text"), 3).as("g3"),
        Text.simhash(Text.tokens(col("text"))).as("sh"))
      .withColumn("sz", size(col("g3")))
      .localCheckpoint()
    val grams = docs.select(col("doc_id"), explode(col("g3")).as("g"))
    val inter = pairs
      .join(grams.withColumnRenamed("doc_id", "doc1"), Seq("doc1"))
      .join(grams.select(col("doc_id").as("doc2"), col("g")), Seq("doc2", "g"), "left_semi")
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("n_inter"))
    val meta = docs.select(col("doc_id"), col("sz"), col("sh"))
    val denom = col("sz1") + col("sz2") - coalesce(col("n_inter"), lit(0L))
    pairs
      .join(inter, Seq("doc1", "doc2"), "left")
      .join(meta.select(col("doc_id").as("doc1"), col("sz").as("sz1"), col("sh").as("sh_1")), "doc1")
      .join(meta.select(col("doc_id").as("doc2"), col("sz").as("sz2"), col("sh").as("sh_2")), "doc2")
      .select(
        col("doc1"), col("doc2"),
        round(when(denom === 0L, lit(0.0))
          .otherwise(coalesce(col("n_inter"), lit(0L)).cast("double") / denom.cast("double")), 6)
          .as("jaccard3"),
        Text.hamming32(col("sh_1"), col("sh_2")).as("hamming"))
      .orderBy("doc1", "doc2")
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("check")
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.build("graft-q35-probe", "32")

    mode match {
      case "check" =>
        val a = arrayCarry(spark, dir)
        val b = gramKeyed(spark, dir)
        val nA = a.count(); val nB = b.count()
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        println(s"rows array=$nA gram=$nB exceptAll-diff=$diff")
        assert(nA == nB && diff == 0, "ARMS DISAGREE — gram-keyed form is not answer-identical")
        println("arms answer-identical")
      case arm @ ("array" | "gram") =>
        val run: () => Unit = arm match {
          case "array" => () => arrayCarry(spark, dir)
            .write.format("noop").mode("overwrite").save()
          case _ => () => gramKeyed(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        val times = (1 to reps).map { i =>
          val t0 = System.nanoTime()
          run()
          val t = (System.nanoTime() - t0) / 1e9
          println(f"[q35-probe] $arm rep $i: $t%.3f s")
          t
        }
        println(f"[q35-probe] $arm min ${times.min}%.3f median ${times.sorted.apply(times.size / 2)}%.3f ($dir)")
      case other =>
        System.err.println(s"unknown mode '$other' (array|gram|check)"); sys.exit(2)
    }
    spark.stop()
  }
}
