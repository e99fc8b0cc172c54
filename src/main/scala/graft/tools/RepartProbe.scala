package graft.tools
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Dev A/B: heavy native text expressions fused into a single-task
  * scan (one-row-group fixture) vs the same expression after a
  * repartition that engages every core. */
object RepartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("repart-probe")
    val docs = Tables.documents(spark, sfDir)
    // the session's core count, matching spreadSmallScan's repartition
    // target — a hardcoded 32 would measure the wrong shape on hosts
    // with a different core count (ADVICE r21)
    val cores = spark.sparkContext.defaultParallelism
    val reps = 5
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-40s min ${ts.min}%.3f  med ${ts.sorted.apply(reps/2)}%.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sig = expr("minhash_sigs(text)")
    time("minhash_sigs fused (1-task scan)") { noop(docs.select(col("doc_id"), sig.as("s"))) }
    time("minhash_sigs repart(n)") { noop(docs.repartition(cores).select(col("doc_id"), sig.as("s"))) }
    val bpe = call_function("bpe_token_count", col("text"))
    time("bpe_token_count fused") { noop(docs.select(col("doc_id"), bpe.as("n"))) }
    time("bpe_token_count repart(n)") { noop(docs.repartition(cores).select(col("doc_id"), bpe.as("n"))) }
    val g3 = call_function("word_text_gram_hashes_distinct", col("text"), lit(3))
    time("gram_hashes_distinct fused") { noop(docs.select(col("doc_id"), g3.as("g"))) }
    time("gram_hashes_distinct repart(n)") { noop(docs.repartition(cores).select(col("doc_id"), g3.as("g"))) }
    spark.stop()
  }
}
