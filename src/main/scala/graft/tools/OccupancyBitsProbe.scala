package graft.tools

import org.apache.spark.sql.functions._

/** End-to-end demonstration of the `occupancyBits` scale rule
  * (VERDICT r8 item 5): the q36/q55 LSH family at a FIXED code width
  * goes quadratic as the corpus grows — within-bucket pair work is
  * Θ(n²/2^bits), and the documented sf1→sf10 q55 wall growth of 74×
  * is that law, not an implementation defect — while sizing the code
  * to the corpus (`bits = occupancyBits(n)`: +1 bit per corpus
  * doubling) holds expected bucket occupancy flat, so candidate
  * pairs (and the wall clock that follows them) grow ~LINEARLY.
  *
  * The carriers keep their fixed knobs (the DuckDB oracle needs a
  * deterministic, engine-shared bucket function at a fixed width);
  * this probe is the production-policy measurement: for each sf dir,
  * counts banded candidate pairs (q36/q37's generator) and
  * multi-probe pairs (q55's) under BOTH knob policies, min-of-`reps`
  * wall each, and prints one table row per (sf, policy).
  *
  * Usage: OccupancyBitsProbe [reps] [sfDir ...]
  *   (defaults: 3 reps, /tmp/sf1 /tmp/sf10)
  */
object OccupancyBitsProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dirs = if (args.length > 1) args.drop(1).toSeq else Seq("/tmp/sf1", "/tmp/sf10")
    val spark = graft.core.GraftSession.build("occupancy-bits-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity

    println("sf_dir\tn_vecs\tpolicy\tbits\tpairs_banded\tsec_banded\tpairs_multiprobe\tsec_multiprobe")
    for (dir <- dirs) {
      val emb = graft.core.Tables.embeddings(spark, dir).localCheckpoint()
      val n = emb.count()
      val scaledBits = Similarity.occupancyBits(n)
      for ((policy, bits) <- Seq("fixed" -> 8, "occupancyBits" -> scaledBits)) {
        def timeCount(df: => org.apache.spark.sql.DataFrame): (Long, Double) = {
          var cnt = 0L
          val best = Seq.fill(reps) {
            val t0 = System.nanoTime()
            cnt = df.count()
            (System.nanoTime() - t0) / 1e9
          }.min
          (cnt, best)
        }
        val (cb, tb) = timeCount(Similarity.candidatePairs(emb, bits = bits))
        val (cm, tm) = timeCount(Similarity.multiProbePairs(emb, bits = bits))
        println(f"$dir\t$n\t$policy\t$bits\t$cb\t$tb%.2f\t$cm\t$tm%.2f")
      }
    }
    spark.stop()
  }
}
