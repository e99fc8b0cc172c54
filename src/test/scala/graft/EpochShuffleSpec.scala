package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EpochShuffle

/** Epoch-shuffle semantics: RNG-free determinism (same epoch ⇒ same
  * permutation, across re-runs and partitionings), epoch independence
  * (different salt ⇒ different order, same corpus multiset), the
  * greedy shard rule recomputed locally, and the composite-key prefix
  * sum's exactness. */
class EpochShuffleSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = (0L until 60L).map(i =>
    (i, Seq.fill(1 + (i % 7).toInt)(s"w$i").mkString(" ")))

  private def run(epoch: Int, parts: Int = 1, budget: Long = 10L) =
    EpochShuffle.shuffleAndPack(
        docs.toDF("doc_id", "text").repartition(parts), epoch, budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)

  test("same epoch is deterministic across re-runs and partitionings; different epochs permute differently") {
    val a = run(7)
    assert(a.toSeq == run(7, parts = 13).toSeq, "epoch 7 must be partitioning-invariant")
    val b = run(8)
    // same corpus, same token counts — only the order moved
    assert(a.map(x => (x._1, x._3)).toSeq == b.map(x => (x._1, x._3)).toSeq)
    assert(a.map(_._2).toSeq != b.map(_._2).toSeq, "epoch salt must change the permutation")
    val posA = a.sortBy(_._2).map(_._1).toSeq
    val posB = b.sortBy(_._2).map(_._1).toSeq
    assert(posA != posB, "different epochs must visit documents in different orders")
    assert(posA != posA.sorted, "the permutation must not degenerate to storage order")
  }

  test("cum_tokens is the exact running total in (epoch_key, doc_id) order; shard is the greedy rule") {
    val rows = run(7, parts = 5, budget = 10L).sortBy(x => (x._2, x._1))
    var cum = 0L
    rows.foreach { case (_, _, n, gotCum, gotShard) =>
      assert(gotShard == cum / 10L, "shard = exclusive-prefix div budget")
      cum += n
      assert(gotCum == cum, "running total must be exact in permuted order")
    }
  }

  test("shard budget guard") {
    val e = intercept[IllegalArgumentException](run(7, budget = 0L))
    assert(e.getMessage.contains("budget"))
  }

  test("manifest round trip: every doc exactly once per epoch, shard budgets hold, re-land overwrites whole") {
    val dir = java.nio.file.Files.createTempDirectory("graft-epochs").toString + "/m"
    val df = docs.toDF("doc_id", "text")
    EpochShuffle.landManifests(df, dir, epochs = Seq(7, 8), tokensPerShard = 10L)
    val landed = spark.read.parquet(dir)
      .select(col("epoch").cast("bigint"), col("shard").cast("bigint"),
        col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // exactly-once per epoch: each epoch's shards partition the corpus
    for (e <- Seq(7L, 8L))
      assert(landed.filter(_._1 == e).map(_._3).sorted.toSeq == (0L until 60L).toSeq,
        s"epoch $e must cover every doc exactly once across its shards")
    // budget: every doc STARTS inside its shard's token window (the
    // greedy first-fit rule; a straddling doc may finish past it)
    landed.foreach { case (e, shard, id, n, cum) =>
      assert((cum - n) / 10L == shard,
        s"epoch $e doc $id starts at ${cum - n}, outside shard $shard's window")
    }
    // the landed assignments ARE shuffleAndPack's (landing fidelity)
    val direct = run(7, budget = 10L).map(x => (x._1, x._5)).toMap
    landed.filter(_._1 == 7L).foreach { case (_, shard, id, _, _) =>
      assert(shard == direct(id), s"doc $id landed in shard $shard, computed ${direct(id)}")
    }
    // re-land with a different epoch set replaces the layout whole
    EpochShuffle.landManifests(df, dir, epochs = Seq(9), tokensPerShard = 10L)
    assert(spark.read.parquet(dir).select(col("epoch").cast("bigint"))
      .distinct().collect().map(_.getLong(0)).toSeq == Seq(9L),
      "a stale epoch survived the overwrite")
  }

  test("fetchShard serves one shard's docs with text in permutation order; manifest read is partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-epochf").toString + "/m"
    val df = docs.toDF("doc_id", "text")
    EpochShuffle.landManifests(df, dir, epochs = Seq(7), tokensPerShard = 10L)
    val expect = run(7, budget = 10L).filter(_._5 == 0L).sortBy(_._2)
    val got = EpochShuffle.fetchShard(df, dir, epoch = 7L, shard = 0L).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == expect.map(_._1).toSeq,
      "fetchShard must return exactly shard 0's docs in permutation order")
    assert(got.forall(r => r.getAs[String]("text").nonEmpty),
      "the corpus text rides the fetch")
    // single-shard fetch prunes at the scan: the epoch equality must
    // sit in a NON-EMPTY PartitionFilters list (a bare
    // "PartitionFilters: []" plus a post-scan Filter would pass a
    // looser check while listing every dir) and the shard equality
    // must be PUSHED so shard-sorted files/row-groups are stat-skipped
    val p = EpochShuffle.manifest(spark, dir, 7L, 0L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val pf = p.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("epoch") && pf.contains("= 7"),
      s"expected a pruning epoch filter at the scan, got '$pf' in:\n$p")
    val pushed = p.linesIterator.find(_.contains("PushedFilters:")).getOrElse("")
    assert(pushed.contains("EqualTo(shard,0)"),
      s"expected the shard equality pushed to the scan, got '$pushed' in:\n$p")
  }
}
