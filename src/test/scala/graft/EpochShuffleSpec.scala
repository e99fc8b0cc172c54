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
}
