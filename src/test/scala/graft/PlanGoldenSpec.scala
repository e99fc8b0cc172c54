package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanFingerprints
import graft.tools.PlanFingerprints.Shape

/** Executed-plan (AQE-final) shape goldens for the heaviest carriers,
  * pinned IN the test suite (VERDICT r21 item 8): PlanSpec pins
  * individual plan properties at plan time, and the campaign ledger
  * diffs fingerprints between rounds, but nothing inside `sbt test`
  * failed when a refactor or Spark upgrade reintroduced an exchange —
  * it surfaced a round later as an unexplained slow bench cell. This
  * spec executes each carrier at sf0.01 and compares the full shape
  * tuple (exchanges, reused, join strategies, aggregates, scans)
  * against the committed golden.
  *
  * When a change is INTENDED (a round's optimization), update the
  * golden here with the new shape and say why in the round's
  * OPTIMIZATION notes — exactly the discipline the ledger's
  * merge-plans step follows. Regenerate values with:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *   SPARK_GRAFT_BENCH_ONLY=<names> graft.tools.PlanFingerprints
  *
  * Shapes are per scale factor (AQE picks size-dependent strategies);
  * these goldens are sf0.01's, captured r22.
  */
class PlanGoldenSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.01"

  private val golden: Map[String, Shape] = Map(
    "q26_minhash_sig"      -> Shape(2, 0, "", 0, 1),
    "q31_neardup_pairs"    -> Shape(3, 0, "BroadcastHashJoin:1", 2, 2),
    "q35_ngram_jaccard"    -> Shape(3, 0, "BroadcastHashJoin:2", 0, 3),
    "q39_neardup_dedup"    -> Shape(4, 0, "BroadcastHashJoin:2", 2, 3),
    "q51_token_shards"     -> Shape(5, 0, "BroadcastHashJoin:1", 2, 2),
    "q60_neardup_clusters" -> Shape(3, 0, "ShuffledHashJoin:1", 0, 2),
    "q66_source_overlap"   -> Shape(6, 0, "BroadcastNestedLoopJoin:1", 6, 1),
    "q83_ingest_pipeline"  -> Shape(11, 0,
      "BroadcastHashJoin:2,ShuffledHashJoin:1,SortMergeJoin:2", 6, 6),
    "q92_span_dedup"       -> Shape(4, 0, "", 2, 1),
    "q95_epoch_shuffle"    -> Shape(6, 0, "BroadcastHashJoin:1", 2, 2),
    "q97_decontaminate"    -> Shape(3, 0, "BroadcastHashJoin:1", 2, 2),
    "q98_epoch_manifests"  -> Shape(2, 0, "", 2, 1))

  for ((name, want) <- golden.toSeq.sortBy(_._1))
    test(s"$name keeps its sf0.01 executed-plan shape") {
      val got = PlanFingerprints.shape(SparkEntry.queries(name)(spark, dir))
      assert(got == want,
        s"$name drifted from the committed golden:\n  want $want\n  got  $got\n" +
        "If this change is INTENDED, update PlanGoldenSpec's golden and " +
        "record the plan diff in the round's OPTIMIZATION notes.")
    }
}
