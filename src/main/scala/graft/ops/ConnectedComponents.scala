package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step a
  * dedup pipeline needs BETWEEN pairwise candidates and keeper
  * selection: near-dup similarity is not transitive, so pairwise
  * keeper rules (drop the higher id of each pair) can drop a document
  * whose only "duplicate" was itself transitively kept. Clustering the
  * candidate graph and keeping one representative per component is the
  * standard fix (this is how production dedup at corpus scale works:
  * MinHash/LSH pairs → components → one doc per component survives).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * label and its neighbors' labels; at fixpoint the label is the min
  * id reachable — a canonical, deterministic component id (which is
  * what lets a DuckDB recursive CTE oracle the result, q60).
  *
  * Scale shape per round: ONE join of the bidirected edge list against
  * the current labels (shuffle keyed by node id) + a min-aggregate —
  * the classic BSP round every distributed CC implementation runs.
  * Rounds needed = cluster diameter, and near-dup clusters are
  * shallow (a handful of hops); `maxIter` caps pathological chains.
  * The driver loop is inherently iterative (like any k-means/CC): each
  * round is an action, `localCheckpoint` truncates the lineage so
  * round N's plan does not replay rounds 1..N-1 (the classic
  * iterative-Spark blowup), and convergence is detected by the
  * label-sum fixpoint — labels only ever DECREASE, so an unchanged
  * sum means an unchanged labeling (no row-by-row diff join needed;
  * the sum accumulates in DECIMAL(38,0) so overflow cannot fake a
  * fixpoint at any id range). The sum rides the SAME job as the
  * checkpoint materialization via `observe` (a `CollectMetrics`
  * node the rows stream through on their way into the checkpoint) —
  * one action per round, not a checkpoint plus a separate aggregate
  * scan, halving the per-round driver-floor cost.
  *
  * Path halving (compressing labels through the previous round's
  * checkpointed table, the pointer-jumping trick) was implemented and
  * MEASURED OUT in round 7: it cut q60's rounds 15 → 9 but added one
  * slim join+exchange per round, and at the near-dup graph's actual
  * diameter (~10–15) the per-round cost increase outweighed the saved
  * rounds at every tested scale (sf1 wall 5.3 → 6.4 s). The O(log d)
  * variant only pays off on chain-deep graphs; `tools/CcRounds`
  * measures rounds for both edge formulations if that trade ever
  * needs re-checking.
  */
object ConnectedComponents {

  /** Label every node with the smallest node id in its component.
    * Output columns: (`id`, `component`), one row per node; nodes
    * absent from `edges` keep their own id (singleton components).
    * If the graph has not converged after `maxIter` rounds (a
    * component chain deeper than the cap), `strict = true` (default)
    * THROWS instead of silently returning partial labels — wrong
    * components with no signal is the worse failure; pass
    * `strict = false` to accept the partial min-so-far labeling.
    *
    * Only the EDGE SUBGRAPH iterates: a node in no candidate pair can
    * never change label, so the BSP rounds run over the (much smaller)
    * set of pair-participating ids and the corpus joins in exactly
    * once at the end for the singleton labels — at 100 TB the corpus
    * is billions of docs while the near-dup graph is orders of
    * magnitude smaller, and it would be a scale bug to drag every doc
    * through every round. */
  def minLabel(nodes: DataFrame, idCol: String,
               edges: DataFrame, srcCol: String, dstCol: String,
               maxIter: Int = 25, strict: Boolean = true): DataFrame =
    minLabelWithRounds(nodes, idCol, edges, srcCol, dstCol, maxIter, strict)._1

  /** Same as [[minLabel]], also returning the number of BSP rounds
    * run (including the fused first round and the final fixpoint-
    * confirmation round) — the scale-relevant statistic: rounds track
    * component diameter, not corpus size. */
  def minLabelWithRounds(nodes: DataFrame, idCol: String,
               edges: DataFrame, srcCol: String, dstCol: String,
               maxIter: Int = 25, strict: Boolean = true): (DataFrame, Int) = {
    val e = edges.select(col(srcCol).cast("long").as("a"),
                         col(dstCol).cast("long").as("b"))
    // r21 loop-shape rework (guide §2.4 — remove per-round shuffles):
    //  - SELF-LOOPS (a,a) for every edge endpoint make each BSP round
    //    a single join+aggregate: min over neighbors ∪ self ≡
    //    least(own, min(neighbor)), so the old per-round left join of
    //    labels against nbrMin — one more join + exchange per round —
    //    is gone. The labeling TRAJECTORY is unchanged round for
    //    round, not just the fixpoint.
    //  - The edge table is REPARTITIONED BY THE JOIN KEY (explicit N:
    //    exempt from AQE coalescing, so every round's join sees the
    //    same partitioning) and SORTED WITHIN PARTITIONS before the
    //    one-time materialization: the per-round join then neither
    //    re-exchanges nor re-sorts the edge side — at corpus scale the
    //    edges are the BIG side of every round, and re-shuffling a
    //    loop-invariant table `diameter` times was the loop's dominant
    //    avoidable cost. hash(b) co-locates equal (a,b) pairs, so the
    //    dedup aggregate reuses that exchange instead of adding an
    //    (a,b)-keyed one.
    val parts = scala.util.Try(
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(32)
    val dedup = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
    val bidir = dedup
      .union(dedup.select(col("a"), col("a").as("b")))         // self-loops (deduped below)
      .repartition(parts, col("b"))
      .distinct()
      .sortWithinPartitions("b")
      .localCheckpoint() // scanned every round: materialize once
    // The label sum is observed on the same materialization that
    // checkpoints the round (verified: Observation fires on the
    // eager localCheckpoint action), so each round is ONE job.
    def checkpointWithSum(df: DataFrame, obsName: String): (DataFrame, java.math.BigDecimal) = {
      val obs = Observation(obsName)
      val ck = df
        .observe(obs, sum(col("component").cast("decimal(38,0)")).as("labelSum"))
        .localCheckpoint()
      val s = obs.get("labelSum") match {
        case null                     => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal  => d
        case d: scala.math.BigDecimal => d.bigDecimal
        case other => throw new IllegalStateException(s"unexpected labelSum $other")
      }
      (ck, s)
    }
    // Round 1 fuses into the init checkpoint: starting labels are
    // min over neighbors ∪ self (the self-loop stands in for the old
    // least(id, ...)) computed straight off the edge list — identical
    // to one BSP round from the trivial id-labeling, one whole action
    // cheaper (and since both directions are present, groupBy(a)
    // covers every edge-subgraph node).
    var (labels, prev) = checkpointWithSum(
      bidir.groupBy("a").agg(min("b").as("component"))
        .select(col("a").as("id"), col("component")),
      "cc_init")
    var iter = 1 // the fused init IS propagation round 1
    var converged = false
    while (!converged && iter < maxIter) {
      // POINTER JUMP then propagate, one action per round (r21).
      // hop: label ← label(label) — the classic shortcutting step,
      // run against the PREVIOUS round's materialized table, so both
      // consumers of `labels` read the checkpointed RDD and nothing
      // recomputes. Every label value is a node id present in the
      // table (init labels are edge endpoints; updates take mins of
      // existing labels), so the inner self-join is total, and the
      // monotone invariant label(y) ≤ y makes the hop non-increasing
      // per node. Rounds needed drop from O(diameter) to
      // O(log diameter) — measured 15 → 5 at sf0.1 where the
      // per-round action floor, not the per-round shuffle, dominated
      // the wall (the r7 halving experiment predates the self-loop
      // single-join round; with today's leaner round the trade
      // reverses and is re-measured in OPTIMIZATION_r21.md).
      // prop: min over neighbors ∪ self via the self-loop edges.
      // Convergence: the sum is unchanged iff hop AND prop were both
      // the identity, and prop-identity alone is the standard
      // fixpoint condition; labels stay per-node non-increasing, so
      // the DECIMAL(38,0) sum test is exactly as before.
      val hopped = labels
        .join(labels.select(col("id").as("component"), col("component").as("c2")),
              Seq("component"))
        .select(col("id"), col("c2").as("component"))
      val (updated, cur) = checkpointWithSum(
        bidir
          .join(hopped.select(col("id").as("b"), col("component").as("bcomp")), "b")
          .groupBy("a").agg(min("bcomp").as("component"))
          .select(col("a").as("id"), col("component")),
        s"cc_round_$iter")
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels = updated
      iter += 1
    }
    if (!converged && strict)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(component deeper than the cap); raise maxIter or pass strict = false")
    // corpus joins in ONCE: nodes outside the edge subgraph are their
    // own (singleton) component
    val out = nodes.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    (out, iter)
  }
}
