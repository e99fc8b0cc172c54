package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (a handful of hot keys receive most rows — the classic 100 TB
  * failure mode where one reducer gets 100× the data).
  *
  * [[saltedJoin]] splits every hot key into `saltBuckets` sub-keys:
  * the large (skewed) side gets a DETERMINISTIC salt derived from a
  * row-local column (hash mod buckets — no `rand()`, so retries and
  * speculative tasks stay consistent), and the small side is
  * replicated once per salt value. Join key becomes (key, salt) —
  * the hot key's rows now spread over `saltBuckets` reducers.
  *
  * AQE's skew-join handling (on in GraftSession) covers many cases at
  * runtime by splitting oversized partitions; explicit salting remains
  * the deterministic tool when a key is so hot that even a split
  * partition exceeds executor memory, or when the join sits below an
  * operator AQE cannot re-plan.
  */
object Skew {
  /** Inner-join `large` with `small` on `key`, spreading each key over
    * `saltBuckets` reducers. `saltSource` must be a column on the
    * large side with per-row variation (an id, a line number). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val salted = large.withColumn("__salt", pmod(hash(col(saltSource)), lit(saltBuckets)))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Aggregate-through-join: the production plan for `large ⋈ small →
    * groupBy(smallCols).agg(...)` shapes where the aggregates read
    * only `large`-side columns. Instead of joining row-per-fact and
    * aggregating after (the q56 carrier shape — the joined volume is
    * the FACT table, and a hot key is a hot reducer), pre-aggregate
    * `large` by the join key first: the join then moves ONE partial
    * row per key, the final aggregation re-combines partials, and key
    * skew never forms — a hot key's facts collapse in the map-side
    * partial aggregate, which is exactly where Spark already handles
    * repeated keys well. At the 100 TB design point this cuts the
    * join input by the fact-to-key ratio (orders→custkey ≈ 13×)
    * regardless of salting or AQE.
    *
    * Catalyst cannot derive this rewrite itself when the final
    * aggregate's grouping column lives on `small` (pushing an
    * aggregate through a join is not in the optimizer's rule set for
    * arbitrary aggregates), so the decomposition is the caller's:
    * `partialAggs` run per join key over `large` and must be
    * RE-AGGREGABLE — sum→sum, count→sum, min→min, max→max; avg as
    * (sum, count) pair — and `finalAggs` do that re-aggregation over
    * the partials' aliases after the join, grouped by `groupCols`
    * (columns of `small`). Value-equality with the join-then-agg plan
    * is pinned in ScaleOpsSpec; the q100 carrier oracles it against
    * the plain-join SQL at every scale factor. */
  def aggThroughJoin(large: DataFrame, small: DataFrame, key: String,
                     partialAggs: Seq[Column], groupCols: Seq[String],
                     finalAggs: Seq[Column]): DataFrame = {
    require(partialAggs.nonEmpty, "aggThroughJoin: no partial aggregates")
    require(finalAggs.nonEmpty, "aggThroughJoin: no final aggregates")
    require(groupCols.nonEmpty, "aggThroughJoin: no grouping columns")
    val partial = large.groupBy(key).agg(partialAggs.head, partialAggs.tail: _*)
    partial.join(small, Seq(key))
      .groupBy(groupCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
