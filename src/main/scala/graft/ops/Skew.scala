package graft.ops

import org.apache.spark.sql.DataFrame
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
}
