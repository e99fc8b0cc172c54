package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped top-k that stays parallel at any scale.
  *
  * The naive form — `row_number() OVER (PARTITION BY g ORDER BY v)`
  * then `rank <= k` — funnels EVERY row of a group through one task's
  * window sort: with few strata and billions of rows per stratum,
  * that is a single-task-per-group scale trap (the grouped analog of
  * what TakeOrderedAndProject avoids for global top-k).
  *
  * This operator is a single aggregation over the native
  * [[graft.functions.BoundedTopK]] TypedImperativeAggregate: the
  * PARTIAL phase keeps a bounded k-entry heap per group per map task
  * (each partition emits at most k rows per group it sees), the
  * exchange carries serialized k-entry buffers — bounded by the
  * cluster, not the data — and the FINAL merge produces the ranked
  * array directly, so no follow-up window sort exists at all. The
  * whole pipeline stays in InternalRow/Tungsten form (no
  * DataFrame→RDD→DataFrame round-trip, no external-Row boxing).
  *
  * Group cardinality per map task bounds stage-1 memory at
  * k × (groups seen); intended for stratum-like group columns
  * (languages, labels, shards), not high-cardinality keys — for
  * those the plain window is already parallel.
  */
object TopK {

  /** Keep the k best rows per group, "best" = largest `orderCol`,
    * ties broken by smallest `tieBreakCol` (any orderable types;
    * nulls rank last in both roles, i.e. a null score never beats a
    * value and a null tie-break loses the tie). Output schema = input
    * schema plus the `rk` rank column (1..k per group); row order
    * unspecified. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderCol: String, tieBreakCol: String, k: Int): DataFrame = {
    val allCols = df.columns.toSeq
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("bounded_topk",
        struct(allCols.map(col): _*), col(orderCol), col(tieBreakCol), lit(k))
        .as("topk"))
      // the array is best-first, so the position is the 0-based rank
      .select(posexplode(col("topk")).as(Seq("pos", "r")))
      .select(allCols.map(c => col(s"r.`$c`")) :+
        (col("pos") + 1).cast("int").as("rk"): _*)
  }
}
