package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ordered prefix sums — the scale-safe form of
  * `SUM(x) OVER (ORDER BY k)`, which Spark otherwise executes as a
  * GLOBAL single-partition window (every row through one task: the
  * canonical scale-killer for running totals).
  *
  * Same chunk-offset construction as [[Percentiles.exactBySort]]:
  * range-partition by the order key, run the within-chunk window in
  * parallel, then add broadcast per-chunk offsets (P tiny rows). The
  * pattern a training pipeline uses to pack documents into
  * token-budget shards (see SparkEntry q51) or assign global positions
  * without a driver bottleneck.
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running total of `valueCol` in
    * `orderCol` order. `orderCol` must be unique per row (ties would
    * make the within-tie running order nondeterministic). The value
    * column must be integral (sums as long). */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
                   cumCol: String): DataFrame =
    runningTotal(df, Seq(orderCol), valueCol, cumCol)

  /** Composite-key form: the running total follows the lexicographic
    * order of `orderCols` (their COMBINATION must be unique per row —
    * how [[graft.ops.EpochShuffle]] orders by a 60-bit permutation
    * key with the row id as the exactness tiebreak). */
  def runningTotal(df: DataFrame, orderCols: Seq[String], valueCol: String,
                   cumCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val parts = df.repartitionByRange(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    // Single-partition by design — it orders the P per-chunk totals
    // (P = shuffle partitions), never data rows. The pmod(pid, 1)
    // partition key is 0 by construction but opaque to constant
    // folding (a bare lit(0) gets optimized away, reverting to an
    // empty spec), so the single partition is EXPLICIT: execution is
    // identical, and WindowExec's "No Partition Defined" warning
    // stays free to flag windows unpartitioned by ACCIDENT (PlanSpec
    // pins the absence).
    val wOff = Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy("__pid")
    val meta = parts.groupBy("__pid").agg(sum(col(valueCol)).as("__cnt"))
      .select(col("__pid"),
        coalesce(sum("__cnt").over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__off"))
    parts
      .withColumn("__run", sum(col(valueCol)).over(
        Window.partitionBy("__pid").orderBy(orderCols.head, orderCols.tail: _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(meta), "__pid")
      .withColumn(cumCol, col("__run") + col("__off"))
      .drop("__pid", "__run", "__off")
  }
}
