package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single right
  * row with the same key and the greatest timestamp ≤ the left row's
  * timestamp — the canonical time-series operator Spark has no
  * built-in for (DuckDB: `ASOF JOIN`; the oracle for q40 uses exactly
  * that).
  *
  * Formulation: tag both sides, UNION, one window pass per key ordered
  * by (ts, right-before-left-on-ties), carry the last non-null right
  * payload forward, keep left rows. Properties that make it the 100 TB
  * shape:
  *  - ONE shuffle total (the window's hash partition on the key) —
  *    an equi-join + groupBy-max formulation shuffles twice and an
  *    interval cross-join explodes;
  *  - state per partition is a sort, not a hash of the right side;
  *  - skewed keys split fine under AQE because the window key is the
  *    join key.
  * Ties: a right row AT the left row's timestamp matches (`>=`
  * semantics, like DuckDB); among equal-ts right rows the one with
  * the greatest tie-break column wins, making results deterministic.
  */
object AsOf {
  /** @param tieBreakCol column of the RIGHT frame ordering equal-ts
    *                     right rows (left rows never tie-break against
    *                     each other — their matches are independent). */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               tieBreakCol: String,
               rightPrefix: String = "r_"): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val rightPayload = right.columns.filterNot(c => c == keyCol).toSeq // keeps right ts

    val lTagged = left.select(
      col(keyCol), col(tsCol),
      struct(leftPayload.map(col): _*).as("__l"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)).as("__r"),
      lit(0).as("__is_r"),
      lit(null).cast(right.schema(tieBreakCol).dataType).as("__tie"))
    val rTagged = right.select(
      col(keyCol), col(tsCol),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          left.select(leftPayload.map(col): _*).schema.fields)).as("__l"),
      struct(rightPayload.map(col): _*).as("__r"),
      lit(1).as("__is_r"),
      col(tieBreakCol).as("__tie"))

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__is_r").desc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)

    val outCols: Seq[Column] =
      Seq(col(keyCol), col(tsCol)) ++
      leftPayload.map(c => col(s"__l.$c").as(c)) ++
      rightPayload.map(c => col(s"__m.$c").as(s"$rightPrefix$c"))
    matched.select(outCols: _*)
  }
}
