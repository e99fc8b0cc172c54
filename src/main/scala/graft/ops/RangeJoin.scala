package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval/proximity) join: pair left rows with right rows
  * whose timestamp lies within ± `radius` — the second classic
  * time-series operator Spark lacks a native strategy for. A naive
  * formulation (`join` on the inequality alone) planes to
  * BroadcastNestedLoopJoin — O(|L|·|R|) and a driver OOM once the
  * right side outgrows the broadcast cap.
  *
  * Bucketization makes it an equi-join: time is cut into buckets of
  * width = radius; a right row in bucket b can only match left rows in
  * buckets {b−1, b, b+1}, so the left side is expanded 3× with the
  * candidate bucket ids, joined on the bucket KEY (hash shuffle, AQE
  * splittable), and refined with the exact |Δt| ≤ radius predicate.
  * Work scales with true match density × 3, never |L|·|R|.
  */
object RangeJoin {
  /** Join `left` to `right` on |left.tsCol − right.tsCol| ≤ radiusSec.
    * Output: all left columns + right columns prefixed `r_`. */
  def byTime(left: DataFrame, right: DataFrame, tsCol: String,
             radiusSec: Long, rightPrefix: String = "r_"): DataFrame = {
    require(radiusSec > 0)
    val radiusUs = radiusSec * 1000000L
    val bucketOf = (c: org.apache.spark.sql.Column) => expr_bucket(c, radiusUs)

    val l = left.withColumn("__cand", explode(array(
        bucketOf(col(tsCol)) - 1, bucketOf(col(tsCol)), bucketOf(col(tsCol)) + 1)))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"$rightPrefix$c"))
      .withColumn("__cand", bucketOf(col(s"$rightPrefix$tsCol")))

    l.join(r, Seq("__cand"))
      .filter(abs(unix_micros(col(tsCol)) - unix_micros(col(s"$rightPrefix$tsCol"))) <= radiusUs)
      .drop("__cand")
  }

  private def expr_bucket(c: org.apache.spark.sql.Column, widthUs: Long) =
    floor(unix_micros(c) / widthUs).cast("long")
}
