package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches via deterministic bottom-k sampling
  * (Cohen & Kaplan's bottom-k sketches) — the third member of the
  * engine's mergeable-sketch family (KMV distinct counts q88,
  * Misra-Gries heavy hitters q89): per group, keep the k rows whose
  * 60-bit md5 SAMPLING KEY (hashed row id — independent of the value)
  * is smallest; that is a uniform without-replacement sample, so the
  * sample's empirical quantiles estimate the group's (rank error
  * concentrates as ~√(q(1−q)/k)), EXACTLY equal to them when the
  * group has ≤ k rows.
  *
  * Why not `approx_percentile`: its GK summary is neither
  * deterministic across engines nor relationally re-derivable, so it
  * can never pass a hash-exact oracle. The bottom-k sample is BOTH —
  * the oracle re-ranks by the same md5 keys — and it is mergeable by
  * construction: the bottom-k of a union IS the bottom-k of the
  * parts' bottom-k's, so per-shard sketches re-aggregate without
  * touching the rows again (the q91 persistence contract; the q96
  * carrier BUILDS per-shard and MERGES, while its oracle computes the
  * global sample directly — the green hash is the mergeability
  * proof, the q56 trick).
  *
  * Scale shape: sketches ride [[graft.functions.BoundedTopK]]
  * (ObjectHashAggregate, map-side partial), so every exchange carries
  * ≤ k-entry buffers per group, never rows; quantile extraction is a
  * per-group array sort of ≤ k values. */
object QuantileSketch {

  /** 60-bit md5 sampling key of a row id (q88/q92 hash convention —
    * re-derivable in ANSI SQL). */
  def sampleKey(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  private def entry(id: Column, value: Column): Column =
    struct(sampleKey(id).as("h"), id.as("id"), value.as("v"))

  /** Per-group sketches: one row per `groupCols` combination with
    * `n_rows` (exact) and `sketch` = the bottom-k (h, id, v) entries,
    * smallest hash first (ties by id — a total order, so the sketch
    * is unique). */
  def build(df: DataFrame, groupCols: Seq[String], idCol: String,
            valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need a positive sample bound, got $k")
    val e = entry(col(idCol), col(valueCol))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        call_function("bounded_topk",
          e, -e.getField("h"), col(idCol), lit(k)).as("sketch"))
  }

  /** Re-aggregate per-shard sketches to coarser groups: bottom-k of
    * the union of bottom-k's ≡ bottom-k of the union (the mergeable
    * property). Returns (groupCols, n_rows, sketch) like [[build]] —
    * the exact count sums BEFORE the entry explode so it never
    * multiplies by sketch size; exchanges again carry only sketch
    * buffers and one long. */
  def merge(sketches: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"need a positive sample bound, got $k")
    val gc = groupCols.map(col)
    val counts = sketches.groupBy(gc: _*).agg(sum(col("n_rows")).as("n_rows"))
    val merged = sketches
      .select(gc :+ explode(col("sketch")).as("e"): _*)
      .groupBy(gc: _*)
      .agg(call_function("bounded_topk",
        col("e"), -col("e.h"), col("e.id"), lit(k)).as("sketch"))
    counts.join(merged, groupCols)
  }

  /** Empirical quantile of a sketch column at `q`: the value at
    * 1-based index ⌊q·(nₛ−1)⌋+1 of the sorted sampled values — a
    * deterministic integer index rule both engines compute identically
    * (one IEEE multiply + floor; no interpolation, so integer-typed
    * values stay integers and the oracle compare is exact). */
  def quantile(sketch: Column, q: Double): Column = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    val vals = array_sort(transform(sketch, _.getField("v")))
    element_at(vals,
      (floor(lit(q) * (size(vals) - 1)) + 1).cast("int"))
  }
}
