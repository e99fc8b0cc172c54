package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.10's aggregate surface): element-wise mean of
  * ARRAY<DOUBLE> vectors per group — `vec_mean(embedding)`.
  *
  * The buffer is one (sums, count) pair per group per partition
  * (merge is element-wise), so group state is O(dim) regardless of
  * row count — the aggregate alternative to the dimension-exploded
  * plan in [[graft.ops.Similarity.ivfUpdate]] when `dim` is small and
  * one row per group is wanted directly.
  *
  * DELIBERATELY has no DuckDB-oracled carrier query: double sums are
  * accumulation-order-dependent in the last ulp, and partial-merge
  * order is nondeterministic across runs — exactly why the oracled
  * q52 accumulates DECIMAL cells instead. SimilaritySpec pins this
  * aggregator against ivfUpdate within 1e-9.
  */
object VecMean extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length && i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0L) Seq.empty else r._1.toSeq.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
