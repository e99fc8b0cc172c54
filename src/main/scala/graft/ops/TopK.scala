package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped top-k that stays parallel at any scale.
  *
  * The naive form — `row_number() OVER (PARTITION BY g ORDER BY v)`
  * then `rank <= k` — funnels EVERY row of a group through one task's
  * window sort: with few strata and billions of rows per stratum,
  * that is a single-task-per-group scale trap (the grouped analog of
  * what TakeOrderedAndProject avoids for global top-k).
  *
  * This operator pre-prunes per INPUT partition with bounded heaps
  * (each partition keeps at most k rows per group it sees), so the
  * shuffle and the final window sort handle at most k × partitions
  * rows per group — bounded by the cluster, not the data. The final
  * window pass is the same rank ≤ k, now over survivors only.
  *
  * Group cardinality per partition bounds stage-1 memory at
  * k × (groups seen); intended for stratum-like group columns
  * (languages, labels, shards), not high-cardinality keys — for
  * those the plain window is already parallel.
  */
object TopK {

  /** Keep the k best rows per group, "best" = largest `orderCol`,
    * ties broken by smallest `tieBreakCol` (both numeric, read as
    * long). Output schema = input schema; row order unspecified. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderCol: String, tieBreakCol: String, k: Int): DataFrame = {
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val oIdx = schema.fieldIndex(orderCol)
    val tIdx = schema.fieldIndex(tieBreakCol)
    // "worst first" ordering so the heap head is the eviction candidate
    val heapOrd: Ordering[Row] = Ordering.by { r: Row =>
      (-r.getAs[Number](oIdx).longValue(), r.getAs[Number](tIdx).longValue())
    }
    val pruned = df.rdd.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[Row]]
      it.foreach { row =>
        val heap = heaps.getOrElseUpdate(
          gIdx.map(row.get),
          scala.collection.mutable.PriorityQueue.empty[Row](heapOrd))
        heap.enqueue(row)
        if (heap.size > k) heap.dequeue() // drops the current worst
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
    val survivors = df.sparkSession.createDataFrame(pruned, schema)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(desc(orderCol), asc(tieBreakCol))
    survivors
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
