package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Value ordering over a column's runtime type (null-free inputs):
    * integral types compare as Long (no precision loss past 2^53),
    * fractional as Double, decimals as BigDecimal — the same
    * comparison the final window's sort applies, so the heap
    * pre-prune and the window agree on who survives. */
  private def fieldOrdering(dt: DataType): Ordering[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Ordering.by((x: Any) => x.asInstanceOf[Number].longValue())
    case FloatType | DoubleType =>
      Ordering.by((x: Any) => x.asInstanceOf[Number].doubleValue())
    // Spark sorts strings as UTF8String binary (code-point order);
    // java.lang.String.compareTo is UTF-16 order — they disagree for
    // supplementary characters vs U+E000..U+FFFF, so compare through
    // UTF8String to match the final window's sort exactly
    case StringType =>
      (a: Any, b: Any) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String]))
    // decimals, timestamps/dates (java.sql or java.time external forms
    // alike): natural Comparable order — the same total order Spark's
    // sort uses for these types
    case TimestampType | TimestampNTZType | DateType | _: DecimalType =>
      (a: Any, b: Any) => a.asInstanceOf[Comparable[Any]].compareTo(b)
    case other =>
      throw new IllegalArgumentException(s"TopK cannot order by type ${other.catalogString}")
  }

  /** Keep the k best rows per group, "best" = largest `orderCol`,
    * ties broken by smallest `tieBreakCol` (any orderable types;
    * nulls rank last in both roles, i.e. a null score never beats a
    * value and a null tie-break loses the tie). Output schema = input
    * schema plus the `rk` rank column (1..k per group); row order
    * unspecified. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderCol: String, tieBreakCol: String, k: Int): DataFrame = {
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val oIdx = schema.fieldIndex(orderCol)
    val tIdx = schema.fieldIndex(tieBreakCol)
    val oOrd = fieldOrdering(schema(oIdx).dataType)
    val tOrd = fieldOrdering(schema(tIdx).dataType)
    // "worst first" ordering so the heap head is the eviction
    // candidate: worse = smaller order value (null order worst),
    // then larger tie-break (null tie-break worst) — exactly the
    // reverse of the final window's
    // (desc_nulls_last(order), asc_nulls_last(tie)) goodness order
    val heapOrd: Ordering[Row] = (x: Row, y: Row) => {
      val xo = x.get(oIdx); val yo = y.get(oIdx)
      val c = (xo, yo) match {
        case (null, null) => 0
        case (null, _)    => 1  // null score is worse → PQ-greater
        case (_, null)    => -1
        case _            => oOrd.compare(yo, xo) // larger score better → PQ-smaller
      }
      if (c != 0) c
      else {
        val xt = x.get(tIdx); val yt = y.get(tIdx)
        (xt, yt) match {
          case (null, null) => 0
          case (null, _)    => 1  // null tie-break loses the tie
          case (_, null)    => -1
          case _            => tOrd.compare(xt, yt) // smaller tie better → PQ-smaller
        }
      }
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
      .orderBy(desc_nulls_last(orderCol), asc_nulls_last(tieBreakCol))
    survivors
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
