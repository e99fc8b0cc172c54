package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TopK

/** Grouped top-k with per-partition pre-pruning vs the naive window. */
class TopKSpec extends AnyFunSuite with SparkTestSession {

  test("matches the naive per-group window incl. ties, across partitions") {
    import spark.implicits._
    // 6 groups spread over 8 partitions, deliberate score ties
    val df = (1 to 4000)
      .map(i => (s"g${i % 6}", i.toLong, ((i * 37) % 50).toLong))
      .toDF("g", "id", "score")
      .repartition(8)
    val got = TopK.perGroup(df, Seq("g"), "score", "id", k = 5)
      .select("g", "id", "score", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val w = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == want)
  }

  test("groups smaller than k survive whole") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L)).toDF("g", "id", "score")
    val got = TopK.perGroup(df, Seq("g"), "score", "id", k = 5)
    assert(got.count() == 3)
  }
}
