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

  test("null scores and tie-breaks rank last, matching the nulls-last window") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Long)](
      ("a", 1L, null), ("a", 2L, 20L), ("a", 3L, 20L), ("a", null, 20L),
      ("a", 4L, 5L), ("b", 5L, null), ("b", null, null), ("b", 6L, 1L))
      .toDF("g", "id", "score")
      .repartition(4)
    val got = TopK.perGroup(df, Seq("g"), "score", "id", k = 3)
      .select("g", "id", "score", "rk")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2), r.getInt(3))).toSet
    val w = Window.partitionBy("g").orderBy(desc_nulls_last("score"), asc_nulls_last("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .collect().map(r => (r.getString(0), r.get(1), r.get(2), r.getInt(3))).toSet
    assert(got == want)
  }

  test("string tie-breaks use Spark's UTF8 binary order, not Java UTF-16 order") {
    import spark.implicits._
    // U+10000 (surrogate pair, UTF-8 F0 90 80 80) vs U+E000 (EE 80 80):
    // Java compareTo says U+10000 < U+E000; Spark's binary sort says
    // the opposite — the heap pre-prune must agree with the window
    val lo = "\uD800\uDC00" // U+10000
    val hi = "\uE000"
    val df = Seq(("a", lo, 5L), ("a", hi, 5L)).toDF("g", "name", "score")
      .coalesce(1) // same partition: the heap must evict the right one
    val got = TopK.perGroup(df, Seq("g"), "score", "name", k = 1)
      .select("name").collect().map(_.getString(0)).toSeq
    val w = Window.partitionBy("g").orderBy(desc_nulls_last("score"), asc_nulls_last("name"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 1)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(got == want && got == Seq(hi))
  }

  test("double-typed scores rank by value, not a truncated long") {
    import spark.implicits._
    // 1.9 vs 1.2: a long-truncating comparison would call these tied
    val df = Seq(("a", 1L, 1.2), ("a", 2L, 1.9), ("a", 3L, 1.5), ("a", 4L, 0.4))
      .toDF("g", "id", "score").repartition(3)
    val got = TopK.perGroup(df, Seq("g"), "score", "id", k = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }
}
