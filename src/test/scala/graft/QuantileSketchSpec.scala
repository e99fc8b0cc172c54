package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QuantileSketch

/** Bottom-k quantile-sketch semantics: exactness at or below k, the
  * mergeable property (shard-merge ≡ direct global build, entry for
  * entry), partitioning invariance, rank-error concentration on a
  * large group, and argument guards. */
class QuantileSketchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def sketchEntries(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Long, Long)]] =
    df.collect().map { r =>
      r.getString(0) -> r.getSeq[Row](r.fieldIndex("sketch"))
        .map(e => (e.getLong(0), e.getLong(1), e.getLong(2)))
    }.toMap

  test("groups at or below k are sampled whole: quantiles are EXACT under the index rule") {
    val docs = (0L until 20L).map(i => (i, "g", i * 10)).toDF("id", "g", "v")
    val sk = QuantileSketch.build(docs, Seq("g"), "id", "v", k = 32)
    val row = sk.select(col("n_rows"), size(col("sketch")),
        QuantileSketch.quantile(col("sketch"), 0.5),
        QuantileSketch.quantile(col("sketch"), 0.9),
        QuantileSketch.quantile(col("sketch"), 0.0),
        QuantileSketch.quantile(col("sketch"), 1.0)).head()
    assert(row.getLong(0) == 20 && row.getInt(1) == 20)
    // sorted values 0,10,...,190: idx(0.5) = floor(0.5*19)+1 = 10 → 90
    assert(row.getLong(2) == 90)
    // idx(0.9) = floor(17.1)+1 = 18 → 170
    assert(row.getLong(3) == 170)
    assert(row.getLong(4) == 0 && row.getLong(5) == 190)
  }

  test("shard-merge ≡ direct global build, entry for entry (the mergeable property)") {
    val docs = (0L until 400L).map(i => (i, s"g${i % 3}", (i * 37) % 1000))
      .toDF("id", "g", "v")
    val direct = sketchEntries(
      QuantileSketch.build(docs, Seq("g"), "id", "v", k = 16))
    val merged = sketchEntries(
      QuantileSketch.merge(
        QuantileSketch.build(docs.withColumn("shard", col("id") % 7),
          Seq("g", "shard"), "id", "v", k = 16),
        Seq("g"), k = 16))
    assert(merged == direct)
    // and the exact counts survive the merge
    val counts = QuantileSketch.merge(
        QuantileSketch.build(docs.withColumn("shard", col("id") % 7),
          Seq("g", "shard"), "id", "v", k = 16),
        Seq("g"), k = 16)
      .select("g", "n_rows").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 400 && counts.size == 3)
  }

  test("sketches are partitioning-invariant (deterministic sampling keys, total-order ties)") {
    val docs = (0L until 300L).map(i => (i, "g", i)).toDF("id", "g", "v")
    val a = sketchEntries(QuantileSketch.build(docs, Seq("g"), "id", "v", 8))
    val b = sketchEntries(QuantileSketch.build(docs.repartition(11), Seq("g"), "id", "v", 8))
    assert(a == b)
  }

  test("rank error concentrates: a k=64 sample of 5000 ranks pins p50 inside the true p35–p65") {
    val docs = (0L until 5000L).map(i => (i, "g", i)).toDF("id", "g", "v")
    val est = QuantileSketch.build(docs, Seq("g"), "id", "v", k = 64)
      .select(QuantileSketch.quantile(col("sketch"), 0.5)).head().getLong(0)
    assert(est > 1750 && est < 3250, s"p50 estimate $est drifted past the ±15%-rank band")
  }

  test("argument guards") {
    val docs = Seq((1L, "g", 1L)).toDF("id", "g", "v")
    assert(intercept[IllegalArgumentException](
      QuantileSketch.build(docs, Seq("g"), "id", "v", 0)).getMessage.contains("positive"))
    val sk = QuantileSketch.build(docs, Seq("g"), "id", "v", 4)
    assert(intercept[IllegalArgumentException](
      sk.select(QuantileSketch.quantile(col("sketch"), 1.5))).getMessage.contains("[0,1]"))
  }

  test("null ids/values are refused, not silently sampled (sketch-family hardening rule)") {
    val docs = Seq((Some(1L), "g", Some(5L)), (None, "g", Some(7L)))
      .toDF("id", "g", "v")
    val e = intercept[Exception](
      QuantileSketch.build(docs, Seq("g"), "id", "v", 4).collect())
    assert(e.getMessage != null && e.getMessage.contains("refuses null"),
      s"got: ${e.getMessage}")
    val e2 = intercept[Exception](
      QuantileSketch.build(Seq((Some(1L), "g", None: Option[Long])).toDF("id", "g", "v"),
        Seq("g"), "id", "v", 4).collect())
    assert(e2.getMessage != null && e2.getMessage.contains("refuses null"))
  }

  test("merging above the build bound is refused (a k-4 sketch does not hold the global bottom-8)") {
    val docs = (0L until 100L).map(i => (i, "g", i)).toDF("id", "g", "v")
    val shards = QuantileSketch.build(docs.withColumn("shard", col("id") % 3),
      Seq("g", "shard"), "id", "v", k = 4)
    val e = intercept[Exception](
      QuantileSketch.merge(shards, Seq("g"), k = 8).collect())
    assert(e.getMessage != null && e.getMessage.contains("cannot merge"),
      s"got: ${e.getMessage}")
    // merging at or below the build bound stays legal
    assert(QuantileSketch.merge(shards, Seq("g"), k = 4).count() == 1)
    assert(QuantileSketch.merge(shards, Seq("g"), k = 2).count() == 1)
  }

  test("merge refuses null/empty sketch arrays instead of silently dropping their n_rows") {
    val docs = (0L until 10L).map(i => (i, "g", i)).toDF("id", "g", "v")
    val good = QuantileSketch.build(docs, Seq("g"), "id", "v", k = 4)
    // a bare posexplode would emit ZERO rows for these, vanishing the
    // row's count (and an all-empty group entirely) from the merge
    for (broken <- Seq(
        good.withColumn("sketch", filter(col("sketch"), _ => lit(false))),
        good.withColumn("sketch",
          lit(null).cast(good.schema("sketch").dataType)))) {
      val e = intercept[Exception](
        QuantileSketch.merge(broken, Seq("g"), k = 4).collect())
      assert(e.getMessage != null && e.getMessage.contains("refuses null/empty"),
        s"got: ${e.getMessage}")
    }
  }

  test("quantile of an empty sketch is NULL, not an index error") {
    val sk = QuantileSketch.build(
        Seq((1L, "g", 1L)).toDF("id", "g", "v"), Seq("g"), "id", "v", 4)
      .withColumn("sketch", filter(col("sketch"), _ => lit(false)))
    assert(sk.select(QuantileSketch.quantile(col("sketch"), 0.5)).head().isNullAt(0))
  }
}
