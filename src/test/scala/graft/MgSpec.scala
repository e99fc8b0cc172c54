package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries frequent-items summary (`mg_agg`, q89): the
  * superset guarantee under adversarial partitioning, exactness when
  * distinct items fit, the count lower-bound property, and refusals.
  * The summary CONTENTS are merge-order-dependent by design, so every
  * assertion here is about the GUARANTEES, not byte equality. */
class MgSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(call_function("mg_agg", col("tok"), lit(k)).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Deterministic skewed stream: token "hh<i>" appears 1000-100*i
    * times for i in 0..4 (heavy), plus 2000 singletons. */
  private def skewed = {
    val rows =
      (0 until 5).flatMap(i => Seq.fill(1000 - 100 * i)(s"hh$i")) ++
      (0 until 2000).map(i => s"tail$i")
    rows.toDF("tok")
  }

  test("mg_agg keeps every item above n/(k+1), with counts at most n/(k+1) under-true") {
    val n = 5 * 1000 - (0 + 100 + 200 + 300 + 400) + 2000 // 6000
    val k = 16
    for (parts <- Seq(1, 7, 32)) {
      val s = summary(skewed.repartition(parts), k)
      assert(s.size <= k)
      for (i <- 0 until 5) {
        val truth = 1000L - 100 * i
        assert(truth > n / (k + 1), "test setup: must be a guaranteed heavy hitter")
        assert(s.contains(s"hh$i"), s"hh$i missing at $parts partitions: $s")
        val kept = s(s"hh$i")
        assert(kept <= truth && truth - kept <= n / (k + 1) * 2 + k,
          s"hh$i kept=$kept truth=$truth at $parts partitions")
      }
    }
  }

  test("mg_agg is exact when the group's distinct items fit in k") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("tok")
    for (parts <- Seq(1, 3)) {
      assert(summary(df.repartition(parts), 10) ==
        Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    }
  }

  test("mg_agg skips nulls and rejects bad arguments") {
    val withNull = Seq(Some("x"), None, Some("x")).toDF("tok")
    assert(summary(withNull, 4) == Map("x" -> 2L))
    for (bad <- Seq("0", "-2", s"${(1 << 16) + 1}"))
      assert(intercept[Exception] {
        Seq("a").toDF("tok").selectExpr(s"mg_agg(tok, $bad)").collect()
      }.getMessage.contains("mg_agg"))
    assert(intercept[Exception] {
      Seq(1L).toDF("v").selectExpr("mg_agg(v, 4)").collect()
    }.getMessage.contains("STRING"))
  }

  test("mg_union_agg: stored per-shard summaries re-merge with the superset guarantee intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mg-shards").toString + "/summaries"
    val df = skewed.withColumn("shard",
      org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.xxhash64(col("tok"))) % 5)
    df.groupBy("shard")
      .agg(call_function("mg_agg", col("tok"), lit(16)).as("summary"))
      .write.parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(call_function("mg_union_agg", col("summary"), lit(16)).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every guaranteed heavy hitter of the COMBINED stream survives
    // the land-and-remerge round trip (n=6000, k=16 -> bound 352)
    for (i <- 0 until 5) assert(merged.contains(s"hh$i"), s"hh$i lost: $merged")
    assert(merged.size <= 16)
    // different-k summaries are refused, not silently mis-merged
    assert(intercept[Exception] {
      spark.read.parquet(dir)
        .selectExpr("mg_union_agg(summary, 8)").collect()
    }.getMessage.contains("mg_union_agg"))
  }

  test("mg_union_agg refuses summaries with null entries or null struct fields") {
    // hand-crafted corrupt input: a null struct would NPE on the item
    // read (or read cnt as 0) — must be refused with a clear message
    assert(intercept[Exception] {
      spark.sql("SELECT mg_union_agg(s, 4) FROM (SELECT " +
        "array(named_struct('item', 'a', 'cnt', 2L), " +
        "CAST(NULL AS STRUCT<item: STRING, cnt: BIGINT>)) AS s)").collect()
    }.getMessage.contains("null entry"))
    assert(intercept[Exception] {
      spark.sql("SELECT mg_union_agg(s, 4) FROM (SELECT " +
        "array(named_struct('item', CAST(NULL AS STRING), 'cnt', 2L)) AS s)").collect()
    }.getMessage.contains("null item or cnt"))
    assert(intercept[Exception] {
      spark.sql("SELECT mg_union_agg(s, 4) FROM (SELECT " +
        "array(named_struct('item', 'a', 'cnt', CAST(NULL AS BIGINT))) AS s)").collect()
    }.getMessage.contains("null item or cnt"))
  }

  test("q89 shape: the MG candidate set + exact confirm equals the direct group-count") {
    // end-to-end equivalence on a frame where heavy hitters exist:
    // the confirmed output must be IDENTICAL to the naive formulation
    val df = skewed
    val total = df.count()
    val cands = df.agg(call_function("mg_agg", col("tok"), lit(64)).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val confirmed = df.filter(col("tok").isInCollection(cands))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") * 200 >= lit(total))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = df.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") * 200 >= lit(total))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(confirmed == direct && direct.nonEmpty)
  }
}
