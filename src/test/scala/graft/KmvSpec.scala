package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KMV distinct-count sketch (`kmv_agg`, q88): sketch contents,
  * merge/partitioning invariance (the property that makes it a SKETCH
  * — per-partition partials union losslessly), estimate accuracy, and
  * the small-group exactness contract. */
class KmvSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    df.agg(call_function("kmv_agg", col("hv"), lit(k)).as("mins"))
      .head().getSeq[Long](0)

  test("kmv_agg keeps the k smallest distinct values, sorted ascending") {
    val df = Seq(50L, 10L, 30L, 10L, 20L, 40L, 30L).toDF("hv")
    assert(sketch(df, 3) == Seq(10L, 20L, 30L))
    // fewer distinct values than k: the sketch IS the distinct set
    assert(sketch(df, 100) == Seq(10L, 20L, 30L, 40L, 50L))
  }

  test("kmv_agg is invariant under partitioning (partial sketches union losslessly)") {
    // deterministic pseudo-hashes via xxhash64 of a sequence — no RNG
    val vals = spark.range(0, 5000)
      .select(xxhash64(col("id")).as("hv"))
    val one = vals.repartition(1)
    val many = vals.repartition(13)
    assert(sketch(one, 64) == sketch(many, 64),
      "sketch must not depend on how rows were partitioned")
    // and grouped: per-group sketches equal under both layouts
    val grouped = spark.range(0, 5000)
      .select((col("id") % 3).as("g"), xxhash64(col("id")).as("hv"))
    def bySketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(call_function("kmv_agg", col("hv"), lit(32)).as("mins"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bySketch(grouped.repartition(1)) == bySketch(grouped.repartition(7)))
  }

  test("kmv estimate tracks the true distinct count within the k-sized error band") {
    // n distinct uniform-ish 60-bit hashes (md5-derived like q88's
    // carrier — deterministic across runs)
    val n = 20000
    val k = 256
    val hv = conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
      .cast("bigint")
    val mins = sketch(spark.range(0, n).select(hv.as("hv")), k)
    assert(mins.size == k)
    val est = (k - 1).toDouble / (mins.last.toDouble / math.pow(2.0, 60))
    // standard KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs true $n")
  }

  test("kmv_union_agg: landed per-shard sketches re-aggregate to EXACTLY the whole-corpus sketch") {
    // the persistence round-trip the mergeable contract promises: one
    // sketch row per shard landed to parquet, re-aggregated later
    // WITHOUT the raw keys — must equal the direct whole-data sketch
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-shards").toString + "/sketches"
    val raw = spark.range(0, 20000)
      .select((col("id") % 7).as("shard"), xxhash64(col("id")).as("hv"))
    raw.groupBy("shard")
      .agg(call_function("kmv_agg", col("hv"), lit(128)).as("sketch"))
      .write.parquet(dir)
    val fromShards = spark.read.parquet(dir)
      .agg(call_function("kmv_union_agg", col("sketch"), lit(128)).as("s"))
      .head().getSeq[Long](0)
    val direct = sketch(raw, 128)
    assert(fromShards == direct, "union of landed shard sketches must be lossless")
    // subset query: union of three shards == direct sketch of those shards
    val some = spark.read.parquet(dir).filter(col("shard") < 3)
      .agg(call_function("kmv_union_agg", col("sketch"), lit(128)).as("s"))
      .head().getSeq[Long](0)
    assert(some == sketch(raw.filter(col("shard") < 3), 128))
    // a sketch from a different k is refused, not silently mis-merged
    assert(intercept[Exception] {
      spark.range(0, 500).select(xxhash64(col("id")).as("hv"))
        .agg(call_function("kmv_agg", col("hv"), lit(64)).as("s"))
        .selectExpr("kmv_union_agg(s, 32)").collect()
    }.getMessage.contains("kmv_union_agg"))
  }

  test("kmv_set_est: exact when unsaturated, theta estimates when saturated") {
    // exact regime: tiny disjoint-ish sets, k well above both
    val exact = spark.sql(
      "SELECT kmv_set_est(kmv_agg(CASE WHEN v % 2 = 0 THEN v END, 64)," +
      "                   kmv_agg(CASE WHEN v % 3 = 0 THEN v END, 64), 64, 60) AS e " +
      "FROM (SELECT CAST(id AS BIGINT) AS v FROM range(0, 60))")
      .select("e.union_est", "e.intersect_est", "e.jaccard_est").head()
    // evens 30, multiples of 3: 20, both (mult of 6): 10 -> union 40
    assert(exact.getDouble(0) == 40.0 && exact.getDouble(1) == 10.0)
    assert(math.abs(exact.getDouble(2) - 0.25) < 1e-12)

    // estimating regime: two overlapping 5000-element sets hashed into
    // [0, 2^60), k=256 -> both saturate; estimates within 4 sigma
    val est = spark.sql(
      "SELECT kmv_set_est(" +
      "  kmv_agg(CASE WHEN id < 5000 THEN h END, 256)," +
      "  kmv_agg(CASE WHEN id >= 2500 THEN h END, 256), 256, 60) AS e " +
      "FROM (SELECT id, CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h " +
      "      FROM range(0, 7500))")
      .select("e.union_est", "e.intersect_est", "e.jaccard_est").head()
    assert(math.abs(est.getDouble(0) - 7500) / 7500 < 0.25, s"union ${est.getDouble(0)}")
    assert(math.abs(est.getDouble(1) - 2500) / 2500 < 0.4, s"inter ${est.getDouble(1)}")

    // a sketch built with a different k is refused, not mis-scaled
    assert(intercept[Exception] {
      spark.sql("SELECT kmv_set_est(kmv_agg(v, 8), kmv_agg(v, 4), 4, 60) FROM " +
        "(SELECT CAST(id AS BIGINT) AS v FROM range(0, 100))").collect()
    }.getMessage.contains("kmv_set_est"))
  }

  test("kmv_set_est refuses out-of-domain and degenerate sketches instead of mis-estimating") {
    // signed hashes (raw xxhash64) produce negative sketch values —
    // negative θ would silently yield negative estimates; must refuse
    val neg = intercept[Exception] {
      spark.sql("SELECT kmv_set_est(array(-5L, 3L), array(1L, 2L), 64, 60)").collect()
    }
    assert(neg.getMessage.contains("out of domain"), neg.getMessage)
    // values >= 2^domain_bits (wrong domain_bits) likewise refused
    assert(intercept[Exception] {
      spark.sql(s"SELECT kmv_set_est(array(1L, ${1L << 61}L), array(1L), 64, 60)").collect()
    }.getMessage.contains("out of domain"))
    // θ=0: both sketches saturated with k-th value 0 → divide-by-zero
    // regime; refused, not Infinity/NaN
    assert(intercept[Exception] {
      spark.sql("SELECT kmv_set_est(array(0L, 0L), array(0L, 0L), 2, 60)").collect()
    }.getMessage.contains("θ=0"))
    // null elements inside a sketch array are corrupt input, refused
    assert(intercept[Exception] {
      spark.sql("SELECT kmv_set_est(array(CAST(NULL AS BIGINT), 3L), array(1L), 64, 60)").collect()
    }.getMessage.contains("null"))
  }

  test("kmv_union_agg refuses sketches containing null elements") {
    // a null read as getLong would inject a phantom 0 minimum,
    // silently corrupting every downstream estimate
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_union_agg(s, 4) FROM " +
        "(SELECT array(CAST(NULL AS BIGINT), 7L) AS s)").collect()
    }
    assert(e.getMessage.contains("null entry"), e.getMessage)
  }

  test("kmv_agg rejects bad arguments loudly") {
    val df = Seq(1L).toDF("hv")
    // non-integer / non-positive / over-cap k
    for (bad <- Seq("0", "-1", s"${(1 << 20) + 1}"))
      assert(intercept[Exception] {
        df.selectExpr(s"kmv_agg(hv, $bad)").collect()
      }.getMessage.contains("kmv_agg"))
    // non-bigint key
    assert(intercept[Exception] {
      Seq("x").toDF("s").selectExpr("kmv_agg(s, 4)").collect()
    }.getMessage.contains("BIGINT"))
  }
}
