package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof of the q71 claim: landing grid cells partitioned
  * by the coarse Z-order bucket makes a lat/lon BOX query prune to
  * the box's buckets — 2-D locality collapsed onto a 1-D layout key.
  * The box's bucket set is derived driver-side with the same Morton
  * interleave, the scan is pinned to touch only those partitions, and
  * the pruned result must equal the plain box filter over everything. */
class ZOrderLandingSpec extends AnyFunSuite with SparkTestSession {

  private def morton(lat: Long, lon: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 8) {
      z |= ((lat >> b) & 1L) << (2 * b)
      z |= ((lon >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("z-bucket-partitioned landing prunes a lat/lon box to its buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zland").toString + "/cells"
    // the full reference grid: 91 lat × 61 lon cells
    val cells = (for (la <- 0L until 91L; lo <- 0L until 61L) yield (la, lo)).toSeq
      .toDF("lat_idx", "lon_idx")
      .withColumn("z", call_function("interleave_bits", col("lat_idx"), col("lon_idx")))
      .withColumn("z_bucket", shiftright(col("z"), 6))
    cells.write.partitionBy("z_bucket").mode("overwrite").parquet(dir)

    val (la0, la1, lo0, lo1) = (10L, 20L, 15L, 25L)
    val boxBuckets = (for (la <- la0 to la1; lo <- lo0 to lo1)
      yield morton(la, lo) >> 6).distinct.sorted
    val totalBuckets = spark.read.parquet(dir).select("z_bucket").distinct().count()
    assert(boxBuckets.size < totalBuckets / 2,
      s"box should cover a minority of buckets (${boxBuckets.size} of $totalBuckets)")

    val box = col("lat_idx").between(la0, la1) && col("lon_idx").between(lo0, lo1)
    val pruned = spark.read.parquet(dir)
      .filter(col("z_bucket").isin(boxBuckets: _*) && box)
    // partition pruning is visible in the plan: the scan's partition
    // count equals the box's bucket count, not the grid's
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the plan"))
    assert(scan.metadata("PartitionFilters").contains("z_bucket"),
      "z_bucket predicate did not become a partition filter")
    val got = pruned.select("lat_idx", "lon_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = cells.filter(box).select("lat_idx", "lon_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "bucket pruning changed the box result")
    val partitionsRead = scan.selectedPartitions.partitionCount
    assert(partitionsRead == boxBuckets.size,
      s"scan read $partitionsRead partitions, box needs ${boxBuckets.size}")
  }

  test("the zland DSv2 write lands the same layout declaratively, and appends") {
    import spark.implicits._
    import graft.sources.ZOrderLanding
    val dir = java.nio.file.Files.createTempDirectory("graft-zdsv2").toString + "/cells"
    val half1 = (for (la <- 0L until 46L; lo <- 0L until 61L) yield (la, lo)).toSeq
      .toDF("lat_idx", "lon_idx")
    val half2 = (for (la <- 46L until 91L; lo <- 0L until 61L) yield (la, lo)).toSeq
      .toDF("lat_idx", "lon_idx")

    half1.write.format("zland").option("path", dir).mode("overwrite").save()
    // incremental drop: append must not clobber the landed buckets
    half2.write.format("zland").option("path", dir).mode("append").save()

    val landed = spark.read.parquet(dir)
    assert(landed.count() == 91L * 61L, "append lost or duplicated rows")
    // layout contract: z_bucket is a partition column and equals the
    // driver-side morton >> 6 for every row
    assert(landed.schema.fieldNames.contains("z_bucket"))
    // partition-column values come back inferred from dir names (int)
    val bad = landed.collect().count { r =>
      val (la, lo) = (r.getAs[Long]("lat_idx"), r.getAs[Long]("lon_idx"))
      r.getAs[Number]("z_bucket").longValue() != (morton(la, lo) >> 6)
    }
    assert(bad == 0, s"$bad rows landed in the wrong bucket")

    // the pruned box scan works identically over the DSv2-landed dir
    val (la0, la1, lo0, lo1) = (10L, 20L, 15L, 25L)
    val got = ZOrderLanding.boxScan(spark, dir, la0, la1, lo0, lo1)
      .select("lat_idx", "lon_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (la <- la0 to la1; lo <- lo0 to lo1) yield (la, lo)).toSet
    assert(got == want)
    // overwrite mode really truncates (idempotent re-land)
    half1.write.format("zland").option("path", dir).mode("overwrite").save()
    assert(spark.read.parquet(dir).count() == 46L * 61L, "overwrite did not truncate")
  }
}
