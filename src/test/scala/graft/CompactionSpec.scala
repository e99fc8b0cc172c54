package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** [[EventStreams.compactLanding]] — the maintenance half of the
  * landing file-count story: `appendFiles` bounds what each
  * micro-batch adds, compaction rewrites the linear-in-batch-count
  * accretion back to O(targetFiles) between stream sessions, without
  * changing a row and without costing the carried blooms a reseed. */
class CompactionSpec extends AnyFunSuite with SparkTestSession {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def visibleFiles(dir: String): Seq[String] =
    graft.core.Tables.listing(spark, dir).filter { part =>
      val p = part.substring(0, part.lastIndexOf(':', part.lastIndexOf(':') - 1))
      val base = p.substring(p.lastIndexOf('/') + 1)
      !(base.startsWith("_") || base.startsWith("."))
    }

  private def landedTexts(dir: String): Seq[(Long, String)] =
    spark.read.parquet(dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

  test("compactLanding: accreted landing rewritten to targetFiles, rows and carry preserved") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val landing = tmpDir("graft-compact") + "/corpus"
    val key = EventStreams.landingKey(spark, landing)
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.ingestDedup(
      input.toDF().toDF("doc_id", "text"), landing, tmpDir("graft-compact-ck"))
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      q.processAllAvailable()
      input.addData((4L, "delta"), (5L, "epsilon"), (6L, "zeta"))
      q.processAllAvailable()
      input.addData((7L, "eta"), (8L, "theta"), (9L, "iota"))
      q.processAllAvailable()
    } finally q.stop()
    val before = landedTexts(landing)
    assert(before.size == 9)
    assert(visibleFiles(landing).size > 2, "fixture must actually be accreted")
    assert(EventStreams.carriedBlooms.containsKey(key), "carry expected before compaction")

    val stats = EventStreams.compactLanding(spark, landing, targetFiles = 2)
    assert(stats.filesBefore > 2 && stats.filesAfter <= 2)
    assert(stats.rows == 9L && stats.carriesKept)
    assert(visibleFiles(landing).size == stats.filesAfter)
    assert(landedTexts(landing) == before, "compaction must not change a row")

    // the carry survived WITH the compacted listing's fingerprint —
    // the next batch trusts it instead of paying a reseed scan
    val carry = EventStreams.carriedBlooms.get(key)
    assert(carry != null &&
      carry.landingFp == graft.core.Tables.listing(spark, landing).mkString(";"))

    // and it still deduplicates: a new stream on the compacted landing
    // rejects a landed text, admits a fresh one
    val in2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.ingestDedup(
      in2.toDF().toDF("doc_id", "text"), landing, tmpDir("graft-compact-ck2"))
    try {
      in2.addData((10L, "alpha"), (11L, "kappa"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(landedTexts(landing) == (before :+ (11L, "kappa")).sorted)
  }

  test("compactLanding: no-op when the landing is already at or under targetFiles") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val landing = tmpDir("graft-compact-noop") + "/corpus"
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.ingestDedup(
      input.toDF().toDF("doc_id", "text"), landing, tmpDir("graft-compact-noop-ck"))
    try {
      input.addData((1L, "alpha")); q.processAllAvailable()
    } finally q.stop()
    val before = graft.core.Tables.listing(spark, landing)
    val stats = EventStreams.compactLanding(spark, landing, targetFiles = 8)
    assert(stats.rows == -1L && stats.filesBefore == stats.filesAfter)
    assert(graft.core.Tables.listing(spark, landing) == before,
      "no-op must not touch the landing")
  }

  test("compactLanding and ingest streams exclude each other on one landing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val landing = tmpDir("graft-compact-excl") + "/corpus"
    val key = EventStreams.landingKey(spark, landing)
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.ingestDedup(
      input.toDF().toDF("doc_id", "text"), landing, tmpDir("graft-compact-excl-ck"))
    try {
      input.addData((1L, "alpha"), (2L, "beta")); q.processAllAvailable()
      // stream active -> compaction refused
      val err = intercept[IllegalStateException] {
        EventStreams.compactLanding(spark, landing, 1)
      }
      assert(err.getMessage.contains(landing))
    } finally q.stop()
    // compaction holding the slot (runId == null) -> stream refused.
    // (clear the stopped stream's stale registration first — takeover
    // normally happens lazily on the next acquire)
    EventStreams.activeIngests.remove(key)
    val held = new EventStreams.IngestReg(spark)
    assert(EventStreams.activeIngests.putIfAbsent(key, held) == null)
    try {
      val in2 = MemoryStream[(Long, String)]
      intercept[IllegalStateException] {
        EventStreams.ingestDedup(
          in2.toDF().toDF("doc_id", "text"), landing, tmpDir("graft-compact-excl-ck2"))
      }
      intercept[IllegalStateException] {
        EventStreams.compactLanding(spark, landing, 1)
      }
    } finally EventStreams.activeIngests.remove(key, held)
  }

  test("compactLanding refuses a hive-partitioned dir (would flatten the pruning layout)") {
    import spark.implicits._
    val dir = tmpDir("graft-compact-part") + "/landing"
    Seq((1L, "2026-01", "a"), (2L, "2026-02", "b"), (3L, "2026-02", "c"))
      .toDF("id", "month", "text")
      .write.partitionBy("month").parquet(dir)
    val err = intercept[IllegalArgumentException] {
      EventStreams.compactLanding(spark, dir, 1)
    }
    assert(err.getMessage.contains("hive-partitioned"))
    // untouched: both partitions still present, rows intact
    assert(spark.read.parquet(dir).count() == 3)
    assert(new java.io.File(dir).listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("month=")) == 2)
  }

  test("compactLanding: an out-of-band append racing the swap aborts, landing untouched") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val landing = tmpDir("graft-compact-race") + "/corpus"
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.ingestDedup(
      input.toDF().toDF("doc_id", "text"), landing, tmpDir("graft-compact-race-ck"))
    try {
      input.addData((1L, "alpha"), (2L, "beta")); q.processAllAvailable()
      input.addData((3L, "gamma"), (4L, "delta")); q.processAllAvailable()
    } finally q.stop()
    val before = landedTexts(landing)
    EventStreams.preSwapHook = { _ =>
      // a foreign writer lands a row between the compaction read and
      // the swap — exactly the rows a blind swap would destroy
      Seq((99L, "raced")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(landing)
    }
    try {
      val err = intercept[IllegalStateException] {
        EventStreams.compactLanding(spark, landing, 1)
      }
      assert(err.getMessage.contains("changed during compaction"))
    } finally EventStreams.preSwapHook = _ => ()
    // the landing keeps BOTH the original rows and the raced-in row,
    // and no temp debris survives the abort
    assert(landedTexts(landing) == (before :+ (99L, "raced")).sorted)
    val parent = new java.io.File(landing).getParentFile
    assert(parent.listFiles().map(_.getName).forall(!_.contains(".compact-tmp-")),
      "aborted compaction must clean its temp dir")
  }
}
