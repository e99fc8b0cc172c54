package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Decontaminate

/** Landed-benchmark decontamination: the artifact round-trip (land →
  * probe), shared-gram counting semantics on hand-computed inputs,
  * empty/NULL-text behavior, suite-version overwrite, and the Bloom
  * sidecar contract. */
class DecontaminateSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft-decon").toString + "/bench"

  test("probe counts a doc's DISTINCT grams shared with the landed set; disjoint docs are clean") {
    val dir = freshDir()
    // benchmark: one doc, 3-grams = {a b c, b c d, c d e}
    Decontaminate.landBenchmark(
      Seq((0L, "a b c d e")).toDF("doc_id", "text"), dir)
    assert(spark.read.parquet(dir).count() == 3)
    val r = Decontaminate.probe(Seq(
        (1L, "a b c d e"),           // all 3 grams shared
        (2L, "x a b c y"),           // only 'a b c'
        (3L, "a b c a b c a b c"),   // repeated shared gram counts ONCE (distinct)
        (4L, "z z z z z"),           // disjoint
        (5L, "a b"),                 // under 3 tokens: no grams
        (6L, "")).toDF("doc_id", "text"), dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(r(1L) == ((3L, 0L)))
    assert(r(2L) == ((1L, 0L)))
    assert(r(3L) == ((1L, 0L)))
    assert(r(4L) == ((0L, 1L)))
    assert(r(5L) == ((0L, 1L)))
    assert(r(6L) == ((0L, 1L)))
  }

  test("duplicate ids merge as one document — one row, summed hits (the documented id-keyed contract)") {
    val dir = freshDir()
    Decontaminate.landBenchmark(Seq((0L, "a b c d e")).toDF("doc_id", "text"), dir)
    val r = Decontaminate.probe(
        Seq((1L, "a b c z z"), (1L, "c d e z z")).toDF("doc_id", "text"), dir)
      .collect()
    assert(r.length == 1 && r(0).getLong(1) == 2L && r(0).getLong(2) == 0L,
      "two rows sharing an id must merge to one report row with summed hits")
  }

  test("NULL text is the empty document: a clean report row, not a vanished doc") {
    val dir = freshDir()
    Decontaminate.landBenchmark(Seq((0L, "a b c d")).toDF("doc_id", "text"), dir)
    val r = Decontaminate.probe(
        Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), dir)
      .collect()
    assert(r.length == 1 && r(0).getLong(1) == 0L && r(0).getLong(2) == 1L)
  }

  test("landBenchmark refuses a zero-gram benchmark BEFORE the overwrite — the previous artifact survives (ADVICE r17)") {
    val dir = freshDir()
    Decontaminate.landBenchmark(Seq((0L, "a b c")).toDF("doc_id", "text"), dir)
    val e = intercept[IllegalArgumentException](
      Decontaminate.landBenchmark(
        Seq((1L, "a b"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"), dir))
    assert(e.getMessage.contains("zero 3-gram"))
    // refusal happened before the overwrite: the old suite still probes
    val r = Decontaminate.probe(Seq((9L, "a b c")).toDF("doc_id", "text"), dir)
      .collect()
    assert(r.length == 1 && r(0).getLong(1) == 1L,
      "the refused landing must not have destroyed the previous set")
  }

  test("a re-land never reuses a part-file name — a pinned file-list snapshot fails loudly, never silently swaps sets") {
    val dir = freshDir()
    Decontaminate.landBenchmark(Seq((0L, "a b c")).toDF("doc_id", "text"), dir)
    val before = Decontaminate.landedGxFiles(spark, dir).toSet
    Decontaminate.landBenchmark(Seq((0L, "x y z")).toDF("doc_id", "text"), dir)
    val after = Decontaminate.landedGxFiles(spark, dir).toSet
    assert(before.nonEmpty && after.nonEmpty && before.intersect(after).isEmpty,
      "per-job UUID part names must make every re-land disjoint")
    // the streaming gate's snapshot mechanism: reading the pinned
    // (now-deleted) list is a LOUD failure
    intercept[Exception](spark.read.parquet(before.toSeq: _*).collect())
  }

  test("re-landing overwrites the previous suite version whole") {
    val dir = freshDir()
    Decontaminate.landBenchmark(Seq((0L, "a b c")).toDF("doc_id", "text"), dir)
    Decontaminate.landBenchmark(Seq((0L, "x y z")).toDF("doc_id", "text"), dir)
    val r = Decontaminate.probe(
        Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text"), dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r(1L) == 0L && r(2L) == 1L,
      "the old suite's grams must not survive a re-land")
  }

  test("the Bloom sidecar has no false negatives over the landed set and ignores the parquet reader") {
    val dir = freshDir()
    val bench = (0L until 50L).map(i => (i, s"w$i x$i y$i z$i")).toDF("doc_id", "text")
    Decontaminate.landBenchmark(bench, dir)
    val blob = Decontaminate.loadBloom(spark, dir)
    val landed = spark.read.parquet(dir)
    // every landed gram must probe positive (no false negatives)
    val missed = landed.filter(!coalesce(
        call_function("bloom_might_contain", lit(blob), col("gx")), lit(false)))
      .count()
    assert(missed == 0L, "bloom false negative over its own build set")
    // the sidecar must not surface as a parquet column/file; both join
    // keys (oracle md5 bridge, engine xxhash64) land per gram
    assert(landed.columns.sorted.toSeq == Seq("gram", "gx"))
  }

  test("loadBloomPinned refuses a sidecar built over DIFFERENT gram files (re-land race)") {
    val dir = freshDir()
    Decontaminate.landBenchmark(
      Seq((0L, "a b c d e")).toDF("doc_id", "text"), dir)
    // consistent artifact: pinned files == listed files
    val (_, files) = Decontaminate.loadBloomPinned(spark, dir)
    assert(files == Decontaminate.landedGxFiles(spark, dir))
    // simulate the re-land window (parquet overwritten, sidecar not
    // yet): rename a part file — per-job UUID names mean a real
    // re-land never reuses one
    val p = new java.io.File(new java.net.URI(files.head))
    val renamed = new java.io.File(p.getParent, "part-relanded.snappy.parquet")
    assert(p.renameTo(renamed))
    val e = intercept[IllegalArgumentException] {
      Decontaminate.loadBloomPinned(spark, dir)
    }
    assert(e.getMessage.contains("re-land"))
  }

  test("loadBloomPinned refuses a headerless (pre-format/truncated) sidecar") {
    val dir = freshDir()
    Decontaminate.landBenchmark(
      Seq((0L, "a b c d e")).toDF("doc_id", "text"), dir)
    // overwrite the sidecar with a raw blob (no GBF1 header); drop the
    // Hadoop checksum sidecar too or the read fails on CRC, not format
    val raw = Decontaminate.loadBloom(spark, dir)
    Files.write(java.nio.file.Paths.get(dir, "_bloom.bin"), raw)
    Files.deleteIfExists(java.nio.file.Paths.get(dir, "._bloom.bin.crc"))
    val e = intercept[IllegalArgumentException] {
      Decontaminate.loadBloom(spark, dir)
    }
    assert(e.getMessage.contains("GBF1"))
  }
}
