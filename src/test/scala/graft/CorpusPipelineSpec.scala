package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.{ChunkDedup, Pii, Text}
import graft.pipeline.CorpusPipeline

/** End-to-end corpus-pipeline integration: the LLM-data operators
  * compose into one flow over the real test corpus — cleanup → PII
  * scrub → exact dedup → chunk-level dedup → quality filter →
  * deterministic split — and the whole chain is reproducible. Each
  * stage is oracled/spec'd on its own elsewhere; this spec pins that
  * their schemas and semantics actually CHAIN (the property a library
  * user depends on and no per-operator test exercises). */
class CorpusPipelineSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.001"

  // the production composition (graft.pipeline.CorpusPipeline) — the
  // same object RunCorpus drives from the CLI; stages restricted to
  // the documents table's columns
  private def pipeline(): DataFrame =
    CorpusPipeline.run(
      Tables.documents(spark, dir).select("doc_id", "lang", "source", "text"))

  // independent hand-built composition (window-based exact dedup
  // instead of the min-struct aggregate, explicit stage spelling) —
  // pins that CorpusPipeline.run changes neither semantics nor schema
  private def reference(): DataFrame = {
    val raw = Tables.documents(spark, dir)
    // 1. normalize + scrub (projections)
    val scrubbed = raw
      .select(col("doc_id"), col("lang"), col("source"),
              Pii.scrub(Text.cleanup(col("text"))).as("p"))
      .select(col("doc_id"), col("lang"), col("source"),
              col("p.clean_text").as("text"),
              (col("p.n_emails") + col("p.n_phones") + col("p.n_ips")).as("n_pii"))
    // 2. exact dedup (lowest id per text — the q21 keeper)
    val exact = scrubbed
      .withColumn("keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("text"))))
      .filter(col("doc_id") === col("keeper")).drop("keeper")
    // 3. chunk-level boilerplate dedup; drop fully-deduplicated docs
    val chunked = ChunkDedup.dedup(exact, "text", "doc_id", w = 8)
      .filter(col("n_kept") > 0)
      .join(exact.select("doc_id", "lang", "source", "n_pii"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_pii"),
              col("text_dedup").as("text"), col("n_chunks"), col("n_kept"))
    // 4. quality gate + deterministic 80/20 split (the q45 discipline)
    chunked
      .filter(size(Text.tokens(col("text"))) >= 5)
      .withColumn("split",
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
               .cast("long") % 100 < 80, "train").otherwise("eval"))
  }

  test("CorpusPipeline.run matches the hand-built reference composition") {
    val key = Seq("doc_id", "lang", "source", "n_pii", "text", "n_chunks", "n_kept", "split")
    val got = pipeline().select(key.map(col): _*).orderBy("doc_id").collect().toSeq
    val want = reference().select(key.map(col): _*).orderBy("doc_id").collect().toSeq
    assert(got == want)
  }

  test("the corpus pipeline chains, filters monotonically, and reproduces") {
    val out = pipeline().cache()
    try {
      val total = Tables.documents(spark, dir).count()
      val n = out.count()
      assert(n > 0 && n <= total, s"pipeline kept $n of $total")
      // schema contract downstream consumers rely on
      assert(out.columns.toSet == Set(
        "doc_id", "lang", "source", "n_pii", "text", "n_chunks", "n_kept", "split"))
      // dedup really deduped: no repeated text survives
      assert(out.groupBy("text").count().filter(col("count") > 1).count() == 0)
      // split covers both classes and is deterministic
      val splits = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(splits.keySet == Set("train", "eval"), splits.toString)
      // end-to-end determinism: a second independent run is identical
      val a = out.orderBy("doc_id").collect().toSeq
      val b = pipeline().orderBy("doc_id").collect().toSeq
      assert(a == b, "pipeline is not reproducible")
    } finally out.unpersist()
  }

  test("near-dup stage: off by default, greedy bucket-min keeper when enabled") {
    import spark.implicits._
    // 2 is a lightly-edited repost of 1 (same minhash buckets — the
    // edit perturbs a handful of the hundreds of 8-char shingles);
    // 3 is from a disjoint vocabulary
    val textA = ("the quick brown fox jumps over the lazy dog again and " * 6).trim
    val textB = ("zebra quartz violin xylophone kumquat jackal wombat nectar " * 6).trim
    val docs = Seq(
      (1L, textA), (2L, textA + " tiny tail edit"), (3L, textB)
    ).toDF("doc_id", "text")
    // minimal chain so the stage under test is isolated (no chunk
    // dedup rewriting text, no quality gate)
    val base = CorpusPipeline.Config(pii = false, chunkDedup = false,
      quality = false, split = false)
    val off = CorpusPipeline.run(docs, base)
    assert(off.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
             == Seq(1L, 2L, 3L), "near-dup must be OFF by default")
    val on = CorpusPipeline.run(docs, base.copy(nearDup = true))
    assert(on.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
             == Seq(1L, 3L), "edited repost must drop; keeper is the bucket min")
    // the stage must not leak its working signature columns
    assert(!on.columns.exists(_.startsWith("mh")), on.columns.mkString(","))
  }

  test("window-chunk stage: off by default, explodes to budget-bounded chunks that inherit the split") {
    import spark.implicits._
    // ~40 tokens per repetition of the phrase; budget 64 forces
    // multiple chunks per doc at 4 repetitions
    val textA = ("the quick brown fox jumps over the lazy dog again and " * 4).trim
    val textB = ("zebra quartz violin xylophone kumquat jackal wombat nectar " * 4).trim
    val docs = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val base = CorpusPipeline.Config(pii = false, chunkDedup = false, quality = false)
    // off by default: doc grain, no chunk columns
    val off = CorpusPipeline.run(docs, base)
    assert(off.count() == 2 && !off.columns.contains("chunk_id"))
    val on = CorpusPipeline.run(docs, base.copy(windowTokens = 64))
    val rows = on.select("doc_id", "chunk_id", "text", "n_tokens", "split").collect()
    assert(rows.length > 2, "chunking must explode the doc grain")
    // every chunk respects the budget (words are all well under it)
    assert(rows.forall(_.getLong(3) <= 64), "chunk over token budget")
    // chunks of one doc all inherit the DOC's split — chunking after
    // splitting is the train/eval-leakage guard
    val splitsPerDoc = rows.groupBy(_.getLong(0)).map { case (_, rs) =>
      rs.map(_.getString(4)).distinct.length
    }
    assert(splitsPerDoc.forall(_ == 1), "one doc's chunks landed in multiple splits")
    // reassembly: chunks in chunk_id order rebuild the doc's word stream
    val rebuilt = rows.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
      .map(_.getString(2)).mkString(" ")
    assert(rebuilt == textA.toLowerCase(java.util.Locale.ROOT))
    // counts additive over the split
    val total1 = rows.filter(_.getLong(0) == 1L).map(_.getLong(3)).sum
    val want1 = docs.filter(col("doc_id") === 1L)
      .select(call_function("bpe_token_count", col("text"))).head.getLong(0)
    assert(total1 == want1)
  }

  test("RunCorpus CLI: dry-run plans, empty input fails, misuse exits 2") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-runcorpus").toString
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/docs")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(s"$tmp/docs").schema)
      .write.parquet(s"$tmp/empty")

    // dry-run: exit 0, prints one plan per stage, writes NOTHING
    val outDir = s"$tmp/out"
    assert(RunCorpus.execute(spark,
      Array("--in", s"$tmp/docs", "--out", outDir, "--dry-run")) == 0)
    assert(!new java.io.File(outDir).exists(), "dry-run must not write output")
    // empty input: a real run exits 1 and writes nothing
    assert(RunCorpus.execute(spark,
      Array("--in", s"$tmp/empty", "--out", outDir)) == 1)
    assert(!new java.io.File(outDir).exists(), "failed run must not write output")
    // misuse: unknown flag and missing required args both exit 2
    assert(RunCorpus.execute(spark, Array("--bogus")) == 2)
    assert(RunCorpus.execute(spark, Array("--in", s"$tmp/docs")) == 2)
    // numeric flags: non-integer and out-of-range values are usage
    // errors (exit 2, nothing written) — never a raw
    // NumberFormatException, never a silently-disabled stage
    assert(RunCorpus.execute(spark, Array("--in", s"$tmp/docs", "--out", outDir,
      "--window-tokens", "64k")) == 2)
    assert(RunCorpus.execute(spark, Array("--in", s"$tmp/docs", "--out", outDir,
      "--window-tokens", "-5")) == 2)
    assert(RunCorpus.execute(spark, Array("--in", s"$tmp/docs", "--out", outDir,
      "--train-pct", "101")) == 2)
    assert(RunCorpus.execute(spark, Array("--in", s"$tmp/docs", "--out", outDir,
      "--chunk-w", "0")) == 2)
    assert(!new java.io.File(outDir).exists(), "usage error must not write output")
    // and the happy path still lands parquet with exit 0
    assert(RunCorpus.execute(spark,
      Array("--in", s"$tmp/docs", "--out", outDir)) == 0)
    assert(spark.read.parquet(outDir).count() == 1)
    // --window-tokens flows through to the chunking stage
    val outChunks = s"$tmp/out-chunks"
    assert(RunCorpus.execute(spark,
      Array("--in", s"$tmp/docs", "--out", outChunks, "--window-tokens", "4")) == 0)
    val chunked = spark.read.parquet(outChunks)
    assert(chunked.columns.contains("chunk_id") && chunked.count() > 1)
  }

  test("RunCorpus serve modes: fetch-shard and probe-bench E2E over landed artifacts, flag hygiene exits 2 (r17 #5)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-serve").toString
    val corpus = (0L until 40L)
      .map(i => (i, s"doc $i body tok${i % 7} tok${(i * 3) % 7} alpha beta gamma"))
      .toDF("doc_id", "text")
    corpus.write.parquet(s"$tmp/corpus")

    // ---- fetch-shard over a landed manifest dir ----
    graft.ops.EpochShuffle.landManifests(
      corpus, s"$tmp/manifests", epochs = Seq(0, 1), tokensPerShard = 40L)
    val outShard = s"$tmp/shard"
    // the serve localCheckpoints the shard for a one-execution probe+write;
    // pin that the checkpoint's RDD blocks are RELEASED on exit — a bare
    // Dataset.unpersist misses them (they live outside the cache manager),
    // which is the r18-ADVICE leak this guards against
    val cachedBefore = spark.sparkContext.getRDDStorageInfo
      .filter(_.numCachedPartitions > 0).map(_.id).toSet
    assert(RunCorpus.execute(spark, Array("--mode", "fetch-shard",
      "--in", s"$tmp/corpus", "--out", outShard,
      "--manifests", s"$tmp/manifests", "--epoch", "1", "--shard", "0")) == 0)
    val cachedAfter = spark.sparkContext.getRDDStorageInfo
      .filter(_.numCachedPartitions > 0).map(_.id).toSet
    assert((cachedAfter -- cachedBefore).isEmpty,
      s"fetch-shard must release its localCheckpoint blocks, leaked RDDs: ${cachedAfter -- cachedBefore}")
    val served = spark.read.parquet(outShard)
    // the served shard carries text + manifest columns, equals the
    // library call row-for-row, and respects the token budget
    val lib = graft.ops.EpochShuffle.fetchShard(corpus, s"$tmp/manifests", 1L, 0L)
      .select("doc_id", "text", "epoch_key", "n_tokens", "cum_tokens")
      .collect().map(_.toSeq).toSet
    assert(served.select("doc_id", "text", "epoch_key", "n_tokens", "cum_tokens")
      .collect().map(_.toSeq).toSet == lib)
    assert(served.agg(sum("n_tokens")).collect()(0).getLong(0) <= 40L + 20L,
      "a shard overshoots its budget by at most one doc")
    // training order survives the artifact: ONE data file, rows in
    // epoch_key order on read-back
    val shardFiles = new java.io.File(outShard).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(shardFiles.length == 1, "a served shard must be one sorted file")
    val keys = spark.read.parquet(outShard).select("epoch_key")
      .collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted, "served rows must arrive in training order")
    // a shard that does not exist serves zero rows → exit 1, and the
    // refusal must NOT clobber a previously served good shard
    assert(RunCorpus.execute(spark, Array("--mode", "fetch-shard",
      "--in", s"$tmp/corpus", "--out", outShard,
      "--manifests", s"$tmp/manifests", "--epoch", "1", "--shard", "9999")) == 1)
    assert(spark.read.parquet(outShard).count() > 0,
      "a wrong-pointer serve must leave the existing artifact intact")

    // ---- probe-bench over a landed benchmark gram set ----
    graft.ops.Decontaminate.landBenchmark(
      Seq((0L, "alpha beta gamma")).toDF("doc_id", "text"), s"$tmp/bench")
    val outProbe = s"$tmp/probe"
    assert(RunCorpus.execute(spark, Array("--mode", "probe-bench",
      "--in", s"$tmp/corpus", "--out", outProbe, "--bench", s"$tmp/bench")) == 0)
    val report = spark.read.parquet(outProbe)
    assert(report.count() == 40L)
    // every corpus doc ends '... alpha beta gamma' → shares the one
    // benchmark 3-gram → contaminated; matches the library call
    val libProbe = graft.ops.Decontaminate.probe(corpus, s"$tmp/bench")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(report.select("doc_id", "n_shared", "clean")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == libProbe)
    assert(report.filter(col("clean") === 0L).count() == 40L)

    // ---- flag hygiene: all exit 2, nothing written ----
    val bad = s"$tmp/bad-out"
    // unknown mode
    assert(RunCorpus.execute(spark, Array("--mode", "nope",
      "--in", s"$tmp/corpus", "--out", bad)) == 2)
    // serve-only options outside their mode
    assert(RunCorpus.execute(spark, Array(
      "--in", s"$tmp/corpus", "--out", bad, "--epoch", "1")) == 2)
    assert(RunCorpus.execute(spark, Array("--mode", "probe-bench",
      "--in", s"$tmp/corpus", "--out", bad, "--bench", s"$tmp/bench",
      "--manifests", s"$tmp/manifests")) == 2)
    // pipeline-only options under a serve mode
    assert(RunCorpus.execute(spark, Array("--mode", "fetch-shard",
      "--in", s"$tmp/corpus", "--out", bad, "--manifests", s"$tmp/manifests",
      "--epoch", "1", "--shard", "0", "--near-dup")) == 2)
    // missing / malformed serve parameters
    assert(RunCorpus.execute(spark, Array("--mode", "fetch-shard",
      "--in", s"$tmp/corpus", "--out", bad,
      "--epoch", "1", "--shard", "0")) == 2)           // no --manifests
    assert(RunCorpus.execute(spark, Array("--mode", "fetch-shard",
      "--in", s"$tmp/corpus", "--out", bad, "--manifests", s"$tmp/manifests",
      "--shard", "0")) == 2)                            // no --epoch
    assert(RunCorpus.execute(spark, Array("--mode", "fetch-shard",
      "--in", s"$tmp/corpus", "--out", bad, "--manifests", s"$tmp/manifests",
      "--epoch", "one", "--shard", "0")) == 2)          // non-integer
    assert(RunCorpus.execute(spark, Array("--mode", "fetch-shard",
      "--in", s"$tmp/corpus", "--out", bad, "--manifests", s"$tmp/manifests",
      "--epoch", "-1", "--shard", "0")) == 2)           // negative
    assert(RunCorpus.execute(spark, Array("--mode", "probe-bench",
      "--in", s"$tmp/corpus", "--out", bad)) == 2)      // no --bench
    assert(!new java.io.File(bad).exists(), "usage errors must not write output")
  }
}
