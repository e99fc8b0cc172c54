package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination against a LANDED gram-fingerprint set —
  * the artifact form of q49's contamination check. At 100 TB the
  * benchmark suite is FIXED while the corpus streams, so recomputing
  * the benchmark gram set per run (q49's in-query shape) re-scans the
  * benchmark for every corpus pass; instead [[landBenchmark]] lands
  * the DISTINCT benchmark 3-gram fingerprints ONCE (a `gram` BIGINT
  * parquet — the q81 persisted-artifact discipline: the DuckDB oracle
  * re-reads the same files) together with a Bloom blob over them
  * (`_bloom.bin` beside the parquet — underscore-prefixed, so both
  * engines' parquet readers ignore it), and every later corpus pass /
  * ingest micro-batch probes the landed set.
  *
  * Fingerprints use the md5 bridge (q88/q92/q94 convention, NOT
  * xxhash64) because the landed artifact is the join boundary between
  * engines: fp(g) = ('0x' || substr(md5(g),1,15))::BIGINT is
  * bit-identical in Spark and DuckDB, so the oracle can re-derive a
  * document's gram fingerprints from its text and join them against
  * the very files the engine landed. Per-doc DISTINCT is taken on the
  * FINGERPRINT array inside the projection (array_distinct of the
  * transformed array — no exchange), matching the oracle's
  * `SELECT DISTINCT doc_id, fp`.
  *
  * Scale shape of [[probe]]: the landed set is the small side (a
  * fixed benchmark suite), broadcast below a row bound from parquet
  * metadata; past it the semi-join prunes to shared grams before any
  * exchange and zero rows re-attach through an id-only scan — q49's
  * two regimes, verbatim. The streaming face
  * ([[graft.streaming.EventStreams.ingestDecontaminate]]) loads the
  * Bloom ONCE as frozen state: a clean batch (zero bloom-positive
  * grams) never reads the landed parquet at all — the carried-state
  * discipline of the dedup family applied to a frozen artifact. */
object Decontaminate {

  /** Landing dir derived from (user, source data dir) — the
    * [[IvfPqIndex.dirFor]] discipline, so concurrent runs over
    * different datasets never clobber each other's benchmark set. */
  def dirFor(dataDir: String): String = {
    val user = sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9_-]", "_")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_q97_bench_${user}_$tag"
  }

  /** Dir of the most recent [[landBenchmark]] in this JVM (the
    * [[IvfPqIndex.lastDir]] discipline; `Verify` derives the dir from
    * its own data dir instead). */
  @volatile private var lastDirVar: String = dirFor("")
  def lastDir: String = lastDirVar

  /** 60-bit md5-bridge fingerprint (q88 convention). */
  private def fp(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("bigint")

  /** Per-doc DISTINCT 3-gram fingerprints of a text, as one projected
    * array — NULL text is the empty document (empty array, kept by
    * the callers' explode_outer so every doc reaches the report).
    * Public: the streaming gate projects the same fingerprints so the
    * stream and the landed set can never disagree on tokenization. */
  def gramFps(text: Column): Column = docGramFps(text)

  private def docGramFps(text: Column): Column =
    array_distinct(transform(Text.ngramsOfText(coalesce(text, lit("")), 3),
      g => fp(g)))

  private def bloomPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_bloom.bin")

  /** Land the benchmark's distinct gram fingerprints (+ the Bloom
    * sidecar) at `outDir`, overwriting any previous set — benchmarks
    * change rarely and whole (a new suite version is a new landing).
    * One benchmark scan; the blob is aggregated from the LANDED files
    * so set and filter can never disagree. */
  def landBenchmark(bench: DataFrame, outDir: String,
                    textCol: String = "text", bits: Int = 0): Unit = {
    val spark = bench.sparkSession
    bench
      .select(explode_outer(docGramFps(col(textCol))).as("gram"))
      .filter(col("gram").isNotNull).distinct()
      .write.mode("overwrite").parquet(outDir)
    val landed = spark.read.parquet(outDir)
    val nbits =
      if (bits > 0) bits else IncrementalDedup.sizedBits(landed.count())
    val blob = landed
      .agg(call_function("bloom_agg", col("gram"), lit(nbits), lit(3)).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val p = bloomPath(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(blob) finally out.close()
    lastDirVar = outDir
  }

  /** The landed Bloom blob — read once per process/stream start and
    * carried as frozen state, never per batch. */
  def loadBloom(spark: SparkSession, dir: String): Array[Byte] = {
    val p = bloomPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val buf = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  /** Per-doc contamination report against the landed set: (idCol,
    * n_shared, clean) — n_shared = how many of the doc's DISTINCT
    * grams appear in the benchmark, clean = BIGINT 0/1 (n_shared = 0).
    * Every input doc yields a row (empty/NULL text scores clean). */
  def probe(docs: DataFrame, benchDir: String,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val bench = spark.read.parquet(benchDir)
    val grams = docs.select(col(idCol),
      explode_outer(docGramFps(col(textCol))).as("gram"))
    // metadata-only row count gates the regime (the q49 gate): a
    // benchmark suite is small by construction, but a user CAN land
    // a corpus-sized one, and a forced broadcast of that would be
    // driver-hostile
    val withShared =
      if (bench.count() <= 2L * 1000 * 1000) {
        grams
          .join(broadcast(bench.withColumn("hit", lit(1))), Seq("gram"), "left")
          .groupBy(idCol).agg(count(col("hit")).as("n_shared"))
      } else {
        val hits = grams.filter(col("gram").isNotNull)
          .join(bench, Seq("gram"), "left_semi")
          .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
        docs.select(idCol)
          .join(hits, Seq(idCol), "left")
          .select(col(idCol), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      }
    withShared.select(col(idCol), col("n_shared"),
      (col("n_shared") === 0L).cast("bigint").as("clean"))
  }
}
