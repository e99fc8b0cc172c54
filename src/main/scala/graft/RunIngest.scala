package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.streaming.EventStreams

/** CLI driving the composed streaming ingest
  * ([[graft.streaming.EventStreams.ingestPipeline]]) — the streaming
  * twin of [[RunCorpus]]: watch an arrivals directory of parquet
  * document batches and keep a deduplicated corpus landing current.
  *
  *   graft.RunIngest --in DIR --corpus DIR --checkpoint DIR
  *                   [--mode exact|near|both]   (default both)
  *                   [--once]                   (drain what exists, then exit)
  *                   [--text-col NAME] [--id-col NAME]
  *
  * `--in` is a parquet directory new document files are dropped into
  * (the `spark.readStream` file source — each discovered file becomes
  * part of a micro-batch, tracked exactly-once via the checkpoint).
  * `--corpus` is the landing dir: it IS the dedup state (text for the
  * exact stage, `mh1..mh4` signature columns for the near stage), so
  * restarts and batch retries self-heal — see the ingestPipeline
  * scaladoc. `--once` drains everything present (processAllAvailable,
  * then stop) and exits 0 — the cron-invocation shape, with the same
  * exactly-once checkpointed file-source offsets a Trigger.AvailableNow
  * run would use; without it the query runs until killed.
  *
  * The first batch defines the stream schema: `--in` must contain at
  * least one parquet file at start (the file source requires a schema;
  * inferring it from the seed files is the standard bootstrap).
  *
  * `--mode` is per-CORPUS, not per-run: `near`/`both` land signature
  * columns and expect them back on the next batch, `exact` lands
  * none — so pointing a `near`/`both` run at a corpus landed by
  * `exact` fails loudly on the missing `mh1..mh4` (the right outcome:
  * silently re-signing landed text would hide that earlier batches
  * were never near-dup-checked). Pick the mode when the corpus is
  * created and keep it.
  *
  * `--compact` is the maintenance form: no stream, just
  * [[graft.streaming.EventStreams.compactLanding]] on `--corpus` —
  * rewrite the accreted per-batch part files down to `--target-files`
  * (default 4) between stream sessions. Refused (exit 1) while an
  * in-JVM ingest stream holds the landing.
  *
  * `--repair` is the crash-recovery form:
  * [[graft.streaming.EventStreams.repairLanding]] on `--corpus` —
  * finish or roll back compaction swaps a crash left half-done
  * (restore aside dirs whose target vanished, finish manifest-proven
  * completed swaps, sweep tmp debris). Exit 1 when an aside dir needs
  * a human decision (its target exists without a matching manifest).
  *
  * `--expire` is the retention form:
  * [[graft.streaming.EventStreams.expireLanding]] on `--corpus` —
  * drop every `--partition-col NAME` partition dir whose value sorts
  * strictly before `--before VALUE` (string compare; exact for ISO
  * months/dates and zero-padded numerics). Same single-writer
  * exclusion as `--compact`.
  *
  * Exit codes: 0 ok, 1 stream/maintenance failure, 2 usage. */
object RunIngest {
  private val usage =
    """usage: graft.RunIngest --in DIR --corpus DIR --checkpoint DIR
      |  [--mode exact|near|both|semantic|full]  which dedup stages (default
      |                                both = exact+near; full = exact+near+
      |                                semantic, stream must carry text AND
      |                                embedding columns)
      |  [--once]                      drain everything present, then exit
      |  [--text-col NAME]             default text (text modes)
      |  [--id-col NAME]               default doc_id
      |  [--vec-col NAME]              default embedding (semantic mode:
      |                                embedding-cosine dedup — drop when a
      |                                landed doc shares an LSH band bucket
      |                                AND cosine >= tau)
      |  [--tau X]                     semantic cosine threshold, default 0.9
      |  [--partition-by COL[,COL]]    land hive-partitioned by COL (e.g. an
      |                                ingest month) — enables --expire
      |                                retention and per-leaf --compact
      |   or: graft.RunIngest --in DIR --corpus DIR --checkpoint DIR --mode index
      |                       --train PATH [--coarse-k N] [--m N] [--ksub N]
      |                                maintain a persisted IVF-PQ index from a
      |                                vector stream: each micro-batch lands
      |                                under its own batch=<id> dir (exactly-
      |                                once), encoded with codebooks trained
      |                                ONCE from --train; --corpus is the index
      |                                dir (defaults coarse-k 4, m 4, ksub 16)
      |   or: graft.RunIngest --in DIR --corpus DIR --checkpoint DIR --mode quality
      |                       --ref PATH --max-xent X [--lang-col NAME]
      |                                frozen-LM quality gate: train the
      |                                per-language bigram LM ONCE from the
      |                                --ref parquet corpus, score every
      |                                streamed doc, land (batch=<id>,
      |                                exactly-once) only docs at or under
      |                                X cross-entropy nats/token; docs the
      |                                gate cannot score (under 2 tokens, a
      |                                language absent from --ref) are
      |                                rejected, not waved through
      |   or: graft.RunIngest --in DIR --corpus DIR --checkpoint DIR --mode dsir
      |                       --train PATH --target-pred EXPR [--min-logw N]
      |                                frozen DSIR importance gate: train the
      |                                two hashed-ngram bucket histograms ONCE
      |                                from the --train parquet corpus (EXPR, a
      |                                SQL boolean over its columns, marks the
      |                                target-distribution slice; the rest is
      |                                the source pool), score every streamed
      |                                doc map-only, land (batch=<id>,
      |                                exactly-once) only docs with integer
      |                                log-weight >= N micro-nats (default 1
      |                                = the paper's strict w > 1 rule, which
      |                                rejects weight-exactly-1 docs such as
      |                                empty texts; pass 0 to admit them)
      |   or: graft.RunIngest --in DIR --corpus DIR --checkpoint DIR --mode decontaminate
      |                       --benchmark DIR [--max-shared N]
      |                                landed-benchmark decontamination gate:
      |                                probe every streamed doc's distinct
      |                                3-gram fingerprints against the gram
      |                                set previously landed at --benchmark
      |                                (see --land-benchmark); docs sharing
      |                                more than N grams (default 0) are
      |                                rejected — test-set leakage must not
      |                                enter a training corpus; survivors
      |                                land (batch=<id>, exactly-once) with
      |                                (n_shared, clean). Clean batches never
      |                                read the landed set (Bloom sidecar)
      |   or: graft.RunIngest --land-benchmark --benchmark DIR --from PATH [--text-col NAME]
      |                                land a benchmark suite's DISTINCT
      |                                3-gram fingerprints (+ Bloom sidecar)
      |                                at DIR, once per suite version — the
      |                                frozen artifact --mode decontaminate
      |                                probes; --from is the benchmark
      |                                parquet (overwrites a previous set)
      |   or: graft.RunIngest --compact --corpus DIR [--target-files N] [--leaf-parallel P]
      |                                rewrite an accreted landing to N
      |                                part files (default 4; per leaf on a
      |                                partitioned landing, P leaves at a
      |                                time); run between stream sessions
      |   or: graft.RunIngest --expire --corpus DIR --partition-col NAME --before VALUE
      |                                drop every NAME=value partition dir
      |                                whose value sorts before VALUE
      |                                (retention; run between stream
      |                                sessions)
      |   or: graft.RunIngest --repair --corpus DIR
      |                                finish or roll back compaction swaps
      |                                a crash left half-done (restore
      |                                aside dirs, sweep debris)
      |   or: graft.RunIngest --stats --corpus DIR
      |                                read-only: per-leaf file counts and
      |                                bytes, crash debris, lock state —
      |                                safe while a stream runs""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-ingest")
    val code = execute(spark, args)
    spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** CLI minus session lifecycle and process exit — IngestCliSpec
    * drives this in-JVM. */
  private[graft] def execute(spark: SparkSession, args: Array[String]): Int = {
    val opts =
      try parse(args.toList, Map.empty)
      catch {
        case e: RuntimeException =>
          System.err.println(s"[ingest] ${e.getMessage}\n$usage")
          return 2
      }
    // maintenance forms take ONLY their own flags: a co-passed
    // streaming flag means the user expected a stream to run too, and
    // silently skipping it would exit 0 on work never done
    val forms = Seq("compact", "expire", "repair", "stats", "land-benchmark")
      .filter(opts.contains)
    if (forms.nonEmpty) {
      val streamFlags =
        (Seq("in", "checkpoint", "once", "mode", "id-col",
             "vec-col", "tau", "partition-by") ++
         // --land-benchmark legitimately picks the gram column
         (if (opts.contains("land-benchmark")) Nil else Seq("text-col")))
          .filter(opts.contains)
      if (streamFlags.nonEmpty) {
        System.err.println(
          s"[ingest] ${streamFlags.map("--" + _).mkString(", ")} cannot be " +
          s"combined with --${forms.head} (maintenance runs no stream)\n$usage")
        return 2
      }
    }
    if (forms.length > 1) {
      System.err.println(
        s"[ingest] ${forms.map("--" + _).mkString(", ")} are separate maintenance " +
        s"runs; pass one at a time\n$usage")
      return 2
    }
    val crossForm =
      (if (opts.contains("expire") || opts.contains("repair") ||
           opts.contains("stats") || opts.contains("land-benchmark"))
         Seq("target-files", "leaf-parallel") else Nil) ++
      (if (opts.contains("compact") || opts.contains("repair") ||
           opts.contains("stats") || opts.contains("land-benchmark"))
         Seq("partition-col", "before") else Nil) ++
      (if (forms.nonEmpty && !opts.contains("land-benchmark"))
         Seq("benchmark", "from", "max-shared") else Nil) ++
      (if (opts.contains("land-benchmark"))
         // all stream-gate value flags: silently dropping one would
         // exit 0 on intent never honored (the block's own rule)
         Seq("corpus", "max-shared", "train", "target-pred", "min-logw",
             "ref", "max-xent", "lang-col", "coarse-k", "m", "ksub") else Nil)
    val crossed = crossForm.filter(opts.contains)
    if (crossed.nonEmpty) {
      System.err.println(
        s"[ingest] ${crossed.map("--" + _).mkString(", ")} belongs to another " +
        s"maintenance form\n$usage")
      return 2
    }
    if (opts.contains("land-benchmark")) {
      if (!(opts.contains("benchmark") && opts.contains("from"))) {
        System.err.println(s"[ingest] --land-benchmark needs --benchmark DIR and --from PATH\n$usage")
        return 2
      }
      return try {
        graft.ops.Decontaminate.landBenchmark(
          spark.read.parquet(opts("from")), opts("benchmark"),
          textCol = opts.getOrElse("text-col", "text"))
        val n = spark.read.parquet(opts("benchmark")).count()
        println(s"[ingest] landed $n distinct benchmark gram fingerprint(s) " +
          s"at ${opts("benchmark")}")
        0
      } catch {
        case e: Exception =>
          System.err.println(s"[ingest] FAILED: ${e.getMessage}")
          1
      }
    }
    if (opts.contains("compact")) {
      if (!opts.contains("corpus")) {
        System.err.println(s"[ingest] --compact needs --corpus\n$usage")
        return 2
      }
      val target =
        try opts.getOrElse("target-files", "4").toInt
        catch {
          case _: NumberFormatException =>
            System.err.println(s"[ingest] --target-files must be an integer\n$usage")
            return 2
        }
      if (target <= 0) {
        System.err.println(s"[ingest] --target-files must be positive, got $target\n$usage")
        return 2
      }
      val leafPar =
        try opts.getOrElse("leaf-parallel", "4").toInt
        catch {
          case _: NumberFormatException =>
            System.err.println(s"[ingest] --leaf-parallel must be an integer\n$usage")
            return 2
        }
      if (leafPar <= 0) {
        System.err.println(s"[ingest] --leaf-parallel must be positive, got $leafPar\n$usage")
        return 2
      }
      return try {
        val s = EventStreams.compactLanding(spark, opts("corpus"), target, leafPar)
        if (s.rows < 0L)
          println(s"[ingest] compaction no-op: ${s.filesBefore} file(s) already <= $target")
        else
          println(s"[ingest] compacted ${opts("corpus")}: ${s.filesBefore} -> " +
            s"${s.filesAfter} file(s), ${s.rows} rows, carries " +
            (if (s.carriesKept) "kept" else "DROPPED (stale carry, or a foreign write detected in the window — next batch reseeds)"))
        0
      } catch {
        case e: Exception =>
          System.err.println(s"[ingest] FAILED: ${e.getMessage}")
          1
      }
    }
    if (opts.contains("stats")) {
      if (!opts.contains("corpus")) {
        System.err.println(s"[ingest] --stats needs --corpus\n$usage")
        return 2
      }
      return try {
        val s = EventStreams.landingStats(spark, opts("corpus"))
        println(f"[ingest] ${opts("corpus")}: ${s.totalFiles} visible file(s), " +
          f"${s.totalBytes / 1e6}%.1f MB across ${s.leaves.size} dir(s)" +
          (if (s.lockHeld) " — MAINTENANCE LOCK HELD" else "") +
          (if (s.writerLockHeld) " — INGEST WRITER LOCK HELD" else ""))
        s.leaves.foreach { case (leaf, files, bytes) =>
          println(f"[ingest]   $leaf: $files file(s), ${bytes / 1e6}%.1f MB")
        }
        if (s.debris.nonEmpty) {
          println(s"[ingest] ${s.debris.size} crash artifact(s) — run --repair:")
          s.debris.foreach(d => println(s"[ingest]   $d"))
        }
        0
      } catch {
        case e: Exception =>
          System.err.println(s"[ingest] FAILED: ${e.getMessage}")
          1
      }
    }
    if (opts.contains("repair")) {
      if (!opts.contains("corpus")) {
        System.err.println(s"[ingest] --repair needs --corpus\n$usage")
        return 2
      }
      return try {
        val s = EventStreams.repairLanding(spark, opts("corpus"))
        println(s"[ingest] repair of ${opts("corpus")}: ${s.oldsRestored} aside " +
          s"dir(s) restored, ${s.oldsDeleted} completed swap(s) finished, " +
          s"${s.tmpsDeleted} tmp dir(s) and ${s.manifestsCleaned} manifest(s) swept")
        if (s.unresolved.nonEmpty) {
          System.err.println(
            s"[ingest] ${s.unresolved.size} aside dir(s) need a human decision " +
            "(target exists without a matching manifest — both sides hold rows):")
          s.unresolved.foreach(p => System.err.println(s"[ingest]   $p"))
          1
        } else 0
      } catch {
        case e: Exception =>
          System.err.println(s"[ingest] FAILED: ${e.getMessage}")
          1
      }
    }
    if (opts.contains("expire")) {
      val needed = Seq("corpus", "partition-col", "before").filterNot(opts.contains)
      if (needed.nonEmpty) {
        System.err.println(
          s"[ingest] --expire needs ${needed.map("--" + _).mkString(", ")}\n$usage")
        return 2
      }
      return try {
        val s = EventStreams.expireLanding(
          spark, opts("corpus"), opts("partition-col"), opts("before"))
        if (s.dirsDropped == 0)
          println(s"[ingest] expiry no-op: no ${opts("partition-col")}= dir sorts " +
            s"before '${opts("before")}'")
        else
          println(s"[ingest] expired ${s.dirsDropped} partition dir(s), " +
            s"${s.filesDropped} file(s) from ${opts("corpus")}, carries " +
            (if (s.carriesKept) "kept" else "DROPPED (stale carry, or a foreign write detected in the window — next batch reseeds)"))
        0
      } catch {
        case e: Exception =>
          System.err.println(s"[ingest] FAILED: ${e.getMessage}")
          1
      }
    }
    val compactOnly = Seq("target-files", "leaf-parallel").filter(opts.contains)
    if (compactOnly.nonEmpty) {
      // only meaningful under --compact; ignoring it would silently
      // run a full stream when the user meant a maintenance rewrite
      System.err.println(
        s"[ingest] ${compactOnly.map("--" + _).mkString(", ")} needs --compact\n$usage")
      return 2
    }
    val expireOnly = Seq("partition-col", "before").filter(opts.contains)
    if (expireOnly.nonEmpty) {
      // only meaningful under --expire — same no-silent-default rule
      System.err.println(
        s"[ingest] ${expireOnly.map("--" + _).mkString(", ")} needs --expire\n$usage")
      return 2
    }
    val required = Seq("in", "corpus", "checkpoint")
    val missing = required.filterNot(opts.contains)
    if (missing.nonEmpty) {
      System.err.println(
        s"[ingest] missing ${missing.map("--" + _).mkString(", ")}\n$usage")
      return 2
    }
    val mode = opts.getOrElse("mode", "both")
    if (!Seq("exact", "near", "both", "semantic", "full", "index", "quality",
             "dsir", "decontaminate").contains(mode)) {
      System.err.println(s"[ingest] unknown --mode '$mode'\n$usage")
      return 2
    }
    // a dedup-relevant flag the chosen mode would silently ignore is
    // the same bug class as a co-passed stream flag on --compact
    val wrongModeFlags =
      (if (mode == "semantic") Seq("text-col").filter(opts.contains)
       else if (mode == "full") Nil
       else if (mode == "index")
         Seq("text-col", "tau", "partition-by").filter(opts.contains)
       else if (mode == "quality")
         Seq("vec-col", "tau", "partition-by").filter(opts.contains)
       else if (mode == "dsir" || mode == "decontaminate")
         Seq("vec-col", "tau", "partition-by").filter(opts.contains)
       else Seq("vec-col", "tau").filter(opts.contains)) ++
      (if (mode != "index" && mode != "dsir")
         Seq("train").filter(opts.contains) else Nil) ++
      (if (mode != "index")
         Seq("coarse-k", "m", "ksub").filter(opts.contains)
       else Nil) ++
      (if (mode != "quality")
         Seq("ref", "max-xent", "lang-col").filter(opts.contains)
       else Nil) ++
      (if (mode != "dsir")
         Seq("target-pred", "min-logw").filter(opts.contains)
       else Nil) ++
      (if (mode != "decontaminate")
         Seq("benchmark", "max-shared").filter(opts.contains)
       else Nil) ++
      Seq("from").filter(opts.contains)
    if (wrongModeFlags.nonEmpty) {
      System.err.println(
        s"[ingest] ${wrongModeFlags.map("--" + _).mkString(", ")} " +
        s"not applicable to mode=$mode\n$usage")
      return 2
    }
    if (mode == "index" && !opts.contains("train")) {
      System.err.println("[ingest] --mode index requires --train PATH " +
        s"(codebooks are trained once from a fixed source, not the stream)\n$usage")
      return 2
    }
    if (mode == "quality" && !(opts.contains("ref") && opts.contains("max-xent"))) {
      System.err.println("[ingest] --mode quality requires --ref PATH and " +
        "--max-xent X (the LM is trained once from a fixed reference, " +
        s"not the stream)\n$usage")
      return 2
    }
    if (mode == "dsir" && !(opts.contains("train") && opts.contains("target-pred"))) {
      System.err.println("[ingest] --mode dsir requires --train PATH and " +
        "--target-pred EXPR (the histograms are trained once from a fixed " +
        s"corpus, not the stream)\n$usage")
      return 2
    }
    if (mode == "decontaminate" && !opts.contains("benchmark")) {
      System.err.println("[ingest] --mode decontaminate requires --benchmark DIR " +
        s"(a gram set previously landed by --land-benchmark)\n$usage")
      return 2
    }
    val maxShared = opts.get("max-shared").map(_.toLongOption) match {
      case Some(Some(n)) if n >= 0 => n
      case Some(_) =>
        System.err.println("[ingest] --max-shared needs a non-negative " +
          s"integer (a shared-gram count)\n$usage")
        return 2
      case None => 0L
    }
    val minLogw = opts.get("min-logw").map(_.toLongOption) match {
      case Some(Some(n)) => n
      case Some(None) =>
        System.err.println("[ingest] --min-logw needs an integer " +
          s"(fixed-point micro-nats)\n$usage")
        return 2
      case None => 1L // the paper's strict w > 1 rule
    }
    val maxXent = opts.get("max-xent").map(_.toDoubleOption) match {
      case Some(Some(x)) if !x.isNaN && x >= 0 => x
      case Some(_) =>
        System.err.println("[ingest] --max-xent needs a non-negative number " +
          s"(per-token cross-entropy is non-negative)\n$usage")
        return 2
      case None => 0.0 // unused outside quality mode
    }
    val langCol = opts.getOrElse("lang-col", "lang")
    val textCol = opts.getOrElse("text-col", "text")
    val idCol = opts.getOrElse("id-col", "doc_id")
    val vecCol = opts.getOrElse("vec-col", "embedding")
    val tau = opts.get("tau").map(_.toDoubleOption) match {
      case Some(None) =>
        System.err.println(s"[ingest] --tau needs a number\n$usage")
        return 2
      case Some(Some(t)) => t
      case None => 0.9
    }
    // index-mode codebook geometry (positive ints, usage-error on junk)
    def posInt(name: String, default: Int): Either[String, Int] =
      opts.get(name) match {
        case None => Right(default)
        case Some(v) => v.toIntOption match {
          case Some(n) if n > 0 => Right(n)
          case _ => Left(s"--$name must be a positive integer, got '$v'")
        }
      }
    val geometry = for {
      ck <- posInt("coarse-k", 4)
      m <- posInt("m", 4)
      ks <- posInt("ksub", 16)
    } yield (ck, m, ks)
    val (coarseK, pqM, pqKsub) = geometry match {
      case Left(msg) =>
        System.err.println(s"[ingest] $msg\n$usage")
        return 2
      case Right(g) => g
    }
    // landing layout: comma-separated partition columns (e.g. an
    // ingest month) — the layout retention/per-leaf compaction works on
    val partCols = opts.get("partition-by")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    if (opts.contains("partition-by") && partCols.isEmpty) {
      System.err.println(s"[ingest] --partition-by needs at least one column\n$usage")
      return 2
    }

    try {
      // schema bootstrap: the file source needs a fixed schema, taken
      // from whatever is already in --in (the seed batch)
      val schema = spark.read.parquet(opts("in")).schema
      val keyCols = mode match {
        case "semantic" | "index" => Seq(vecCol, idCol)
        case "full"               => Seq(textCol, vecCol, idCol)
        case "quality"            => Seq(textCol, idCol, langCol)
        case "dsir" | "decontaminate" => Seq(textCol, idCol)
        case _                    => Seq(textCol, idCol)
      }
      val absent = keyCols.filterNot(schema.fieldNames.contains)
      require(absent.isEmpty,
        s"input schema must contain ${keyCols.map("'" + _ + "'").mkString(", ")}; " +
        s"got ${schema.fieldNames.mkString(",")}")
      val docs = spark.readStream.schema(schema).parquet(opts("in"))
      val q = mode match {
        case "exact" => EventStreams.ingestDedup(docs, opts("corpus"), opts("checkpoint"), textCol, idCol, partitionCols = partCols)
        case "near"  => EventStreams.ingestNearDup(docs, opts("corpus"), opts("checkpoint"), textCol, idCol, partitionCols = partCols)
        case "semantic" => EventStreams.ingestSemantic(docs, opts("corpus"), opts("checkpoint"), tau, vecCol, idCol, partitionCols = partCols)
        case "full" => EventStreams.ingestPipeline(docs, opts("corpus"), opts("checkpoint"), textCol, idCol, partitionCols = partCols,
          semantic = Some(EventStreams.SemanticStage(tau = tau, vecCol = vecCol)))
        case "index" => EventStreams.ingestIndex(docs, opts("corpus"), opts("checkpoint"),
          trainingSource = spark.read.parquet(opts("train")),
          coarseK = coarseK, m = pqM, ksub = pqKsub, idCol = idCol, vecCol = vecCol)
        case "quality" => EventStreams.ingestQuality(docs, opts("corpus"), opts("checkpoint"),
          reference = spark.read.parquet(opts("ref")),
          maxXentPerToken = maxXent, textCol = textCol, idCol = idCol, langCol = langCol)
        case "dsir" => EventStreams.ingestDsir(docs, opts("corpus"), opts("checkpoint"),
          trainCorpus = spark.read.parquet(opts("train")),
          targetPred = org.apache.spark.sql.functions.expr(opts("target-pred")),
          minLogwMicronats = minLogw, textCol = textCol, idCol = idCol)
        case "decontaminate" => EventStreams.ingestDecontaminate(docs,
          opts("corpus"), opts("checkpoint"), benchDir = opts("benchmark"),
          maxSharedGrams = maxShared, textCol = textCol, idCol = idCol)
        case _       => EventStreams.ingestPipeline(docs, opts("corpus"), opts("checkpoint"), textCol, idCol, partitionCols = partCols)
      }
      if (opts.contains("once")) {
        // AvailableNow is a writeStream option; the ingest entry
        // points own their writeStream, so "--once" drains by polling
        // processAllAvailable then stopping — same exactly-once
        // semantics (checkpointed file-source offsets), simpler than
        // threading a Trigger through every entry point.
        q.processAllAvailable()
        q.stop()
        val landed = spark.read.parquet(opts("corpus")).count()
        println(s"[ingest] drained; corpus now $landed rows at ${opts("corpus")}")
      } else {
        println(s"[ingest] streaming from ${opts("in")} into ${opts("corpus")} (mode=$mode); ctrl-c to stop")
        q.awaitTermination()
      }
      0
    } catch {
      case e: Exception =>
        System.err.println(s"[ingest] FAILED: ${e.getMessage}")
        1
    }
  }

  /** Flags taking a value. A misspelled flag must be a usage error,
    * not a silently-ignored entry that lets the run proceed with
    * defaults (e.g. `--textcol body` deduplicating the wrong column
    * and exiting 0). */
  private val valueFlags =
    Set("in", "corpus", "checkpoint", "mode", "text-col", "id-col", "vec-col", "tau", "target-files",
        "leaf-parallel", "partition-col", "before", "partition-by",
        "train", "coarse-k", "m", "ksub", "ref", "max-xent", "lang-col",
        "target-pred", "min-logw", "benchmark", "max-shared", "from")

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--once" :: rest => parse(rest, acc + ("once" -> "true"))
      case "--compact" :: rest => parse(rest, acc + ("compact" -> "true"))
      case "--expire" :: rest => parse(rest, acc + ("expire" -> "true"))
      case "--repair" :: rest => parse(rest, acc + ("repair" -> "true"))
      case "--stats" :: rest => parse(rest, acc + ("stats" -> "true"))
      case "--land-benchmark" :: rest => parse(rest, acc + ("land-benchmark" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") && !value.startsWith("--") =>
        val name = flag.drop(2)
        if (!valueFlags.contains(name))
          throw new RuntimeException(s"unknown flag $flag")
        parse(rest, acc + (name -> value))
      case flag :: rest if flag.startsWith("--") =>
        throw new RuntimeException(
          if (valueFlags.contains(flag.drop(2))) s"flag $flag needs a value"
          else s"unknown flag $flag")
      case other :: _ =>
        throw new RuntimeException(s"unexpected argument '$other'")
    }
}
