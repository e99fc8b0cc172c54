package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream (SURVEY §2.9
  * extended scope; the reference is batch-only, so semantics are
  * spec'd from Spark's event-time model and oracled by the batch
  * analogs q16–q18, which run the SAME transforms below on a static
  * frame).
  *
  * Design rule: every transform is `DataFrame => DataFrame` so one
  * definition serves `spark.read` (bounded, tested against DuckDB) and
  * `spark.readStream` (incremental, tested with MemoryStream). This is
  * the whole point of Structured Streaming — the engine picks
  * incrementalization; the query does not change.
  *
  * State sizing at scale: all aggregations are keyed by
  * (window/session × type/user); the watermark bounds state: windows
  * older than (max event time − delay) are finalized and evicted.
  */
object EventStreams {
  val WatermarkDelay = "10 minutes"

  /** Tumbling 1 h counts per event type (streaming form of q16). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), (col("value_cents").cast("double") / 100.0).as("sum_value"))

  /** Sliding 1 h window every 15 min (streaming form of q17). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows with a 30 min gap, per user (streaming form of
    * q18, via the built-in session_window). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  // ---------- custom state: flatMapGroupsWithState sessionization ----------

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long, valueSum: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, total_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Custom stateful sessionization: one state record per active user,
    * sessions emitted when the event-time watermark passes last-event
    * + gap (or on state timeout in streaming). Demonstrates the
    * explicit-state API the built-in session_window can't express
    * (e.g. carrying running value sums per session).
    *
    * @param flushOpenAtEnd set true when running on a BOUNDED dataset:
    *   batch execution never fires event-time timeouts, so without the
    *   flush each user's final open session would be silently dropped.
    *   In batch all data is present, so the open session is in fact
    *   complete and flushing it is exact. Leave false in streaming,
    *   where an open session may still grow and must wait for its
    *   timeout. */
  def sessionizeStateful(events: Dataset[Event],
                         flushOpenAtEnd: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs),
                             s.n, s.valueSum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= SessionGapMs =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1,
                                    valueSum = s.valueSum + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.startMs),
                                     new Timestamp(s.lastMs), s.n, s.valueSum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            if (flushOpenAtEnd) {
              cur.foreach { s =>
                closed ::= Session(userId, new Timestamp(s.startMs),
                                   new Timestamp(s.lastMs), s.n, s.valueSum)
              }
              state.remove()
            } else cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + SessionGapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join: each click matched to the same
    * user's purchases within the following hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can EVICT buffered rows once the watermark passes — the
    * two requirements that make a stream-stream join's state bounded
    * (an unconstrained join buffers both streams forever). Works
    * identically on bounded frames (batch ≡ stream, tested). */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", WatermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", WatermarkDelay)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
              col("purchase_id"), col("purchase_ts"), col("purchase_value"))
  }

  /** Stream-static enrichment: every micro-batch LEFT-joins the
    * static dimension (broadcast — the dim is small by definition of
    * being a dim). Stream-static joins need no watermark and keep no
    * join state: the static side is simply re-planned per micro-batch,
    * which also means a dim backed by a table/files picks up updates
    * between batches. Unmatched stream rows survive with null dim
    * columns (enrichment must never drop events). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup — the incremental twin of the batch
    * hash-groupBy dedup (q21): duplicates by `keys` are dropped for as
    * long as their event time is within the watermark, and the
    * dedup state is EVICTED once the watermark passes (bounded state —
    * a plain `dropDuplicates` on a stream grows state forever, the
    * scale trap this wrapper exists to avoid). */
  def dedupeStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", WatermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Wire a transform to a file-backed stream of events-shaped parquet
    * (the production entry: readStream → transform → writeStream). */
  def streamFromParquet(spark: SparkSession, dir: String,
                        transform: DataFrame => DataFrame): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    transform(spark.readStream.schema(schema).parquet(dir))
  }

  /** Continuous corpus ingest with CROSS-BATCH exact dedup — the
    * streaming face of [[graft.ops.IncrementalDedup]] (q74) and the
    * contract a training-data pipeline actually needs: a document is
    * a duplicate if its text appeared in ANY earlier batch, not just
    * inside the watermark window ([[dedupeStream]]'s bounded-state
    * regime). Each micro-batch first collapses its own internal
    * repeats (lowest id wins, the q21 keeper discipline), then checks
    * the ENTIRE landed corpus through the bloom-prefiltered exact
    * confirm, and appends only genuinely-new rows to the landing dir.
    *
    * The landed corpus IS the dedup state — there is no separate
    * state store to size, checkpoint, or lose. That makes retries
    * self-healing: if a batch reruns after a partial failure, every
    * row it already landed probes as a duplicate of itself and is
    * skipped, so at-least-once batch delivery still converges to an
    * exactly-once corpus. That includes a PARTIALLY-failed append
    * under the v2 task-side committer ([[graft.core.Committers]]):
    * leftover committed-task files are valid parquet the next batch
    * reads as corpus, so the retry appends only what is genuinely
    * missing (pinned by StreamingSpec's crash-retry case).
    * At 100 TB the corpus side is exactly q74's shape: one bloom scan
    * + a confirm join bounded by the batch's dup rate. */
  /** Landed-corpus row counts carried across micro-batches, keyed by
    * landing dir — exposed so StreamingSpec can pin that the count
    * tracks the corpus without per-batch recounting. */
  private[graft] val landedCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** In-batch exact keeper: lowest id per text (the q21 discipline);
    * the id leads the struct so min() orders by it. Shared by
    * [[ingestDedup]] and [[ingestPipeline]] — one copy of the keeper
    * rule. */
  private def exactFirsts(batch: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fields = col(idCol) +: batch.columns.filterNot(_ == idCol).map(col).toSeq
    batch.groupBy(col(textCol))
      .agg(min(struct(fields: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Exact-stage bloom carried across micro-batches, keyed by landing
    * dir. Rebuilding the bloom per batch is a FULL corpus scan per
    * micro-batch — O(corpus), the clearest scale-killer in a
    * long-running ingest over a large landing. The carried blob makes
    * steady state O(batch): probe with the carried blob, and after
    * each append OR-in a bloom of just the appended rows.
    *
    * Exactness discipline — a bloom MISSING landed texts would admit
    * duplicates (the false-NEGATIVE direction the confirm join cannot
    * repair), so the carry is only trusted when `landingFp`, a
    * file-status fingerprint of the landing dir recorded immediately
    * after our own append, still matches: ANY out-of-band change —
    * leftover task files from a crashed batch attempt (the
    * StreamingSpec crash-retry case), another writer, a manual edit —
    * changes the fingerprint and forces a reseed scan, restoring the
    * per-batch-rebuild self-heal exactly when it is needed and only
    * then. Capacity: the blob is sized for 4× the seed-time corpus
    * (~16 bits/row keeps confirm traffic ~0.5%); growing past that
    * drops the carry so the next batch reseeds at the new size —
    * amortized one corpus scan per 4× growth. */
  private[graft] final case class CarriedBloom(
    blob: Array[Byte], bits: Int, hashes: Int, capacity: Long, landingFp: String)
  private[graft] val carriedBlooms =
    new java.util.concurrent.ConcurrentHashMap[String, CarriedBloom]()

  private def landingFp(spark: SparkSession, landingDir: String): String =
    graft.core.Tables.fingerprint(spark, landingDir)

  /** Cross-batch exact confirm: bloom-pruned NOT-IN against the landed
    * corpus. Uses (and maintains) the carried bloom for `landingDir`;
    * seeds it with one corpus scan when absent, stale, or outgrown. */
  private def exactConfirm(spark: SparkSession, landingDir: String,
                           corpus: DataFrame, firsts: DataFrame, landedCount: Long,
                           textCol: String, idCol: String): DataFrame = {
    val fp = landingFp(spark, landingDir)
    val cached = carriedBlooms.get(landingDir)
    val carried =
      if (cached != null && cached.landingFp == fp && landedCount <= cached.capacity) cached
      else {
        val cap = math.max(landedCount, 1L) * 4
        val bits = graft.ops.IncrementalDedup.sizedBits(cap)
        val c = CarriedBloom(
          graft.ops.IncrementalDedup.buildBloom(corpus, textCol, bits, 3),
          bits, 3, cap, fp)
        carriedBlooms.put(landingDir, c)
        c
      }
    firsts.join(
      graft.ops.IncrementalDedup.newDocsWithBloom(corpus, firsts, carried.blob,
          textCol, idCol)
        .filter(col("is_new")).select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  /** The bloom metric to ride the append's Observation when a carry
    * exists: the appended rows' bloom is then computed DURING the
    * write itself — no extra action, and crucially no re-execution of
    * `fresh`'s plan, whose confirm subtree reads the landing (the
    * steady-state batch must never rescan the landing; pinned by
    * StreamingSpec's listener test). None when no carry exists yet —
    * the first batch seeds via [[seedCarryFromAppend]] instead. */
  private def bloomMetricFor(landingDir: String, textCol: String): Option[org.apache.spark.sql.Column] =
    Option(carriedBlooms.get(landingDir)).map(c =>
      call_function("bloom_agg", xxhash64(col(textCol)), lit(c.bits), lit(c.hashes)).as("bf"))

  /** After a successful append: fold the observed append-bloom into
    * the carry and re-stamp the landing fingerprint; drop the carry
    * when the landed count outgrew the blob (next batch reseeds at the
    * larger size). */
  private def foldObservedBloom(spark: SparkSession, landingDir: String,
                                observed: Option[Array[Byte]], landedCount: Long): Unit = {
    val cached = carriedBlooms.get(landingDir)
    if (cached == null || observed.isEmpty) return
    if (landedCount > cached.capacity) { carriedBlooms.remove(landingDir); return }
    carriedBlooms.put(landingDir, cached.copy(
      blob = graft.ops.IncrementalDedup.unionBloom(cached.blob, observed.get),
      landingFp = landingFp(spark, landingDir)))
  }

  /** First batch only (no carry yet): seed the carry from the append
    * itself — no corpus existed before it, so the append IS the
    * corpus, and `fresh`'s first-batch plan reads no landing (the dir
    * was absent), so re-running it here is landing-free batch-scale
    * work. */
  private def seedCarryFromAppend(spark: SparkSession, landingDir: String,
                                  fresh: DataFrame, landedCount: Long,
                                  textCol: String): Unit = {
    val cap = math.max(landedCount, 1L) * 4
    val bits = graft.ops.IncrementalDedup.sizedBits(cap)
    carriedBlooms.put(landingDir, CarriedBloom(
      graft.ops.IncrementalDedup.buildBloom(fresh, textCol, bits, 3),
      bits, 3, cap, landingFp(spark, landingDir)))
  }

  /** Cross-batch near-dup confirm: probe the landed `mh1..mh4`
    * signature columns (column-pruned scan, text never re-read). */
  private def nearConfirm(corpus: DataFrame, kept: DataFrame, idCol: String): DataFrame = {
    val corpusSigs = corpus
      .select(col(idCol), col("mh1"), col("mh2"), col("mh3"), col("mh4"))
    kept.join(
      graft.ops.NearDupIncremental.newDocs(corpusSigs, kept, idCol)
        .filter(col("is_new")).select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  def ingestDedup(docs: DataFrame, landingDir: String, checkpointDir: String,
                  textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // Landed row count carried across batches: seeded ONCE (first
    // batch that finds an existing dir — one metadata count), then
    // advanced by each batch's observed append size. Bloom sizing
    // (sizedBits) therefore never re-counts the landing dir, whose
    // file listing grows forever under a long-running stream. The
    // count only SIZES the filter — drift after a partial retry can't
    // break dedup exactness (the confirm join stays exact).
    val landed = landedCounts.computeIfAbsent(landingDir,
      _ => new java.util.concurrent.atomic.AtomicLong(-1L))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val firsts = exactFirsts(batch, textCol, idCol)
        // Only a genuinely-absent landing dir means "first batch".
        // Any other read failure (transient IO, corrupt footer,
        // permissions) must fail the batch so the retry re-runs WITH
        // dedup — swallowing it would append duplicates permanently
        // and break the exactly-once-corpus convergence contract.
        val landingPath = new org.apache.hadoop.fs.Path(landingDir)
        val fs = landingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val firstBatch = !fs.exists(landingPath)
        val fresh =
          if (firstBatch) {
            // first batch: nothing landed yet. Unconditional set, not
            // compareAndSet(-1,0): a stale carried counter from a
            // DELETED-and-recreated landing dir (same JVM, new stream)
            // must reset with the dir, or sizedBits sizes off a ghost
            // corpus forever. Same for a stale carried bloom.
            landed.set(0L)
            carriedBlooms.remove(landingDir)
            firsts
          } else {
            val corpus = spark.read.parquet(landingDir)
            if (landed.get() < 0L) landed.set(corpus.count()) // seed on restart
            exactConfirm(spark, landingDir, corpus, firsts, landed.get(), textCol, idCol)
          }
        // observe the append size — and, when a carry exists, the
        // appended rows' bloom — inside the write action (no second
        // computation of `fresh`, no landing rescan) and advance the
        // carried count + blob
        val bloomMetric = bloomMetricFor(landingDir, textCol)
        val obs = new org.apache.spark.sql.Observation(s"ingest_landed_$batchId")
        fresh.observe(obs, count(lit(1)).as("n"), bloomMetric.toSeq: _*)
          // task-side commit (v2): a failed batch may leave SOME task
          // files behind, and the carried-bloom fingerprint check
          // detects them on retry (mismatch → reseed from the landing,
          // which includes the leftovers) — the retried batch appends
          // only what is genuinely missing (self-heal pinned by
          // StreamingSpec's crash-retry case)
          .write.options(graft.core.Committers.TaskCommitV2)
          .mode("append").parquet(landingDir)
        landed.addAndGet(obs.get("n").asInstanceOf[Long])
        if (firstBatch)
          seedCarryFromAppend(spark, landingDir, fresh, landed.get(), textCol)
        else
          foldObservedBloom(spark, landingDir,
            bloomMetric.map(_ => obs.get("bf").asInstanceOf[Array[Byte]]), landed.get())
        ()
      }
      .start()
  }

  /** Cross-batch NEAR-dup ingest — [[ingestDedup]]'s MinHash/LSH twin
    * ([[graft.ops.NearDupIncremental]]): a batch doc is dropped when
    * any of its LSH band buckets already contains an accepted doc, so
    * a lightly-edited repost never re-enters the corpus.
    *
    * The landed corpus again IS the state, with one refinement: each
    * accepted row lands WITH its `mh1..mh4` signature columns, in the
    * SAME atomic append. Per-batch dedup therefore reads only those
    * four long columns off the landing (column-pruned scan — the text
    * is never re-tokenized), and state cannot diverge from the corpus
    * on a retry: a partially-failed append publishes each surviving
    * row WITH its signatures (the v2 task commit is atomic per file,
    * and signatures ride the same rows), so a replayed batch collides
    * with its own landed buckets and drops exactly those docs.
    * Within a batch the greedy bucket-min keeper applies first
    * (smallest id per bucket survives — deterministic, one pass;
    * see [[graft.ops.NearDupIncremental.keepBucketMins]] for the
    * over-drop trade vs full connected components, which remains the
    * batch q60 operator's job). The read-failure discipline matches
    * [[ingestDedup]]: only a genuinely-absent dir means "first
    * batch"; anything else fails the batch so the retry re-runs WITH
    * dedup. */
  def ingestNearDup(docs: DataFrame, landingDir: String, checkpointDir: String,
                    textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ops.NearDupIncremental
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val kept = NearDupIncremental.keepBucketMins(
          NearDupIncremental.withSigs(batch, textCol), idCol)
        val landingPath = new org.apache.hadoop.fs.Path(landingDir)
        val fs = landingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fresh =
          if (!fs.exists(landingPath)) kept // first batch: nothing landed yet
          else nearConfirm(spark.read.parquet(landingDir), kept, idCol)
        // v2 task commit: see ingestDedup's append — partial publishes
        // are absorbed because signatures land with their rows
        fresh.write.options(graft.core.Committers.TaskCommitV2)
          .mode("append").parquet(landingDir)
        ()
      }
      .start()
  }

  /** The production ingest shape: EXACT dedup then NEAR-dup, composed
    * in one foreachBatch against ONE landing dir. Exact-equal reposts
    * are the overwhelming bulk of real ingest duplicates and are
    * eliminated first by the cheap path (in-batch text keeper, then
    * bloom-pruned confirm against the landed text — the whole batch
    * never reaches MinHash); only the exact-survivors are shingled,
    * signed, bucket-min-kept, and probed against the landed `mh1..mh4`
    * (column-pruned scan, text never re-tokenized). Survivors land
    * WITH their signatures in one atomic-per-file append, so the
    * landed corpus is simultaneously the exact-dedup state (text) and
    * the near-dup state (signatures), and the crash-retry self-heal
    * argument of both parents applies unchanged: a leftover task file
    * carries text+sigs together, so a replayed batch collides with its
    * own partial publish on BOTH stages.
    *
    * Near-dup would also drop exact duplicates (equal texts share all
    * buckets), so correctness does not depend on stage order; the
    * ordering is a cost statement — signature computation is the
    * expensive stage, and it runs only on what exact dedup admits.
    *
    * Read-failure discipline matches the parents: only a genuinely-
    * absent landing dir means "first batch"; any other failure fails
    * the batch so the retry re-runs WITH dedup. */
  def ingestPipeline(docs: DataFrame, landingDir: String, checkpointDir: String,
                     textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ops.NearDupIncremental
    val landed = landedCounts.computeIfAbsent(landingDir,
      _ => new java.util.concurrent.atomic.AtomicLong(-1L))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // stage 1a: in-batch exact keeper (shared with ingestDedup)
        val firsts = exactFirsts(batch, textCol, idCol)
        val landingPath = new org.apache.hadoop.fs.Path(landingDir)
        val fs = landingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val firstBatch = !fs.exists(landingPath)
        val fresh =
          if (firstBatch) { // nothing landed yet
            landed.set(0L) // see ingestDedup: reset, don't CAS — the dir may have been recreated
            carriedBlooms.remove(landingDir)
            // stage 2a only (nothing landed to probe): in-batch
            // near-dup keeper over the exact-survivors
            NearDupIncremental.keepBucketMins(
              NearDupIncremental.withSigs(firsts, textCol), idCol)
          } else {
            val corpus = spark.read.parquet(landingDir)
            if (landed.get() < 0L) landed.set(corpus.count()) // seed on restart
            // stage 1b: cross-batch exact confirm (carried-bloom prune + join)
            val exactNew = exactConfirm(spark, landingDir, corpus, firsts, landed.get(), textCol, idCol)
            // stage 2: sign ONLY the exact-survivors, keep in-batch
            // bucket minima, then probe the landed signature columns
            val kept = NearDupIncremental.keepBucketMins(
              NearDupIncremental.withSigs(exactNew, textCol), idCol)
            nearConfirm(corpus, kept, idCol)
          }
        // the landing holds exactly the near-surviving texts, so the
        // carried EXACT bloom folds the final `fresh` (post-near),
        // observed during the write like ingestDedup's
        val bloomMetric = bloomMetricFor(landingDir, textCol)
        val obs = new org.apache.spark.sql.Observation(s"ingest_pipe_landed_$batchId")
        fresh.observe(obs, count(lit(1)).as("n"), bloomMetric.toSeq: _*)
          .write.options(graft.core.Committers.TaskCommitV2)
          .mode("append").parquet(landingDir)
        landed.addAndGet(obs.get("n").asInstanceOf[Long])
        if (firstBatch)
          seedCarryFromAppend(spark, landingDir, fresh, landed.get(), textCol)
        else
          foldObservedBloom(spark, landingDir,
            bloomMetric.map(_ => obs.get("bf").asInstanceOf[Array[Byte]]), landed.get())
        ()
      }
      .start()
  }
}
