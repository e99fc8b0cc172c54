package graft

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Pins [[Tables.events]] against BOTH physical `ts` encodings the
  * driver's fixture generator has shipped (TESTDATA.md history):
  *
  *  - int64 TIMESTAMP(NANOS) — read as a long of nanos under
  *    `spark.sql.legacy.parquet.nanosAsLong=true`;
  *  - int64 TIMESTAMP(MICROS, isAdjustedToUTC=false) — inferred as
  *    TIMESTAMP_NTZ.
  *
  * The round-10 bench broke (15 queries, `DATATYPE_MISMATCH`) exactly
  * because only one of these forms was covered when the fixtures were
  * regenerated; this spec makes that class of breakage a test failure
  * instead of a round-long bench outage. The micros fixture here is
  * written through parquet-java directly (not Spark) so the annotation
  * under test is the file's, not the writer session's.
  */
class TablesSpec extends AnyFunSuite with SparkTestSession {

  /** (event_id, micros-since-epoch-UTC) rows both fixtures encode. */
  private val rows: Seq[(Long, Long)] = Seq(
    0L -> 1714566896789012L, // 2024-05-01T12:34:56.789012Z
    1L -> 0L,                // the epoch itself
    2L -> 1700000000123456L)

  private def eventsSchema(unit: LogicalTypeAnnotation.TimeUnit) =
    Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveType.PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, unit)).named("ts")
      .named("events")

  /** Writes `dir/events.parquet` with `ts` in the given unit; nanos
    * rows carry +999 ns of sub-micro precision so the normalization's
    * truncation to micros is exercised, not just the aligned case. */
  private def writeFixture(dir: Path, unit: LogicalTypeAnnotation.TimeUnit): Unit = {
    val schema = eventsSchema(unit)
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new HPath(dir.resolve("events.parquet").toString))
      .withConf(conf).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, us) =>
      val g = f.newGroup()
      g.add("event_id", id)
      g.add("ts", if (unit == LogicalTypeAnnotation.TimeUnit.NANOS) us * 1000 + 999 else us)
      w.write(g)
    } finally w.close()
  }

  test("events: nanos-long and micros-NTZ fixtures normalize to identical timestamps") {
    val nanosDir = Files.createTempDirectory("graft-events-nanos")
    val ntzDir = Files.createTempDirectory("graft-events-ntz")
    writeFixture(nanosDir, LogicalTypeAnnotation.TimeUnit.NANOS)
    writeFixture(ntzDir, LogicalTypeAnnotation.TimeUnit.MICROS)

    // sanity: the two fixtures really exercise the two raw schemas the
    // dispatch branches on — otherwise this spec silently tests one path
    assert(Tables.load(spark, nanosDir.toString, "events").schema("ts").dataType == LongType)
    assert(Tables.load(spark, ntzDir.toString, "events").schema("ts").dataType == TimestampNTZType)

    val a = Tables.events(spark, nanosDir.toString)
    val b = Tables.events(spark, ntzDir.toString)
    assert(a.schema("ts").dataType == TimestampType, "nanos branch must yield TIMESTAMP")
    assert(b.schema("ts").dataType == TimestampType, "NTZ branch must yield TIMESTAMP")

    def values(df: org.apache.spark.sql.DataFrame): Seq[(Long, java.time.Instant)] =
      df.orderBy("event_id").collect().toSeq
        .map(r => (r.getLong(0), r.getTimestamp(1).toInstant))
    assert(values(a) == values(b),
      "the two physical encodings must agree after normalization")
    // and both agree with the literal micros the fixtures encode
    val expected = rows.map { case (id, us) =>
      (id, java.time.Instant.EPOCH.plusNanos(us * 1000))
    }
    assert(values(b) == expected)
  }

  test("events: the session timezone contract is UTC (value-preserving NTZ read)") {
    // Tables.events documents that the NTZ reading is wall-clock
    // identity ONLY under a UTC session zone; fail loudly here rather
    // than let a config drift silently shift every event instant.
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("events: a non-UTC session zone is rejected, not silently shifted") {
    val ntzDir = Files.createTempDirectory("graft-events-ntz-tz")
    writeFixture(ntzDir, LogicalTypeAnnotation.TimeUnit.MICROS)
    val orig = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] {
        Tables.events(spark, ntzDir.toString)
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", orig)
  }

  test("registerAll: every fixture table is SQL-addressable; events arrives normalized") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val counts = spark.sql(
      "SELECT (SELECT count(*) FROM region) AS r, (SELECT count(*) FROM lineitem) AS l")
      .head()
    assert(counts.getLong(0) == 5 && counts.getLong(1) == 6000)
    // the view serves the NORMALIZED events (session-zoned TIMESTAMP),
    // not the raw physical encoding
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType == TimestampType)
    // SQL over a view composes with the injected engine functions
    val toks = spark.sql(
      "SELECT sum(size(word_tokens(text))) AS n FROM documents").head().getLong(0)
    assert(toks > 0)
  }

  test("load: the schema memo self-invalidates on in-place regeneration") {
    // Pins the Tables.load catalog contract: schema is inferred once
    // per (path, file-status fingerprint) — the catalog-style memo that
    // removed the ~70 ms/query footer-inference tax (BASELINE round 12
    // third session) — and a same-path rewrite with a DIFFERENT schema
    // is visible on the very next load with NO manual invalidate():
    // the driver regenerated /root/testdata three times in round 12
    // alone, and a stale served schema is the round-10 breakage class.
    val dir = Files.createTempDirectory("graft-schema-memo").toString
    val path = s"$dir/region.parquet"
    spark.range(3).selectExpr("id as r_regionkey").write.parquet(path)
    assert(Tables.load(spark, dir, "region").schema.fieldNames.toSeq
      == Seq("r_regionkey"))
    // memo hit: a second load of the unchanged dir serves the same schema
    assert(Tables.load(spark, dir, "region").schema.fieldNames.toSeq
      == Seq("r_regionkey"))
    // rewrite in place with a changed schema; the fingerprint (part
    // names/lengths/mtimes) changes, so the new schema is re-inferred
    // immediately — no invalidate() call anywhere in this test
    spark.range(3).selectExpr("id as r_regionkey", "'x' as r_name")
      .write.mode("overwrite").parquet(path)
    assert(Tables.load(spark, dir, "region").schema.fieldNames.toSeq.sorted
      == Seq("r_name", "r_regionkey"))
  }

  test("load: a same-schema file append is visible on the next load") {
    // The relation memo caches the resolved FileIndex, so the OLD
    // "listing is per-call" visibility contract now rides the
    // fingerprint key instead: appending a part file changes the
    // dir's stat fingerprint, which must rebuild the relation and
    // surface the new rows — with no invalidate() call.
    val dir = Files.createTempDirectory("graft-listing-memo").toString
    val path = s"$dir/region.parquet"
    spark.range(3).selectExpr("id as r_regionkey").write.parquet(path)
    assert(Tables.load(spark, dir, "region").count() == 3)
    spark.range(2).selectExpr("id + 100 as r_regionkey")
      .write.mode("append").parquet(path)
    assert(Tables.load(spark, dir, "region").count() == 5,
      "appended part file not visible — relation memo failed to re-key on the new listing")
  }

  test("load: relation memo is per-session — a second session gets its own relation") {
    // The memo is keyed weakly by session: a DataFrame built in one
    // session must never be served to another (plans carry their
    // session), and both sessions must read the same data correctly.
    val dir = Files.createTempDirectory("graft-two-sessions").toString
    spark.range(4).selectExpr("id as r_regionkey").write.parquet(s"$dir/region.parquet")
    val df1 = Tables.load(spark, dir, "region")
    val other = spark.newSession()
    val df2 = Tables.load(other, dir, "region")
    assert(df1.sparkSession eq spark)
    assert(df2.sparkSession eq other)
    assert(df1.count() == 4 && df2.count() == 4)
    // same session + unchanged dir -> the SAME memoized frame
    assert(Tables.load(spark, dir, "region") eq df1)
  }

  test("documentsCount/sourceNames self-invalidate on documents rewrite") {
    // With q61 feeding documentsCount into RESULT values, a stale
    // count after an in-place regeneration would be a silent
    // correctness bug — so the data memos carry the same fingerprint
    // key as the schema/relation memos.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-doccount-memo").toString
    val path = s"$dir/documents.parquet"
    Seq((1L, "a", "s1"), (2L, "b", "s2")).toDF("doc_id", "text", "source")
      .write.parquet(path)
    assert(Tables.documentsCount(spark, dir) == 2L)
    assert(Tables.sourceNames(spark, dir) == Seq("s1", "s2"))
    Seq((1L, "a", "s1"), (2L, "b", "s2"), (3L, "c", "s3"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(path)
    assert(Tables.documentsCount(spark, dir) == 3L,
      "stale documentsCount after in-place rewrite")
    assert(Tables.sourceNames(spark, dir) == Seq("s1", "s2", "s3"),
      "stale sourceNames after in-place rewrite")
  }
}
