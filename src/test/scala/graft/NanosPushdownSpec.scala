package graft

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Pins [[graft.plans.NanosTsPushdown]]: on the legacy nanos-long
  * `events` generation, a ts-range predicate over the normalized
  * column must (a) reach the parquet scan's `PushedFilters` as a
  * bare-long comparison, and (b) keep EXACTLY the semantics of the
  * unrewritten `timestamp_micros(ts div 1000) <cmp> bound` — including
  * at the sub-microsecond truncation boundaries, where an off-by-one
  * in the ×1000 rescale silently drops or admits edge rows.
  */
class NanosPushdownSpec extends AnyFunSuite with SparkTestSession {

  /** micros bound all comparisons run against. */
  private val M = 1714566896789012L // 2024-05-01T12:34:56.789012Z
  private val bound = java.sql.Timestamp.from(
    java.time.Instant.EPOCH.plusNanos(M * 1000))

  /** Nanos values straddling every truncation boundary of M: the four
    * neighbors of the [1000·M, 1000·M+999] micro-bucket, its interior,
    * plus far-away and epoch rows. */
  private val nanosValues: Seq[Long] = Seq(
    M * 1000 - 1000, M * 1000 - 1, M * 1000, M * 1000 + 1,
    M * 1000 + 999, M * 1000 + 1000, M * 1000 + 1999,
    0L, 1L, 999L, 1000L, 1700000000123456789L)

  private lazy val nanosDir: Path = {
    val dir = Files.createTempDirectory("graft-nanos-pushdown")
    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveType.PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new HPath(dir.resolve("events.parquet").toString))
      .withConf(conf).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try nanosValues.zipWithIndex.foreach { case (n, id) =>
      val g = f.newGroup()
      g.add("event_id", id.toLong)
      g.add("ts", n)
      w.write(g)
    } finally w.close()
    dir
  }

  private def events: DataFrame = Tables.events(spark, nanosDir.toString)

  test("nanos generation: ts-range predicate reaches PushedFilters as a long bound") {
    import org.apache.spark.sql.types.LongType
    // sanity: this fixture really exercises the nanos-long branch
    assert(Tables.load(spark, nanosDir.toString, "events").schema("ts").dataType == LongType)
    val p = events.filter(col("ts") >= bound)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("GreaterThanOrEqual(ts,"),
      s"nanos ts bound not pushed to the parquet scan:\n${p.take(1500)}")
    // and the pushed bound is the rescaled long, not a timestamp string
    assert(p.contains(s"GreaterThanOrEqual(ts,${M * 1000})"),
      s"pushed bound is not the exact 1000x rescale:\n${p.take(1500)}")
  }

  test("rewrite is exact at every truncation boundary, all six comparison shapes") {
    // Oracle: evaluate `(n div 1000) <cmp> M` in Scala with div's
    // truncate-toward-zero semantics (all fixture nanos are >= 0, so
    // trunc == floor here; negative-operand algebra is covered below).
    def q(n: Long): Long = n / 1000
    val cases: Seq[(String, DataFrame, Long => Boolean)] = Seq(
      (">=", events.filter(col("ts") >= bound), n => q(n) >= M),
      (">",  events.filter(col("ts") >  bound), n => q(n) >  M),
      ("<=", events.filter(col("ts") <= bound), n => q(n) <= M),
      ("<",  events.filter(col("ts") <  bound), n => q(n) <  M),
      ("==", events.filter(col("ts") === bound), n => q(n) == M),
      // literal-on-left mirror (lit <= col  ⟺  col >= lit)
      ("mirror<=", events.filter(lit(bound) <= col("ts")), n => q(n) >= M))
    cases.foreach { case (name, df, oracle) =>
      val got = df.select("event_id").collect().map(_.getLong(0)).toSet
      val want = nanosValues.zipWithIndex.collect {
        case (n, id) if oracle(n) => id.toLong
      }.toSet
      assert(got == want, s"op $name: got $got, want $want")
    }
  }

  test("negative-nanos algebra: trunc-toward-zero bounds are exact") {
    // The rule's lower/upper derivation must hold for pre-epoch nanos,
    // where div truncates toward zero (≠ floor). Exhaustive check of
    // the bound formulas against brute force over a window crossing
    // zero, for every micros bound in a small window around zero.
    def q(n: Long): Long = n / 1000 // JVM long division == Spark div
    def lower(m: Long): Long = if (m > 0) m * 1000 else m * 1000 - 999
    def upper(m: Long): Long = if (m >= 0) m * 1000 + 999 else m * 1000
    val ns = -3000L to 3000L
    for (m <- -3L to 3L) {
      assert(ns.filter(q(_) >= m) == ns.filter(_ >= lower(m)), s"lower($m)")
      assert(ns.filter(q(_) <= m) == ns.filter(_ <= upper(m)), s"upper($m)")
      assert(ns.filter(q(_) == m) == ns.filter(n => n >= lower(m) && n <= upper(m)), s"eq($m)")
    }
  }

  test("guards: Long.MinValue bound and non-deterministic operand are left alone") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.dsl.plans._
    import org.apache.spark.sql.catalyst.expressions.{
      EqualTo, IntegralDivide, Literal, MicrosToTimestamp, Rand}
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.types.{LongType, TimestampType}
    import graft.plans.NanosTsPushdown

    val ts = Symbol("ts").long
    val rel = LocalRelation(ts)
    def nanosAsTs(n: org.apache.spark.sql.catalyst.expressions.Expression) =
      MicrosToTimestamp(IntegralDivide(n, Literal(1000L, LongType)))

    // 1. A Long.MinValue micros bound: abs(MinValue) == MinValue (< MaxSafeMicros),
    //    so an abs-based guard would admit it and ×1000 would wrap. The explicit
    //    range guard must refuse the rewrite entirely.
    val minPlan = rel.where(EqualTo(nanosAsTs(ts), Literal(Long.MinValue, TimestampType))).analyze
    assert(NanosTsPushdown(minPlan).fastEquals(minPlan),
      "Long.MinValue bound must not be rewritten (×1000 would overflow)")

    // 2. A non-deterministic operand: the EqualTo rewrite would duplicate it
    //    into two comparisons, evaluating it twice. Must be left untouched.
    val nonDet = org.apache.spark.sql.catalyst.expressions.Cast(new Rand(Literal(42L)), LongType)
    assert(!nonDet.deterministic)
    val ndPlan = rel.where(EqualTo(nanosAsTs(nonDet), Literal(M, TimestampType))).analyze
    assert(NanosTsPushdown(ndPlan).fastEquals(ndPlan),
      "non-deterministic operand must not be duplicated by the EqualTo rewrite")

    // 3. Control: the same shapes with a safe bound and a deterministic
    //    operand DO rewrite (guards are not over-broad).
    val okPlan = rel.where(EqualTo(nanosAsTs(ts), Literal(M, TimestampType))).analyze
    assert(!NanosTsPushdown(okPlan).fastEquals(okPlan), "control rewrite did not fire")
  }

  test("predicates the rule must NOT touch still evaluate correctly") {
    // A non-literal bound (column vs column) matches no rewrite case;
    // the filter must still run through the unrewritten expression.
    val df = events.withColumn("b", lit(bound)).filter(col("ts") >= col("b"))
    assert(df.count() == nanosValues.count(_ / 1000 >= M))
  }
}
