package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

/** As-of join semantics: latest right row ≤ left ts per key, `>=` tie
  * inclusion, null before any right row, per-key isolation,
  * deterministic tie-break among equal-ts right rows. */
class AsOfSpec extends AnyFunSuite with SparkTestSession {

  private def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s")

  test("matches the latest right row at or before each left timestamp") {
    import spark.implicits._
    val quotes = Seq( // key, ts, quote_id, px
      (1L, t("10:00:00"), 100L, 10.0),
      (1L, t("10:05:00"), 101L, 11.0),
      (1L, t("10:10:00"), 102L, 12.0),
      (2L, t("10:07:00"), 200L, 99.0)).toDF("k", "ts", "quote_id", "px")
    val trades = Seq( // key, ts, trade_id
      (1L, t("09:59:00"), 1L),  // before any quote -> null
      (1L, t("10:05:00"), 2L),  // exactly at quote 101 -> inclusive match
      (1L, t("10:07:30"), 3L),  // between 101 and 102 -> 101
      (1L, t("10:30:00"), 4L),  // after all -> 102
      (2L, t("10:08:00"), 5L)   // other key -> its own quote, not key 1's
    ).toDF("k", "ts", "trade_id")

    val got = AsOf.asofJoin(trades, quotes, "k", "ts", tieBreakCol = "quote_id")
      .orderBy("trade_id")
      .select("trade_id", "r_quote_id", "r_px")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

    assert(got(0) == ((1L, None, None)))
    assert(got(1) == ((2L, Some(101L), Some(11.0))))
    assert(got(2) == ((3L, Some(101L), Some(11.0))))
    assert(got(3) == ((4L, Some(102L), Some(12.0))))
    assert(got(4) == ((5L, Some(200L), Some(99.0))))
  }

  test("equal-ts right rows resolve deterministically to the greatest tie-break") {
    import spark.implicits._
    val right = Seq(
      (1L, t("10:00:00"), 7L, 1.0),
      (1L, t("10:00:00"), 9L, 2.0)).toDF("k", "ts", "rid", "v")
    val left = Seq((1L, t("10:00:00"), 50L)).toDF("k", "ts", "lid")
    val got = AsOf.asofJoin(left, right, "k", "ts", tieBreakCol = "rid")
      .select("r_rid").head
    assert(got.getLong(0) == 9L)
  }

  test("plans with a single shuffle (the window partition)") {
    import spark.implicits._
    val right = Seq((1L, t("10:00:00"), 7L)).toDF("k", "ts", "rid")
    val left = Seq((1L, t("10:01:00"), 50L)).toDF("k", "ts", "lid")
    val plan = AsOf.asofJoin(left, right, "k", "ts", tieBreakCol = "rid")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchanges = "Exchange \\(".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one exchange:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"no join operator expected:\n$plan")
  }
}
