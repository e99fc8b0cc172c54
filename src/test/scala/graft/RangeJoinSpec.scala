package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Range-join semantics: equivalence with the brute-force inequality
  * join, boundary inclusion, and the no-nested-loop plan property. */
class RangeJoinSpec extends AnyFunSuite with SparkTestSession {

  private def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("matches exactly the pairs within the radius (boundaries inclusive)") {
    import spark.implicits._
    val left = Seq((1L, t(0)), (2L, t(1000))).toDF("id", "ts")
    val right = Seq(
      (10L, t(-60)), (11L, t(0)), (12L, t(59)), (13L, t(60)),
      (14L, t(61)), (15L, t(999)), (16L, t(1060))).toDF("id", "ts")
    val got = RangeJoin.byTime(left, right, "ts", radiusSec = 60)
      .select(col("id"), col("r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), // ±60 inclusive
      (2L, 15L), (2L, 16L)))
  }

  test("equivalent to the brute-force cross+filter on random-ish data") {
    import spark.implicits._
    val left = (1 to 60).map(i => (i.toLong, t(i * 37 % 900))).toDF("id", "ts")
    val right = (1 to 80).map(i => (i.toLong + 1000, t(i * 53 % 900))).toDF("id", "ts")
    val fast = RangeJoin.byTime(left, right, "ts", radiusSec = 45)
      .select(col("id"), col("r_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = left.crossJoin(right.select(col("id").as("rid"), col("ts").as("rts")))
      .filter(abs(unix_micros(col("ts")) - unix_micros(col("rts"))) <= 45L * 1000000)
      .select(col("id"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == slow)
    assert(fast.nonEmpty)
  }

  test("plan: equi-join on buckets, no nested-loop product") {
    import spark.implicits._
    val left = Seq((1L, t(0))).toDF("id", "ts")
    val right = Seq((2L, t(5))).toDF("id", "ts")
    val plan = RangeJoin.byTime(left, right, "ts", radiusSec = 60)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
           s"nested-loop detected:\n$plan")
  }
}
