package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PrefixSum

/** Distributed running totals vs the naive global-order window. */
class PrefixSumSpec extends AnyFunSuite with SparkTestSession {

  test("matches SUM OVER (ORDER BY) exactly on shuffled input") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 7919) % 5001, (i % 13).toLong))
      .toDF("k", "v") // unique keys, arbitrary order
    val got = PrefixSum.runningTotal(df, "k", "v", "cum")
      .select("k", "cum").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the ORACLE is deliberately the naive global window (the thing
    // runningTotal exists to avoid) — the "No Partition Defined"
    // warning this line triggers is the oracle's, not the operator's
    // (PlanSpec pins that no production plan carries one)
    val want = df.withColumn("cum",
        sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("k", "cum").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("range exchange is reused across the offsets and ranked consumers") {
    import spark.implicits._
    // same pinning as PercentilesSpec: both consumers of the
    // range-partitioned frame must share one exchange (sampled range
    // bounds could differ between recomputations and corrupt offsets)
    val df = (1 to 5000).map(i => ((i * 7919) % 5001, (i % 13).toLong)).toDF("k", "v")
    val result = PrefixSum.runningTotal(df, "k", "v", "cum")
    result.collect()
    val executed = result.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") || executed.contains("ReusedQueryStage"),
           s"range exchange not reused across consumers:\n$executed")
  }

  test("the data-bearing window is chunk-keyed, never a global ordering") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, 1L)).toDF("k", "v")
    val plan = PrefixSum.runningTotal(df, "k", "v", "cum")
      .queryExecution.explainString(FormattedMode)
    // the only acceptable global-order window is over __pid chunk
    // counts (P rows); the values themselves must be windowed by __pid
    assert(plan.contains("partitionBy") || plan.contains("__pid"), plan)
    assert(!plan.contains("windowspecdefinition(k#"),
           s"found a window globally ordered by the data key:\n$plan")
  }
}
