package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Percentiles

/** Lazy sort-based exact percentiles vs Spark's own exact `percentile`
  * aggregate (the value-map implementation this operator replaces for
  * all-distinct columns). */
class PercentilesSpec extends AnyFunSuite with SparkTestSession {

  test("matches the percentile aggregate on an all-distinct column") {
    import spark.implicits._
    // deterministic, unordered, all-distinct values incl. negatives
    val df = (1 to 10007).map(i => ((i * 7919) % 10007) - 5000.0).toDF("x")
    val got = Percentiles.exactBySort(df, "x", Seq(0.25, 0.5, 0.75), "p")
      .head()
    val want = df.select(expr("percentile(x, array(0.25D, 0.5D, 0.75D))"))
      .head().getSeq[Double](0)
    assert(got.getDouble(0) == want(0))
    assert(got.getDouble(1) == want(1))
    assert(got.getDouble(2) == want(2))
  }

  test("interpolates between bracketing ranks and ignores nulls") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(2.0), Some(3.0), Some(4.0))
      .toDF("x")
    // n=4: r(0.5) = 1.5 -> 2.0 + 0.5*(3.0-2.0) = 2.5
    val got = Percentiles.exactBySort(df, "x", Seq(0.5), "p").head().getDouble(0)
    assert(got == 2.5)
  }

  test("cents histogram matches the percentile aggregate incl. duplicates and negatives") {
    import spark.implicits._
    // 2-decimal money-like values with heavy duplication and negatives
    val df = (1 to 20011).map(i => (((i * 37) % 997) - 300) / 4.0).toDF("x")
    val got = Percentiles.exactByCentsHistogram(df, "x", Seq(0.1, 0.5, 0.9), "p").head()
    val want = df.select(expr("percentile(x, array(0.1D, 0.5D, 0.9D))"))
      .head().getSeq[Double](0)
    assert(got.getDouble(0) == want(0))
    assert(got.getDouble(1) == want(1))
    assert(got.getDouble(2) == want(2))
    // and it agrees with the sort-based general operator
    val bySort = Percentiles.exactBySort(df, "x", Seq(0.1, 0.5, 0.9), "p").head()
    assert((0 to 2).forall(i => bySort.getDouble(i) == got.getDouble(i)))
  }

  test("range exchange is reused across the meta and ranked consumers") {
    import spark.implicits._
    // Correctness of exactBySort depends on BOTH consumers of the
    // range-partitioned values (per-chunk counts and ranked rows)
    // seeing the SAME partition bounds: range bounds come from seeded
    // sampling, so a recomputed exchange could draw different bounds
    // and corrupt global ranks. AQE's runtime exchange reuse makes the
    // two branches share one exchange — this pins that plan property
    // so a Spark upgrade or conf change that breaks reuse fails loudly
    // instead of silently risking rank skew.
    val df = (1 to 10007).map(i => ((i * 7919) % 10007).toDouble).toDF("x")
    val result = Percentiles.exactBySort(df, "x", Seq(0.25, 0.5, 0.75), "p")
    result.collect() // adaptive plan finalizes only on execution
    val executed = result.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") || executed.contains("ReusedQueryStage"),
           s"range exchange not reused across consumers:\n$executed")
  }

  test("is one lazy plan: no jobs run at construction, no global-sort window") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan = Percentiles.exactBySort(df, "x", Seq(0.5), "p")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "construction must not launch jobs")
    val explained = plan.queryExecution.explainString(FormattedMode)
    // the data-bearing window is keyed by partition id, never a global
    // single-partition ordering over the values
    assert(!explained.contains("Window [row_number() windowspecdefinition(v#"),
           s"global value-ordered window found:\n$explained")
  }
}
