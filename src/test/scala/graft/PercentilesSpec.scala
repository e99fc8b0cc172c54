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

  test("cents fine-pass value-range predicate shape reaches PushedFilters") {
    // exactByCentsHistogram's second pass filters the SOURCE column
    // with an OR of closed ranges precisely so the scan prunes row
    // groups at cluster scale; this pins that Spark's parquet pushdown
    // accepts that shape (Or(And(>=,<=),And(>=,<=))) on a double
    // column — if it ever stops pushing, the fine pass silently
    // becomes a second full scan.
    import org.apache.spark.sql.functions.{col, lit}
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val pred =
      (col("l_extendedprice") >= lit(100.0) && col("l_extendedprice") <= lit(102.56)) ||
      (col("l_extendedprice") >= lit(500.0) && col("l_extendedprice") <= lit(502.56))
    val p = li.filter(pred).select("l_extendedprice")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("Or(And(GreaterThanOrEqual(l_extendedprice"),
           s"fine-pass range predicate not pushed:\n${p.take(1200)}")
  }

  test("ranged data materializes once; both consumers share the checkpointed RDD") {
    import spark.implicits._
    // Correctness of exactBySort depends on BOTH consumers of the
    // range-partitioned values (per-chunk counts and ranked rows)
    // seeing the SAME partition bounds: range bounds come from seeded
    // sampling, so two independently-planned exchanges could draw
    // different bounds and corrupt global ranks. Round 6 leaned on
    // runtime ReusedExchange for this; the operator now branches both
    // consumers from ONE lazy localCheckpoint, so the guarantee is
    // structural: the final plan holds two scans of the same
    // checkpointed RDD and NO range exchange at all (the range
    // pipeline lives once, inside the checkpoint lineage).
    val df = (1 to 10007).map(i => ((i * 7919) % 10007).toDouble).toDF("x")
    val result = Percentiles.exactBySort(df, "x", Seq(0.25, 0.5, 0.75), "p")
    result.collect() // adaptive plan finalizes only on execution
    // AdaptiveSparkPlan.toString prints final AND initial plans —
    // inspect only the final section
    val executed = result.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!executed.toLowerCase.contains("rangepartitioning"),
           s"range exchange should live inside the checkpoint lineage, not the plan:\n$executed")
    val scans = "Scan ExistingRDD".r.findAllIn(executed).length
    assert(scans == 2, s"expected 2 scans of the shared checkpointed RDD, got $scans:\n$executed")
  }

  test("construction materializes only the checkpoint stages; no global-sort window") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan = Percentiles.exactBySort(df, "x", Seq(0.5), "p")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // the checkpoint pays the range-sample + shuffle-write stages up
    // front (that is the single-materialization contract); anything
    // beyond those few jobs would mean driver-side compute crept in
    assert(after - before <= 3,
      s"construction ran ${after - before} jobs — more than the checkpoint stages")
    val explained = plan.queryExecution.explainString(FormattedMode)
    // no window at all anymore: ranks come from the checkpointed
    // monotonically_increasing_id layout, never a global
    // single-partition ordering over the values
    assert(!explained.contains("row_number()"),
           s"rank window found — ranks must come from the checkpointed id layout:\n$explained")
  }
}
