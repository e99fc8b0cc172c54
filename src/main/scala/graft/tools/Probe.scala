package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Dev-loop profiler: time named SparkEntry queries (min of N runs,
  * after warm-up) and optionally dump their formatted plans.
  *
  *   graft.tools.Probe q01_pricing_summary q03_join_segment
  *   graft.tools.Probe --explain q32_describe
  *   graft.tools.Probe --adhoc   (runs the inline experiments below)
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe")
    val explain = args.contains("--explain")
    val names = args.filterNot(_.startsWith("--"))

    if (args.contains("--adhoc")) adhoc(spark, sfDir)
    if (args.contains("--entry")) {
      val n = graft.SparkEntry.entry(spark).count()
      println(s"[probe] entry() rows = $n")
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) {
        println(s"==== $name ====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min ${times.min}%6.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }

  /** Scratch space for micro-experiments; edit freely between runs. */
  private def adhoc(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import graft.ops.Text
    val docs = Tables.documents(spark, sfDir)
    def dtime(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[adhoc] $label%-40s min ${ts.min}%6.3f")
    }
    val toks = Text.tokens(col("text"))
    dtime("tokens only")(docs.select(col("doc_id"), toks.as("t")))
    dtime("size(tokens)")(docs.select(col("doc_id"), size(toks).as("n")))
    dtime("size(distinct)")(docs.select(col("doc_id"), size(array_distinct(toks)).as("n")))
    dtime("ngram2 size")(docs.select(col("doc_id"), size(Text.ngrams(toks, 2)).as("n")))
    dtime("stopword ratio")(docs.select(col("doc_id"), Text.stopwordRatio(toks).as("r")))
    dtime("toks once, 4 stats")(docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), size(col("t")).as("a"), size(array_distinct(col("t"))).as("b"),
              greatest(size(col("t")) - 1, lit(0)).as("c"),
              Text.stopwordRatio(col("t")).as("d")))
    val li = Tables.lineitem(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[adhoc] $label%-40s min ${ts.min}%6.3f")
    }
    li.count() // warm
    time("count(*)") { li.agg(count(lit(1))).collect() }
    time("sum(double)") { li.agg(sum(col("l_quantity"))).collect() }
    time("sum(decimal18_2)") {
      li.agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))).collect()
    }
    time("6x decimal sums (q01 shape)") {
      li.agg(
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
        sum(col("l_discount").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
        count(col("l_quantity")), count(col("l_extendedprice")), count(col("l_discount"))).collect()
    }
    time("groupBy(2) 6 decimal sums") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
        sum(col("l_discount").cast(org.apache.spark.sql.types.DecimalType(18, 2)))).collect()
    }
    time("exact percentile(price)") {
      li.agg(expr("percentile(l_extendedprice, array(0.25D,0.5D,0.75D))")).collect()
    }
    time("exact percentile(quantity)") {
      li.agg(expr("percentile(l_quantity, array(0.25D,0.5D,0.75D))")).collect()
    }
    time("sort price") { li.select("l_extendedprice").orderBy("l_extendedprice").write.format("noop").mode("overwrite").save() }
    time("rdd sortBy+zip+filter") {
      val values = li.select("l_extendedprice").na.drop().rdd.map(_.getDouble(0))
      val n = values.count()
      val need = Seq(0.25, 0.5, 0.75).flatMap { p =>
        val r = p * (n - 1); Seq(r.floor.toLong, math.ceil(r).toLong) }.toSet
      values.sortBy(identity).zipWithIndex()
        .filter { case (_, i) => need.contains(i) }.collect()
    }
    time("agg with pct_q + stats") {
      val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
      def x100(c: String) = round(col(c) * 100, 0).cast("long")
      li.agg(count(lit(1)),
        sum(x100("l_quantity").cast(D38)), sum((x100("l_quantity") * x100("l_quantity")).cast(D38)),
        sum(x100("l_extendedprice").cast(D38)), sum((x100("l_extendedprice") * x100("l_extendedprice")).cast(D38)),
        min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice")),
        expr("percentile(l_quantity, array(0.25D,0.5D,0.75D))")).collect()
    }
    time("agg stats only (no percentile)") {
      val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
      def x100(c: String) = round(col(c) * 100, 0).cast("long")
      li.agg(count(lit(1)),
        sum(x100("l_quantity").cast(D38)), sum((x100("l_quantity") * x100("l_quantity")).cast(D38)),
        sum(x100("l_extendedprice").cast(D38)), sum((x100("l_extendedprice") * x100("l_extendedprice")).cast(D38)),
        min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice"))).collect()
    }
  }
}
