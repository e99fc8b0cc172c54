package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Percentiles

/** Times the sort-regime percentile fallback on q32's two lineitem
  * columns — the judge's "q32-via-sort" cell. The chooser routes q32
  * away from this regime; this probe forces it so the fallback's cost
  * stays measured. */
object SortRegimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.build("graft-sort-probe", "32")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    def time(name: String)(f: => Any): Unit = {
      f
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-50s $best%8.3f s")
    }

    time("exactBySort l_quantity + l_extendedprice") {
      val q = Percentiles.exactBySort(li.select(col("l_quantity")),
        "l_quantity", Seq(0.25, 0.5, 0.75), "qq")
      val p = Percentiles.exactBySort(li.select(col("l_extendedprice")),
        "l_extendedprice", Seq(0.25, 0.5, 0.75), "pp")
      q.crossJoin(p).write.format("noop").mode("overwrite").save()
    }
    time("exactBySort l_extendedprice only") {
      Percentiles.exactBySort(li.select(col("l_extendedprice")),
        "l_extendedprice", Seq(0.25, 0.5, 0.75), "pp")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
