package graft.tools

/** Dev aid: execute one SparkEntry query against a data dir and print
  * the join/exchange skeleton of the EXECUTED (adaptive-final) plan —
  * `.explain` at plan time hides AQE's runtime join strategy choices.
  *   java ... graft.tools.PlanProbe <query> <sfdir>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("plan-probe")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    // execute df's OWN QueryExecution (a write would spawn a separate
    // one, leaving this AdaptiveSparkPlanExec un-finalized and the
    // printout pre-AQE)
    df.foreach(_ => ())
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
                   l.contains("Scan") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
