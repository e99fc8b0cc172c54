package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-touching specs (session
  * start-up dominates test wall-clock otherwise). Built through
  * GraftSession so tests run with exactly the engine's semantics
  * (UTC, ANSI default, nanosAsLong, AQE). */
object SparkTestSession {
  lazy val spark: SparkSession = graft.core.GraftSession.build("graft-test", "4")
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.spark
}
