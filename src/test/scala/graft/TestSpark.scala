package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for the ScalaTest suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: several specs deliberately build single-partition
    // windows as the naive oracle side, and WindowExec's per-plan WARN
    // floods the test log
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
