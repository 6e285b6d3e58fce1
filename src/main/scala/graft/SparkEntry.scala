package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    q.CoreQueries,
    q.JoinQueries,
    q.AggQueries,
    q.WindowQueries,
    q.ExtendedRelQueries,
    q.ScalarQueries,
    q.EventWindowQueries,
    q.TextQueries,
    q.SimilarityQueries,
    q.AnalyticsQueries,
    q.TpchQueries,
  )

  private val allDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship on /root/testdata/sf0.001 (SURVEY.md §7.2 step 1): the
    * TPC-H-Q1-shaped aggregate — the reference's "query pushed through the
    * loader" — written to a Delta table (scan → shuffle agg → hand-rolled
    * _delta_log commit, reference P1→P2→P10) and read back through the
    * Delta log reader. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val result = q.AggQueries.q1(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    val table = java.nio.file.Files.createTempDirectory("graft-entry-delta").toString
    sinks.DeltaSink.write(result, table, overwrite = true)
    sinks.DeltaSink.read(spark, table)
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate / property-tested operators).
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Per-query shape version (see [[QueryDef.shapeVersion]]) — Bench keys
    * its regression reference on (query, shape) so a declared scope change
    * re-baselines automatically.
    */
  def shapeVersions: Map[String, Int] =
    allDefs.map(d => d.name -> d.shapeVersion).toMap
}
