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
    q.ScalarQueries,
    q.EventWindowQueries,
    q.TextQueries,
    q.SimilarityQueries,
  )

  private val allDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship on /root/testdata/sf0.001: the TPC-H-Q1-shaped aggregate
    * (the reference's "query pushed through the loader", SURVEY.md §7.2
    * step 1); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    q.AggQueries.q1(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate / property-tested operators).
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
