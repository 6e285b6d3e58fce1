package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet corpus (TESTDATA.md).
  *
  * The reference reads exactly one table per run (a Postgres query result or
  * a single Parquet file — /root/reference/src/lib.rs:86-135); this engine
  * exposes the whole corpus as named tables so queries can be declared
  * relationally and Catalyst can plan scans with pushdown + pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
