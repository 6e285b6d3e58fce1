package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** One declared operator from SURVEY.md §2.2: a Spark implementation plus
  * (when SQL-expressible) an equivalent DuckDB oracle query. The driver
  * hash-compares the two on sf0.01 — column NAMES, row ORDER and VALUES must
  * all match, hence the determinism contract helpers below.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Determinism contract (SURVEY.md §2.2): double aggregation order is not
    * associative, so every SUM/AVG over doubles goes through DECIMAL(38,6)
    * on both the Spark and DuckDB side.
    */
  val Dec38: DecimalType = DecimalType(38, 6)
  def dec(c: Column): Column = c.cast(Dec38)
}

trait QueryModule {
  def defs: Seq[QueryDef]

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)
}
