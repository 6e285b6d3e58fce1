package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The null contract, exercised the way the reference exercises it: its
  * fixture's FIRST row is all-NULL (tests/postgres-init-scripts/
  * init-pg-data.sql:17-18) and the integration test asserts null slots per
  * column (tests/basic_integration.rs:246-427). The driver corpus carries
  * no nulls, so this spec pins three-valued logic on a constructed frame:
  * aggregation null-skipping, null group keys, conditional functions,
  * window null ordering, distinct-treats-null-as-equal, and sink
  * round-trips.
  */
class NullHandlingSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("grp", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true),
    StructField("d", DecimalType(10, 2), nullable = true)))

  private def df = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(null, null, null, null), // the reference's all-NULL first row
      Row(1L, "a", 1.5, new java.math.BigDecimal("1.50")),
      Row(2L, "a", 2.5, new java.math.BigDecimal("2.50")),
      Row(3L, "b", null, null),
      Row(4L, null, 4.0, new java.math.BigDecimal("4.00"))),
    schema)

  test("aggregates skip nulls; count(*) does not") {
    val r = df.agg(
      count(lit(1)).as("n_rows"), count(col("v")).as("n_v"),
      sum(col("d")).as("sum_d"), avg(col("v")).as("avg_v")).collect()(0)
    assert(r.getLong(0) == 5 && r.getLong(1) == 3)
    assert(r.getDecimal(2) == new java.math.BigDecimal("8.00"))
    assert(math.abs(r.getDouble(3) - (1.5 + 2.5 + 4.0) / 3) < 1e-12)
  }

  test("null group keys form their own group (SQL GROUP BY semantics)") {
    val groups = df.groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(groups == Map(Some("a") -> 2L, Some("b") -> 1L, None -> 2L))
  }

  test("coalesce / nullif / null-safe equality three-valued logic") {
    val r = df.select(
      coalesce(col("v"), lit(-1.0)).as("c"),
      nullif(col("grp"), lit("a")).as("nf"),
      col("grp") <=> lit(null).as("nse"),
      (col("grp") === lit(null)).as("eq")).orderBy(col("id").asc_nulls_first).collect()
    assert(r(0).getDouble(0) == -1.0)          // all-NULL row coalesces
    assert(r(1).isNullAt(1))                   // nullif('a','a') -> null
    assert(!r(1).getBoolean(2))                // 'a' <=> null is FALSE not null
    assert(r(0).getBoolean(2))                 // null <=> null is TRUE
    assert(r(1).isNullAt(3))                   // 'a' = null is null
  }

  test("window null ordering is explicit and stable") {
    val w = Window.orderBy(col("v").asc_nulls_first, col("id").asc_nulls_first)
    val ids = df.withColumn("rn", row_number().over(w))
      .orderBy("rn").collect().map(r => Option(r.get(0)))
    // null v rows (ids null, 3) first — tie broken by id nulls-first
    assert(ids.take(2).toSeq == Seq(None, Some(3L)))
  }

  test("distinct treats null as equal to null") {
    val twoNullRows = df.select("grp").filter(col("grp").isNull)
    assert(twoNullRows.count() == 2)
    assert(twoNullRows.distinct().count() == 1)
  }

  test("Delta round-trip preserves per-column null slots") {
    val table = java.nio.file.Files.createTempDirectory("graft-null-delta").toString
    sinks.DeltaSink.write(df, table)
    val back = sinks.DeltaSink.read(spark, table).orderBy(col("id").asc_nulls_first).collect()
    assert(back(0).isNullAt(0) && back(0).isNullAt(1) && back(0).isNullAt(2) && back(0).isNullAt(3))
    assert(back(3).isNullAt(2) && back(3).isNullAt(3)) // id=3 row keeps v/d null
    assert(back(4).isNullAt(1))                        // id=4 row keeps grp null
  }

  test("Iceberg round-trip preserves the all-NULL row") {
    val table = java.nio.file.Files.createTempDirectory("graft-null-ice").toString
    sinks.IcebergSink.write(df, table, sinks.IcebergSink.CreateExclusive)
    val back = sinks.IcebergSink.read(spark, table)
    assert(back.filter(col("id").isNull && col("grp").isNull &&
      col("v").isNull && col("d").isNull).count() == 1)
  }
}
