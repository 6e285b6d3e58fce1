package graft

import graft.sinks.SchemaGate
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the six is_schema_aligned unit tests from
  * /root/reference/src/iceberg_destination.rs:379-553 onto the Spark
  * StructType gate.
  */
class SchemaGateSpec extends AnyFunSuite {
  private def st(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nullable) => StructField(n, t, nullable) })

  private val existing = st(
    ("a", StringType, false), ("b", IntegerType, false), ("c", BooleanType, false))

  test("positive: identical positional types") {
    // reference :390-410 (old schema mixes optional/required; new is required)
    val old = st(("a", StringType, true), ("b", IntegerType, false), ("c", BooleanType, true))
    assert(SchemaGate.isSchemaAligned(
      st(("a", StringType, false), ("b", IntegerType, false), ("c", BooleanType, false)), old))
  }

  test("positive: renamed fields still align (positional match)") {
    // reference :412-433
    assert(SchemaGate.isSchemaAligned(
      st(("x", StringType, false), ("y", IntegerType, false), ("z", BooleanType, false)),
      existing))
  }

  test("positive: non-nullable data into nullable fields") {
    // reference :436-457
    val old = st(("a", StringType, true), ("b", IntegerType, true), ("c", BooleanType, true))
    assert(SchemaGate.isSchemaAligned(
      st(("a", StringType, false), ("b", IntegerType, false), ("c", BooleanType, false)), old))
  }

  test("negative: added field") {
    // reference :459-482
    assert(!SchemaGate.isSchemaAligned(
      st(("a", StringType, false), ("b", IntegerType, false),
        ("c", BooleanType, false), ("d", BooleanType, false)),
      existing))
  }

  test("negative: mismatched type") {
    // reference :484-505
    assert(!SchemaGate.isSchemaAligned(
      st(("a", StringType, false), ("b", IntegerType, false), ("c", IntegerType, false)),
      existing))
  }

  test("negative: reordered fields") {
    // reference :507-528
    assert(!SchemaGate.isSchemaAligned(
      st(("b", IntegerType, false), ("a", StringType, false), ("c", BooleanType, false)),
      existing))
  }

  test("negative: nullable data into required field") {
    // reference :531-552
    assert(!SchemaGate.isSchemaAligned(
      st(("a", StringType, true), ("b", IntegerType, false), ("c", BooleanType, false)),
      existing))
    assert(SchemaGate.check(
      st(("a", StringType, true), ("b", IntegerType, false), ("c", BooleanType, false)),
      existing).exists(_.contains("required in old schema")))
  }
}
