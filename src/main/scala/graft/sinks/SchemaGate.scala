package graft.sinks

import org.apache.spark.sql.types.StructType

/** Positional schema-compatibility gate (reference P14).
  *
  * Re-expresses `is_schema_aligned` from
  * /root/reference/src/iceberg_destination.rs:87-115: before appending to or
  * overwriting an existing table, the incoming schema must have the same
  * field count, positionally identical types (field NAMES may differ —
  * proven by test_is_schema_aligned_positive_renamed, :412-433), and must
  * not put nullable data into a required field (:406-409 direction: required
  * old + optional new = error; optional old + required new = fine).
  * Reordered fields are rejected because types are compared by position
  * (:507-528).
  */
object SchemaGate {

  /** Returns the list of incompatibilities (empty = aligned). */
  def check(incoming: StructType, existing: StructType): Seq[String] = {
    if (incoming.fields.length != existing.fields.length)
      return Seq(
        s"New data is incompatible with existing schema. Old schema has " +
          s"${existing.fields.length} fields but new schema has ${incoming.fields.length} fields")
    existing.fields.zip(incoming.fields).zipWithIndex.flatMap {
      case ((old, nw), i) =>
        val nullability =
          if (!old.nullable && nw.nullable)
            Seq(s"Field $i (${old.name}) is required in old schema but not required in new schema")
          else Nil
        val types =
          if (old.dataType != nw.dataType)
            Seq(s"Field $i (${old.name}) has data type ${old.dataType.sql} in old schema " +
              s"but ${nw.dataType.sql} in new schema")
          else Nil
        nullability ++ types
    }.toSeq
  }

  def isSchemaAligned(incoming: StructType, existing: StructType): Boolean =
    check(incoming, existing).isEmpty

  /** Throwing form used by the sinks before append/overwrite. */
  def enforce(incoming: StructType, existing: StructType): Unit = {
    val problems = check(incoming, existing)
    if (problems.nonEmpty)
      throw new IllegalArgumentException(
        "New data is incompatible with existing schema: " + problems.mkString("; "))
  }
}
