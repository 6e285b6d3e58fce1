package graft

import graft.sources.PgTypeMapping._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the PG-source type contract, pinning the same edge cases
  * the reference pins: epoch boundaries (pg_datetime.rs:53-78), numeric
  * typmod unpacking and base-10000 decode with truncate-toward-zero
  * (pg_numeric.rs), the 14-type table and the all-nullable rule
  * (pg_arrow_source.rs:168-188, :233).
  */
class TypeMappingSpec extends AnyFunSuite {

  test("timestamp just after J2000 (reference test shape)") {
    // wire bytes [0,0,0,0,0,0,1,2] = 258 µs after 2000-01-01
    assert(rebaseMicros(258L) == 946684800000000L + 256 + 2)
  }

  test("timestamp just before J2000") {
    assert(rebaseMicros(-1L) == 946684800000000L - 1)
  }

  test("date just after J2000") {
    // wire bytes [0,0,1,2] = day 258
    assert(rebaseDays(258) == 10957 + 256 + 2)
  }

  test("date just before J2000") {
    assert(rebaseDays(-1) == 10957 - 1)
  }

  test("numeric typmod precision/scale unpack (numeric.c layout)") {
    val typmod = ((10 << 16) | 2) + 4 // NUMERIC(10,2)
    assert(numericTypmodPrecision(typmod) == 10)
    assert(numericTypmodScale(typmod) == 2)
    val typmod2 = ((38 << 16) | 18) + 4
    assert(numericTypmodPrecision(typmod2) == 38)
    assert(numericTypmodScale(typmod2) == 18)
  }

  private def numericBuf(ndigits: Int, weight: Int, sign: Int, digits: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](8 + 2 * digits.length)
    def put16(i: Int, v: Int): Unit = { out(i) = ((v >> 8) & 0xff).toByte; out(i + 1) = (v & 0xff).toByte }
    put16(0, ndigits); put16(2, weight & 0xffff); put16(4, sign); put16(6, 0)
    digits.zipWithIndex.foreach { case (d, i) => put16(8 + 2 * i, d) }
    out
  }

  test("numeric decode: 1.5 at scale 2 -> unscaled 150") {
    // 1.5 = digits [1, 5000], weight 0
    assert(pgNumericToUnscaled(numericBuf(2, 0, 0x0000, Seq(1, 5000)), 2) == BigInt(150))
  }

  test("numeric decode: -12345678.90 at scale 2") {
    // base-10000: 1234 5678 9000e-4, weight 1, negative
    assert(pgNumericToUnscaled(numericBuf(3, 1, 0x4000, Seq(1234, 5678, 9000)), 2) ==
      BigInt(-1234567890L))
  }

  test("numeric decode truncates toward zero below the target scale") {
    // 1.2345 at scale 2: digits [1, 2345], truncation keeps 1.23 (123), not 1.24
    assert(pgNumericToUnscaled(numericBuf(2, 0, 0x0000, Seq(1, 2345)), 2) == BigInt(123))
    // negative: -1.2345 -> -123 (toward zero, not floor)
    assert(pgNumericToUnscaled(numericBuf(2, 0, 0x4000, Seq(1, 2345)), 2) == BigInt(-123))
  }

  test("numeric NaN and infinities reject like the reference") {
    intercept[IllegalArgumentException] {
      pgNumericToUnscaled(numericBuf(0, 0, 0xC000, Seq()), 2)
    }
    intercept[IllegalArgumentException] {
      pgNumericToUnscaled(numericBuf(0, 0, 0xD000, Seq()), 2)
    }
  }

  test("the 14-type mapping matches pg_arrow_source.rs:168-188") {
    assert(sparkTypeFor("bool") == BooleanType)
    assert(sparkTypeFor("char") == ByteType)
    assert(sparkTypeFor("int2") == ShortType)
    assert(sparkTypeFor("int4") == IntegerType)
    assert(sparkTypeFor("int8") == LongType)
    assert(sparkTypeFor("float4") == FloatType)
    assert(sparkTypeFor("float8") == DoubleType)
    assert(sparkTypeFor("timestamp") == TimestampNTZType)
    assert(sparkTypeFor("timestamptz") == TimestampType)
    assert(sparkTypeFor("date") == DateType)
    assert(sparkTypeFor("numeric", ((12 << 16) | 3) + 4) == DecimalType(12, 3))
    assert(sparkTypeFor("text") == StringType)
    assert(sparkTypeFor("varchar") == StringType)
    assert(sparkTypeFor("bytea") == BinaryType)
  }

  test("unsupported types reject with cast-to-text guidance") {
    val e = intercept[IllegalArgumentException](sparkTypeFor("jsonb"))
    assert(e.getMessage.contains("Cast the column to text"))
  }

  test("result schemas are nullable-by-default (reference §1.2 contract)") {
    val schema = toSchema(Seq(("id", "int8", -1), ("v", "numeric", ((10 << 16) | 2) + 4)))
    assert(schema.fields.forall(_.nullable))
    assert(schema("v").dataType == DecimalType(10, 2))
  }

  test("decimal round-trip through Spark matches the declared scale") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(BigDecimal("1.50"), BigDecimal("-12345678.90"))
      .toDF("d").select($"d".cast(DecimalType(10, 2)))
    val vals = df.collect().map(_.getDecimal(0).unscaledValue().longValue()).toSeq
    assert(vals == Seq(150L, -1234567890L))
  }
}
