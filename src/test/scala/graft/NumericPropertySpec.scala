package graft

import graft.sources.PgTypeMapping
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the PG numeric wire decode: an independent encoder
  * (string-based base-10000 grouping, written here in the test) feeds
  * random decimals through [[PgTypeMapping.pgNumericToUnscaled]]; the
  * result must equal the value truncated toward zero at the target scale —
  * the reference's semantic (pg_numeric.rs:51-59 discards the remainder).
  */
class NumericPropertySpec extends AnyFunSuite {

  /** Encode a BigDecimal into the PG binary numeric layout. */
  private def encode(v: BigDecimal): Array[Byte] = {
    val neg = v.signum < 0
    val abs = v.abs
    val s = abs.underlying().toPlainString
    val (intPart, fracPart) = s.span(_ != '.') match {
      case (i, f) => (i, f.drop(1))
    }
    val intPad = "0" * ((4 - intPart.length % 4) % 4) + intPart
    val fracPad = fracPart + "0" * ((4 - fracPart.length % 4) % 4)
    var groups = (intPad + fracPad).grouped(4).map(_.toInt).toVector
    var weight = intPad.length / 4 - 1
    // strip leading zero groups (weight shrinks), then trailing zero groups
    while (groups.length > 1 && groups.head == 0) { groups = groups.tail; weight -= 1 }
    while (groups.length > 1 && groups.last == 0) groups = groups.init
    if (groups == Vector(0)) { groups = Vector(); weight = 0 }
    val out = new Array[Byte](8 + 2 * groups.length)
    def put16(i: Int, x: Int): Unit = { out(i) = ((x >> 8) & 0xff).toByte; out(i + 1) = (x & 0xff).toByte }
    put16(0, groups.length)
    put16(2, weight & 0xffff)
    put16(4, if (neg) 0x4000 else 0x0000)
    put16(6, math.max(0, v.scale))
    groups.zipWithIndex.foreach { case (g, i) => put16(8 + 2 * i, g) }
    out
  }

  test("decode(encode(v), s) == truncate-toward-zero(v * 10^s) for random decimals") {
    val gen = for {
      unscaled <- Gen.chooseNum(-999999999999999L, 999999999999999L)
      scale <- Gen.chooseNum(0, 6)
      resultScale <- Gen.chooseNum(0, 6)
    } yield (BigDecimal(BigInt(unscaled), scale), resultScale)
    val prop = Prop.forAll(gen) { t =>
      val (v, resultScale) = t
      val expected = (v * BigDecimal(10).pow(resultScale))
        .setScale(0, BigDecimal.RoundingMode.DOWN).toBigInt
      PgTypeMapping.pgNumericToUnscaled(encode(v), resultScale) == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("reference fixture edge values decode at their declared scale") {
    // the shapes exercised by the reference fixture's hand-set numeric edge
    // rows (tests/postgres-init-scripts/init-pg-data.sql): max/min digits,
    // sub-scale truncation, zero
    Seq(
      (BigDecimal("0"), 2, BigInt(0)),
      (BigDecimal("0.01"), 2, BigInt(1)),
      (BigDecimal("-0.01"), 2, BigInt(-1)),
      (BigDecimal("12345.6789"), 2, BigInt(1234567)),
      (BigDecimal("-12345.6789"), 2, BigInt(-1234567)),
      (BigDecimal("99999999.99"), 2, BigInt(9999999999L)),
      (BigDecimal("10000"), 0, BigInt(10000)),
      (BigDecimal("0.0001"), 4, BigInt(1))
    ).foreach { case (v, rs, want) =>
      assert(PgTypeMapping.pgNumericToUnscaled(encode(v), rs) == want, s"v=$v")
    }
  }
}
