package graft

import graft.functions.HashExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native codegen'd hash expressions to the higher-order-lambda
  * formulations they replaced. The dedup oracle hashes (q_dedup_ngram) and
  * the no-oracle property tests both depend on these values being
  * bit-identical to Spark's `xxhash64` chaining, so any drift here is a
  * correctness break, not just a perf regression.
  */
class HashExpressionsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def sampleTokens = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq("the", "quick", "brown", "fox", "jumps")),
      (2L, Seq("a", "b")),          // shorter than shingle width 3
      (3L, Seq("solo")),            // single token
      (4L, Seq.empty[String]),      // empty array
      (5L, Seq("x", null, "y", "z")) // null element
    ).toDF("id", "toks")
  }

  test("TokenHashes matches transform(toks, t => xxhash64(t)) bit-for-bit") {
    val df = sampleTokens.select(
      col("id"),
      HashExpressions.tokenHashes(col("toks")).as("native"),
      transform(col("toks"), t => xxhash64(t)).as("lambda"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("ShingleHashes matches the 3-gram xxhash64 lambda chain bit-for-bit") {
    val df = sampleTokens
      .select(col("id"), HashExpressions.tokenHashes(col("toks")).as("th"))
      .select(
        col("id"),
        HashExpressions.shingleHashes(col("th"), 3).as("native"),
        when(size(col("th")) >= 3,
          transform(sequence(lit(0), size(col("th")) - 3),
            i => xxhash64(
              element_at(col("th"), i + 1),
              element_at(col("th"), i + 2),
              element_at(col("th"), i + 3)))).as("lambda"))
    df.collect().foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(1), s"id=${r.getLong(0)}")
      else assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("MinHashBandHashes matches the 32-min-aggregate + band-hash pipeline") {
    val numPerm = 32
    val rows = 2
    val bands = numPerm / rows
    val sh = sampleTokens
      .select(col("id"), col("toks"), HashExpressions.tokenHashes(col("toks")).as("th"))
      .select(col("id"),
        coalesce(HashExpressions.shingleHashes(col("th"), 3),
          array(xxhash64(concat_ws(" ", col("toks"))))).as("ghs"))

    val native = sh.select(col("id"),
        posexplode(HashExpressions.minhashBandHashes(col("ghs"), numPerm, rows)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    // the replaced formulation: explode, per-permutation min aggregate,
    // then xxhash64 over each band's mins plus the band index
    val mins = (0 until numPerm).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val sigs = sh.select(col("id"), explode(col("ghs")).as("h"))
      .groupBy("id").agg(mins.head, mins.tail: _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * rows until b * rows + rows).map(i => col(s"m$i")) :+ lit(b): _*).as(s"b$b")
    }
    val lambda = sigs.select(col("id") +: bandCols: _*)
      .select(col("id"), posexplode(array((0 until bands).map(b => col(s"b$b")): _*)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    assert(native == lambda)
  }

  test("SimHashSig majority vote matches a driver-side recomputation") {
    val rows = sampleTokens
      .select(col("id"),
        array_distinct(HashExpressions.tokenHashes(col("toks"))).as("th"))
      .select(col("id"), col("th"), HashExpressions.simhashSig(col("th")).as("sig"))
      .collect()
    rows.foreach { r =>
      val hs = if (r.isNullAt(1)) Seq.empty else r.getSeq[Long](1)
      if (hs.isEmpty) assert(r.isNullAt(2), s"id=${r.getLong(0)}")
      else {
        var expect = 0L
        (0 until 64).foreach { b =>
          val c = hs.count(h => ((h >>> b) & 1L) == 1L)
          if (2 * c > hs.size) expect |= 1L << b
        }
        assert(r.getLong(2) == expect, s"id=${r.getLong(0)}")
      }
    }
  }

  test("property: TokenHashes/ShingleHashes match the lambda chain on random inputs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val tokGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const(""),
      Gen.const(null: String)))
    val prop = Prop.forAll(Gen.listOfN(8, tokGen)) { rows =>
      val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
      val out = df.select(
        col("id"),
        HashExpressions.tokenHashes(col("toks")).as("nat"),
        transform(col("toks"), t => xxhash64(t)).as("lam"))
        .select(col("id"),
          HashExpressions.shingleHashes(col("nat"), 3).as("natSh"),
          when(size(col("lam")) >= 3,
            transform(sequence(lit(0), size(col("lam")) - 3),
              i => xxhash64(
                element_at(col("lam"), i + 1),
                element_at(col("lam"), i + 2),
                element_at(col("lam"), i + 3)))).as("lamSh"),
          col("nat"), col("lam"))
        .collect()
      out.forall { r =>
        r.getSeq[Long](3) == r.getSeq[Long](4) &&
          (if (r.isNullAt(2)) r.isNullAt(1)
           else r.getSeq[Long](1) == r.getSeq[Long](2))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("SQL surface: graft_token_hashes / graft_simhash registered and callable") {
    val s = spark
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(s)
    sampleTokens.createOrReplaceTempView("hx_toks")
    val out = s.sql(
      """SELECT id,
        |  graft_simhash(graft_token_hashes(toks)) AS sig,
        |  graft_minhash_bands(graft_shingle_hashes(graft_token_hashes(toks), 3), 32, 2) AS bands
        |FROM hx_toks WHERE id = 1""".stripMargin).collect()
    assert(out.length == 1 && !out(0).isNullAt(1) && out(0).getSeq[Long](2).length == 16)
  }
}
