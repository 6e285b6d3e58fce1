package graft

import graft.operators.ProductQuantizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization properties: encode/ADC math, lossless corner,
  * rerank exactness of the declared IVF-PQ query, and determinism.
  */
class PqSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("PQ encode: vectors equal to codebook entries are lossless, ADC exact") {
    val s = spark
    import s.implicits._
    // 4 seed vectors, dim 8, M=2 subspaces of 4 — every corpus vector IS a
    // concatenation of codebook entries, so encoding is lossless and the
    // ADC dot must equal the exact dot bit-for-bit-ish (same IEEE ops in
    // the same index order; tolerance only for the sum regrouping)
    val seeds = Array(
      Array(1.0, 0.0, 2.0, 0.0, 0.0, 3.0, 0.0, 4.0),
      Array(0.0, 5.0, 0.0, 1.0, 2.0, 0.0, 1.0, 0.0),
      Array(2.0, 2.0, 2.0, 2.0, 1.0, 1.0, 1.0, 1.0),
      Array(9.0, 0.0, 0.0, 1.0, 0.0, 0.0, 7.0, 0.0))
    val books = ProductQuantizer.codebooksFromSeeds(seeds, 2)
    assert(books.length == 2 && books(0).length == 4 && books(0)(0).length == 4)

    // corpus: mixed concatenations — vec k = seeds(a).take(4) ++ seeds(b).drop(4)
    val combos = Seq((0, 1), (1, 0), (2, 3), (3, 2), (0, 0), (3, 3))
    val rows = combos.zipWithIndex.map { case ((a, b), id) =>
      (id.toLong, (seeds(a).take(4) ++ seeds(b).drop(4)).map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val enc = df.select(col("vec_id"),
      ProductQuantizer.encode(col("embedding"), books).as("codes"))
      .orderBy("vec_id").collect()
    combos.zipWithIndex.foreach { case ((a, b), id) =>
      assert(enc(id).getSeq[Int](1) == Seq(a, b),
        s"vec $id expected codes ($a,$b) got ${enc(id).getSeq[Int](1)}")
    }

    // ADC dot vs exact dot for a probe against every (lossless) candidate
    val probe = Array(0.5, -1.0, 2.0, 0.0, 1.0, 1.0, -2.0, 0.25)
    val adc = df.select(col("vec_id"),
        ProductQuantizer.adcDot(typedLit(probe.map(_.toFloat)),
          ProductQuantizer.encode(col("embedding"), books), books).as("adc"),
        graft.functions.VectorExpressions.dot(
          typedLit(probe.map(_.toFloat)), col("embedding")).as("exact"))
      .orderBy("vec_id").collect()
    adc.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
        s"vec ${r.getLong(0)}: adc ${r.getDouble(1)} vs exact ${r.getDouble(2)}")
    }
    // approximate norm is exact too on the lossless corpus
    val nrm = df.select(col("vec_id"),
        ProductQuantizer.adcNorm2(
          ProductQuantizer.encode(col("embedding"), books), books).as("n2"))
      .orderBy("vec_id").collect()
    combos.zipWithIndex.foreach { case ((a, b), id) =>
      val exact = (seeds(a).take(4) ++ seeds(b).drop(4)).map(x => x * x).sum
      assert(math.abs(nrm(id).getDouble(1) - exact) < 1e-9)
    }
  }

  test("PQ encode: lossy vectors map to the nearest codebook entry per subspace") {
    val s = spark
    import s.implicits._
    val seeds = Array(
      Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 10.0, 10.0, 10.0))
    val books = ProductQuantizer.codebooksFromSeeds(seeds, 2)
    // (0.4,0.4 | 9,9) → subspace 0 nearest code 0, subspace 1 nearest code 1
    val df = Seq((1L, Seq(0.4f, 0.4f, 9f, 9f))).toDF("vec_id", "embedding")
    val codes = df.select(ProductQuantizer.encode(col("embedding"), books))
      .head().getSeq[Int](0)
    assert(codes == Seq(0, 1))
  }

  test("PQ encode: a NaN component clamps to code 0 instead of crashing ADC") {
    val s = spark
    import s.implicits._
    val seeds = Array(Array(1.0, 2.0, 3.0, 4.0), Array(5.0, 6.0, 7.0, 8.0))
    val books = ProductQuantizer.codebooksFromSeeds(seeds, 2)
    val df = Seq((1L, Seq(Float.NaN, 1f, 2f, 3f)), (2L, Seq(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val enc = df.select(col("vec_id"),
      ProductQuantizer.encode(col("embedding"), books).as("codes"))
    val rows = enc.orderBy("vec_id").collect()
    assert(rows(0).getSeq[Int](1).forall(c => c >= 0 && c < 2), "codes in range")
    // ADC over the clamped codes evaluates without error
    val adc = enc.select(ProductQuantizer.adcDot(
      typedLit(Array(1f, 1f, 1f, 1f)), col("codes"), books).as("a")).collect()
    assert(adc.length == 2 && !adc(1).isNullAt(0))
  }

  test("q_sim_ann_ivfpq: reranked scores equal exact cosine; deterministic") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, dir)
      .select("qid", "cid", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = SparkEntry.queries("q_sim_ann_ivfpq")(spark, dir)
      .select("qid", "cid", "score", "rn").collect()
    assert(pq.nonEmpty)
    // the final rerank is exact, so any pair also in the brute-force top-k
    // carries an IDENTICAL score (same decimal-cast double)
    val overlapping = pq.filter(r => exact.contains((r.getLong(0), r.getLong(1))))
    assert(overlapping.nonEmpty)
    overlapping.foreach { r =>
      assert(exact((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
    // per-probe ranks are 1..n with no gaps
    pq.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // rerun is bit-identical (deterministic seeds, literal codebooks)
    val again = SparkEntry.queries("q_sim_ann_ivfpq")(spark, dir)
      .select("qid", "cid", "score", "rn").collect()
    assert(pq.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
