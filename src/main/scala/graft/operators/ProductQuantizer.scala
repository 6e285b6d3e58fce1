package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the memory/bandwidth
  * transform behind billion-scale ANN serving (IVF-PQ): a dim-D vector is
  * split into M contiguous subspaces, each subspace is vector-quantized
  * against its own K-entry codebook, and the vector is stored as M small
  * code ids (M bytes at K≤256) instead of D floats. Approximate distances
  * are then computed from the QUERY vector and the candidate's CODES alone
  * (asymmetric distance computation, ADC) — candidates never ship their
  * float vectors, which is the entire point at 100 TB: the candidate side
  * of the similarity join shrinks D·4/M-fold (64-dim float32 → 8 codes =
  * 32× lighter rows through the shuffle).
  *
  * Scale posture:
  *  - Codebooks are tiny metadata (M·K·(D/M) doubles = K·D total — same
  *    size as the coarse-centroid table IVF already broadcasts); they are
  *    closed over as expression LITERALS, so encoding and ADC both run as
  *    pure map-side codegen'd projections — no shuffle, no UDF, no
  *    broadcast join.
  *  - Encoding is the same argmax-of-(s·c − |c|²/2) trick as
  *    [[KMeans]] — argmin Euclidean without materializing |s|² — done per
  *    subspace on sliced sub-vectors.
  *  - ADC reconstructs dot(q, candidate) ≈ Σ_m dot(q_m, codebook_m[code_m])
  *    via literal-array `element_at` lookups; the candidate's approximate
  *    norm comes from the same codes, so approximate COSINE ranking needs
  *    nothing but codes on the candidate side.
  *
  * Determinism: codebooks are caller-provided (deterministic seeds in the
  * declared query; a production pipeline trains them with [[KMeans]] per
  * subspace on a sample); everything downstream is pure IEEE arithmetic in
  * fixed index order.
  */
object ProductQuantizer {

  /** Codebooks carved from seed vectors: entry k of subspace m is seed k's
    * m-th sub-slice. `dim` must divide evenly into `m` subspaces.
    */
  def codebooksFromSeeds(seeds: Array[Array[Double]], m: Int): Array[Array[Array[Double]]] = {
    require(seeds.nonEmpty, "need seed vectors")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m)(mi => seeds.map(_.slice(mi * sub, (mi + 1) * sub)))
  }

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Map-side PQ encoding: `vec` (array<float|double>, length M·sub) →
    * array<int> of M code ids, each the argmin-L2 codebook entry of its
    * subspace (ties → lowest code id, matching [[KMeans]]). A NaN/null
    * component makes every subspace score NaN, where `array_position`
    * finds no maximum and returns 0; the `greatest(1, …)` clamp routes
    * such rows deterministically to code 0 instead of letting the -1
    * escape into `element_at(book, 0)` downstream (a runtime error that
    * would fail the whole job on one malformed embedding — review r8
    * finding).
    */
  def encode(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val sub = books.head.head.length
    array(books.zipWithIndex.map { case (book, mi) =>
      val s = slice(vec, mi * sub + 1, sub)
      val scores = array(book.map { c =>
        dot(s, typedLit(c)) - lit(c.map(x => x * x).sum / 2.0)
      }.toIndexedSeq: _*)
      (greatest(lit(1L), array_position(scores, array_max(scores))) - 1).cast("int")
    }.toIndexedSeq: _*)
  }

  /** ADC approximate dot product: query vector (floats) vs candidate CODES.
    * Each subspace contributes dot(q_m, codebook_m[code_m]) — a literal
    * nested-array `element_at` lookup, fully codegen'd, no candidate
    * vector required.
    */
  def adcDot(qvec: Column, codes: Column, books: Array[Array[Array[Double]]]): Column = {
    val sub = books.head.head.length
    books.zipWithIndex.map { case (book, mi) =>
      val q = slice(qvec, mi * sub + 1, sub)
      val entry = element_at(typedLit(book), element_at(codes, mi + 1) + 1)
      dot(q, entry)
    }.reduce(_ + _)
  }

  /** Approximate squared L2 norm of the DEcoded candidate, from codes
    * alone: Σ_m |codebook_m[code_m]|² (subspaces are orthogonal splits).
    */
  def adcNorm2(codes: Column, books: Array[Array[Array[Double]]]): Column =
    books.zipWithIndex.map { case (book, mi) =>
      val norms = book.map(c => c.map(x => x * x).sum)
      element_at(typedLit(norms), element_at(codes, mi + 1) + 1)
    }.reduce(_ + _)

  /** ADC approximate cosine: adcDot / (|q| · sqrt(adcNorm2)). */
  def adcCosine(qvec: Column, qnorm: Column, codes: Column,
      books: Array[Array[Array[Double]]]): Column =
    adcDot(qvec, codes, books) / (qnorm * sqrt(adcNorm2(codes, books)))
}
