package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor retrieval by OR-amplified random-hyperplane
  * LSH — the library form of `q_sim_ann_lsh`, with the cost/recall knobs
  * exposed (VERDICT r4 "Next round" #3: the L=8 recall lift bought a ~7×
  * cost with no way to tune it).
  *
  * Recall model for a pair at cosine similarity c: one hyperplane agrees
  * with probability p = 1 − arccos(c)/π, one AND-table of `bits` bits fires
  * with p^bits, and `tables` OR'd tables reach 1 − (1 − p^bits)^tables.
  * At c = 0.97 (the near-duplicate band ANN retrieval exists for):
  *
  *   tables=8, bits=12 → recall ≈ 0.977   (the round-4 default)
  *   tables=6, bits=12 → recall ≈ 0.941
  *   tables=8, bits=14 → recall ≈ 0.953 with 4× smaller buckets
  *
  * Cost is driven by the CANDIDATE count (each candidate pair fetches two
  * embedding arrays for the exact rerank), which scales with
  * tables × n² / 2^bits — so `bits` is the cheap lever (bucket occupancy
  * halves per bit) and `tables` the expensive one. `bucketCap` bounds the
  * worst case: a degenerate bucket of B vectors (all-zero embeddings, a
  * constant-vector corpus) otherwise contributes B² pairs; capping keeps a
  * deterministic pseudo-random `bucketCap`-subset per (table, bucket), so
  * candidate cost is ≤ tables × n × bucketCap regardless of skew. The cap
  * rank reuses the self-join's own (tbl, bits) hash partitioning — one
  * exchange serves both.
  *
  * All joins are equi-joins; bucket keys are slim (id, tbl, bits) rows —
  * embeddings never ride the explode; no all-pairs anywhere.
  */
object AnnLsh {

  /** Cost/recall configuration; defaults match the recall >= 0.9 contract
    * at near-duplicate cosine (tables=8, bits=14 → ≈0.95 at c=0.97) with
    * 4× smaller buckets than the round-4 (8, 12) default.
    */
  final case class Config(
      tables: Int = 8,
      bits: Int = 14,
      bucketCap: Int = 128,
      topK: Int = 5,
      dim: Int = 64,
      seed: Long = 42L)

  /** Deterministic ±1 hyperplane matrix for `cfg` (flat, row-major:
    * tables × bits planes of `dim` components).
    */
  def planes(cfg: Config): Array[Double] = {
    val rnd = new scala.util.Random(cfg.seed)
    Array.fill(cfg.tables * cfg.bits * cfg.dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Top-`cfg.topK` approximate cosine neighbors per vector of `emb`
    * (columns: idCol, vecCol). Returns (qid, cid, score_d, rn) with scores
    * exact (the rerank computes true cosine on candidates).
    */
  def annCosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): DataFrame = {
    import graft.functions.VectorExpressions
    // Fail fast on a dim mismatch: HyperplaneSignatures returns null for a
    // vector whose length differs from the plane width, which would silently
    // drop every row instead of erroring (ADVICE r5). One cheap limit(1)
    // probe on the driver beats an empty "result" downstream.
    emb.select(size(col(vecCol))).limit(1).collect().headOption.foreach { r =>
      if (!r.isNullAt(0) && r.getInt(0) != cfg.dim)
        throw new IllegalArgumentException(
          s"AnnLsh: embedding column '$vecCol' has ${r.getInt(0)} components " +
            s"but Config.dim=${cfg.dim}; pass Config(dim = ${r.getInt(0)})")
    }
    val pl = planes(cfg)
    val banded0 = emb
      .select(col(idCol).as("vec_id"), posexplode(
        VectorExpressions.hyperplaneSigs(col(vecCol), pl, cfg.tables, cfg.bits)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bits")
    // Worst-case bound: keep a deterministic `bucketCap`-subset per bucket.
    // Window.partitionBy(tbl, bits) hashes on the SAME key as the self-join
    // below, so the rank rides the join's exchange instead of adding one.
    val banded =
      if (cfg.bucketCap > 0) {
        val wB = Window.partitionBy("tbl", "bits").orderBy(xxhash64(col("vec_id")))
        banded0.withColumn("__cap_rk", row_number().over(wB))
          .filter(col("__cap_rk") <= cfg.bucketCap).drop("__cap_rk")
      } else banded0
    // union-of-tables candidate set: same-bucket pairs in ANY table
    val cands = banded.as("x").join(banded.as("y"), Seq("tbl", "bits"))
      .filter(col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("qid"), col("y.vec_id").as("cid"))
      .distinct()
    val withN = emb.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
      VectorExpressions.l2norm(col(vecCol)).as("nrm"))
    val w = Window.partitionBy("qid").orderBy(col("score_d").desc, col("cid").asc)
    cands
      .join(withN.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn")), "qid")
      .join(withN.select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("nrm").as("cn")), "cid")
      .withColumn("score_d",
        VectorExpressions.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cfg.topK)
      .select(col("qid"), col("cid"), col("score_d"), col("rn"))
  }
}
