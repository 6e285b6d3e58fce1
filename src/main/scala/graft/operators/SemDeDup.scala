package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.{dot, l2norm}

/** SemDeDup-style semantic deduplication (the Abbas-et-al-2023 shape):
  * k-means-partition the embedding space, materialize cosine >= tau pairs
  * ONLY within a cluster, connected-components the pair graph, keep the
  * min-id representative per component.
  *
  * Scale posture (100 TB): clustering first is the entire point — the
  * candidate join is an equi-join on the cluster id, so pair cost is
  * sum(|cluster|^2) instead of |corpus|^2, and k grows with the corpus so
  * the per-cluster quadratic stays bounded (the SemDeDup paper runs
  * k ~ sqrt(n)). Assignment is map-side (literal centroids, codegen dot —
  * see [[KMeans]]); the pair join shuffles once on the cluster id; the
  * component pass is [[Ops.connectedComponents]]'s slim (v, label) rounds.
  *
  * Determinism: KMeans seeds/sums are deterministic, the dot kernel is
  * sequential (order-fixed IEEE), ties keep the lowest id — so the kept
  * set is stable across partitionings and reruns.
  */
object SemDeDup {

  /** Within-cluster candidate pairs: (id_a, id_b) with id_a < id_b, same
    * k-means cell, cosine >= tau. Also returns the per-id cell assignment
    * (id, cluster) so callers can reuse it without a second k-means run.
    */
  def clusterPairs(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tau: Double): (DataFrame, DataFrame) = {
    val assigned = KMeans.assign(emb, idCol, vecCol, k, iters)
    val vecs = emb.join(assigned, Seq(idCol))
      .select(col(idCol).as("id"), col("cluster"), col(vecCol).as("v"),
        l2norm(col(vecCol)).as("nrm"))
    val pairs = vecs.as("a").join(vecs.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= tau)
      .select("id_a", "id_b")
    (assigned, pairs)
  }

  /** `(id, cluster, kept)` — kept = false iff the id sits in a >= tau
    * within-cluster component and is not its min-id representative.
    */
  def prune(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tau: Double): DataFrame = {
    val (assigned, pairs) = clusterPairs(emb, idCol, vecCol, k, iters, tau)
    val removed = Ops.connectedComponents(pairs)
      .filter(!col("is_rep"))
      .select(col("id"), lit(false).as("kept"))
    assigned.select(col(idCol).as("id"), col("cluster"))
      .join(removed, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }
}
