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

  /** Cell occupancy above which the mega-cluster sub-split kicks in. Pair
    * cost per un-split cell is occ²/2 cosines, so 2048 bounds the worst
    * cold cell at ~2M codegen dot products while leaving every healthy
    * cell (the paper regime keeps |cell| ~ sqrt(n)/1) untouched.
    */
  val DefaultClusterCap = 2048

  /** Within-cluster candidate pairs: (id_a, id_b) with id_a < id_b, same
    * k-means cell, cosine >= tau. Also returns the per-id cell assignment
    * (id, cluster) so callers can reuse it without a second k-means run.
    *
    * Mega-cluster guard (the [[BandJoin.cappedCandidates]] recipe applied
    * to k-means cells): pair cost is Σ|cell|², which one degenerate cell —
    * common on near-duplicate-heavy corpora — turns quadratic with no
    * bound. So the census counts cell occupancy first (k rows, broadcast
    * back), and cells over `cap` sub-split by the RUNNER-UP centroid index
    * ([[KMeans.assignTop2]]): a hot cell of size B fans across up to k−1
    * Voronoi-boundary sub-buckets and its pair count drops from B² toward
    * Σᵢbᵢ² — and since the paper posture grows k with the corpus, the
    * fanout grows with it. Recall effect (documented, by design): a ≥ tau
    * pair inside a HOT cell is lost only if the two vectors' second
    * nearest centroids differ — near-identical vectors (the high-tau dedup
    * regime) share a runner-up almost surely, and exact duplicates have
    * identical score vectors, hence identical runner-ups: NEVER lost.
    * Cold cells keep subKey = −1, so under-cap corpora are bit-identical
    * to the unguarded join.
    */
  def clusterPairs(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tau: Double,
      cap: Int = DefaultClusterCap): (DataFrame, DataFrame) = {
    require(cap >= 2, s"cluster cap must be >= 2, got $cap")
    // r19 (guide §2.4): the assignment carries the VECTOR out of KMeans's
    // own materialized (id, vec) working set, so the pair join's input is
    // a map-side projection over cached blocks — the id-keyed join back
    // onto `emb` (two exchanges + sort per side) is gone. The slim
    // (id, cluster, cluster2) frame is still materialized once for the
    // occupancy census and the returned assignment (r18, guide §5);
    // re-deriving the scores for `vecs` is k·dim codegen dot products per
    // row over the cached working set — cheaper than the join it replaces.
    val assigned2v = KMeans.assignTop2WithVec(emb, idCol, vecCol, k, iters)
    val slim = assigned2v.select(col(idCol), col("cluster"), col("cluster2"))
      .localCheckpoint(false)
    val occ = slim.groupBy("cluster").agg(count(lit(1)).as("occ"))
    val vecs = assigned2v.join(broadcast(occ), Seq("cluster"))
      .select(col(idCol).as("id"), col("cluster"),
        when(col("occ") > cap, col("cluster2")).otherwise(lit(-1)).as("subKey"),
        col(vecCol).as("v"), l2norm(col(vecCol)).as("nrm"))
    val pairs = vecs.as("a").join(vecs.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.subKey") === col("b.subKey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= tau)
      .select("id_a", "id_b")
    (slim.select(col(idCol), col("cluster")), pairs)
  }

  /** `(id, cluster, kept)` — kept = false iff the id sits in a >= tau
    * within-cluster component and is not its min-id representative.
    */
  def prune(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tau: Double,
      cap: Int = DefaultClusterCap): DataFrame = {
    val (assigned, pairs) = clusterPairs(emb, idCol, vecCol, k, iters, tau, cap)
    val removed = Ops.connectedComponents(pairs)
      .filter(!col("is_rep"))
      .select(col("id"), lit(false).as("kept"))
    assigned.select(col(idCol).as("id"), col("cluster"))
      .join(removed, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }
}
