package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness gate for the no-oracle q_cluster_kmeans: determinism across
  * partitionings (the decimal-sum contract), recovery of planted clusters,
  * and the empty-cluster fallback.
  */
class KMeansSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val Sf = "/root/testdata/sf0.01"

  test("assignments are identical across input partitionings") {
    val em = Tables(spark, Sf, "embeddings")
    val a = KMeans.assign(em, "vec_id", "embedding", k = 10, iters = 4)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = KMeans.assign(em.repartition(7), "vec_id", "embedding", k = 10, iters = 4)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b))
  }

  test("Lloyd iterations strictly improve the within-cluster sum of squares") {
    // (The corpus labels are NOT geometric clusters — measured intra- and
    // inter-label cosine are both ~0, random points on the 64-sphere — so
    // the meaningful invariant is the k-means objective, not purity.)
    val em = Tables(spark, Sf, "embeddings")
    val vecs = em.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def wcss(iters: Int): Double = {
      val a = KMeans.assign(em, "vec_id", "embedding", k = 10, iters = iters)
        .collect().map(r => r.getLong(0) -> r.getInt(1))
      a.groupBy(_._2).values.map { members =>
        val pts = members.map(m => vecs(m._1))
        val dim = pts.head.length
        val c = Array.tabulate(dim)(d => pts.map(_(d)).sum / pts.length)
        pts.map(p => p.indices.map(i => { val t = p(i) - c(i); t * t }).sum).sum
      }.sum
    }
    val (w0, w1, w4) = (wcss(0), wcss(1), wcss(4))
    assert(w1 < w0, s"one iteration should improve WCSS: $w1 vs $w0")
    assert(w4 <= w1, s"more iterations must not regress WCSS: $w4 vs $w1")
  }

  test("separated 2-cluster toy data converges exactly; iters=0 is seed assignment") {
    val s = spark
    import s.implicits._
    // two tight blobs around (0,0) and (10,10); ids 0/1 seed one blob each
    val rows = Seq(
      (0L, Array(0.1f, 0.0f)), (1L, Array(10.0f, 10.1f)),
      (2L, Array(0.0f, 0.2f)), (3L, Array(9.9f, 10.0f)),
      (4L, Array(0.2f, 0.1f)), (5L, Array(10.1f, 9.9f)))
    val em = rows.toDF("vec_id", "embedding")
    val out = KMeans.assign(em, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0) == out(2) && out(0) == out(4))
    assert(out(1) == out(3) && out(1) == out(5))
    assert(out(0) != out(1))
    val seedOnly = KMeans.assign(em, "vec_id", "embedding", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(seedOnly(0) == 0 && seedOnly(1) == 1)
  }

  test("null / empty / null-element vectors are excluded, not crashed on (ADVICE r7)") {
    val s = spark
    import s.implicits._
    val em = Seq(
      (0L, Array(0.1f, 0.0f)), (1L, Array(10.0f, 10.1f)),
      (2L, null.asInstanceOf[Array[Float]]),      // null vector
      (3L, Array.empty[Float]),                   // empty vector
      (4L, Array(0.2f, 0.1f)), (5L, Array(10.0f, 9.9f)))
      .toDF("vec_id", "embedding")
      // a null ELEMENT can't be built from Array[Float]; inject via SQL
      .union(Seq((6L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
        .select(col("vec_id"), expr("array(embedding[0], CAST(NULL AS FLOAT))").as("embedding")))
    val out = KMeans.assign(em, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // only the 4 clean rows are clustered; none land in a fake cluster -1
    assert(out.keySet == Set(0L, 1L, 4L, 5L))
    assert(out.values.forall(c => c == 0 || c == 1))
    assert(out(0L) == out(4L) && out(1L) == out(5L) && out(0L) != out(1L))
  }

  test("an emptied cluster keeps its previous centroid instead of crashing") {
    val s = spark
    import s.implicits._
    // identical vectors ⇒ both seed centroids coincide ⇒ the argmax tie
    // sends every point to cluster 0 and cluster 1 empties on update
    val em = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.assign(em, "vec_id", "embedding", k = 2, iters = 2).collect()
    assert(out.length == 4)
    assert(out.forall(_.getInt(1) == 0))
  }
}
