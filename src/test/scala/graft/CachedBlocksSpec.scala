package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the executor-storage hygiene contract (VERDICT r18 item 5): the
  * operators' lazy localCheckpoint frames pin MEMORY_AND_DISK blocks, and
  * the harnesses release them between queries with
  * [[CachedBlocks.releaseAll]] — so a long-lived multi-query JVM (the
  * 270-query bench, a query service at 100 TB) keeps FLAT storage instead
  * of accumulating every query's working set for the session lifetime.
  */
class CachedBlocksSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def persistentCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("releaseAll drops the blocks a checkpoint-using operator pins") {
    val s = spark
    import s.implicits._
    CachedBlocks.releaseAll(s) // clean slate (other suites share the session)
    val before = persistentCount
    // a real operator path that localCheckpoints internally: CC supersteps
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val comp = operators.Ops.connectedComponents(edges)
    assert(comp.count() == 5)
    // plus a query-level lazy checkpoint, consumed by an aggregate
    val ck = s.range(1000).toDF("id").localCheckpoint(false)
    assert(ck.agg(count(lit(1))).head().getLong(0) == 1000L)
    assert(persistentCount > before,
      "expected the checkpoint-using paths to pin persistent RDDs")
    CachedBlocks.releaseAll(s)
    assert(persistentCount == 0,
      s"releaseAll must drop every persistent RDD; $persistentCount left")
  }

  test("storage stays flat across repeated checkpoint-using queries with releaseAll between them") {
    val s = spark
    import s.implicits._
    CachedBlocks.releaseAll(s)
    val counts = (1 to 3).map { _ =>
      val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
      operators.Ops.connectedComponents(edges).count()
      val n = persistentCount
      CachedBlocks.releaseAll(s)
      n
    }
    // each iteration pins some blocks, and release returns to zero — the
    // per-iteration pin count must not grow run over run (no accumulation)
    assert(counts.distinct.size == 1,
      s"per-query pinned-block counts must not grow: $counts")
    assert(persistentCount == 0)
  }
}
