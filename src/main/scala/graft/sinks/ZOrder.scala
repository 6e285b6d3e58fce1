package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order clustering transform shared by the Delta and Iceberg compactors
  * (OPTIMIZE ZORDER): each column scales to 8-bit buckets between its
  * min and max (one broadcast agg row — no driver collect), the bucket
  * bits interleave into a z-value, and the frame range-partitions + sorts
  * on it so rows close in the multi-column space land in the same files —
  * min/max file-skipping then prunes scans filtered on ANY prefix of the
  * z-ordered columns.
  */
private[graft] object ZOrder {

  def cluster(df: DataFrame, zorderBy: Seq[String], nFiles: Int): DataFrame = {
    val bits = 8
    // collision-free internal names: a user column named __z / __min0
    // must never be overwritten or made ambiguous by the clustering
    // machinery
    val tag = java.util.UUID.randomUUID().toString.take(8)
    def minName(i: Int) = s"__graft_min_${tag}_$i"
    def maxName(i: Int) = s"__graft_max_${tag}_$i"
    val zName = s"__graft_z_$tag"
    val aggs = zorderBy.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).as(minName(i)), max(col(c)).as(maxName(i)))
    }
    val minmax = df.agg(aggs.head, aggs.tail: _*)
    val z = zorderBy.indices.map { i =>
      // least(…, numBuckets) folds the x == max row (which width_bucket
      // reports as numBuckets + 1) into the last bucket — an epsilon on
      // the upper bound would be absorbed by double rounding for |max|
      // beyond ~1e7 (ids, epoch millis) and misplace every max-valued row
      // into bucket 0's bit pattern
      val b = least(width_bucket(col(zorderBy(i)).cast("double"),
        col(minName(i)).cast("double"),
        col(maxName(i)).cast("double"), lit(1 << bits)), lit(1 << bits)) - 1
      (0 until bits).map { k =>
        shiftleft(shiftright(b, k).bitwiseAND(1), k * zorderBy.length + i)
      }.reduce((a, c) => a.bitwiseOR(c))
    }.reduce((a, c) => a.bitwiseOR(c))
    // range-partition straight to the target file count: each write task
    // gets one contiguous z-range (coalesce would concatenate sorted runs
    // and break the clustering)
    df.crossJoin(broadcast(minmax))
      .withColumn(zName, z)
      .repartitionByRange(nFiles, col(zName))
      .sortWithinPartitions(zName)
      .select(df.columns.toIndexedSeq.map(col): _*)
  }
}
