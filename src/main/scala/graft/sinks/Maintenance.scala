package graft.sinks

import org.apache.spark.sql.SparkSession

/** POLICY-DRIVEN table maintenance — the nightly janitor loop every
  * long-lived lakehouse table needs, composed from the individual verbs
  * so each threshold decision is METADATA-ONLY (log stats / manifest
  * counts; nothing is scanned to decide):
  *
  *  - Delta: purge deletion vectors once the masked-row ratio crosses
  *    `dvPurgeRatio` (REORG touches only DV files), bin-pack once the
  *    live-file count exceeds `maxSmallFiles` (OPTIMIZE), then checkpoint
  *    (O(delta) replay for every future reader) and vacuum on the
  *    caller's retention clock.
  *  - Iceberg: merge manifests once the data-manifest count exceeds
  *    `maxManifests` (planning cost O(appends) → O(1)), expire snapshots
  *    past `keepLast` (ref-pinned and policy-retained history survives),
  *    and sweep age-gated orphans.
  *
  * At 100 TB the point is WHAT EACH STEP COSTS: every trigger reads KBs
  * of metadata, and every action's cost is proportional to the debt it
  * retires (DV files, small files, manifests, orphans) — never to the
  * table. Both runners return what they did, so a scheduler can log it.
  */
object Maintenance {

  /** @return (dvPurged, compacted, vacuumedFiles) */
  def maintainDelta(spark: SparkSession, table: String,
      maxSmallFiles: Int = 64,
      dvPurgeRatio: Double = 0.1,
      vacuumRetentionMs: Long = 7L * 24 * 3600 * 1000,
      store: CommitStore = CommitStore.Local): (Boolean, Boolean, Int) = {
    import org.apache.spark.sql.functions.{coalesce, col, count, from_json, lit, sum}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // one metadata pass answers both triggers: live-file count, physical
    // rows (numRecords) and masked rows (DV cardinality)
    val stats = DeltaSink.fileStats(spark, table) // num_records is LIVE rows
    val nFiles = stats.count()
    val masked = DeltaSink.dvMaskedRows(spark, table)
    val live = stats.agg(coalesce(sum(col("num_records")), lit(0L)))
      .head().getLong(0)
    val purge = live + masked > 0 &&
      masked.toDouble / (live + masked).toDouble >= dvPurgeRatio
    if (purge) DeltaSink.reorgPurge(spark, table, store = store): Unit
    val compactNeeded = nFiles > maxSmallFiles
    if (compactNeeded) DeltaSink.compact(spark, table, store = store): Unit
    DeltaSink.checkpoint(spark, table, store): Unit
    val vacuumed = DeltaSink.vacuum(spark, table, vacuumRetentionMs, store)
    (purge, compactNeeded, vacuumed)
  }

  /** @return (manifestsMerged, snapshotsExpiredFiles, orphansRemoved) */
  def maintainIceberg(spark: SparkSession, table: String,
      maxManifests: Int = 64,
      keepLast: Int = 5,
      orphanAgeMs: Long = 3L * 24 * 3600 * 1000,
      store: CommitStore = CommitStore.Local): (Boolean, Int, Int) = {
    val manifests = IcebergSink.metaTable(spark, table, "manifests")
      .filter(org.apache.spark.sql.functions.col("content") === 0).count()
    val rewrite = manifests > maxManifests
    if (rewrite) IcebergSink.rewriteManifests(table, store): Unit
    val expired = IcebergSink.expireSnapshots(table, keepLast, store)
    val orphans = IcebergSink.removeOrphanFiles(spark, table, orphanAgeMs, store)
    (rewrite, expired, orphans.size)
  }
}
