package graft.streaming

import graft.sinks.IcebergSink
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a graft Iceberg table — the format
  * twin of [[DeltaTailSource]]. Offsets are SEQUENCE NUMBERS (strictly
  * monotonic per commit, never reused — Iceberg's native change cursor);
  * each micro-batch is the bounded incremental scan of sequences
  * (start, end] via [[IcebergSink.readAppendedBetween]], resolved against
  * the boundary snapshot so a commit racing the offset read can never
  * leak into a batch and re-deliver. Per-entry sequences make a
  * rewriteManifests metadata compaction between offsets invisible (merged
  * manifests keep their files' original sequences), and a data compaction
  * (`replace` snapshot) is skipped outright — its files are rewrites of
  * already-delivered rows. Data-CHANGING non-append snapshots (upsert,
  * MoR update/delete — `overwrite`/`delete` operations) fail the batch
  * loudly by default; `.option("skip-overwrite-snapshots", true)` opts
  * into upstream Iceberg's skip contract (the feed stays append-only and
  * rows removed by those writers are not retracted).
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft-iceberg-tail")
  *     .option("path", "/path/to/iceberg-table")
  *     .load()
  * }}}
  */
class IcebergTailSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-tail"

  private def table(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-iceberg-tail requires .option(\"path\", <iceberg table>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      IcebergSink.tableSchema(table(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergTailSource(sqlContext, table(parameters),
      skipOverwrites = parameters
        .getOrElse("skip-overwrite-snapshots", "false").toBoolean,
      branch = parameters.get("branch"))
}

/** @param branch follow a NAMED BRANCH head instead of main
  *   (`.option("branch", "staging")`) — the WAP audit pipeline's intake:
  *   staged commits feed this tail for validation while staying invisible
  *   to every main-line reader; after fastForward publishes, the main
  *   tail picks the same sequences up from ITS offset and the branch tail
  *   idles (the branch head stops advancing) — no row is lost or doubled
  *   across the handover because both feeds cursor the SAME shared,
  *   never-reused sequence space.
  */
class IcebergTailSource(sqlContext: SQLContext, table: String,
    skipOverwrites: Boolean = false,
    branch: Option[String] = None) extends Source {

  override val schema: StructType = IcebergSink.tableSchema(table)

  /** The offset after a sequence-`s` batch is s itself; a fresh query
    * starts from 0 (every data sequence is ≥ 1, so the whole table is the
    * first batch). Offsets are MAIN-head sequences only — a branch commit
    * never advances the feed — and never move backwards within a run: a
    * rollback lowers the main head's sequence, and the feed simply idles
    * until new commits pass the prior watermark (already-delivered rows
    * are not retracted, the same caveat as the Delta twin).
    */
  private var maxSeen = -1L
  override def getOffset: Option[Offset] = {
    val s = branch match {
      case Some(b) => IcebergSink.branchHeadSequence(table, b)
      case None => IcebergSink.mainHeadSequence(table)
    }
    maxSeen = math.max(maxSeen, s)
    if (maxSeen < 0) None else Some(LongOffset(maxSeen))
  }

  private def seq(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    // after a restart the engine hands back the checkpointed JSON form
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val since = start.map(seq).getOrElse(0L)
    org.apache.spark.sql.GraftColumnBridge.asStreaming(
      IcebergSink.readAppendedBetween(sqlContext.sparkSession, table,
        since, seq(end), skipOverwrites = skipOverwrites))
  }

  override def stop(): Unit = ()
}
