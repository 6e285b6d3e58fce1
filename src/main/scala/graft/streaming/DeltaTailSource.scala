package graft.streaming

import graft.sinks.DeltaSink
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a graft Delta table — the read side of
  * the lakehouse streaming story ([[graft.sinks.DeltaSink.appendExactlyOnce]]
  * is the write side). Offsets are log versions; each micro-batch is the
  * bounded change feed of versions (start, end] via
  * [[DeltaSink.readChangesBetween]], so a commit racing the offset read
  * can never leak into a batch and re-deliver. Compaction rewrites
  * (`dataChange=false`) are excluded — an OPTIMIZE never re-emits rows —
  * which makes this exactly Delta's CDF tailing contract for append-only
  * tables; rows removed by overwriting writers are not retracted (the
  * same caveat delta-spark's streaming source documents).
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft-delta-tail") // or classOf[DeltaTailSourceProvider].getName
  *     .option("path", "/path/to/delta-table")
  *     .load()
  * }}}
  */
class DeltaTailSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta-tail"

  private def table(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-delta-tail requires .option(\"path\", <delta table>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      DeltaSink.tableSchema(sqlContext.sparkSession, table(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaTailSource(sqlContext, table(parameters))
}

class DeltaTailSource(sqlContext: SQLContext, table: String) extends Source {

  override val schema: StructType =
    DeltaSink.tableSchema(sqlContext.sparkSession, table)

  /** The offset after a version-`v` batch is v itself; a fresh query
    * starts from -1 (deliver the whole table as the first batch).
    */
  override def getOffset: Option[Offset] = {
    val v = DeltaSink.latestVersion(table)
    if (v < 0) None else Some(LongOffset(v))
  }

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    // after a restart the engine hands back the checkpointed JSON form
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val since = start.map(version).getOrElse(-1L)
    // re-tagged as a streaming frame — MicroBatchExecution asserts it
    org.apache.spark.sql.GraftColumnBridge.asStreaming(
      DeltaSink.readChangesBetween(sqlContext.sparkSession, table, since, version(end)))
  }

  override def stop(): Unit = ()
}
