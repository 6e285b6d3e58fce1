package graft.sinks

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Hand-rolled Delta Lake sink + reader (reference P10).
  *
  * delta-spark is absent from /opt/spark/jars (SURVEY.md §7.1), so — exactly
  * like the reference, which hand-rolls the commit protocol in Rust
  * (/root/reference/src/delta_destination.rs:392-477) — this writes the
  * `_delta_log` JSON actions directly:
  *
  *  - refuse-unless-overwrite when the target already contains data
  *    (delta_destination.rs:414-427: logs and returns without writing);
  *  - overwrite deletes existing contents first (:429-432);
  *  - version 0 commit = protocol action PINNED TO v1 readers/writers
  *    (:446-458) + metaData;
  *  - version 1 commit = one Add action per data file with numRecords stats
  *    (:460-470) — the exact two-commit create/append shape asserted by the
  *    reference's integration test (tests/basic_integration.rs:48-58).
  *
  * Data files are written by Spark's parquet writer with snappy compression
  * and maxRecordsPerFile = 2,097,152 (reference P7/P8 constants,
  * delta_destination.rs:43,439). Divergence: the reference also pins
  * 122,880-ROW parquet row groups; parquet-java sizes row groups in BYTES
  * (parquet.block.size), so the row-count knob has no direct equivalent —
  * the write path keeps the writer default. Log commits are atomic via
  * CREATE_NEW —
  * the single-writer equivalent of the reference's conditional-put
  * (delta_destination.rs:377-389 downgrades copy_if_not_exists the same way).
  */
object DeltaSink {
  private val mapper = new ObjectMapper()
  val MaxRecordsPerFile = 2097152L

  private def logDir(table: String) = Paths.get(table, "_delta_log")
  private def versionFile(table: String, v: Long) =
    logDir(table).resolve(f"$v%020d.json")

  private def esc(s: String): String = mapper.writeValueAsString(s)

  /** Writes `df` as a brand-new Delta table. Returns true if written; false
    * if the target was non-empty and overwrite was not requested (the
    * reference's refuse-and-return, delta_destination.rs:421-427).
    */
  def write(df: DataFrame, table: String, overwrite: Boolean = false,
      maxRecordsPerFile: Long = MaxRecordsPerFile): Boolean = {
    val dir = new File(table)
    val existing = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    if (existing.nonEmpty) {
      if (!overwrite) return false
      existing.foreach(deleteRecursively)
    }
    // mode=overwrite only placates Spark's path-exists check: the
    // refuse-unless-overwrite decision was already taken above, and the
    // target has been emptied by then.
    df.write
      .mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(table)
    // Spark leaves a _SUCCESS marker; the Delta log is the commit record.
    new File(dir, "_SUCCESS").delete()

    val conf = df.sparkSession.sessionState.newHadoopConf()
    val parts = Option(dir.listFiles()).get
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    Files.createDirectories(logDir(table))

    val now = System.currentTimeMillis()
    // Reference semantics: sink schemas are nullable-by-default (SURVEY.md
    // §1.2; pg_arrow_source.rs:233 sets nullable=true unconditionally), and
    // Spark file scans surface nullable columns anyway.
    val schemaString = StructType(df.schema.fields.map(_.copy(nullable = true))).json
    val commit0 = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":1}}""",
      s"""{"metaData":{"id":"${java.util.UUID.randomUUID()}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${esc(schemaString)},"partitionColumns":[],"configuration":{},"createdTime":$now}}""")
    commitAtomic(versionFile(table, 0), commit0)

    val adds = parts.map { f =>
      val records = numRecords(f, conf)
      s"""{"add":{"path":${esc(f.getName)},"partitionValues":{},"size":${f.length()},""" +
        s""""modificationTime":${f.lastModified()},"dataChange":true,"stats":"{\\"numRecords\\":$records}"}}"""
    }
    commitAtomic(versionFile(table, 1), adds.toSeq)
    true
  }

  /** Reads a Delta table by replaying the `_delta_log`: accumulates add
    * actions (minus removes) across versions in order, then scans the live
    * files with the metaData schema.
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val logs = Option(logDir(table).toFile.listFiles())
      .map(_.toSeq).getOrElse(Nil)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .sortBy(_.getName)
    require(logs.nonEmpty, s"not a Delta table (no _delta_log): $table")
    var schema: Option[StructType] = None
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    for (log <- logs; line <- Files.readAllLines(log.toPath).asScala if line.nonEmpty) {
      val node = mapper.readTree(line)
      if (node.has("metaData"))
        schema = Some(DataType.fromJson(node.get("metaData").get("schemaString").asText())
          .asInstanceOf[StructType])
      if (node.has("add")) live += node.get("add").get("path").asText()
      if (node.has("remove")) live -= node.get("remove").get("path").asText()
    }
    require(schema.isDefined, s"Delta log has no metaData action: $table")
    val paths = live.toSeq.map(p => new File(table, p).getAbsolutePath)
    spark.read.schema(schema.get).parquet(paths: _*)
  }

  private def commitAtomic(target: java.nio.file.Path, lines: Seq[String]): Unit = {
    val bytes = (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8)
    Files.write(target, bytes, StandardOpenOption.CREATE_NEW)
  }

  private def numRecords(f: File, conf: Configuration): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.toURI), conf))
    try reader.getRecordCount finally reader.close()
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
