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

  /** Appends `df` to an existing Delta table as ONE new log version, with
    * optimistic-concurrency commit retry — the natural completion of the
    * reference's create/overwrite-only Delta sink (its Iceberg sink already
    * appends with OCC, iceberg_destination.rs:326-341 + lib.rs:168-196; the
    * same protocol applies here: write data files, then claim version N+1
    * with an atomic CREATE_NEW, re-reading table state on collision).
    * Append never conflicts on content (no removes), so a collision only
    * needs a version bump. The positional schema gate (P14) guards the
    * append exactly as on the Iceberg path. Returns the committed version.
    *
    * Each transaction stages its data files in a private temp directory and
    * moves them into the table under a txn-unique name — concurrent appenders
    * never share Hadoop's `_temporary` staging dir and can never claim each
    * other's files, the same unique-file-name discipline real Delta writers
    * use.
    */
  def append(df: DataFrame, table: String, retries: Int = 3): Long = {
    val dir = new File(table)
    require(logDir(table).toFile.isDirectory, s"not a Delta table (no _delta_log): $table")
    SchemaGate.enforce(df.schema, read(df.sparkSession, table).schema)
    val staging = Files.createTempDirectory("graft-delta-txn").toFile
    val txn = java.util.UUID.randomUUID().toString
    val adds = try {
      df.write
        .mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", MaxRecordsPerFile)
        .parquet(staging.getPath)
      val conf = df.sparkSession.sessionState.newHadoopConf()
      Option(staging.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.map { case (src, i) =>
          val f = new File(dir, f"part-$i%05d-$txn.snappy.parquet")
          Files.move(src.toPath, f.toPath)
          s"""{"add":{"path":${esc(f.getName)},"partitionValues":{},"size":${f.length()},""" +
            s""""modificationTime":${f.lastModified()},"dataChange":true,"stats":"{\\"numRecords\\":${numRecords(f, conf)}}"}}"""
        }
    } finally deleteRecursively(staging)
    var attempt = 0
    while (true) {
      val next = latestVersion(table) + 1
      try {
        commitAtomic(versionFile(table, next), adds)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException if attempt < retries =>
          attempt += 1 // another writer claimed this version; re-read and retry
      }
    }
    -1 // unreachable
  }

  /** Latest committed log version of a Delta table. */
  def latestVersion(table: String): Long =
    logFiles(table).lastOption
      .map(_.getName.stripSuffix(".json").toLong)
      .getOrElse(-1L)

  private def logFiles(table: String): Seq[File] =
    Option(logDir(table).toFile.listFiles())
      .map(_.toSeq).getOrElse(Nil)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .sortBy(_.getName)

  /** Reads a Delta table by replaying the `_delta_log`: accumulates add
    * actions (minus removes) across versions in order, then scans the live
    * files with the metaData schema. `asOfVersion` stops the replay at that
    * commit — snapshot time travel over the same log.
    */
  def read(spark: SparkSession, table: String, asOfVersion: Option[Long] = None): DataFrame = {
    val logs = logFiles(table)
      .filter(f => asOfVersion.forall(v => f.getName.stripSuffix(".json").toLong <= v))
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
