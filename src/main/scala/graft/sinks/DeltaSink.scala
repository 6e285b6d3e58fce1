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
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.types._

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
  * Beyond the reference's create/overwrite (it never appends to Delta and
  * has no maintenance verbs), the sink completes the protocol the way a
  * long-lived 100 TB table needs:
  *
  *  - [[append]]: one new log version per transaction with OCC retry;
  *    `mergeSchema=true` additionally evolves the table by APPENDING new
  *    nullable columns (common prefix matched by name+type; the updated
  *    metaData action commits atomically with the adds; table id and
  *    createdTime preserved) — delta-spark's append-time schema
  *    evolution. A concurrent schema change aborts the evolving append
  *    with ConcurrentModificationException (delta-spark's
  *    MetadataChangedException contract) instead of clobbering it;
  *  - partitioned layout: `partitionBy` writes Hive-style `col=value/` dirs,
  *    records `partitionColumns` in metaData and per-file `partitionValues`
  *    in every add action — the reader hands Spark the partition dirs so
  *    Catalyst partition-prunes scans on those columns for free;
  *  - [[checkpoint]]: parquet snapshot of the log state + `_last_checkpoint`
  *    pointer, so readers replay O(commits-since-checkpoint) JSON files
  *    instead of the whole history (a daily-append table is unreadable at
  *    version 10k otherwise). Auto-taken every [[CheckpointInterval]]
  *    appends, mirroring delta-spark's default cadence;
  *  - [[compact]]: bin-packs live files into `maxRecordsPerFile`-sized ones
  *    per partition and commits remove+add with `dataChange=false` — the
  *    OPTIMIZE verb; small-file pileup is the first thing that kills scan
  *    throughput under frequent appends.
  *
  * Data files are written by Spark's parquet writer with snappy compression
  * and maxRecordsPerFile = 2,097,152 (reference P7/P8 constants,
  * delta_destination.rs:43,439). Divergence: the reference also pins
  * 122,880-ROW parquet row groups; parquet-java sizes row groups in BYTES
  * (parquet.block.size), so the row-count knob has no direct equivalent —
  * the write path keeps the writer default. Log commits are atomic via
  * CREATE_NEW — the single-writer equivalent of the reference's
  * conditional-put (delta_destination.rs:377-389 downgrades
  * copy_if_not_exists the same way).
  *
  * PROTOCOL BOUNDARY: tables start at Delta protocol v1 exactly — the
  * same pin as the reference (delta_destination.rs:446-458) — and never
  * emit actions a v1 reader can't replay UNTIL an explicit opt-in verb
  * upgrades them: [[renameColumn]]/[[dropColumn]] bump to reader 2 /
  * writer 5 with `delta.columnMapping.mode=name` declared in the
  * metaData configuration, [[deleteWhereDV]]/[[updateWhereDV]] bump to
  * reader 3 / writer 7 with feature lists, writing spec-format DV
  * sidecars (framed + CRC'd portable RoaringBitmapArray, base85 "u"
  * descriptors) external spec-compliant readers parse. Features beyond
  * those (generated columns, row tracking, v2 checkpoints) stay out of
  * scope, and both [[resolve]]'s reader gate and [[requireWritable]]
  * refuse tables demanding them.
  */
object DeltaSink extends org.apache.spark.internal.Logging {
  private val mapper = new ObjectMapper()
  val MaxRecordsPerFile = 2097152L

  /** Appends auto-checkpoint at every multiple of this version number —
    * delta-spark's default `delta.checkpointInterval` is likewise 10.
    */
  val CheckpointInterval = 10

  private def logDir(table: String) = Paths.get(table, "_delta_log")
  private def versionFile(table: String, v: Long) =
    logDir(table).resolve(f"$v%020d.json")
  private def checkpointFile(table: String, v: Long) =
    logDir(table).resolve(f"$v%020d.checkpoint.parquet")
  private def lastCheckpointFile(table: String) =
    logDir(table).resolve("_last_checkpoint")

  private def esc(s: String): String = mapper.writeValueAsString(s)

  /** COLUMN MAPPING (Delta protocol reader 2 / writer 5, mode "name"):
    * once [[renameColumn]]/[[dropColumn]] enable it, every field carries
    * `delta.columnMapping.physicalName` (+ a stable `.id`) in the schema
    * metadata; data files store PHYSICAL column names (existing columns
    * upgrade with physicalName = their then-current name, so every file
    * ever written is already physical), renames change only the LOGICAL
    * name, and drops remove the field while its physical column stays in
    * old files, unread. Readers project physical→logical; writers rename
    * logical→physical before staging.
    */
  private val PhysNameKey = "delta.columnMapping.physicalName"
  private val MapIdKey = "delta.columnMapping.id"
  /** Spec key: a generated column's SQL expression rides its StructField
    * metadata in schemaString (Delta spec §Generated Columns).
    */
  private val GenExprKey = "delta.generationExpression"

  private def physName(f: StructField): String =
    if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey)
    else f.name

  private def mappingEnabled(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(PhysNameKey))

  /** The table properties a column-mapped table must DECLARE in its
    * metaData action's configuration (Delta spec: a reader defaults to
    * mode "none" and would resolve parquet by logical names — silently
    * reading NULLs after any rename — unless the mode property says
    * otherwise): mode "name" plus the high-water column id.
    */
  private def mappingConfig(schema: StructType): Map[String, String] =
    if (!mappingEnabled(schema)) Map.empty
    else Map(
      "delta.columnMapping.mode" -> "name",
      "delta.columnMapping.maxColumnId" -> maxMapId(schema).toString)

  /** Highest assigned column-mapping id anywhere in the schema, nested
    * fields included — the `delta.columnMapping.maxColumnId` property and
    * the floor fresh ids are minted above.
    */
  private def maxMapId(dt: DataType): Long = dt match {
    case st: StructType => st.fields.map(f => math.max(
      if (f.metadata.contains(MapIdKey)) f.metadata.getLong(MapIdKey) else 0L,
      maxMapId(f.dataType))).foldLeft(0L)(math.max)
    case ArrayType(et, _) => maxMapId(et)
    case MapType(k, v, _) => math.max(maxMapId(k), maxMapId(v))
    case _ => 0L
  }

  /** Logical→physical rename for staging writes (no-op without mapping);
    * columns outside the schema (e.g. `_change_type`) pass through.
    */
  private def toPhysical(df: DataFrame, schema: StructType): DataFrame = {
    if (!mappingEnabled(schema)) return df
    import org.apache.spark.sql.functions.col
    val byName = schema.fields.map(f => f.name -> physName(f)).toMap
    df.select(df.columns.toIndexedSeq.map { c =>
      byName.get(c).filter(_ != c).map(p => col(c).as(p)).getOrElse(col(c))
    }: _*)
  }

  /** The schema as data files carry it: physical names, no mapping
    * metadata anywhere (the parquet reader must not chase it). Nested
    * fields keep their names — only top-level columns are
    * rename-addressable, so nested physical names always equal their
    * logical ones; their stamped metadata still has to go.
    */
  private def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = physName(f),
        dataType = clearMappingMeta(f.dataType),
        metadata = org.apache.spark.sql.types.Metadata.empty)))

  private def clearMappingMeta(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f => f.copy(
      dataType = clearMappingMeta(f.dataType),
      metadata = org.apache.spark.sql.types.Metadata.empty)))
    case ArrayType(et, n) => ArrayType(clearMappingMeta(et), n)
    case MapType(k, v, n) => MapType(clearMappingMeta(k), clearMappingMeta(v), n)
    case other => other
  }

  /** A deletion-vector descriptor on an add action (reader v3 / writer
    * v7), in the Delta spec's own vocabulary: `storageType` "u" stores
    * `pathOrInlineDv` = `<prefix><RFC-1924-base85 uuid>` with the sidecar
    * at `<table>/<prefix>/deletion_vector_<uuid>.bin`; "p" stores an
    * absolute path (this engine also accepts a table-RELATIVE "p" for its
    * own pre-spec descriptors). `offset` addresses the DV's blob inside
    * the spec-framed file; `sizeInBytes` is the blob's dataSize (not the
    * file length); `cardinality` lets metadata-only consumers (fileStats)
    * subtract without opening anything.
    */
  private[sinks] case class DvInfo(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Long, cardinality: Long)

  /** The prefix DV sidecars are written under — one directory per table,
    * so [[vacuum]] sweeps a single listing (real writers scatter random
    * prefixes for S3 key sharding; a prefix is an arbitrary string per
    * the spec, and locality beats sharding on every store that isn't
    * 2010-era S3).
    */
  private[sinks] val DvPrefix = "deletion_vectors"

  /** Table-relative sidecar path of a DV descriptor, or None when the
    * descriptor has no sidecar at all ("i" carries its bits inline) or
    * points outside the table (an absolute "p" elsewhere) — those are
    * never vacuum-tracked.
    */
  private def dvRelPath(table: String, dv: DvInfo): Option[String] = dv.storageType match {
    case "u" =>
      val prefix = dv.pathOrInlineDv.dropRight(20)
      val uuid = graft.functions.DeletionVector.decodeUuid(dv.pathOrInlineDv.takeRight(20))
      Some((if (prefix.isEmpty) "" else prefix + "/") + s"deletion_vector_$uuid.bin")
    case "p" if !dv.pathOrInlineDv.startsWith("/") => Some(dv.pathOrInlineDv)
    case "p" =>
      val tableAbs = new File(table).getAbsolutePath + "/"
      if (dv.pathOrInlineDv.startsWith(tableAbs))
        Some(dv.pathOrInlineDv.stripPrefix(tableAbs))
      else None
    case "i" => None
    case other => throw new IllegalArgumentException(
      s"unsupported deletion-vector storageType: $other")
  }

  /** The sidecar file a DV descriptor resolves to. */
  private def dvFile(table: String, dv: DvInfo): File =
    dvRelPath(table, dv).map(rel => new File(table, rel))
      .getOrElse(new File(dv.pathOrInlineDv))

  /** Reads + parses a descriptor's bitmap: INLINE descriptors ("i",
    * spec: pathOrInlineDv = base85 of the raw portable bitmap, no file)
    * decode in place; spec-framed sidecars (offset present) verify
    * version/size/CRC/magic; sidecar descriptors WITHOUT an offset are
    * this engine's pre-spec raw-Roaring64 files, kept readable so
    * r13-era tables replay.
    */
  private def dvBitmapBytes(table: String, dv: DvInfo, store: CommitStore): Array[Byte] =
    dvBitmapBytesVia(table, dv, p => readBytes(store, new File(p)))

  /** [[dvBitmapBytes]] with caller-supplied byte I/O — the form a TASK can
    * run (executors hold a [[TaskIO]], never the driver's store handle).
    */
  private[sinks] def dvBitmapBytesVia(table: String, dv: DvInfo,
      read: String => Array[Byte]): Array[Byte] = {
    if (dv.storageType == "i") {
      // base85 works in 4-byte blocks, so encoders zero-pad the tail;
      // sizeInBytes recovers the true payload length
      val decoded = graft.functions.DeletionVector.base85Decode(dv.pathOrInlineDv)
      require(decoded.length >= dv.sizeInBytes,
        s"inline DV shorter than its declared size: ${decoded.length} < ${dv.sizeInBytes}")
      return graft.functions.DeletionVector.serialize(
        graft.functions.DeletionVector.fromPortable(
          decoded.take(dv.sizeInBytes.toInt)))
    }
    val raw = read(dvFile(table, dv).getAbsolutePath)
    dv.offset match {
      case Some(off) => graft.functions.DeletionVector.serialize(
        graft.functions.DeletionVector.readDvFile(raw, off, dv.sizeInBytes))
      case None => raw
    }
  }

  /** Touched files per DV SHARD file — the DV write path shards touched
    * files by path hash and each shard packs this many files' bitmaps in
    * ONE task into ONE multi-DV sidecar (bounded task memory), so a
    * 10^6-file delete lands ~1k sidecar objects — not 10^6 tiny blobs and
    * never one driver-assembled monolith. Point deletes (≤ this many
    * touched files) keep producing a single sidecar per commit.
    * Test/tuning override: -Dgraft.dv.filesPerShard=N.
    */
  private[sinks] def FilesPerDvShard: Int =
    sys.props.get("graft.dv.filesPerShard").map(_.toInt).getOrElse(1024)

  /** Live adds per v2-checkpoint sidecar BUCKET. Buckets are the unit of
    * incremental reuse: a re-checkpoint rewrites only buckets whose
    * content changed, so smaller buckets mean finer reuse but more
    * objects. 50k adds ≈ a few MB of parquet per sidecar; a 10^6-file
    * table carries ~32 buckets (power-of-two ratchet). Test/tuning
    * override: -Dgraft.ckpt.addsPerSidecar=N.
    */
  private[sinks] def AddsPerCkptSidecar: Long =
    sys.props.get("graft.ckpt.addsPerSidecar").map(_.toLong).getOrElse(50000L)

  /** One touched file's KB-scale result of a sharded DV pack — the ONLY
    * thing the DV write returns to the driver (never bitmap bytes).
    */
  private[sinks] case class DvShardDesc(rel: String, uuidMsb: Long,
      uuidLsb: Long, offset: Int, dataSize: Int, cardinality: Long,
      freshCardinality: Long)

  /** Packs ONE shard of (file → fresh bitmap bytes) into ONE spec multi-DV
    * sidecar file: merges each file's fresh bitmap with its existing
    * descriptor's (vectors are cumulative in Delta — OR-merge), frames all
    * payloads back to back ([[graft.functions.DeletionVector.frameDvFileMulti]])
    * and names the file from a DETERMINISTIC per-shard uuid (txn uuid ⊕
    * shard id), so a retried task republishes the same bytes at the same
    * key. Pure function of its inputs — runs identically in a task (the
    * scale path) or on the driver (the streamed fallback for driver-only
    * stores). Returns (table-relative sidecar path, file bytes, shard
    * uuid, per-file descriptors).
    */
  private[sinks] def packDvShard(table: String, txnMsb: Long, txnLsb: Long,
      shardId: Int, entries: Seq[(String, Array[Byte])],
      oldByRel: Map[String, DvInfo],
      read: String => Array[Byte])
      : (String, Array[Byte], java.util.UUID, Seq[DvShardDesc]) = {
    val D = graft.functions.DeletionVector
    val sorted = entries.sortBy(_._1)
    val merged = sorted.map { case (rel, fresh) =>
      val freshCard = D.deserialize(fresh).getLongCardinality
      val bytes = oldByRel.get(rel) match {
        case Some(old) => D.merge(dvBitmapBytesVia(table, old, read), fresh)
        case None => fresh
      }
      val bm = D.deserialize(bytes)
      (rel, D.toPortable(bm), bm.getLongCardinality, freshCard)
    }
    val (fileBytes, offsets) = D.frameDvFileMulti(merged.map(_._2))
    val uuid = new java.util.UUID(txnMsb, txnLsb ^ shardId.toLong)
    val dvRel = s"$DvPrefix/deletion_vector_$uuid.bin"
    val descs = merged.zip(offsets).map {
      case ((rel, _, card, freshCard), (offset, dataSize)) =>
        DvShardDesc(rel, uuid.getMostSignificantBits,
          uuid.getLeastSignificantBits, offset, dataSize, card, freshCard)
    }
    (dvRel, fileBytes, uuid, descs)
  }

  /** Sidecar bytes through the store protocol when one is given — a real
    * bucket has no local open (VERDICT r13 item 2).
    */
  private def readBytes(store: CommitStore, f: File): Array[Byte] = store match {
    case os: ObjectStore => os.readObject(f.toPath)
    case _ => Files.readAllBytes(f.toPath)
  }

  /** A data file's absolute location: add paths are table-relative,
    * except a SHALLOW CLONE's ([[cloneTable]]), which are absolute
    * pointers into the source table (spec: add.path may be either).
    */
  private def dataAbs(table: String, path: String): String =
    if (path.startsWith("/")) path
    else new File(table, path).getAbsolutePath

  /** One live data file in the replayed table state. `baseRowId`: row
    * tracking (spec §Row Tracking) — the id of this file's first row.
    */
  private case class AddEntry(path: String, partitionValues: Map[String, String],
      size: Long, modificationTime: Long, stats: String,
      dv: Option[DvInfo] = None,
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None)

  /** Replayed snapshot of the `_delta_log` at `asOfVersion` (or latest).
    * `txns` is the streaming-writer watermark map: appId → highest
    * committed transaction version (Delta's `txn` action).
    */
  private case class State(version: Long, metaId: String,
      createdTime: Long, schema: StructType,
      partitionColumns: Seq[String], live: Seq[AddEntry],
      txns: Map[String, Long], minWriter: Int = 1,
      configuration: Map[String, String] = Map.empty,
      domains: Map[String, String] = Map.empty)

  /** Writes `df` as a brand-new Delta table. Returns true if written; false
    * if the target was non-empty and overwrite was not requested (the
    * reference's refuse-and-return, delta_destination.rs:421-427).
    * `partitionBy` lays the table out in Hive-style partition directories
    * recorded in the log (see object doc).
    */
  /** Clusters rows by the table's partition columns before a PARTITIONED
    * write (guide §6 — Iceberg's `write.distribution-mode=hash`, Delta's
    * optimized write): without it every write task emits one file per
    * partition value it happens to hold, so a day-partitioned ingest at
    * T tasks × D days commits T·D tiny files — measured as
    * q_delta_generated running 48 s at the 5× corpus (~2400 files per
    * write, ~19× the 1× time). Hash-clustering makes the file count ∝
    * distinct partition values (linear in data), `maxRecordsPerFile`
    * still splits an oversized partition into multiple files, and AQE may
    * coalesce the REPARTITION_BY_COL output. Known trade at 100 TB: one
    * giant partition value funnels into one task — split such tables by a
    * finer transform (that is a layout decision, not a writer default).
    */
  private def clusterByPartitions(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df
    else df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)

  def write(df: DataFrame, table: String, overwrite: Boolean = false,
      maxRecordsPerFile: Long = MaxRecordsPerFile,
      partitionBy: Seq[String] = Nil,
      store: CommitStore = CommitStore.Local): Boolean = {
    val dir = new File(table)
    val existing = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    if (existing.nonEmpty) {
      if (!overwrite) return false
      existing.foreach(deleteRecursively)
    }
    val conf = df.sparkSession.sessionState.newHadoopConf()
    def sparkWrite(target: String): Unit = {
      // mode=overwrite only placates Spark's path-exists check: the
      // refuse-unless-overwrite decision was already taken above, and the
      // target has been emptied by then.
      val writer = clusterByPartitions(df, partitionBy).write
        .mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", maxRecordsPerFile)
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(target)
      // Spark leaves a _SUCCESS marker; the Delta log is the commit record.
      new File(target, "_SUCCESS").delete()
    }
    // Data-file placement: a plain store writes parquet straight into the
    // table; an ObjectStore stages locally and PUBLISHES each file through
    // the store's multipart upload — the reference's single pipeline
    // (delta_destination.rs:70-229: upload data files, then conditionally
    // put the commit), end to end over the store protocol.
    val adds: Seq[AddEntry] = store match {
      case _: ObjectStore =>
        val staging = Files.createTempDirectory("graft-delta-write").toFile
        try {
          sparkWrite(staging.getPath)
          publishAll(store, dir, staging, conf, (rel, _) => rel.toString)
        } finally deleteRecursively(staging)
      case _ =>
        sparkWrite(table)
        dataFiles(dir).map(f => toAddEntry(dir, f, conf))
    }
    Files.createDirectories(logDir(table))

    val now = System.currentTimeMillis()
    // Reference semantics: sink schemas are nullable-by-default (SURVEY.md
    // §1.2; pg_arrow_source.rs:233 sets nullable=true unconditionally), and
    // Spark file scans surface nullable columns anyway.
    val schemaString = StructType(df.schema.fields.map(_.copy(nullable = true))).json
    val commit0 = Seq(protocolJsonFor(df.schema),
      metaDataJson(java.util.UUID.randomUUID().toString, schemaString, partitionBy, now))
    commitAtomic(store, versionFile(table, 0), commit0)
    commitAtomic(store, versionFile(table, 1), adds.map(a => addJson(a)))
    true
  }

  /** CREATES a Delta table with GENERATED COLUMNS (spec §Generated
    * Columns, `delta.generationExpression` field metadata + writer v4):
    * each (name → SQL expression) column is computed from the frame,
    * appended to the schema with its expression stamped in the field
    * metadata, and from then on EVERY append either computes the column
    * (when omitted) or verifies the provided values in-plan — see
    * [[append]]. The headline use at 100 TB is Delta's answer to hidden
    * partitioning: partition by a generated `date(ts)` column and writers
    * never hand-maintain it, while readers partition-prune on it.
    */
  def writeGenerated(df: DataFrame, table: String,
      generated: Map[String, String],
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = MaxRecordsPerFile,
      store: CommitStore = CommitStore.Local): Boolean = {
    import org.apache.spark.sql.functions.expr
    require(generated.nonEmpty, "writeGenerated needs at least one column")
    generated.keys.foreach(n => require(!df.columns.contains(n),
      s"generated column $n already exists in the frame"))
    val withCols = generated.toSeq.sortBy(_._1).foldLeft(df) { case (d, (n, ex)) =>
      val m = new org.apache.spark.sql.types.MetadataBuilder()
        .putString(GenExprKey, ex).build()
      d.withColumn(n, expr(ex).as(n, m))
    }
    val ok = write(withCols, table, overwrite = false, maxRecordsPerFile,
      partitionBy, store)
    if (ok) {
      // generated columns are a WRITER feature: legacy v4 (spec) — bumped
      // in a follow-up protocol commit so pre-v4 writers refuse the table
      commitAtomic(store, versionFile(table, 2),
        Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}"""))
    }
    ok
  }

  /** CONVERT an Iceberg table to Delta IN PLACE — METADATA-ONLY (the
    * reverse of [[IcebergSink.convertFromDelta]]; together they are the
    * UniForm pattern in both directions): mints the standard two-commit
    * `_delta_log` (protocol + metaData, then one add per live Iceberg
    * data file with its manifest record_count as numRecords stats and its
    * typed partition values stringified into the Hive codec) alongside
    * `metadata/`, moving zero data bytes. Identity partitioning maps
    * 1:1 — both formats drop the column from the files and carry the
    * value in table metadata; hidden (transform) partitioning,
    * partition-evolved layouts and live MoR deletes refuse. Both
    * front-ends then evolve independently; each side's janitor treats the
    * other's live files as referenced ([[vacuum]] /
    * [[IcebergSink.expireSnapshots]] guards). Returns the file count.
    */
  def convertFromIceberg(spark: SparkSession, table: String,
      store: CommitStore = CommitStore.Local): Int = {
    require(!Files.exists(logDir(table)), s"$table is already a Delta table")
    val (schema, partCols, files) = IcebergSink.inventoryForConvert(table)
    val dir = new File(table)
    def strPv(v: Any, colName: String): String = v match {
      case null => null
      case i: Integer if schema(colName).dataType ==
        org.apache.spark.sql.types.DateType =>
        java.time.LocalDate.ofEpochDay(i.toLong).toString
      case other => String.valueOf(other)
    }
    val adds = files.map { case (absPath, pvals, n) =>
      val f = new File(absPath)
      require(f.getAbsolutePath.startsWith(dir.getAbsolutePath + File.separator),
        s"data file outside the table root cannot convert: $absPath")
      AddEntry(dir.toPath.relativize(f.toPath).toString,
        partCols.map(c => c -> strPv(pvals.getOrElse(c, null), c)).toMap,
        f.length(), f.lastModified(), s"""{"numRecords":$n}""")
    }
    val now = System.currentTimeMillis()
    Files.createDirectories(logDir(table))
    val commit0 = Seq(protocolJson,
      metaDataJson(java.util.UUID.randomUUID().toString,
        StructType(schema.fields.map(_.copy(nullable = true))).json,
        partCols, now))
    commitAtomic(store, versionFile(table, 0), commit0)
    try commitAtomic(store, versionFile(table, 1), adds.map(a => addJson(a)))
    catch { case e: Throwable =>
      scala.util.Try(deleteData(store, dir, "_delta_log/" +
        versionFile(table, 0).getFileName.toString))
      throw e
    }
    adds.size
  }

  /** SHALLOW CLONE — a zero-copy table copy (Delta CLONE semantics): the
    * clone gets its OWN log (fresh table id, version 0/1) whose add
    * actions point at the SOURCE's data files by absolute path (spec:
    * `add.path` may be relative or absolute — absolute is exactly the
    * shallow-clone encoding). No data byte moves at any table size, so a
    * 100 TB production table clones in milliseconds for experimentation;
    * the clone then evolves independently — appends land clone-local
    * files, CoW/DV deletes rewrite or mask only what they touch, vacuum
    * on the clone never reclaims source files (they live outside its
    * root). Deletion-vector descriptors absolutize the same way ("u"
    * sidecars become absolute-"p" pointers into the source). The source's
    * protocol (feature lists included) and column-mapping schema carry
    * over verbatim — physical names keep resolving the source's parquet.
    * Partitioned sources refuse for now: this reader derives partition
    * values via directory discovery under the table root, which absolute
    * outside paths cannot join. CAVEAT (same as every shallow-clone
    * implementation): vacuuming the SOURCE can reclaim files the clone
    * still references — retention policy must outlive clones. Returns
    * the number of files referenced.
    */
  def cloneTable(spark: SparkSession, source: String, target: String,
      store: CommitStore = CommitStore.Local): Int = {
    val (meta, live) = resolve(spark, source, None)
    require(meta.partitionColumns.isEmpty,
      "shallow clone of a partitioned table is not supported yet: the " +
        "reader derives partition values by directory discovery, which " +
        "absolute source paths cannot join")
    val dir = new File(target)
    require(Option(dir.listFiles()).forall(_.isEmpty),
      s"clone target is not empty: $target")
    val adds = collectAdds(live).map { a =>
      a.copy(path = dataAbs(source, a.path),
        dv = a.dv.map { d =>
          if (d.storageType == "i") d // inline bits travel in the log itself
          else DvInfo("p", dvFile(source, d).getAbsolutePath,
            d.offset, d.sizeInBytes, d.cardinality)
        })
    }
    Files.createDirectories(logDir(target))
    val now = System.currentTimeMillis()
    val protocol =
      if (meta.minReader == 1 && meta.minWriter == 1)
        protocolJson
      else {
        def lst(fs: Seq[String]) =
          fs.distinct.sorted.map(esc).mkString("[", ",", "]")
        s"""{"protocol":{"minReaderVersion":${meta.minReader},""" +
          s""""minWriterVersion":${meta.minWriter}""" +
          (if (meta.minReader >= 3)
            s""","readerFeatures":${lst(meta.readerFeatures)}""" +
              s""","writerFeatures":${lst(meta.writerFeatures)}"""
          else "") + "}}"
      }
    // an ICT source's clone RESTARTS its own commit clock: the
    // enablement properties are table-local (the clone's history begins
    // at ITS v0), and v0 must lead with a commitInfo or the per-commit
    // probe chain never starts — config would claim ICT while every
    // commit went unstamped, the one inconsistency the feature forbids
    val ict = meta.configuration
      .get("delta.enableInCommitTimestamps").contains("true")
    val config = meta.configuration ++ mappingConfig(meta.schema) ++
      (if (ict) Map(
        "delta.inCommitTimestampEnablementVersion" -> "0",
        "delta.inCommitTimestampEnablementTimestamp" -> now.toString)
      else Map.empty)
    val commit0 =
      (if (ict) Seq(s"""{"commitInfo":{"inCommitTimestamp":$now,"timestamp":$now}}""")
       else Nil) ++
      Seq(protocol,
        metaDataJson(java.util.UUID.randomUUID().toString, meta.schema.json,
          // the source's table properties travel with the clone — CHECK
          // constraints included (real CLONE copies them)
          Nil, now, config))
    commitAtomic(store, versionFile(target, 0), commit0)
    commitAtomic(store, versionFile(target, 1), adds.map(a => addJson(a)))
    adds.size
  }

  /** Appends `df` to an existing Delta table as ONE new log version, with
    * optimistic-concurrency commit retry — the natural completion of the
    * reference's create/overwrite-only Delta sink (its Iceberg sink already
    * appends with OCC, iceberg_destination.rs:326-341 + lib.rs:168-196; the
    * same protocol applies here: write data files, then claim version N+1
    * with an atomic CREATE_NEW, re-reading table state on collision).
    * Append never conflicts on content (no removes), so a collision only
    * needs a version bump. The positional schema gate (P14) guards the
    * append exactly as on the Iceberg path. Respects the table's declared
    * partition layout. Returns the committed version.
    *
    * Each transaction stages its data files in a private temp directory and
    * moves them into the table under a txn-unique name — concurrent appenders
    * never share Hadoop's `_temporary` staging dir and can never claim each
    * other's files, the same unique-file-name discipline real Delta writers
    * use.
    */
  def append(df: DataFrame, table: String, retries: Int = 3,
      store: CommitStore = CommitStore.Local,
      mergeSchema: Boolean = false): Long =
    append(df, table, retries, None, store, mergeSchema)

  /** Exactly-once append for streaming writers: the commit carries a
    * `txn` action recording (appId, txnVersion), and a batch whose
    * txnVersion is ≤ the table's recorded watermark for that appId is
    * SKIPPED — so a foreachBatch sink that dies between "committed to
    * Delta" and "checkpointed by Spark" simply replays the batch into a
    * no-op instead of double-writing it. This is Delta's streaming-sink
    * idempotence protocol. Returns the committed version, or -1 if the
    * batch was already in the table.
    */
  def appendExactlyOnce(df: DataFrame, table: String, appId: String,
      txnVersion: Long, store: CommitStore = CommitStore.Local): Long =
    append(df, table, 3, Some((appId, txnVersion)), store, mergeSchema = false)

  private def append(df0: DataFrame, table: String, retries: Int,
      txn0: Option[(String, Long)], store: CommitStore,
      mergeSchema: Boolean): Long = {
    val dir = new File(table)
    require(logDir(table).toFile.isDirectory, s"not a Delta table (no _delta_log): $table")
    val state = replay(df0.sparkSession, table, None)
    requireWritable(state.minWriter, table)
    // GENERATED COLUMNS (spec §Generated Columns): a batch may OMIT a
    // generated column — the writer computes it (in schema order, so a
    // generated column may reference an earlier one) — and a batch that
    // PROVIDES one has its values verified in-plan (null-safe equality →
    // raise_error), the same zero-extra-pass discipline as CHECK
    // constraints. Both happen before the positional gate, which then
    // sees the full declared width.
    val df: DataFrame = {
      import org.apache.spark.sql.functions.{col, expr, lit, raise_error, when}
      val genCols = state.schema.fields.filter(_.metadata.contains(GenExprKey))
      genCols.foldLeft(df0) { (d, f) =>
        val ex = expr(f.metadata.getString(GenExprKey)).cast(f.dataType)
        if (!d.columns.contains(f.name)) d.withColumn(f.name, ex)
        else {
          val first = d.columns.head
          val dt = d.schema.head.dataType
          d.withColumn(first,
            when(col(f.name) <=> ex, col(first))
              .otherwise(raise_error(lit(
                s"generated column ${f.name} mismatch: expected " +
                  s"${f.metadata.getString(GenExprKey)}")).cast(dt)))
        }
      }
    }
    txn0.foreach { case (appId, v) =>
      if (state.txns.get(appId).exists(_ >= v)) return -1L
    }
    // Schema evolution (mergeSchema=true, delta-spark's append option):
    // new columns may be APPENDED — the common prefix must match by name
    // and type (stricter than the positional P14 gate: evolved metadata is
    // read by name, so a silent positional rename would orphan data), and
    // a narrower frame may omit trailing nullable columns (its files just
    // lack them; the declared-schema read fills nulls). When the table
    // schema widens, the SAME commit carries an updated metaData action —
    // atomic with the adds, table id preserved.
    def evolveAgainst(existing: StructType): Option[StructType] = {
      val n = math.min(df.schema.length, existing.length)
      val mismatches = existing.fields.take(n).zip(df.schema.fields.take(n))
        .zipWithIndex.collect {
          case ((old, nw), i) if old.name != nw.name || old.dataType != nw.dataType =>
            s"field $i: table has ${old.name}: ${old.dataType.sql}, " +
              s"incoming has ${nw.name}: ${nw.dataType.sql}"
          case ((old, nw), i) if !old.nullable && nw.nullable =>
            // same direction rule as the P14 gate: never put possibly-null
            // data into a column the table declares required
            s"field $i (${old.name}) is required in the table but nullable in the incoming data"
        }
      require(mismatches.isEmpty,
        "mergeSchema only appends new columns; common prefix must match: " +
          mismatches.mkString("; "))
      if (df.schema.length > existing.length) {
        // appended names must be fresh under Spark's default
        // case-insensitive resolution — a duplicate would commit a schema
        // spark.read.schema() rejects, bricking every subsequent read
        val taken = existing.fields.map(_.name.toLowerCase).toSet
        val fresh = df.schema.fields.drop(n).map(_.name)
        val dupes = fresh.filter(f => taken.contains(f.toLowerCase)) ++
          fresh.groupBy(_.toLowerCase).collect { case (_, vs) if vs.length > 1 => vs.head }
        require(dupes.isEmpty,
          s"mergeSchema appended columns collide (case-insensitive): ${dupes.mkString(", ")}")
        // under column mapping, ADDED columns get FRESH physical names
        // (real Delta assigns UUIDs): re-adding a dropped or renamed
        // logical name must NEVER resurrect old files' physical column of
        // that name, and toPhysical must never emit duplicates
        val nextId = existing.fields
          .filter(_.metadata.contains(MapIdKey))
          .map(_.metadata.getLong(MapIdKey)).foldLeft(0L)(math.max)
        Some(StructType(existing.fields ++
          df.schema.fields.drop(n).zipWithIndex.map { case (f, k) =>
            val f1 = f.copy(nullable = true)
            if (!mappingEnabled(existing)) f1
            else f1.copy(metadata =
              new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f1.metadata)
                .putLong(MapIdKey, nextId + k + 1)
                .putString(PhysNameKey,
                  s"col-${java.util.UUID.randomUUID()}").build())
          }))
      } else {
        require(existing.fields.drop(n).forall(_.nullable),
          "incoming data omits non-nullable trailing columns")
        None
      }
    }
    val evolvedSchema: Option[StructType] =
      if (!mergeSchema) { SchemaGate.enforce(df.schema, state.schema); None }
      else evolveAgainst(state.schema)
    val staging = Files.createTempDirectory("graft-delta-txn").toFile
    val txn = java.util.UUID.randomUUID().toString
    val adds = try {
      // stage under the EVOLVED mapping: an added column's fresh physical
      // name must reach the file, not its logical name
      val writer = toPhysical(
          clusterByPartitions(withConstraintCheck(df, state.configuration),
            state.partitionColumns),
          evolvedSchema.getOrElse(state.schema)).write
        .mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", MaxRecordsPerFile)
      (if (state.partitionColumns.nonEmpty)
         writer.partitionBy(state.partitionColumns: _*)
       else writer).parquet(staging.getPath)
      val conf = df.sparkSession.sessionState.newHadoopConf()
      // preserve the partition subpath; txn-unique base names
      publishAll(store, dir, staging, conf, (rel, i) =>
        Option(rel.getParent).map(_.toString + "/").getOrElse("") +
          f"part-$i%05d-$txn.snappy.parquet")
    } finally deleteRecursively(staging)
    val txnLine = txn0.map { case (appId, v) =>
      s"""{"txn":{"appId":${esc(appId)},"version":$v}}"""
    }
    // any abort path removes the already-published data files — they are
    // not in the log, so leaving them would only waste space until vacuum
    def abort(): Unit = adds.foreach(a => deleteData(store, dir, a.path))
    var attempt = 0
    // Version through which the txn watermark has been validated. A replay
    // of THIS batch (two speculative executions of one foreachBatch) can
    // commit at any version number without ever colliding with us, so the
    // watermark must be re-checked against every version that appeared
    // since the last check — before EVERY commit attempt, not only after a
    // collision. CREATE_NEW succeeding at `next` then proves no commit
    // (and so no competing replay) landed between the check and ours:
    // writers only ever claim latestVersion+1, so an intervening commit
    // would have claimed `next` first.
    var checkedThrough = state.version
    // Version floor proven by conditional-put failures: a putIfAbsent that
    // throws AlreadyExists is AUTHORITATIVE evidence the version exists even
    // when the store's LISTING hasn't surfaced it yet (an eventually-
    // consistent object store; see CommitStore.DelayedVisibilityLocal).
    // Without this floor a writer racing a lagging listing re-claims the
    // same version until its retries burn out instead of advancing.
    var minNext = state.version + 1
    while (true) {
      val latest = latestVersion(table)
      txn0.foreach { case (appId, v) =>
        if (latest > checkedThrough) {
          val st = replay(df.sparkSession, table, None)
          checkedThrough = st.version
          if (st.txns.get(appId).exists(_ >= v)) { abort(); return -1L }
        }
      }
      val next = math.max(latest + 1, minNext)
      // a schema-evolving commit must not clobber a concurrent evolution:
      // if ANY commit landed after our snapshot, re-replay and require the
      // schema we evolved from to be unchanged (delta-spark aborts with
      // MetadataChangedException on concurrent metadata change — same
      // contract here; the caller re-runs the append against fresh state)
      if (evolvedSchema.isDefined && latest > state.version) {
        val st = replay(df.sparkSession, table, None)
        if (st.schema != state.schema) {
          abort()
          throw new java.util.ConcurrentModificationException(
            "table schema changed concurrently during a mergeSchema append; re-run the append")
        }
      }
      try {
        // evolved metaData (if any) rides in the SAME commit as the adds:
        // either both land or neither — a reader never sees files whose
        // columns the declared schema doesn't know about. createdTime is
        // the TABLE's creation time — preserved like the id.
        val metaLine = evolvedSchema.map(sch => metaDataJson(state.metaId,
          sch.json, state.partitionColumns,
          // external logs may omit createdTime (replays as 0) — don't
          // propagate a zero birth-time into the evolved action
          if (state.createdTime != 0L) state.createdTime
          else System.currentTimeMillis(),
          // a metaData action REPLACES configuration wholesale, so every
          // re-emission must carry the FULL replayed map (CHECK
          // constraints would otherwise silently vanish) plus the
          // mapping mode/maxColumnId refresh (the added column may have
          // raised the high-water id)
          state.configuration ++ mappingConfig(sch)))
        // ROW TRACKING: fresh ids assign above the CURRENT high-water
        // mark — re-read whenever anything landed since our snapshot, so
        // two racing appends can never mint overlapping ids (the loser's
        // conditional put fails and it re-bases on the next attempt)
        val (addsFinal, domainLine) =
          if (!state.configuration.get(RowTrackingConf).contains("true"))
            (adds, None)
          else {
            val domainsNow =
              if (latest > state.version) replay(df.sparkSession, table, None).domains
              else state.domains
            val hwm = rowIdHighWaterMark(domainsNow).getOrElse(-1L)
            val (w, newHwm) = assignRowIds(adds, hwm, next)
            (w, Some(domainJson(RowTrackingDomain,
              s"""{"rowIdHighWaterMark":$newHwm}""")))
          }
        commitAtomic(store, versionFile(table, next),
          metaLine.toSeq ++ txnLine.toSeq ++ addsFinal.map(a => addJson(a)) ++
            domainLine.toSeq)
        // The append is committed at this point: an auto-checkpoint failure
        // (IO error) must not surface as an append failure — the caller
        // would retry and double-write the batch. Best-effort only.
        if (next % CheckpointInterval == 0)
          scala.util.Try(checkpoint(df.sparkSession, table, store))
        return next
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          if (attempt >= retries) { abort(); throw e }
          attempt += 1 // another writer claimed this version; re-read and retry
          minNext = next + 1
      }
    }
    -1 // unreachable
  }

  /** RESTORE — the undo verb (Delta RESTORE semantics): commits a NEW
    * version whose live set is exactly `asOfVersion`'s, re-adding the
    * pinned version's files missing from the current live set and removing
    * current files the pinned version doesn't reference. Metadata-only: no
    * data file is read, moved or rewritten — cost scales with the file-set
    * DIFF, never the table. Actions carry dataChange=true (a restore
    * changes table contents; incremental consumers must see it). History
    * is preserved: the undone commits stay replayable, so time travel
    * FORWARD to them still works until vacuum reclaims their files — and
    * the re-added files are live again, protected from future vacuum by
    * construction. Precondition (same as Delta RESTORE): the pinned
    * version's files must not have been vacuumed yet.
    * Returns (filesReAdded, filesRemoved); (0, 0) with no commit when the
    * current state already equals the target.
    */
  def restore(spark: SparkSession, table: String, asOfVersion: Long,
      retries: Int = 3, store: CommitStore = CommitStore.Local): (Int, Int) = {
    val target = replay(spark, table, Some(asOfVersion))
    var attempt = 0
    while (attempt <= retries) {
      // diff against FRESH state every attempt: a concurrent commit
      // changes the current live set, and a restore computed against a
      // stale one would resurrect or orphan its files
      val current = replay(spark, table, None)
      requireWritable(current.minWriter, table)
      require(current.schema == target.schema,
        "restore across a schema change is not supported: restore the data " +
          "first, then evolve, or vice versa")
      val targetPaths = target.live.map(_.path).toSet
      val currentByPath = current.live.map(a => a.path -> a.dv).toMap
      // a path live in BOTH states but under a DIFFERENT deletion-vector
      // (a DV delete landed after the restore point) must be re-added
      // with the target's descriptor — the path diff alone would leave
      // the later delete silently in force
      val readds = target.live.filter(a =>
        !currentByPath.get(a.path).contains(a.dv))
      val removes = current.live.filterNot(a => targetPaths.contains(a.path))
      if (readds.isEmpty && removes.isEmpty) return (0, 0)
      val now = System.currentTimeMillis()
      val lines = removes.map(a =>
        s"""{"remove":{"path":${esc(a.path)},"deletionTimestamp":$now,"dataChange":true}}""") ++
        readds.map(a => addJson(a))
      // Claim exactly the version AFTER the one the diff was computed
      // against (writers only claim latestVersion+1): a commit landing
      // between the replay above and this claim then collides with
      // FileAlreadyExistsException and triggers the re-diff retry —
      // re-reading latestVersion here would let that interleaved commit
      // (e.g. a concurrent compact) be silently built over with a stale
      // diff, resurrecting files it removed.
      val next = current.version + 1
      try {
        commitAtomic(store, versionFile(table, next), lines)
        return (readds.size, removes.size)
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          if (attempt >= retries) throw e
          attempt += 1 // another writer claimed it; re-diff and retry
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bin-packs the table's live files into `maxRecordsPerFile`-sized files
    * (per partition, preserving the declared layout) and commits the rewrite
    * as remove+add actions with `dataChange=false` — the OPTIMIZE verb.
    * Readers at any version still resolve: old files stay on disk, only the
    * log stops referencing them (vacuum = physical deletion is the caller's
    * retention decision). Returns (filesRewritten, filesAfter) — on an
    * unclustered or first-clustering run filesRewritten is every live
    * file; on an INCREMENTAL liquid run (see below) it is only the
    * unclustered tail, and (0, 0) means the table was already fully
    * clustered and no commit was made.
    *
    * `zorderBy` additionally CLUSTERS the rewrite on a Z-order curve over
    * the given numeric columns (OPTIMIZE ZORDER): each column is scaled to
    * 8-bit buckets between its min and max (one broadcast agg row — no
    * driver collect), the bucket bits are interleaved into a z-value, and
    * the rewrite range-partitions + sorts on it. Rows close in the
    * multi-column space land in the same parquet files, so min/max
    * file-skipping prunes scans filtered on ANY prefix of those columns —
    * the layout lever for multi-dimensional predicates at 100 TB.
    */
  def compact(spark: SparkSession, table: String,
      maxRecordsPerFile: Long = MaxRecordsPerFile,
      zorderBy: Seq[String] = Nil,
      store: CommitStore = CommitStore.Local): (Int, Int) = {
    import org.apache.spark.sql.functions._
    val dir = new File(table)
    val state = replay(spark, table, None)
    requireWritable(state.minWriter, table)
    // ROW TRACKING: an id-preserving compaction MATERIALIZES `_row_id`
    // AND `_row_commit_version` into the rewritten parquet (spec:
    // dataChange=false rewrites must carry row lineage explicitly) — the
    // rewritten adds' baseRowId/defaultRowCommitVersion stay null and
    // [[readWithRowIds]] picks both columns up from the files, so the
    // rewrite's own version never claims the repacked rows
    val rowTracking = state.configuration.get(RowTrackingConf).contains("true")
    val current0 =
      if (rowTracking) readWithRowIds(spark, table, store)
      else readState(spark, table, state, store)
    // LIQUID CLUSTERING: on a clustered table a plain OPTIMIZE clusters
    // implicitly by the declared columns (the spec's contract — the
    // declaration is metadata-only, the NEXT rewrite realizes it); an
    // explicit zorderBy still overrides for a one-off layout
    val clusterPhys = clusteringPhysical(state.domains)
    val clusterCols =
      if (zorderBy.nonEmpty) zorderBy
      else clusterPhys.map { phys =>
        state.schema.fields.find(f => physName(f) == phys)
          .map(_.name).getOrElse(phys)
      }
    val txn = java.util.UUID.randomUUID().toString
    // INCREMENTAL liquid: a declared-columns OPTIMIZE re-clusters ONLY
    // the unclustered TAIL — files written by a previous clustering
    // rewrite carry forward untouched. Clustered generations are tracked
    // in the graft-owned [[LiquidDomain]] as the rewrite txn uuids, which
    // every rewritten file carries in its NAME (real Delta stamps ZCube
    // ids in add tags; the domain spelling keeps this engine's replayed
    // add schema lean while staying KB-bounded — one uuid per OPTIMIZE,
    // pruned to generations still live). A file re-joins the tail when a
    // DV lands on it (the rewrite purges the mask) or when the declared
    // columns changed (the old layout no longer clusters the new key).
    // Row-tracking tables keep the full id-materializing rewrite.
    val liquid = zorderBy.isEmpty && clusterPhys.nonEmpty
    val prevGens: Set[String] = state.domains.get(LiquidDomain)
      .map(c => mapper.readTree(c))
      .filter(n => n.path("columns").elements().asScala
        .map(_.asText()).toSeq == clusterPhys)
      .map(_.path("generations").elements().asScala.map(_.asText()).toSet)
      .getOrElse(Set.empty)
    val (carried, tail) =
      if (!liquid || rowTracking || prevGens.isEmpty) (Nil, state.live)
      else state.live.partition(a =>
        a.dv.isEmpty && prevGens.exists(g => a.path.contains(g)))
    if (tail.isEmpty) return (0, 0) // fully clustered already — no-op
    // Bin-pack target for the REWRITTEN set: live row count from the
    // log's own numRecords stats minus each file's deletion-vector
    // cardinality (the same metadata-only subtraction fileStats makes —
    // a post-delete compact must size for the survivors, not the masked
    // rows; no data scan either way); maxRecordsPerFile still caps each
    // file, so the result is the minimal file count at the declared size.
    val tailRows = tail.map { a =>
      Option(a.stats).map(s => mapper.readTree(s).path("numRecords").asLong(0L))
        .getOrElse(0L) - a.dv.map(_.cardinality).getOrElse(0L)
    }.sum
    val nTailFiles = math.max(1,
      ((tailRows + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt)
    val source =
      if (carried.isEmpty) current0
      else readState(spark, table, state.copy(live = tail), store)
    val current =
      if (clusterCols.isEmpty) source
      else ZOrder.cluster(source, clusterCols, nTailFiles) // shared with IcebergSink
    val staging = Files.createTempDirectory("graft-delta-compact").toFile
    val conf = spark.sessionState.newHadoopConf()
    val adds = try {
      // coalesce is shuffle-free and hits the bin-pack formula when the
      // inputs are evenly sized (append-written files are); a DV-masked
      // input's SURVIVORS are arbitrarily skewed, so only a round-robin
      // repartition keeps every bin under maxRecordsPerFile — the shuffle
      // is bounded by the live rows the compaction rewrites anyway
      val packed =
        if (clusterCols.nonEmpty) current // ZOrder.cluster already sized it
        else if (tail.exists(_.dv.isDefined)) current.repartition(nTailFiles)
        else current.coalesce(nTailFiles)
      val writer = toPhysical(packed, state.schema).write
        .mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", maxRecordsPerFile)
      (if (state.partitionColumns.nonEmpty)
         writer.partitionBy(state.partitionColumns: _*)
       else writer).parquet(staging.getPath)
      publishAll(store, dir, staging, conf, (rel, i) =>
        Option(rel.getParent).map(_.toString + "/").getOrElse("") +
          f"part-$i%05d-$txn.c000.snappy.parquet")
    } finally deleteRecursively(staging)
    val now = System.currentTimeMillis()
    val removes = tail.map(a =>
      s"""{"remove":{"path":${esc(a.path)},"deletionTimestamp":$now,"dataChange":false}}""")
    // record the new clustered generation (this txn + the carried ones
    // still live) in the same commit; a one-off ZORDER over a clustered
    // table RESETS the generations — its layout is not the declared key's
    val domainLines =
      if (liquid) {
        val liveGens = (prevGens.filter(g => carried.exists(_.path.contains(g)))
          .toSeq.sorted :+ txn)
        val colsJson = clusterPhys.map(esc).mkString("[", ",", "]")
        val gensJson = liveGens.map(esc).mkString("[", ",", "]")
        Seq(domainJson(LiquidDomain,
          s"""{"columns":$colsJson,"generations":$gensJson}"""))
      } else if (zorderBy.nonEmpty && state.domains.contains(LiquidDomain))
        Seq(domainJson(LiquidDomain,
          s"""{"columns":[],"generations":[]}"""))
      else Nil
    val lines = removes ++ adds.map(a => addJson(a, dataChange = false)) ++
      domainLines
    val inputPaths = tail.map(_.path).toSet
    var attempt = 0
    var validatedThrough = state.version
    while (true) {
      // The rewrite stays valid only while every file it read is STILL
      // live — a concurrent append only adds files (compatible; ours
      // remove nothing of theirs), but a concurrent compaction already
      // removed our inputs, and committing on top of it would leave BOTH
      // rewrites live and duplicate every row. That competing compaction
      // may have committed at an intermediate version while our Spark
      // rewrite was staging, i.e. WITHOUT ever colliding with our claim —
      // so the liveness check must run before EVERY commit attempt, not
      // only in the collision catch. A successful CREATE_NEW at `next`
      // then guarantees all versions < next were visible at validation
      // time (writers only claim latestVersion+1), closing the window.
      val latest = latestVersion(table)
      if (latest > validatedThrough) {
        val liveNow = replay(spark, table, None).live.map(_.path).toSet
        validatedThrough = latest
        if (!inputPaths.subsetOf(liveNow)) {
          adds.foreach(a => deleteData(store, dir, a.path))
          throw new IllegalStateException(
            s"concurrent compaction of $table; compaction aborted")
        }
      }
      val next = latest + 1
      try {
        commitAtomic(store, versionFile(table, next), lines)
        return (tail.size, adds.size)
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          if (attempt >= 3) {
            adds.foreach(a => deleteData(store, dir, a.path))
            throw new IllegalStateException(
              s"concurrent writers on $table; compaction aborted", e)
          }
          attempt += 1 // re-validate against the new version and retry
      }
    }
    (tail.size, adds.size) // unreachable
  }

  /** REORG … APPLY (PURGE) — materialize deletion vectors: rewrites ONLY
    * the DV-carrying live files as their survivor rows and drops the DVs,
    * leaving every clean file untouched (the scale contract vs [[compact]],
    * which rewrites the whole table: after a 0.1% DV delete on a 100 TB
    * table, purge cost ∝ the touched files, not the table). The commit is
    * layout-only (`dataChange:false` on both sides — a CDF reader sees no
    * row change, exactly the spec's semantics for OPTIMIZE/REORG), and the
    * orphaned DV sidecars age out through [[vacuum]]'s existing
    * superseded-descriptor sweep. Same concurrency discipline as compact:
    * a commit may land between snapshot and claim only if every input
    * file is still live (concurrent appends wave through; a competing
    * rewrite aborts this one). Returns (dvFilesRewritten, rowsPurged).
    */
  def reorgPurge(spark: SparkSession, table: String,
      maxRecordsPerFile: Long = MaxRecordsPerFile,
      store: CommitStore = CommitStore.Local): (Int, Long) = {
    val dir = new File(table)
    val state = replay(spark, table, None)
    requireWritable(state.minWriter, table)
    val dvAdds = state.live.filter(_.dv.isDefined)
    if (dvAdds.isEmpty) return (0, 0L)
    // a row-tracked table's DV debt retires through COMPACT, whose
    // rewrite materializes `_row_id` — this per-file purge would reassign
    // survivor positions and silently break every row's id
    require(!state.configuration.get(RowTrackingConf).contains("true"),
      s"$table has row tracking enabled — retire DV debt with compact " +
        "(id-materializing) instead of reorgPurge")
    val purgedRows = dvAdds.map(_.dv.get.cardinality).sum
    // survivors of the touched files only — the clean files never enter
    // the job; bin sizing from log stats (numRecords − DV cardinality),
    // no data scan to plan
    val survivorRows = dvAdds.map { a =>
      Option(a.stats).map(s => mapper.readTree(s).path("numRecords").asLong(0L))
        .getOrElse(0L) - a.dv.map(_.cardinality).getOrElse(0L)
    }.sum
    val nFiles = math.max(1,
      ((survivorRows + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt)
    val survivors = readState(spark, table, state.copy(live = dvAdds), store)
    val staging = Files.createTempDirectory("graft-delta-reorg").toFile
    val txn = java.util.UUID.randomUUID().toString
    val conf = spark.sessionState.newHadoopConf()
    val adds = try {
      // DV-masked survivors are arbitrarily skewed across the touched
      // files — round-robin repartition keeps every bin under the cap
      // (the same reasoning as compact's DV branch)
      val writer = toPhysical(survivors.repartition(nFiles), state.schema).write
        .mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", maxRecordsPerFile)
      (if (state.partitionColumns.nonEmpty)
         writer.partitionBy(state.partitionColumns: _*)
       else writer).parquet(staging.getPath)
      publishAll(store, dir, staging, conf, (rel, i) =>
        Option(rel.getParent).map(_.toString + "/").getOrElse("") +
          f"part-$i%05d-$txn.c000.snappy.parquet")
    } finally deleteRecursively(staging)
    val now = System.currentTimeMillis()
    val removes = dvAdds.map(a =>
      s"""{"remove":{"path":${esc(a.path)},"deletionTimestamp":$now,"dataChange":false}}""")
    val lines = removes ++ adds.map(a => addJson(a, dataChange = false))
    val inputPaths = dvAdds.map(_.path).toSet
    var attempt = 0
    var validatedThrough = state.version
    while (true) {
      // identical liveness window to compact(): every input must still be
      // live at each commit attempt, or a competing rewrite already
      // superseded our inputs and committing would double their rows
      val latest = latestVersion(table)
      if (latest > validatedThrough) {
        val liveNow = replay(spark, table, None).live.map(_.path).toSet
        validatedThrough = latest
        if (!inputPaths.subsetOf(liveNow)) {
          adds.foreach(a => deleteData(store, dir, a.path))
          throw new IllegalStateException(
            s"concurrent rewrite of $table; reorg aborted")
        }
      }
      val next = latest + 1
      try {
        commitAtomic(store, versionFile(table, next), lines)
        return (dvAdds.size, purgedRows)
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          if (attempt >= 3) {
            adds.foreach(a => deleteData(store, dir, a.path))
            throw new IllegalStateException(
              s"concurrent writers on $table; reorg aborted", e)
          }
          attempt += 1
      }
    }
    (dvAdds.size, purgedRows) // unreachable
  }

  /** MERGE INTO: keyed upsert / delete against the current snapshot —
    * a read-modify-write of ONLY the files that can contain a source key.
    *
    *  - A matched table row is replaced by its source row; a source row
    *    with no match is inserted; a source row whose `deleteCol` is true
    *    deletes its match (and inserts nothing).
    *  - File selection is two-stage: the per-file [min,max] stats every
    *    add records prune by the source's key range (metadata only, no
    *    data read), then ONE semi-join scan of the surviving candidates
    *    finds the files that truly contain a source key. Every other file
    *    is carried over verbatim — at 100 TB a merge touching one key
    *    rewrites one file, not the table.
    *  - Source keys must be unique on `keys` (validated INSIDE the rewrite
    *    job — a window count + raise_error — so the check costs no extra
    *    pass over the source; duplicate source rows would make the rewrite
    *    nondeterministic and fail the job before the commit). NULL keys
    *    never match, mirroring SQL MERGE equality.
    *  - Concurrency: strict OCC. ANY commit landing between this merge's
    *    snapshot and its version claim aborts it — unlike [[compact]], a
    *    concurrent append cannot be waved through, because it may add rows
    *    for a merged key that this rewrite never saw (the re-run sees
    *    them). The conflict surfaces as IllegalStateException; the caller
    *    re-runs the merge.
    *
    * The reference's loader writes whole tables (overwrite/append,
    * delta_destination.rs:414-470); MERGE is the keyed refinement of that
    * contract.
    *
    * @return (filesRewritten, filesSkipped, filesAdded)
    */
  /** Observability/test seam: how many live files survived the last
    * merge's stage-1 stats pruning (before the semi-join refinement) —
    * the number SinkSpec pins to prove composite-key bounds actually
    * narrow the candidate set.
    */
  @volatile private[graft] var lastMergeCandidates: Int = -1

  def merge(spark: SparkSession, table: String, source: DataFrame,
      keys: Seq[String], deleteCol: Option[String] = None,
      store: CommitStore = CommitStore.Local,
      changeDataFeed: Boolean = true): (Int, Int, Int) = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "merge requires at least one key column")
    val dir = new File(table)
    val (meta, live0) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    val liveAdds = collectAdds(live0)
    val state = State(meta.version, meta.id, meta.createdTime, meta.schema, meta.partitionColumns,
      liveAdds, meta.txns, meta.minWriter, meta.configuration)
    val tableCols = state.schema.fieldNames.toSeq
    // Delete-marked source rows remove their match and insert nothing.
    // The key-uniqueness guard rides the rewrite itself (a window count +
    // raise_error inside the plan that writes the new files) instead of a
    // separate eager groupBy job — at scale that was a full extra pass
    // over the source before any work (VERDICT r4 "what's wrong" #3).
    // Guarding `writes` (the inserted side) is what matters: duplicate
    // INSERTED rows are the nondeterministic outcome; a delete-marked row
    // sharing its key with one update resolves deterministically (the
    // match is dropped via srcKeys, the update row is inserted = replace).
    val u = java.util.UUID.randomUUID().toString.take(8)
    val dupN = s"__graft_dup_$u"
    val wDup = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val writes = deleteCol
      .map(c => source.filter(!coalesce(col(c), lit(false))).drop(c))
      .getOrElse(source)
      .select(tableCols.map(col): _*)
      .withColumn(dupN, count(lit(1)).over(wDup))
      .filter(when(col(dupN) > 1, raise_error(
        lit(s"merge source must be unique on (${keys.mkString(", ")})")))
        .otherwise(lit(true)))
      .drop(dupN)
    val srcKeys = source.select(keys.map(col): _*)
    // one aggregate computes [min, max] for EVERY key column; a composite
    // key then prunes on the intersection of all ranges (r9)
    val boundAggs = keys.flatMap(k => Seq(
      min(col(k)).cast("string").as(s"lo_$k"),
      max(col(k)).cast("string").as(s"hi_$k")))
    val bounds = source.agg(boundAggs.head, boundAggs.tail: _*).collect()(0)
    if (bounds.isNullAt(0)) return (0, state.live.size, 0) // empty source
    // stage 1: stats range pruning on all key columns (no data read)
    val keyBounds = keys.zipWithIndex.map { case (k, i) =>
      (k, bounds.getString(2 * i), bounds.getString(2 * i + 1))
    }
    val candAdds = collectAdds(statsPruned(meta, live0, keyBounds))
    lastMergeCandidates = candAdds.size
    // stage 2: semi-join the candidates' rows against the source keys —
    // only files with a TRUE match are rewritten
    val touched: Seq[AddEntry] =
      if (candAdds.isEmpty) Nil
      else {
        val fileCol = s"__graft_mf_${java.util.UUID.randomUUID().toString.take(8)}"
        // Match scanned-file URIs back to AddEntry paths by SUFFIX, not by
        // java.io.File relativization: input_file_name() yields a scheme'd
        // URI (file://…, s3a://bucket/…) that File/Path relativization
        // only handles on a local FS (ADVICE r4). AddEntry paths are
        // table-relative and txn-unique, so a suffix hit is unambiguous.
        val hitPaths = readState(spark, table, state.copy(live = candAdds), store)
          .withColumn(fileCol, input_file_name())
          .join(srcKeys, keys, "left_semi")
          .select(fileCol).distinct().collect()
          .map(_.getString(0))
          .map(u => try new java.net.URI(u).getPath catch { case _: Exception => u })
          .toSet
        candAdds.filter(a =>
          hitPaths.exists(p => p == a.path || p.endsWith("/" + a.path)))
      }
    // stage 3: rewrite touched files (matched rows swapped out) + inserts
    val kept = readState(spark, table, state.copy(live = touched), store)
      .join(srcKeys, keys, "left_anti")
    val newData = kept.unionByName(writes)
    val staging = Files.createTempDirectory("graft-delta-merge").toFile
    val txn = java.util.UUID.randomUUID().toString
    val conf = spark.sessionState.newHadoopConf()
    val adds = try {
      // CHECK constraints gate the merge's inserted/updated rows inside
      // the same write job (kept rows re-pass trivially)
      val writer = toPhysical(withConstraintCheck(newData, state.configuration),
        state.schema).write.mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", MaxRecordsPerFile)
      (if (state.partitionColumns.nonEmpty)
         writer.partitionBy(state.partitionColumns: _*)
       else writer).parquet(staging.getPath)
      publishAll(store, dir, staging, conf, (rel, i) =>
        Option(rel.getParent).map(_.toString + "/").getOrElse("") +
          f"part-$i%05d-$txn.c000.snappy.parquet")
    } finally deleteRecursively(staging)
    val now = System.currentTimeMillis()
    val removes = touched.map(a =>
      s"""{"remove":{"path":${esc(a.path)},"deletionTimestamp":$now,"dataChange":true}}""")
    if ((removes ++ adds).isEmpty) return (0, state.live.size, 0) // nothing to change
    // CHANGE DATA FEED: the merge's row-level change images, written as
    // CDC files in the SAME commit (Delta CDF's design — computing the
    // images at merge time costs two delta-sized joins over the touched
    // files the rewrite already planned; reconstructing them later would
    // cost a full diff of the rewritten files). Classification: a source
    // row whose key matched a touched row is an update (pre image = the
    // old row, post image = the new), a delete-marked match is a delete,
    // an unmatched non-delete source row is an insert. Readers take a
    // commit's change rows from its cdc actions ([[readCdf]]); the main
    // table replay ignores them (dataChange=false, unknown action field).
    val cdcAdds: Seq[AddEntry] = if (!changeDataFeed) Nil else {
      val ct = "_change_type"
      val touchedRows = readState(spark, table, state.copy(live = touched), store)
      val touchedKeys = touchedRows.select(keys.map(col): _*)
      val updPre = touchedRows
        .join(writes.select(keys.map(col): _*), keys, "left_semi")
        .withColumn(ct, lit("update_preimage"))
      // a key that is BOTH delete-marked and updated in one source resolves
      // as a replace (merge contract) — its images are update_pre/postimage,
      // so the delete class must exclude keys the writes side carries, or
      // the old row would be double-classified (delete + update_preimage)
      val delPre = deleteCol.map { c =>
        val delOnlyKeys = source.filter(coalesce(col(c), lit(false)))
          .select(keys.map(col): _*)
          .join(writes.select(keys.map(col): _*), keys, "left_anti")
        touchedRows.join(delOnlyKeys, keys, "left_semi")
          .withColumn(ct, lit("delete"))
      }
      val updPost = writes.join(touchedKeys, keys, "left_semi")
        .withColumn(ct, lit("update_postimage"))
      val ins = writes.join(touchedKeys, keys, "left_anti")
        .withColumn(ct, lit("insert"))
      val cdcDf = (Seq(updPre) ++ delPre.toSeq ++ Seq(updPost, ins))
        .reduce(_.unionByName(_))
      val cdcStaging = Files.createTempDirectory("graft-delta-cdc").toFile
      try {
        toPhysical(cdcDf, state.schema).write.mode("overwrite")
          .option("compression", "snappy")
          .option("maxRecordsPerFile", MaxRecordsPerFile)
          .parquet(cdcStaging.getPath)
        publishAll(store, dir, cdcStaging, conf,
          (_, i) => f"_change_data/cdc-$i%05d-$txn.snappy.parquet")
      } finally deleteRecursively(cdcStaging)
    }
    val cdcLines = cdcAdds.map(a =>
      s"""{"cdc":{"path":${esc(a.path)},"partitionValues":{},""" +
        s""""size":${a.size},"dataChange":false}}""")
    val lines = removes ++ adds.map(a => addJson(a)) ++ cdcLines
    try commitAtomic(store, versionFile(table, state.version + 1), lines)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        (adds ++ cdcAdds).foreach(a => deleteData(store, dir, a.path))
        throw new IllegalStateException(
          s"concurrent commit on $table during merge; re-run the merge", e)
    }
    (touched.size, state.live.size - touched.size, adds.size)
  }

  /** DELETE WHERE — row-level delete (Delta DELETE semantics,
    * copy-on-write): ONE commit rewrites ONLY the files that contain a
    * matching row, with the matches dropped; every other file is carried
    * untouched, so cost scales with the files the predicate TOUCHES, never
    * the table. The touched set comes from a predicate scan that shuffles
    * nothing but matched file paths (map-side distinct). With the feed on,
    * the deleted rows are written as cdc delete images in the same commit
    * — [[readCdf]] then serves the DELETE without re-diffing the rewrite.
    * Returns the number of rows deleted; no commit when nothing matches.
    */
  def deleteWhere(spark: SparkSession, table: String, predicate: String,
      store: CommitStore = CommitStore.Local,
      changeDataFeed: Boolean = true): Long = {
    import org.apache.spark.sql.functions.lit
    rewriteTouched(spark, table, predicate, "delete",
      replacementOf = (_, _) => None,
      imagesOf = (matched, _) => matched.withColumn("_change_type", lit("delete")),
      imageRowsPerMatch = 1, store, changeDataFeed)
  }

  /** Shared copy-on-write machinery behind [[deleteWhere]]/[[updateWhere]]:
    * finds the files holding a TRUE match of `predicate` (a scan that
    * shuffles nothing but matched file paths), rewrites exactly those
    * files as kept-rows ∪ `replacementOf(matched)` — rows where the
    * predicate is NULL are carried UNCHANGED (SQL semantics; a bare !pred
    * filter would silently erase them) — stages `imagesOf` as cdc files
    * when the feed is on, and commits removes + adds + cdc atomically.
    * Returns the matched-row count (free from the cdc footers when the
    * feed is on — `imageRowsPerMatch` divides pre+post pairs back to
    * rows — else one count job).
    */
  private def rewriteTouched(spark: SparkSession, table: String,
      predicate: String, opName: String,
      replacementOf: (DataFrame, StructType) => Option[DataFrame],
      imagesOf: (DataFrame, Option[DataFrame]) => DataFrame,
      imageRowsPerMatch: Int,
      store: CommitStore, changeDataFeed: Boolean): Long = {
    import org.apache.spark.sql.functions.{coalesce, expr, input_file_name, lit}
    val dir = new File(table)
    val state = replay(spark, table, None)
    requireWritable(state.minWriter, table)
    val fileCol = s"__graft_rf_${java.util.UUID.randomUUID().toString.take(8)}"
    // which files hold a match: URI→path suffix match, same contract as merge
    val hitPaths = readState(spark, table, state, store)
      .withColumn(fileCol, input_file_name())
      .filter(expr(predicate))
      .select(fileCol).distinct().collect()
      .map(_.getString(0))
      .map(u => try new java.net.URI(u).getPath catch { case _: Exception => u })
      .toSet
    val touched = state.live.filter(a =>
      hitPaths.exists(p => p == a.path || p.endsWith("/" + a.path)))
    if (touched.isEmpty) return 0L
    val touchedRows = readState(spark, table, state.copy(live = touched), store)
    val matched = touchedRows.filter(expr(predicate))
    val replacement = replacementOf(matched, state.schema)
    val keptRows = touchedRows.filter(!coalesce(expr(predicate), lit(false)))
    val rewrite = replacement.map(keptRows.unionByName(_)).getOrElse(keptRows)
    val staging = Files.createTempDirectory(s"graft-delta-$opName").toFile
    val txn = java.util.UUID.randomUUID().toString
    val conf = spark.sessionState.newHadoopConf()
    val adds = try {
      val writer = toPhysical(withConstraintCheck(rewrite, state.configuration),
        state.schema).write.mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", MaxRecordsPerFile)
      (if (state.partitionColumns.nonEmpty)
         writer.partitionBy(state.partitionColumns: _*)
       else writer).parquet(staging.getPath)
      publishAll(store, dir, staging, conf, (rel, i) =>
        Option(rel.getParent).map(_.toString + "/").getOrElse("") +
          f"part-$i%05d-$txn.c000.snappy.parquet")
    } finally deleteRecursively(staging)
    val cdcAdds: Seq[AddEntry] = if (!changeDataFeed) Nil else {
      val cdcStaging = Files.createTempDirectory("graft-delta-cdc").toFile
      try {
        toPhysical(imagesOf(matched, replacement), state.schema)
          .write.mode("overwrite")
          .option("compression", "snappy")
          .option("maxRecordsPerFile", MaxRecordsPerFile)
          .parquet(cdcStaging.getPath)
        publishAll(store, dir, cdcStaging, conf,
          (_, i) => f"_change_data/cdc-$i%05d-$txn.snappy.parquet")
      } finally deleteRecursively(cdcStaging)
    }
    val matchedRows =
      if (changeDataFeed)
        cdcAdds.map(a =>
          Option(a.stats).map(s => mapper.readTree(s).path("numRecords").asLong(0L))
            .getOrElse(0L)).sum / imageRowsPerMatch
      else matched.count()
    val now = System.currentTimeMillis()
    val removes = touched.map(a =>
      s"""{"remove":{"path":${esc(a.path)},"deletionTimestamp":$now,"dataChange":true}}""")
    val cdcLines = cdcAdds.map(a =>
      s"""{"cdc":{"path":${esc(a.path)},"partitionValues":{},""" +
        s""""size":${a.size},"dataChange":false}}""")
    val lines = removes ++ adds.map(a => addJson(a)) ++ cdcLines
    try commitAtomic(store, versionFile(table, state.version + 1), lines)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        (adds ++ cdcAdds).foreach(a => deleteData(store, dir, a.path))
        throw new IllegalStateException(
          s"concurrent commit on $table during $opName; re-run the $opName", e)
    }
    matchedRows
  }

  /** UPDATE WHERE — row-level update (Delta UPDATE semantics,
    * copy-on-write): ONE commit rewrites only the files containing a
    * matching row, with the matches transformed by the `set` expressions
    * (column → SQL expression over the pre-update row); every other file
    * is carried untouched, so cost scales with the touched files, never
    * the table. With the feed on, the pre/post images ride the same
    * commit as cdc files — [[readCdf]] classifies the UPDATE without
    * re-diffing. Returns the number of rows updated.
    */
  def updateWhere(spark: SparkSession, table: String, predicate: String,
      set: Map[String, String],
      store: CommitStore = CommitStore.Local,
      changeDataFeed: Boolean = true): Long = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    require(set.nonEmpty, "update requires at least one SET column")
    rewriteTouched(spark, table, predicate, "update",
      replacementOf = (matched, schema) => {
        set.keys.foreach(c => require(schema.fieldNames.contains(c),
          s"no such column: $c"))
        // all SET expressions evaluate against the PRE-update row (SQL
        // UPDATE semantics): one select, not sequential withColumns
        Some(matched.select(schema.fieldNames.map(c =>
          set.get(c).map(e => expr(e).cast(schema(c).dataType).as(c))
            .getOrElse(col(c))).toIndexedSeq: _*))
      },
      imagesOf = (matched, replacement) =>
        matched.withColumn("_change_type", lit("update_preimage"))
          .unionByName(replacement.get
            .withColumn("_change_type", lit("update_postimage"))),
      imageRowsPerMatch = 2, store, changeDataFeed)
  }

  /** DELETE WHERE via DELETION VECTORS — merge-on-read, the opt-in
    * protocol extension (reader v3 / writer v7; the reference pins v1,
    * delta_destination.rs:446-458, so like `evolve` this is an explicit
    * verb, never a default). Where [[deleteWhere]] rewrites every touched
    * file, this commits each touched file's add action again carrying a
    * deletion-vector sidecar — a roaring bitmap of the matched row
    * indexes — so NO data file is read back or rewritten: a 1-row delete
    * in a 2-GB file costs KBs at any table size. The first DV use bumps
    * the table protocol in the SAME commit; re-deletes OR-merge into one
    * descriptor per file; CDC images ride the commit as cdc files when
    * the feed is on (default — readCdf then classifies without
    * reconstruction). Matches evaluate against the MERGED view, so
    * already-deleted rows can never re-match (re-delete is a no-op).
    * Returns the number of rows deleted.
    */
  def deleteWhereDV(spark: SparkSession, table: String, predicate: String,
      store: CommitStore = CommitStore.Local,
      changeDataFeed: Boolean = true): Long = {
    import org.apache.spark.sql.functions.lit
    dvRewrite(spark, table, predicate, "deleteWhereDV",
      replacementOf = (_, _) => None,
      imagesOf = (matched, _) => matched.withColumn("_change_type", lit("delete")),
      store, changeDataFeed)
  }

  /** UPDATE WHERE via DELETION VECTORS — the merge-on-read twin of
    * [[updateWhere]], completing the MoR DML plane: ONE commit masks the
    * matched rows out of their files with deletion-vector sidecars (no
    * touched file read back or rewritten) and appends the transformed
    * replacements as NEW files — cost ∝ matched rows at any file size,
    * where the copy-on-write path pays a full rewrite of every touched
    * file. Every SET expression evaluates against the PRE-update row (SQL
    * UPDATE semantics); pre/post images ride the commit as cdc files;
    * first DV use bumps the protocol like [[deleteWhereDV]]. Returns the
    * number of rows updated.
    */
  def updateWhereDV(spark: SparkSession, table: String, predicate: String,
      set: Map[String, String],
      store: CommitStore = CommitStore.Local,
      changeDataFeed: Boolean = true): Long = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    require(set.nonEmpty, "update requires at least one SET column")
    dvRewrite(spark, table, predicate, "updateWhereDV",
      replacementOf = (matched, schema) => {
        set.keys.foreach(c => require(schema.fieldNames.contains(c),
          s"no such column: $c"))
        Some(matched.select(schema.fieldNames.map(c =>
          set.get(c).map(e => expr(e).cast(schema(c).dataType).as(c))
            .getOrElse(col(c))).toIndexedSeq: _*))
      },
      imagesOf = (matched, replacement) =>
        matched.withColumn("_change_type", lit("update_preimage"))
          .unionByName(replacement.get
            .withColumn("_change_type", lit("update_postimage"))),
      store, changeDataFeed)
  }

  /** Shared merge-on-read machinery behind [[deleteWhereDV]] /
    * [[updateWhereDV]] — the DV twin of [[rewriteTouched]].
    */
  private def dvRewrite(spark: SparkSession, table: String, predicate: String,
      opName: String,
      replacementOf: (DataFrame, StructType) => Option[DataFrame],
      imagesOf: (DataFrame, Option[DataFrame]) => DataFrame,
      store: CommitStore,
      changeDataFeed: Boolean): Long = {
    import org.apache.spark.sql.functions.{broadcast, col, expr, lit,
      regexp_replace}
    import spark.implicits._
    val dir = new File(table)
    val (meta, liveDf) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    val state = State(meta.version, meta.id, meta.createdTime, meta.schema,
      meta.partitionColumns, collectAdds(liveDf), meta.txns)
    // (file → new deleted positions) against the MERGED view; the rel
    // path arrives via a broadcast dual-key lookup (raw + URI-encoded),
    // never by parsing the reader's URI
    val lookup = state.live.flatMap { a =>
      val abs = dataAbs(table, a.path)
      val enc = new File(abs).toURI.toString
        .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
      Seq(abs, enc).distinct.map(k => (k, a.path))
    }.toDF("_gf_key", "_gf_rel")
    // LEFT join + plan-riding raise_error (the same discipline as the
    // Iceberg merge-on-read lookup): a normalization mismatch must fail
    // loudly — an inner join would silently leave matched rows ALIVE
    import org.apache.spark.sql.functions.{coalesce => cl, concat, raise_error}
    val matched = readStateMerged(spark, table, state, keepLineage = true, store)
      .filter(expr(predicate))
      .withColumn("_gf_key",
        regexp_replace(col("_gf_uri"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"))
      .join(broadcast(lookup), Seq("_gf_key"), "left")
      .withColumn("_gf_rel", cl(col("_gf_rel"),
        raise_error(concat(lit(s"$opName: matched row from unmapped file "),
          col("_gf_uri")))))
      // the matched scan feeds BOTH the bitmap build and the CDC images —
      // persist so the table is scanned once, not twice
      .persist()
    try {
    // distributed bitmap build, KEPT DISTRIBUTED: one tight group per
    // touched file, sharded by path hash; each shard of ≤FilesPerDvShard
    // files OR-merges with any existing vector and packs + PUBLISHES its
    // own spec multi-DV sidecar file (version byte, then each file's
    // size-framed + CRC'd portable RoaringBitmapArray back to back; each
    // descriptor = storageType "u" with its shard's base85 uuid + its own
    // offset). Only KB-scale descriptors ever reach the driver — a wide
    // predicate across 10^6 files costs the driver 10^6 descriptors (the
    // same metadata class as the log replay itself), never GBs of bitmap
    // bytes (VERDICT r15). A point delete (≤ one shard) still lands a
    // single sidecar object.
    // r18 (guide §2.3 "aggregate before you shuffle" — found by the
    // SkewAudit max-share flag on q_delta_clone): the old shape shuffled
    // every RAW (file, position) row into one reducer per touched file —
    // at 8 bytes/row that is the full matched set over the wire, and a
    // delete touching few files funnels through few tasks. Positions now
    // combine into per-(partition, file) PARTIAL bitmaps map-side, so the
    // shuffle carries KB-scale bitmap blobs and the per-file reducer
    // merges ≤ #partitions partials. Bitmap OR is order-independent and
    // packDvShard re-canonicalizes from content, so the committed sidecar
    // bytes are unchanged.
    val fresh = matched
      .select(col("_gf_rel"), col("_gf_pos"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val D = graft.functions.DeletionVector
        val m = scala.collection.mutable.HashMap
          .empty[String, org.roaringbitmap.longlong.Roaring64Bitmap]
        it.foreach { case (rel, pos) =>
          m.getOrElseUpdate(rel,
            new org.roaringbitmap.longlong.Roaring64Bitmap).addLong(pos)
        }
        m.iterator.map { case (rel, bm) => (rel, D.serialize(bm)) }
      }
      .groupByKey(_._1)
      .mapGroups { (rel, it) =>
        (rel, it.map(_._2).reduce(graft.functions.DeletionVector.merge))
      }.persist()
    val descs: Seq[DvShardDesc] = try {
      val touched = fresh.count()
      if (touched == 0L) return 0L
      val oldByRel: Map[String, DvInfo] =
        state.live.flatMap(a => a.dv.map(a.path -> _)).toMap
      val txnUuid = java.util.UUID.randomUUID()
      val (tMsb, tLsb) =
        (txnUuid.getMostSignificantBits, txnUuid.getLeastSignificantBits)
      val shards = math.max(1,
        ((touched + FilesPerDvShard - 1) / FilesPerDvShard).toInt)
      val tableAbs = dir.getAbsolutePath
      store.taskIO match {
        case Some(io) =>
          // the scale path: pack + publish FROM TASKS
          val bOld = spark.sparkContext.broadcast(oldByRel)
          try {
            fresh.rdd
              .partitionBy(new org.apache.spark.HashPartitioner(shards))
              .mapPartitionsWithIndex { (pid, it) =>
                val entries = it.toVector
                if (entries.isEmpty) Iterator.empty
                else {
                  val (dvRel, fileBytes, _, ds) = packDvShard(tableAbs,
                    tMsb, tLsb, pid, entries, bOld.value, io.read)
                  io.write(new File(tableAbs, dvRel).getAbsolutePath, fileBytes)
                  ds.iterator
                }
              }.collect().toSeq
          } catch { case e: Throwable =>
            // tasks publish before the job completes, so a mid-job failure
            // sweeps every DETERMINISTIC candidate shard name (absent
            // keys are a no-op) — zero bytes behind an aborted write
            (0 until shards).foreach { pid =>
              val uuid = new java.util.UUID(tMsb, tLsb ^ pid.toLong)
              scala.util.Try(
                deleteData(store, dir, s"$DvPrefix/deletion_vector_$uuid.bin"))
            }
            throw e
          } finally bOld.destroy()
        case None =>
          // driver-only store (in-memory/hooked test doubles have no
          // task-side I/O): stream shard-sized chunks through the driver —
          // at most FilesPerDvShard bitmaps in the pack buffer at once,
          // never the full touched set
          import scala.jdk.CollectionConverters._
          val publishedRels = scala.collection.mutable.ArrayBuffer[String]()
          try {
            fresh.toLocalIterator().asScala.grouped(FilesPerDvShard)
              .zipWithIndex.flatMap { case (chunk, i) =>
                val (dvRel, fileBytes, _, ds) = packDvShard(tableAbs, tMsb,
                  tLsb, i, chunk, oldByRel, p => readBytes(store, new File(p)))
                val target = new File(dir, dvRel)
                store match {
                  case os: ObjectStore => os.putObject(target.toPath, fileBytes)
                  case _ =>
                    target.getParentFile.mkdirs()
                    Files.write(target.toPath, fileBytes): Unit
                }
                publishedRels += dvRel
                ds
              }.toVector
          } catch { case e: Throwable =>
            publishedRels.foreach(p =>
              scala.util.Try(deleteData(store, dir, p)))
            throw e
          }
      }
    } finally fresh.unpersist(): Unit
    val deletedNow = descs.map(_.freshCardinality).sum
    val publishedDv: Seq[String] = descs
      .map(d => s"$DvPrefix/deletion_vector_" +
        s"${new java.util.UUID(d.uuidMsb, d.uuidLsb)}.bin").distinct
    val conf = spark.sessionState.newHadoopConf()
    val txn = java.util.UUID.randomUUID().toString.take(8)
    val matchedRows = matched.select(state.schema.fieldNames.map(col).toIndexedSeq: _*)
    val replacement = replacementOf(matchedRows, state.schema)
    // replacement rows (an update's post-images) land as NEW files in the
    // table's layout — cost ∝ matched rows, never the touched files. Any
    // failure from here to the commit reclaims everything published so
    // far: an uncommitted transaction leaves zero bytes behind.
    val dataAdds: Seq[AddEntry] = try {
      replacement match {
        case None => Nil
        case Some(rep) =>
          val staging = Files.createTempDirectory("graft-delta-dv-rep").toFile
          try {
            // CHECK constraints gate an update's post-images too
            val w = toPhysical(withConstraintCheck(rep, meta.configuration),
              state.schema).write.mode("overwrite")
              .option("compression", "snappy")
              .option("maxRecordsPerFile", MaxRecordsPerFile)
            (if (state.partitionColumns.nonEmpty)
               w.partitionBy(state.partitionColumns: _*)
             else w).parquet(staging.getPath)
            publishAll(store, dir, staging, conf, (rel, i) =>
              Option(rel.getParent).map(_.toString + "/").getOrElse("") +
                f"part-$i%05d-$txn.c000.snappy.parquet")
          } finally deleteRecursively(staging)
      }
    } catch { case e: Throwable =>
      publishedDv.foreach(p => scala.util.Try(deleteData(store, dir, p)))
      throw e
    }
    // CDC images (cost ∝ matched rows, same as the CoW path)
    val cdcAdds: Seq[AddEntry] = if (!changeDataFeed) Nil else try {
      val cdcStaging = Files.createTempDirectory("graft-delta-dv-cdc").toFile
      try {
        toPhysical(imagesOf(matchedRows, replacement), state.schema)
          .write.mode("overwrite")
          .option("compression", "snappy")
          .option("maxRecordsPerFile", MaxRecordsPerFile)
          .parquet(cdcStaging.getPath)
        publishAll(store, dir, cdcStaging,
          conf, (_, i) => f"_change_data/cdc-$i%05d-$txn.snappy.parquet")
      } finally deleteRecursively(cdcStaging)
    } catch { case e: Throwable =>
      (publishedDv ++ dataAdds.map(_.path)).foreach(p =>
        scala.util.Try(deleteData(store, dir, p)))
      throw e
    }
    // re-add each touched file (same path, new descriptor — last add per
    // path wins in replay; the data file is untouched). Metadata-only: the
    // descriptors came back from the shards, no bitmap is reopened.
    val now = System.currentTimeMillis()
    val byRel: Map[String, AddEntry] = state.live.map(a => a.path -> a).toMap
    val newAdds = descs.sortBy(_.rel).map { d =>
      val add = byRel.getOrElse(d.rel,
        throw new IllegalStateException(s"matched file not live: ${d.rel}"))
      val encoded = DvPrefix + graft.functions.DeletionVector.encodeUuid(
        new java.util.UUID(d.uuidMsb, d.uuidLsb))
      add.copy(modificationTime = now,
        dv = Some(DvInfo("u", encoded, Some(d.offset), d.dataSize.toLong,
          d.cardinality)))
    }
    // v3/v7 protocols must LIST every active table feature (spec rule):
    // a DV bump on a column-mapped table carries columnMapping too (and
    // any features an earlier protocol action already tracked), or a
    // spec-compliant external reader would stop applying the mapping
    def features(tracked: Seq[String]) =
      (tracked ++ Seq("deletionVectors") ++
        (if (mappingEnabled(state.schema)) Seq("columnMapping") else Nil))
        .distinct.sorted.map(esc).mkString("[", ",", "]")
    val bump =
      if (meta.minReader >= 3 && meta.minWriter >= 7) Nil
      else Seq(s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":${features(meta.readerFeatures)},""" +
        s""""writerFeatures":${features(meta.writerFeatures)}}}""")
    val cdcLines = cdcAdds.map(a =>
      s"""{"cdc":{"path":${esc(a.path)},"partitionValues":{},""" +
        s""""size":${a.size},"dataChange":false}}""")
    // ROW TRACKING: an update's replacement rows are NEW rows — they take
    // fresh ids above the high-water mark (the Iceberg twin's contract);
    // the touched files' re-adds keep their baseRowId via add.copy above
    val (dataAddsFinal, domainLine) =
      if (!meta.configuration.get(RowTrackingConf).contains("true") ||
          dataAdds.isEmpty)
        (dataAdds, Nil)
      else {
        val hwm = rowIdHighWaterMark(meta.domains).getOrElse(-1L)
        val (w, newHwm) = assignRowIds(dataAdds, hwm, state.version + 1)
        (w, Seq(domainJson(RowTrackingDomain,
          s"""{"rowIdHighWaterMark":$newHwm}""")))
      }
    val lines = bump ++ (newAdds ++ dataAddsFinal).map(a => addJson(a)) ++
      cdcLines ++ domainLine
    try commitAtomic(store, versionFile(table, state.version + 1), lines)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        (publishedDv ++ cdcAdds.map(_.path) ++ dataAdds.map(_.path)).foreach(p =>
          scala.util.Try(deleteData(store, dir, p)))
        throw new IllegalStateException(
          s"concurrent commit on $table during $opName; re-run", e)
    }
    deletedNow
    } finally matched.unpersist(): Unit
  }

  /** RENAME a column — METADATA-ONLY (Delta column mapping, mode "name",
    * the Delta twin of IcebergSink.evolveRename): the first rename/drop
    * enables mapping by stamping every existing field with physicalName =
    * its then-current name (every file ever written is therefore already
    * physical) and bumps the protocol to reader 2 / writer 5 in the SAME
    * commit; the rename itself changes ONLY the logical name — no data
    * file is read or touched at any table size. Partition columns refuse
    * (their names key the Hive layout and the log's partitionValues).
    */
  def renameColumn(spark: SparkSession, table: String, from: String,
      to: String, store: CommitStore = CommitStore.Local): Unit =
    columnMappingOp(spark, table, store, from) { (schema, idx) =>
      require(!schema.fieldNames.contains(to), s"column $to already exists")
      StructType(schema.fields.updated(idx, schema.fields(idx).copy(name = to)))
    }

  /** DROP a column — METADATA-ONLY (column mapping): the field leaves the
    * declared schema; its physical column stays in old files, unread
    * (readers project by physical name, so it is simply never selected).
    */
  def dropColumn(spark: SparkSession, table: String, column: String,
      store: CommitStore = CommitStore.Local): Unit =
    columnMappingOp(spark, table, store, column) { (schema, idx) =>
      require(schema.fields.length > 1, "cannot drop the last column")
      StructType(schema.fields.patch(idx, Nil, 1))
    }

  private def columnMappingOp(spark: SparkSession, table: String,
      store: CommitStore, column: String)(
      op: (StructType, Int) => StructType): Unit = {
    val (meta, _) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    require(!meta.partitionColumns.contains(column),
      s"cannot rename or drop partition column $column")
    // stored SQL expressions (CHECK constraints, generated columns) name
    // columns LOGICALLY: after a rename the stored text still says the
    // old name and every subsequent append/update/merge fails at
    // analysis time — the table is write-bricked until the constraint is
    // dropped. A drop bricks identically. Upstream Delta blocks both, so
    // refuse up front with the fix in the message.
    def exprRefs(sql: String): Set[String] =
      try spark.sessionState.sqlParser.parseExpression(sql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.head.toLowerCase
      }.toSet
      catch { case _: Exception => Set(column.toLowerCase) } // unparseable → refuse
    val lcol = column.toLowerCase
    meta.configuration.foreach { case (k, v) =>
      if (k.startsWith("delta.constraints.") && exprRefs(v).contains(lcol))
        throw new IllegalArgumentException(
          s"column $column is referenced by CHECK constraint " +
            s"${k.stripPrefix("delta.constraints.")} ($v); drop the " +
            "constraint first (dropCheckConstraint), evolve, then re-add")
    }
    meta.schema.fields.foreach { f =>
      if (f.name != column && f.metadata.contains(GenExprKey) &&
          exprRefs(f.metadata.getString(GenExprKey)).contains(lcol))
        throw new IllegalArgumentException(
          s"column $column is referenced by generated column ${f.name}'s " +
            "generation expression; drop the generated column first")
    }
    // stamp EVERY unmapped field, not just on first enable: a column
    // added (mergeSchema) after mapping was enabled may lack metadata —
    // its files carry the logical name, so physicalName = current name is
    // exactly right; skipping it would let a later rename silently NULL
    // its pre-rename data. NESTED fields stamp too (spec: every field of
    // a column-mapped schema carries id + physicalName); they are not
    // rename-addressable here, so physical always equals logical below
    // the top level.
    var nextId = maxMapId(meta.schema)
    def freshId(): Long = { nextId += 1; nextId }
    def stampNested(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val meta1 =
          if (f.metadata.contains(PhysNameKey)) f.metadata
          else new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong(MapIdKey, freshId())
            .putString(PhysNameKey, f.name).build()
        f.copy(metadata = meta1, dataType = stampNested(f.dataType))
      })
      case ArrayType(et, n) => ArrayType(stampNested(et), n)
      case MapType(k, v, n) => MapType(stampNested(k), stampNested(v), n)
      case other => other
    }
    val mapped = StructType(meta.schema.fields.map { f =>
      val f1 =
        if (f.metadata.contains(PhysNameKey)) f
        else f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putLong(MapIdKey, freshId())
          .putString(PhysNameKey, f.name).build())
      f1.copy(dataType = stampNested(f1.dataType))
    })
    val idx = mapped.fieldNames.indexOf(column)
    require(idx >= 0, s"no such column: $column")
    val evolved = op(mapped, idx)
    // protocol: v3/v7 tables must LIST every active feature (spec rule),
    // so enabling mapping on a DV table refreshes the TRACKED feature
    // lists with columnMapping; pre-v3 tables bump to plain (2,5) —
    // feature lists only exist at v3+
    val bump =
      if (meta.minReader >= 3) {
        def lst(fs: Seq[String]) =
          (fs :+ "columnMapping").distinct.sorted.map(esc).mkString("[", ",", "]")
        Seq(s"""{"protocol":{"minReaderVersion":${meta.minReader},""" +
          s""""minWriterVersion":${meta.minWriter},""" +
          s""""readerFeatures":${lst(meta.readerFeatures)},""" +
          s""""writerFeatures":${lst(meta.writerFeatures)}}}""")
      }
      else if (meta.minReader >= 2 && meta.minWriter >= 5) Nil
      else Seq(s"""{"protocol":{"minReaderVersion":${math.max(2, meta.minReader)},""" +
        s""""minWriterVersion":${math.max(5, meta.minWriter)}}}""")
    val metaLine = metaDataJson(meta.id,
      StructType(evolved.fields.map(_.copy(nullable = true))).json,
      meta.partitionColumns,
      if (meta.createdTime != 0L) meta.createdTime else System.currentTimeMillis(),
      // the spec-compliance half of the mapping (ADVICE r13): without
      // delta.columnMapping.mode=name in configuration an external reader
      // defaults to mode none and NULLs every post-rename read — plus the
      // FULL replayed configuration (a metaData action replaces the map
      // wholesale; dropping it here would strip CHECK constraints)
      meta.configuration ++ mappingConfig(evolved))
    try commitAtomic(store, versionFile(table, meta.version + 1), bump :+ metaLine)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"concurrent commit on $table during column evolution; re-run", e)
    }
  }

  /** The table's CHECK constraints, from the replayed configuration
    * (spec: `delta.constraints.<name>` = SQL expression).
    */
  private def constraintsOf(config: Map[String, String]): Seq[(String, String)] =
    config.toSeq.collect {
      case (k, v) if k.startsWith("delta.constraints.") =>
        (k.stripPrefix("delta.constraints."), v)
    }.sortBy(_._1)

  /** Plants CHECK-constraint enforcement INTO the write plan: the first
    * column is wrapped in `when(constraint) col else raise_error`, so a
    * violating row fails the write JOB before anything commits — zero
    * extra pass over the data (the alternative, a separate
    * `filter(!c).count()`, scans the batch twice). SQL CHECK semantics:
    * NULL satisfies (only FALSE violates), hence the coalesce(.., true).
    */
  private def withConstraintCheck(df: DataFrame,
      config: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit,
      raise_error, when}
    val cs = constraintsOf(config)
    if (cs.isEmpty) return df
    val first = df.columns.head
    val dt = df.schema.head.dataType
    cs.foldLeft(df) { case (d, (n, ex)) =>
      d.withColumn(first,
        when(coalesce(expr(ex).cast("boolean"), lit(true)), col(first))
          .otherwise(raise_error(
            lit(s"CHECK constraint $n violated: ($ex)")).cast(dt)))
    }
  }

  /** ADD a CHECK constraint (Delta spec §CheckConstraints,
    * `delta.constraints.<name>`): the declarative data-quality gate — once
    * added, EVERY ingest path (append, update rewrites, merge) plants the
    * predicate into its own write plan and a violating batch fails before
    * one byte commits. Adding validates the EXISTING rows first (the
    * spec's ALTER TABLE contract — one scan, the unavoidable cost), then
    * commits a metaData re-emission carrying the constraint in
    * configuration plus the protocol the feature requires (legacy writer
    * v3, or the checkConstraints writer feature on v7 tables). At 100 TB
    * this is what keeps a million-file table clean WITHOUT a nightly
    * full-scan audit: the invariant is enforced at the only place data
    * enters.
    */
  def addCheckConstraint(spark: SparkSession, table: String, name: String,
      expression: String, store: CommitStore = CommitStore.Local): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    require(name.matches("[A-Za-z0-9_]+"),
      s"constraint name must be alphanumeric: $name")
    val (meta, liveDf) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    val key = s"delta.constraints.$name"
    require(!meta.configuration.contains(key), s"constraint $name already exists")
    val state = State(meta.version, meta.id, meta.createdTime, meta.schema,
      meta.partitionColumns, collectAdds(liveDf), meta.txns, meta.minWriter)
    val bad = readStateMerged(spark, table, state, keepLineage = false, store)
      .filter(not(coalesce(expr(expression).cast("boolean"), lit(true))))
      .limit(1).count()
    require(bad == 0L,
      s"cannot add constraint $name: existing rows violate ($expression)")
    commitConstraintConfig(table, store, meta,
      meta.configuration + (key -> expression))
  }

  /** ENABLE in-commit timestamps (Delta spec §in-commit-timestamps,
    * writer feature `inCommitTimestamp`): every commit from this one on
    * leads with a commitInfo action whose `inCommitTimestamp` is the
    * commit's DURABLE clock — monotonic by construction (max(wall clock,
    * prev + 1), stamped inside [[commitAtomic]]). Why it matters: the
    * pre-ICT timestamp rule is commit-file MTIME, which an rsync, a
    * bucket migration, or a `touch` silently rewrites — after which
    * "the table at 09:00" resolves to the wrong version. ICT lives IN
    * the committed bytes; copying the log cannot move it. The enablement
    * commit records `delta.inCommitTimestampEnablementVersion`/
    * `...Timestamp` (spec) so readers know where the ICT clock starts;
    * [[versionAtTimestamp]] prefers ICT per commit and falls back to
    * mtime for pre-enablement history. Protocol: writer v7 + the
    * `inCommitTimestamp` writer feature (reader unchanged — the feature
    * is writer-only).
    */
  def enableInCommitTimestamps(spark: SparkSession, table: String,
      store: CommitStore = CommitStore.Local): Unit = {
    val (meta, _) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    require(!meta.configuration.get("delta.enableInCommitTimestamps").contains("true"),
      s"in-commit timestamps already enabled on $table")
    val version = meta.version + 1
    val ict = System.currentTimeMillis()
    def lst(fs: Seq[String]) = fs.distinct.sorted.map(esc).mkString("[", ",", "]")
    val bump =
      if (meta.minWriter >= 7 && meta.writerFeatures.contains("inCommitTimestamp")) Nil
      else Seq(s"""{"protocol":{"minReaderVersion":${meta.minReader},""" +
        s""""minWriterVersion":7,""" +
        s""""readerFeatures":${lst(meta.readerFeatures)},""" +
        s""""writerFeatures":${lst(meta.writerFeatures :+ "inCommitTimestamp")}}}""")
    val metaLine = metaDataJson(meta.id,
      StructType(meta.schema.fields.map(_.copy(nullable = true))).json,
      meta.partitionColumns,
      if (meta.createdTime != 0L) meta.createdTime else ict,
      meta.configuration ++ mappingConfig(meta.schema) ++ Map(
        "delta.enableInCommitTimestamps" -> "true",
        "delta.inCommitTimestampEnablementVersion" -> version.toString,
        "delta.inCommitTimestampEnablementTimestamp" -> ict.toString))
    val info = s"""{"commitInfo":{"inCommitTimestamp":$ict,"timestamp":$ict}}"""
    try commitAtomic(store, versionFile(table, version), (info +: bump) :+ metaLine)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"concurrent commit on $table during ICT enablement; re-run", e)
    }
  }

  /** DROPs a CHECK constraint — metadata-only. */
  def dropCheckConstraint(spark: SparkSession, table: String, name: String,
      store: CommitStore = CommitStore.Local): Unit = {
    val (meta, _) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    val key = s"delta.constraints.$name"
    require(meta.configuration.contains(key), s"no such constraint: $name")
    commitConstraintConfig(table, store, meta, meta.configuration - key)
  }

  private def commitConstraintConfig(table: String, store: CommitStore,
      meta: MetaState, newConfig: Map[String, String]): Unit = {
    // protocol: CHECK constraints are legacy writer v3; a v7 table lists
    // the checkConstraints writer feature instead (spec rule: v7 must
    // track every active feature)
    val bump =
      if (meta.minWriter >= 7) {
        if (meta.writerFeatures.contains("checkConstraints")) Nil
        else {
          def lst(fs: Seq[String]) = fs.distinct.sorted.map(esc).mkString("[", ",", "]")
          Seq(s"""{"protocol":{"minReaderVersion":${meta.minReader},""" +
            s""""minWriterVersion":7,""" +
            s""""readerFeatures":${lst(meta.readerFeatures)},""" +
            s""""writerFeatures":${lst(meta.writerFeatures :+ "checkConstraints")}}}""")
        }
      }
      else if (meta.minWriter >= 3) Nil
      else Seq(s"""{"protocol":{"minReaderVersion":${meta.minReader},""" +
        s""""minWriterVersion":3}}""")
    val metaLine = metaDataJson(meta.id,
      StructType(meta.schema.fields.map(_.copy(nullable = true))).json,
      meta.partitionColumns,
      if (meta.createdTime != 0L) meta.createdTime else System.currentTimeMillis(),
      newConfig ++ mappingConfig(meta.schema))
    try commitAtomic(store, versionFile(table, meta.version + 1), bump :+ metaLine)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"concurrent commit on $table during constraint change; re-run", e)
    }
  }

  /** Writes a parquet checkpoint of the current log state plus the
    * `_last_checkpoint` pointer. Readers then start from the checkpoint and
    * replay only newer JSON commits — O(delta) instead of O(history).
    * Older JSON commits are retained so `asOfVersion` time travel before the
    * checkpoint still works.
    */
  def checkpoint(spark: SparkSession, table: String): Long =
    checkpoint(spark, table, CommitStore.Local)

  def checkpoint(spark: SparkSession, table: String, store: CommitStore): Long = {
    import org.apache.spark.sql.functions.{col, lit, struct}
    // a table already on V2 checkpoints STAYS on them: a classic rewrite
    // of the pointer would strand the manifest + `_sidecars` set with no
    // reclaimer and silently downgrade the layout a caller opted into
    // (ADVICE r15) — route through the v2 path, which also reclaims
    // correctly
    locally {
      val f = lastCheckpointFile(table)
      if (Files.exists(f) &&
          mapper.readTree(Files.readString(f)).has("path"))
        return checkpointV2(spark, table, store)
    }
    val (meta, live) = resolve(spark, table, None)
    // Metadata plane (protocol, metaData, txn watermarks): a handful of
    // rows, built on the driver. Data plane (the add list): stays a
    // DataFrame END-TO-END — resolved distributedly by [[resolve]] and
    // written straight back out, so a table with millions of live files
    // checkpoints without the add list ever materializing on the driver.
    val metaRows: Seq[Row] =
      // feature lists exist only at v3/v7 (spec); carry the replayed
      // ones so a reader starting from this checkpoint keeps them
      (Row(Row(meta.minReader, meta.minWriter,
        if (meta.minReader >= 3) meta.readerFeatures else null,
        if (meta.minWriter >= 7) meta.writerFeatures else null),
        null, null, null, null) +:
      Row(null,
        Row(Option(meta.id).getOrElse(java.util.UUID.randomUUID().toString), Row("parquet"),
          StructType(meta.schema.fields.map(_.copy(nullable = true))).json,
          meta.partitionColumns,
          // the full replayed table configuration (constraints, etc.);
          // column-mapping keys re-derive from the schema stamps so a
          // mapped table keeps them even across older commits
          meta.configuration ++ mappingConfig(meta.schema),
          if (meta.createdTime != 0L) meta.createdTime else System.currentTimeMillis()),
        null, null, null) +:
      meta.txns.toSeq.sortBy(_._1).map { case (app, v) =>
        Row(null, null, null, Row(app, v), null)
      }) ++
      // active domain metadata (the row-tracking high-water mark above
      // all) survives the checkpoint, or a replay-from-checkpoint would
      // REUSE removed files' row ids
      meta.domains.toSeq.sortBy(_._1).map { case (d, c) =>
        Row(null, null, null, null, Row(d, c, false))
      }
    def nullAs(field: String) =
      lit(null).cast(CheckpointSchema(field).dataType).as(field)
    val df = spark.createDataFrame(metaRows.asJava, CheckpointSchema)
      .unionByName(live.select(
        nullAs("protocol"), nullAs("metaData"),
        struct(col("path"), col("partitionValues"), col("size"),
          col("modificationTime"), lit(true).as("dataChange"),
          col("stats"), col("deletionVector"), col("baseRowId"),
          col("defaultRowCommitVersion")).as("add"),
        nullAs("txn"), nullAs("domainMetadata")))
    // Stage INSIDE _delta_log: the final step is then a same-filesystem
    // directory rename — Files.move of a non-empty directory cannot
    // copy-fallback across mounts, and a cross-FS failure after deleting
    // the previous checkpoint would leave _last_checkpoint dangling.
    val target = checkpointFile(table, meta.version)
    store match {
      case os: ObjectStore =>
        // Store path: stage the checkpoint parquet locally, UPLOAD the new
        // parts first (object PUTs replace atomically, so a same-version
        // re-checkpoint never empties an already-published dir — deleting
        // first would leave _last_checkpoint referencing a missing
        // checkpoint if the re-upload died mid-flight, and concurrent
        // readers would see a partially-emptied dir during the
        // network-slow window), THEN reclaim only the stale keys not in
        // the new part set (a failed partial upload or a different
        // partition count would otherwise strand orphan parts that
        // shadow-pad snapshot reads forever). Finally flip
        // _last_checkpoint with a plain put — the server's
        // tmp+atomic-move gives the same no-partial-pointer guarantee as
        // the local write-then-rename below.
        val staging = Files.createTempDirectory("graft-ckpt-stage").toFile
        try {
          df.write.mode("overwrite").option("compression", "snappy")
            .parquet(staging.getPath)
          new File(staging, "_SUCCESS").delete()
          val fresh = dataFiles(staging).map { src =>
            val key = target.resolve(src.getName)
            os.putObject(key, Files.readAllBytes(src.toPath))
            key
          }.toSet
          os.listPrefix(target).filterNot(fresh).foreach(os.deleteObject)
        } finally deleteRecursively(staging)
      case _ =>
        // Stage INSIDE _delta_log: the final step is then a same-filesystem
        // directory rename — Files.move of a non-empty directory cannot
        // copy-fallback across mounts, and a cross-FS failure after deleting
        // the previous checkpoint would leave _last_checkpoint dangling.
        val staging = Files.createTempDirectory(logDir(table), "ckpt-staging-").toFile
        try {
          // Multi-part checkpoint: the PARQUET DIRECTORY is the checkpoint
          // (readers just spark.read.parquet it, same as the single-file form
          // older tables carry) — one writer task per live-set partition, no
          // driver bottleneck, no single giant file at scale.
          df.write.mode("overwrite").option("compression", "snappy")
            .parquet(staging.getPath)
          new File(staging, "_SUCCESS").delete()
          deleteRecursively(target.toFile) // re-checkpoint at same version
          Files.move(staging.toPath, target)
        } finally deleteRecursively(staging)
    }
    val ptr = s"""{"version":${meta.version}}"""
    store match {
      case os: ObjectStore =>
        os.putObject(lastCheckpointFile(table),
          (ptr + "\n").getBytes(StandardCharsets.UTF_8))
      case _ =>
        // write-then-rename: a concurrent reader must never see a partial
        // _last_checkpoint (it would fail the JSON parse and abort the read)
        val tmp = logDir(table).resolve(
          s"_last_checkpoint.tmp-${java.util.UUID.randomUUID()}")
        Files.write(tmp, (ptr + "\n").getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, lastCheckpointFile(table),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
    meta.version
  }

  /** V2 CHECKPOINT (Delta spec §v2-checkpoints, feature `v2Checkpoint`):
    * the checkpoint splits into a tiny MANIFEST
    * (`<v>.checkpoint.<uuid>.parquet` — protocol, metaData, txn
    * watermarks, a checkpointMetadata stamp, and one `sidecar` row per
    * part) plus SIDECAR parquet files under `_delta_log/_sidecars/`
    * holding the add actions. Why this is the 100 TB posture where the
    * classic form is not: the sidecar list is REUSABLE — an incremental
    * re-checkpoint can carry unchanged sidecars forward and rewrite only
    * the parts whose files changed, and N readers fetch the KB-scale
    * manifest then scan sidecars in parallel, instead of every reader
    * listing one monolithic checkpoint directory. The feature is gated:
    * this commits a protocol action (reader 3 / writer 7, `v2Checkpoint`
    * on BOTH lists) FIRST, so a reader that cannot resolve through a v2
    * checkpoint refuses the table instead of silently replaying the
    * whole JSON log past it (or worse, mis-reading). The pointer file
    * carries the manifest name; sidecar writes stay distributed
    * end-to-end exactly like the classic path.
    */
  def checkpointV2(spark: SparkSession, table: String,
      store: CommitStore = CommitStore.Local): Long = {
    import org.apache.spark.sql.functions.{col, lit, struct}
    locally {
      val (meta0, _) = resolve(spark, table, None)
      requireWritable(meta0.minWriter, table)
      if (!(meta0.minReader >= 3 && meta0.readerFeatures.contains("v2Checkpoint"))) {
        // version-implied legacy capabilities become EXPLICIT feature
        // names on the bump (spec rule: v3/v7 lists every active feature)
        def active(flag: Boolean, name: String) = if (flag) Seq(name) else Nil
        val mapped = mappingEnabled(meta0.schema)
        val rf = (meta0.readerFeatures ++
          active(mapped, "columnMapping") :+ "v2Checkpoint").distinct.sorted
        val wf = (meta0.writerFeatures ++
          active(mapped, "columnMapping") ++
          active(meta0.configuration.keys.exists(_.startsWith("delta.constraints.")),
            "checkConstraints") ++
          active(meta0.schema.fields.exists(_.metadata.contains(GenExprKey)),
            "generatedColumns") ++
          active(meta0.configuration.get("delta.enableInCommitTimestamps")
            .contains("true"), "inCommitTimestamp") :+ "v2Checkpoint")
          .distinct.sorted
        def lst(fs: Seq[String]) = fs.map(esc).mkString("[", ",", "]")
        try commitAtomic(store, versionFile(table, meta0.version + 1),
          Seq(s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
            s""""readerFeatures":${lst(rf)},"writerFeatures":${lst(wf)}}}"""))
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            throw new IllegalStateException(
              s"concurrent commit on $table during v2Checkpoint enablement; re-run", e)
        }
      }
    }
    val (meta, live) = resolve(spark, table, None)
    val sidecarDir = logDir(table).resolve("_sidecars")
    // the PREVIOUS v2 generation: its manifest name is the reclaim fence
    // (kept one generation, so a reader mid-resolve on the old pointer
    // never loses its sidecars — ADVICE r15) and its sidecar rows are the
    // reuse candidates
    val prevManifest: Option[String] = {
      val f = lastCheckpointFile(table)
      if (!Files.exists(f)) None
      else Option(mapper.readTree(Files.readString(f)).get("path"))
        .map(_.asText())
        .filter(n => Files.exists(logDir(table).resolve(n)))
    }
    val prevSidecars: Map[String, (Long, Long)] = prevManifest.map { name =>
      spark.read.schema(V2ManifestSchema)
        .parquet(logDir(table).resolve(name).toString)
        .where(col("sidecar").isNotNull)
        .select("sidecar.path", "sidecar.sizeInBytes",
          "sidecar.modificationTime")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    }.getOrElse(Map.empty)
    // INCREMENTAL data plane: the live set buckets DETERMINISTICALLY by
    // path hash (bucket count = smallest power of two keeping buckets
    // under AddsPerCkptSidecar, so the layout only reshuffles on a size
    // ratchet); each bucket's sidecar is CONTENT-ADDRESSED — its name
    // carries an order-independent xxhash64-XOR over every
    // replay-relevant add field — and a bucket whose name the previous
    // manifest already lists CARRIES FORWARD without a byte written. A
    // nightly re-checkpoint of a 100 TB table rewrites only the buckets
    // its day's commits touched; N readers still fan out over the full
    // sidecar list in parallel (this is the layout's point — SURVEY
    // §2.2 q_delta_checkpoint_v2).
    val sidecars: Seq[(String, Long, Long)] = {
      import org.apache.spark.sql.functions.{coalesce, count, expr, pmod,
        to_json, xxhash64}
      val liveCount = live.count()
      var buckets = 1
      while (buckets.toLong * AddsPerCkptSidecar < liveCount) buckets *= 2
      val withB = live
        .withColumn("_b",
          pmod(xxhash64(col("path")), lit(buckets.toLong)).cast("int"))
        .withColumn("_rh", xxhash64(col("path"), col("size"),
          col("modificationTime"), coalesce(col("stats"), lit("")),
          coalesce(col("deletionVector.storageType"), lit("")),
          coalesce(col("deletionVector.pathOrInlineDv"), lit("")),
          coalesce(col("deletionVector.offset"), lit(-1)),
          coalesce(col("deletionVector.sizeInBytes"), lit(-1L)),
          coalesce(col("deletionVector.cardinality"), lit(-1L)),
          coalesce(col("baseRowId"), lit(-1L)),
          coalesce(col("defaultRowCommitVersion"), lit(-1L)),
          to_json(col("partitionValues"))))
      val bucketInfo: Seq[(Int, Long)] = withB.groupBy(col("_b"))
        .agg(expr("bit_xor(_rh)").as("h"), count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
      def sidecarName(b: Int, h: Long) =
        f"inc-$buckets%05d-$b%05d-$h%016x.parquet"
      val (carried, changed) = bucketInfo.partition { case (b, h) =>
        prevSidecars.contains(sidecarName(b, h))
      }
      val staging = Files.createTempDirectory("graft-ckpt2-stage").toFile
      val written: Seq[(String, Long, Long)] =
        if (changed.isEmpty) Nil
        else try {
          val changedIds = changed.map(_._1)
          withB.where(col("_b").isin(changedIds: _*))
            .select(struct(col("path"), col("partitionValues"), col("size"),
              col("modificationTime"), lit(true).as("dataChange"),
              col("stats"), col("deletionVector"), col("baseRowId"),
              col("defaultRowCommitVersion")).as("add"),
              col("_b"))
            .repartition(col("_b"))
            .write.mode("overwrite").option("compression", "snappy")
            .partitionBy("_b").parquet(staging.getPath)
          val hashById = changed.toMap
          changedIds.map { b =>
            val parts = dataFiles(new File(staging, s"_b=$b"))
            // repartition(col) pins a bucket to exactly one task; a split
            // bucket would break content addressing, so fail loudly
            require(parts.length == 1,
              s"bucket $b staged ${parts.length} parts; expected exactly one")
            val src = parts.head
            val name = sidecarName(b, hashById(b))
            val target = sidecarDir.resolve(name)
            store match {
              case os: ObjectStore =>
                os.putObject(target, Files.readAllBytes(src.toPath))
              case _ =>
                Files.createDirectories(sidecarDir)
                // identical content by construction if the name already
                // exists (an older generation outside the reuse fence)
                Files.move(src.toPath, target,
                  java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
            }
            (name, src.length(), System.currentTimeMillis())
          }
        } finally deleteRecursively(staging)
      carried.map { case (b, h) =>
        val name = sidecarName(b, h)
        val (sz, mt) = prevSidecars(name)
        (name, sz, mt)
      } ++ written
    }
    // metadata plane + sidecar list → the manifest (driver-side, KBs)
    val metaRows: Seq[Row] =
      (Row(Row(meta.minReader, meta.minWriter, meta.readerFeatures,
        meta.writerFeatures), null, null, null, null, null) +:
      Row(null,
        Row(meta.id, Row("parquet"),
          StructType(meta.schema.fields.map(_.copy(nullable = true))).json,
          meta.partitionColumns,
          meta.configuration ++ mappingConfig(meta.schema),
          if (meta.createdTime != 0L) meta.createdTime else System.currentTimeMillis()),
        null, null, null, null) +:
      Row(null, null, Row(meta.version), null, null, null) +:
      (meta.txns.toSeq.sortBy(_._1).map { case (app, v) =>
        Row(null, null, null, Row(app, v), null, null)
      } ++
      meta.domains.toSeq.sortBy(_._1).map { case (d, c) =>
        Row(null, null, null, null, null, Row(d, c, false))
      })) ++ sidecars.map { case (n, sz, mt) =>
        Row(null, null, null, null, Row(n, sz, mt), null)
      }
    val manifestName =
      f"${meta.version}%020d.checkpoint.${java.util.UUID.randomUUID()}.parquet"
    val mStaging = Files.createTempDirectory("graft-ckpt2-man").toFile
    try {
      spark.createDataFrame(metaRows.asJava, V2ManifestSchema)
        .coalesce(1).write.mode("overwrite").parquet(mStaging.getPath)
      val part = dataFiles(mStaging).head
      val target = logDir(table).resolve(manifestName)
      store match {
        case os: ObjectStore => os.putObject(target, Files.readAllBytes(part.toPath))
        case _ => Files.move(part.toPath, target): Unit
      }
    } finally deleteRecursively(mStaging)
    // pointer flip LAST — the manifest name rides the pointer, so a
    // reader either resolves the complete new checkpoint or the old one
    val ptr = s"""{"version":${meta.version},"path":${esc(manifestName)}}"""
    store match {
      case os: ObjectStore =>
        os.putObject(lastCheckpointFile(table),
          (ptr + "\n").getBytes(StandardCharsets.UTF_8))
      case _ =>
        val tmp = logDir(table).resolve(
          s"_last_checkpoint.tmp-${java.util.UUID.randomUUID()}")
        Files.write(tmp, (ptr + "\n").getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, lastCheckpointFile(table),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
    // stale-artifact reclaim with an N-1 FENCE: the new generation AND
    // the immediately-previous one (manifest + every sidecar either
    // references) survive — a reader that resolved the old pointer just
    // before the flip, or a racing checkpointV2 that lost, still finds
    // its whole generation; everything older is dead (readers resolve
    // pointer → manifest → sidecars) and without this a nightly
    // re-checkpoint strands one manifest + sidecar set per run that no
    // janitor would ever sweep (ADVICE r15). Classic checkpoint
    // DIRECTORIES (<v>.checkpoint.parquet) don't match the uuid'd
    // manifest pattern and are left alone.
    def reclaim(f: File): Unit = store match {
      case os: ObjectStore => os.deleteObject(f.toPath)
      case _ => Files.deleteIfExists(f.toPath): Unit
    }
    val keepManifests = Set(manifestName) ++ prevManifest
    val keepSidecars = sidecars.map(_._1).toSet ++ prevSidecars.keySet
    Option(logDir(table).toFile.listFiles()).toSeq.flatten
      .filter(f => f.getName.matches("\\d{20}\\.checkpoint\\..+\\.parquet") &&
        !keepManifests.contains(f.getName))
      .foreach(reclaim)
    Option(sidecarDir.toFile.listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") &&
        !keepSidecars.contains(f.getName))
      .foreach(reclaim)
    meta.version
  }

  private val V2ManifestSchema = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("checkpointMetadata", StructType(Seq(
      StructField("version", LongType)))),
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))),
    StructField("sidecar", StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType)))),
    StructField("domainMetadata", StructType(Seq(
      StructField("domain", StringType),
      StructField("configuration", StringType),
      StructField("removed", BooleanType))))))

  /** Read-side v2 manifest schema: [[V2ManifestSchema]] plus `add` — the
    * Delta v2-checkpoint spec permits a manifest to carry file actions
    * INLINE when it references no sidecars; our own writer never does, but
    * an externally written checkpoint may (r19 ADVICE parity with the
    * driver fast path, which already reads them). Reading a column absent
    * from the file yields nulls, so our own manifests read unchanged.
    */
  private lazy val V2ManifestReadSchema =
    StructType(V2ManifestSchema.fields.toSeq :+ CheckpointSchema("add"))

  private val CheckpointSchema = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      // spec: a v3/v7 protocol action REQUIRES its feature lists — a
      // checkpoint dropping them would strip a DV or column-mapped
      // table's capabilities for any reader starting there (ADVICE r13)
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", LongType),
        StructField("cardinality", LongType)))),
      // ROW TRACKING (spec §Row Tracking, writer feature `rowTracking`):
      // the id of this file's first row; rows derive baseRowId + position,
      // and their commit version inherits defaultRowCommitVersion unless a
      // rewrite materialized the per-row column
      StructField("baseRowId", LongType),
      StructField("defaultRowCommitVersion", LongType)))),
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))),
    // domain metadata (spec §Domain Metadata): the row-tracking high-water
    // mark lives in domain "delta.rowTracking" — a checkpoint dropping it
    // would let a replay-from-checkpoint REUSE removed files' row ids
    StructField("domainMetadata", StructType(Seq(
      StructField("domain", StringType),
      StructField("configuration", StringType),
      StructField("removed", BooleanType))))))

  /** Highest committed streaming-transaction version for `appId`, or -1 —
    * the watermark [[appendExactlyOnce]] consults.
    */
  def lastTxnVersion(spark: SparkSession, table: String, appId: String): Long =
    replay(spark, table, None).txns.getOrElse(appId, -1L)

  // ---- ROW TRACKING (Delta spec §Row Tracking — the format twin of
  // IcebergSink row lineage, closing cross-format id symmetry) ----

  private[sinks] val RowTrackingDomain = "delta.rowTracking"
  private val RowTrackingConf = "delta.enableRowTracking"

  /** The highest row id assigned so far (the spec's rowIdHighWaterMark,
    * stored in the `delta.rowTracking` domain metadata; -1 = none).
    */
  private def rowIdHighWaterMark(domains: Map[String, String]): Option[Long] =
    domains.get(RowTrackingDomain)
      .map(c => mapper.readTree(c).path("rowIdHighWaterMark").asLong(-1L))

  private def domainJson(domain: String, conf: String): String =
    s"""{"domainMetadata":{"domain":${esc(domain)},""" +
      s""""configuration":${esc(conf)},"removed":false}}"""

  private def rowsOf(a: AddEntry): Long =
    Option(a.stats).map(s => mapper.readTree(s).path("numRecords").asLong(0L))
      .getOrElse(0L)

  /** Assigns fresh, contiguous baseRowIds above `hwm` (add order) and
    * stamps each add's defaultRowCommitVersion with the committing
    * version (spec §Row Tracking: rows inherit their file's default
    * commit version unless a rewrite materialized the per-row column);
    * returns the re-stamped adds and the new high-water mark.
    */
  private def assignRowIds(adds: Seq[AddEntry], hwm: Long,
      commitVersion: Long): (Seq[AddEntry], Long) = {
    var cursor = hwm
    val out = adds.map { a =>
      val n = rowsOf(a)
      val o = a.copy(baseRowId = Some(cursor + 1),
        defaultRowCommitVersion = Some(commitVersion))
      cursor += n
      o
    }
    (out, cursor)
  }

  /** ENABLE ROW TRACKING (spec writer features `rowTracking` +
    * `domainMetadata`): every row gets a STABLE id — `baseRowId +
    * position` — that survives appends, DV deletes (positions never
    * move) and id-materializing compaction. ONE metadata-only commit
    * re-adds every live file with a retroactive baseRowId (path order,
    * cumulative by the log's own numRecords — no data file opened),
    * bumps the protocol (v3/v7, feature lists carried per the spec's
    * list-every-feature rule), stamps `delta.enableRowTracking` into the
    * configuration and seeds the `delta.rowTracking` high-water-mark
    * domain. Returns the rows assigned.
    */
  def enableRowTracking(spark: SparkSession, table: String,
      store: CommitStore = CommitStore.Local): Long = {
    val state = replay(spark, table, None)
    requireWritable(state.minWriter, table)
    require(!state.configuration.get(RowTrackingConf).contains("true"),
      s"row tracking already enabled on $table")
    val (meta, _) = resolve(spark, table, None)
    // retroactive enablement cannot recover pre-feature per-row commit
    // versions — like delta-spark's backfill, the enable commit's own
    // version stamps every re-added file
    val (withIds, hwm) = assignRowIds(state.live.sortBy(_.path), -1L,
      state.version + 1)
    def features(tracked: Seq[String], extra: Seq[String]) =
      (tracked ++ extra).distinct.sorted.map(esc).mkString("[", ",", "]")
    val bump =
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":${features(meta.readerFeatures,
          if (mappingEnabled(state.schema)) Seq("columnMapping") else Nil)},""" +
        s""""writerFeatures":${features(meta.writerFeatures,
          Seq("rowTracking", "domainMetadata") ++
            (if (mappingEnabled(state.schema)) Seq("columnMapping") else Nil))}}}"""
    val metaLine = metaDataJson(state.metaId,
      StructType(state.schema.fields.map(_.copy(nullable = true))).json,
      state.partitionColumns,
      if (state.createdTime != 0L) state.createdTime else System.currentTimeMillis(),
      state.configuration ++ mappingConfig(state.schema) +
        (RowTrackingConf -> "true"))
    val lines = Seq(bump, metaLine) ++
      withIds.map(a => addJson(a, dataChange = false)) :+
      domainJson(RowTrackingDomain, s"""{"rowIdHighWaterMark":$hwm}""")
    try commitAtomic(store, versionFile(table, state.version + 1), lines)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"concurrent commit on $table during enableRowTracking; re-run", e)
    }
    hwm + 1
  }

  /** Whether the table tracks row ids (the janitor's action selector). */
  private[sinks] def rowTrackingEnabled(spark: SparkSession, table: String): Boolean =
    replay(spark, table, None).configuration.get(RowTrackingConf).contains("true")

  /** ROW-ID READ — the current merged view plus `_row_id`
    * ([[IcebergSink.readWithLineage]]'s format twin): `baseRowId +
    * position` for manifest-assigned files, the MATERIALIZED `_row_id`
    * column for files an id-preserving compaction rewrote, null for
    * files predating enablement. DV deletes apply exactly as in [[read]];
    * survivors keep their ids because deletes never move positions.
    */
  def readWithRowIds(spark: SparkSession, table: String,
      store: CommitStore = CommitStore.Local): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col}
    val (meta, liveDf) = resolve(spark, table, None)
    val state0 = State(meta.version, meta.id, meta.createdTime, meta.schema,
      meta.partitionColumns, collectAdds(liveDf), meta.txns, meta.minWriter,
      meta.configuration, meta.domains)
    // widen the read schema by the physical lineage columns: files an
    // id-preserving compaction materialized carry them; all others read
    // null and inherit from the add's manifest fields
    val withRid = state0.copy(schema = StructType(state0.schema.fields ++ Seq(
      StructField("_row_id", LongType, nullable = true),
      StructField("_row_commit_version", LongType, nullable = true))))
    val base = readStateMerged(spark, table, withRid, keepLineage = true, store)
    val lookup = state0.live.flatMap { a =>
      val abs = dataAbs(table, a.path)
      val enc = new File(abs).toURI.toString
        .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
      Seq(abs, enc).distinct.map(k =>
        (k, a.baseRowId.map(Long.box).orNull,
          a.defaultRowCommitVersion.map(Long.box).orNull))
    }
    val lookupDf = spark.createDataFrame(
      lookup.map { case (k, b, v) => Row(k, b, v) }.asJava,
      StructType(Seq(StructField("_gf_bkey", StringType),
        StructField("_gf_brid", LongType, nullable = true),
        StructField("_gf_bdrcv", LongType, nullable = true))))
    import org.apache.spark.sql.functions.regexp_replace
    base
      .withColumn("_gf_bkey",
        regexp_replace(col("_gf_uri"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"))
      .join(broadcast(lookupDf), Seq("_gf_bkey"), "left")
      .withColumn("_row_id",
        coalesce(col("_row_id"), col("_gf_brid") + col("_gf_pos")))
      // ROW COMMIT VERSION (spec §Row Tracking's second column): the
      // file's defaultRowCommitVersion unless a materializing rewrite
      // preserved the per-row value physically
      .withColumn("_row_commit_version",
        coalesce(col("_row_commit_version"), col("_gf_bdrcv")))
      .select((state0.schema.fieldNames.toIndexedSeq ++
        Seq("_row_id", "_row_commit_version")).map(col): _*)
  }

  // ---- TABLE STATISTICS ([[IcebergStats]]'s format twin; graft
  // EXTENSION, documented rather than hidden: the Delta spec has no
  // table-statistics slot — per-file stats ride add.stats — so the
  // registration lives in a `graft.stats` metadata DOMAIN, exactly what
  // domain metadata exists for: engine-owned named configuration) ----

  private[sinks] val StatsDomain = "graft.stats"

  /** Computes one theta sketch PER COLUMN in a single distributed pass
    * (constant ≤K×8 B per partition shipped), packs them into ONE Puffin
    * file of `apache-datasketches-theta-v1` blobs under
    * `_delta_log/_graft_stats/`, and registers (path, table version,
    * per-column `ndv`) in the `graft.stats` domain via a METADATA-ONLY
    * commit — writer v7 + the `domainMetadata` feature (reader version
    * untouched; domains are writer-plane and unknown ones are ignored).
    * Blob identity is the COLUMN NAME in blob properties (Delta has no
    * Iceberg field ids outside column mapping). Re-running replaces the
    * registration and deletes the superseded Puffin. Why at 100 TB: the
    * broadcast decision wants the build side's cardinality BEFORE any
    * scan — the domain row is an O(1) read off the replayed log head,
    * no data file or per-file stats walk ([[statsNdv]]/[[scanForJoin]]).
    * Returns the per-column NDV estimates (exact below the sketch's K).
    */
  def writeStats(spark: SparkSession, table: String, columns: Seq[String],
      store: CommitStore = CommitStore.Local): Map[String, Long] = {
    import org.apache.spark.sql.functions.col
    require(columns.nonEmpty, "writeStats needs at least one column")
    val (meta, _) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    val df = read(spark, table)
    val T = graft.functions.ThetaSketch
    val aggs = columns.map(c => T.sketch(T.hashFor(col(c))).as(s"_sk_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val sketches: Seq[(String, Array[Long])] = columns.zipWithIndex.map {
      case (c, i) => c -> row.getSeq[Long](i).toArray
    }
    // Puffin: magic, blobs back to back, JSON footer (same public layout
    // as [[IcebergStats.writeStats]]; payloads are raw CompactSketches)
    val bos = new java.io.ByteArrayOutputStream()
    val magic = Array[Byte]('P', 'F', 'A', '1')
    bos.write(magic)
    val blobMeta = sketches.map { case (c, sk) =>
      val payload = IcebergStats.compactThetaBytes(sk)
      val off = bos.size().toLong
      bos.write(payload)
      (c, off, payload.length.toLong, IcebergStats.ndvEstimate(sk))
    }
    val footerStart = bos.size()
    val blobsJson = blobMeta.map { case (c, off, len, ndv) =>
      s"""{"type":"apache-datasketches-theta-v1","fields":[],""" +
        s""""offset":$off,"length":$len,""" +
        s""""properties":{"ndv":"$ndv","column":${esc(c)}}}"""
    }.mkString(",")
    val footerPayload =
      s"""{"blobs":[$blobsJson],"properties":{"created-by":"graft-stats"}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bos.write(magic)
    bos.write(footerPayload)
    val pl = footerPayload.length
    bos.write(Array[Byte]((pl & 0xFF).toByte, ((pl >> 8) & 0xFF).toByte,
      ((pl >> 16) & 0xFF).toByte, ((pl >> 24) & 0xFF).toByte))
    bos.write(Array[Byte](0, 0, 0, 0)) // footer flags
    bos.write(magic)
    val fileBytes = bos.toByteArray
    val statsPath = Paths.get(table, "_delta_log", "_graft_stats",
      s"stats-${java.util.UUID.randomUUID()}.puffin")
    store match {
      case os: ObjectStore => os.putObject(statsPath, fileBytes)
      case _ =>
        Files.createDirectories(statsPath.getParent)
        Files.write(statsPath, fileBytes): Unit
    }
    val ndvs = blobMeta.map { case (c, _, _, ndv) => c -> ndv }.toMap
    def lst(fs: Seq[String]) = fs.distinct.sorted.map(esc).mkString("[", ",", "]")
    val bump =
      if (meta.minWriter >= 7 && meta.writerFeatures.contains("domainMetadata")) Nil
      else Seq(s"""{"protocol":{"minReaderVersion":${meta.minReader},""" +
        s""""minWriterVersion":7,""" +
        s""""readerFeatures":${lst(meta.readerFeatures)},""" +
        s""""writerFeatures":${lst(meta.writerFeatures :+ "domainMetadata")}}}""")
    val ndvJson = columns.map(c => s"${esc(c)}:${ndvs(c)}")
      .mkString("{", ",", "}")
    // TABLE-RELATIVE path in the domain row, like every add-file path in
    // the log: a relocated table resolves its own stats (absolute legacy
    // rows still resolve through dataAbs)
    val conf = s"""{"path":${
      esc(s"_delta_log/_graft_stats/${statsPath.getFileName}")},""" +
      s""""tableVersion":${meta.version},"ndv":$ndvJson}"""
    val superseded = meta.domains.get(StatsDomain)
      .map(c => mapper.readTree(c).path("path").asText()).filter(_.nonEmpty)
    try commitAtomic(store, versionFile(table, meta.version + 1),
      bump :+ domainJson(StatsDomain, conf))
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        store match {
          case os: ObjectStore => scala.util.Try(os.deleteObject(statsPath)): Unit
          case _ => Files.deleteIfExists(statsPath): Unit
        }
        throw new IllegalStateException(
          s"concurrent commit on $table during writeStats; re-run", e)
    }
    // the replaced stats file is dead the moment the domain row moved
    // (domain rows carry table-relative paths; resolve before reclaiming)
    superseded.foreach { p =>
      val target = Paths.get(dataAbs(table, p))
      store match {
        case os: ObjectStore => scala.util.Try(os.deleteObject(target)): Unit
        case _ => Files.deleteIfExists(target): Unit
      }
    }
    ndvs
  }

  /** The column's registered NDV (from the `graft.stats` domain — an
    * O(1) read off the log head; the Puffin is never opened). None when
    * the table carries no statistics for the column.
    */
  def statsNdv(spark: SparkSession, table: String, column: String): Option[Long] = {
    replay(spark, table, None).domains.get(StatsDomain).flatMap { c =>
      val n = mapper.readTree(c).path("ndv").path(column)
      if (n.isMissingNode || n.isNull) None else Some(n.asLong())
    }
  }

  /** The NDV-driven BROADCAST decision ([[IcebergStats.scanForJoin]]'s
    * format twin): reads the table for a join and marks it
    * broadcast-able when the registered NDV of its join key — for a
    * dimension keyed by that column, an upper-bound row-count proxy —
    * sits under `broadcastMaxNdv`. Without statistics the scan is
    * returned unhinted (Catalyst's size-based estimate decides).
    */
  def scanForJoin(spark: SparkSession, table: String, joinKey: String,
      broadcastMaxNdv: Long = 1000000L): DataFrame = {
    val df = read(spark, table)
    if (statsNdv(spark, table, joinKey).exists(_ <= broadcastMaxNdv))
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }

  // ---- LIQUID CLUSTERING (Delta spec §Clustered Table — the
  // `clustering` writer feature; columns live in the `delta.clustering`
  // metadata domain) ----

  private[sinks] val ClusteringDomain = "delta.clustering"

  /** Graft-owned INCREMENTAL-liquid state: `{"columns": [physical...],
    * "generations": [txn-uuid...]}` — the rewrite txns whose output files
    * (txn uuid in the file name) are already clustered by `columns`.
    * Written by [[compact]] in the same commit as the rewrite; KB-bounded
    * (one uuid per OPTIMIZE, pruned to live generations). The spec slot
    * [[ClusteringDomain]] stays exactly spec-shaped.
    */
  private[sinks] val LiquidDomain = "graft.clustering"

  /** CLUSTER BY — declares the table's clustering columns (Delta spec
    * §Clustered Table): ONE metadata-only commit bumping the protocol to
    * writer v7 with the `clustering` + `domainMetadata` features (reader
    * untouched — clustering is a write-time layout contract readers need
    * not know) and recording `{"clusteringColumns":[["c"],…]}` in the
    * `delta.clustering` domain, the spec's slot (each entry a physical
    * column-name path). NO file moves at declaration time — the liquid
    * posture: [[compact]] (OPTIMIZE) clusters implicitly from then on,
    * and re-running clusterBy with different columns re-points future
    * OPTIMIZE runs without rewriting history (the mobility partitioning
    * can't offer). Read side: the clustered layout's tight per-file
    * [min, max] stats are exactly what [[readRange]]/[[readRanges]]
    * prune on — no new read machinery, just far fewer surviving files.
    */
  def clusterBy(spark: SparkSession, table: String, columns: Seq[String],
      store: CommitStore = CommitStore.Local): Unit = {
    require(columns.nonEmpty, "clusterBy needs at least one column")
    val (meta, _) = resolve(spark, table, None)
    requireWritable(meta.minWriter, table)
    columns.foreach(c => require(meta.schema.fieldNames.contains(c),
      s"no such column: $c"))
    def lst(fs: Seq[String]) = fs.distinct.sorted.map(esc).mkString("[", ",", "]")
    val need = Seq("clustering", "domainMetadata")
      .filterNot(meta.writerFeatures.contains)
    val bump =
      if (meta.minWriter >= 7 && need.isEmpty) Nil
      else Seq(s"""{"protocol":{"minReaderVersion":${meta.minReader},""" +
        s""""minWriterVersion":7,""" +
        s""""readerFeatures":${lst(meta.readerFeatures)},""" +
        s""""writerFeatures":${lst(meta.writerFeatures ++ need)}}}""")
    // data files carry PHYSICAL names; record those (spec contract)
    val paths = columns
      .map(c => s"[${esc(physName(meta.schema(c)))}]").mkString("[", ",", "]")
    try commitAtomic(store, versionFile(table, meta.version + 1),
      bump :+ domainJson(ClusteringDomain, s"""{"clusteringColumns":$paths}"""))
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"concurrent commit on $table during clusterBy; re-run", e)
    }
  }

  /** The declared clustering columns as LOGICAL names (empty when the
    * table is not clustered) — the domain stores physical paths, mapped
    * back through the schema's column-mapping stamps.
    */
  def clusteringColumns(spark: SparkSession, table: String): Seq[String] = {
    val state = replay(spark, table, None)
    clusteringPhysical(state.domains).map { phys =>
      state.schema.fields.find(f => physName(f) == phys)
        .map(_.name).getOrElse(phys)
    }
  }

  private def clusteringPhysical(domains: Map[String, String]): Seq[String] =
    domains.get(ClusteringDomain).toSeq.flatMap { c =>
      mapper.readTree(c).path("clusteringColumns").elements().asScala.toSeq
        // a multi-segment path is a nested column; join to the dotted form
        .map(_.elements().asScala.map(_.asText()).mkString("."))
    }

  /** Physically deletes data files no longer referenced by the LATEST
    * snapshot whose on-disk mtime is older than `retentionMs` — the VACUUM
    * verb that reclaims space after [[compact]]/overwriting appends. Like
    * real Delta vacuum this also sweeps orphans (files from crashed
    * writers that never committed). Time travel to versions that
    * referenced a deleted file stops working — that's the retention
    * tradeoff the caller chooses. Returns the number of files deleted.
    */
  def vacuum(spark: SparkSession, table: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000,
      store: CommitStore = CommitStore.Local): Int = {
    val dir = new File(table)
    val liveAdds = replay(spark, table, None).live
    // dual-format guard (convertFromDelta/convertFromIceberg): a file the
    // ICEBERG plane still references — any snapshot — is not a tombstone,
    // whatever the Delta log thinks of it
    val icebergLive: Set[String] =
      if (Files.exists(Paths.get(table, "metadata", "version-hint.text")))
        IcebergSink.referencedDataFiles(table).flatMap { p =>
          val f = new File(p)
          if (f.getAbsolutePath.startsWith(dir.getAbsolutePath + File.separator))
            Some(dir.toPath.relativize(f.toPath).toString)
          else None
        }
      else Set.empty
    val liveNow = liveAdds.map(_.path).toSet ++ icebergLive
    val cutoff = System.currentTimeMillis() - retentionMs
    val dead = dataFiles(dir).filter { f =>
      val rel = dir.toPath.relativize(f.toPath).toString
      !liveNow.contains(rel) && f.lastModified() < cutoff
    }
    // reclamation travels the store protocol when one is given (a real
    // bucket has no local unlink); empty-prefix cleanup below is a local
    // nicety — object stores have no directories to sweep
    dead.foreach(f => deleteData(store, dir, dir.toPath.relativize(f.toPath).toString))
    // CDC files are never referenced by a snapshot — they age out on the
    // same retention clock (Delta CDF's consume-within-retention contract)
    val deadCdc = Option(new File(dir, "_change_data").listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() < cutoff)
    deadCdc.foreach(f => deleteData(store, dir, dir.toPath.relativize(f.toPath).toString))
    // deletion-vector sidecars: superseded descriptors (a re-delete
    // OR-merged them away, or a rewrite/compact dropped the DV) reclaim
    // on the same clock; live-referenced ones never do
    val liveDvs = liveAdds.flatMap(_.dv.flatMap(dvRelPath(table, _))).toSet
    val deadDv = Option(new File(dir, DvPrefix).listFiles()).toSeq.flatten
      .filter { f =>
        val rel = dir.toPath.relativize(f.toPath).toString
        f.getName.endsWith(".bin") && !liveDvs.contains(rel) &&
          f.lastModified() < cutoff
      }
    deadDv.foreach(f => deleteData(store, dir, dir.toPath.relativize(f.toPath).toString))
    // drop partition dirs emptied by the sweep
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName != "_delta_log" &&
        Option(d.listFiles()).forall(_.isEmpty))
      .foreach(_.delete())
    dead.size + deadCdc.size + deadDv.size
  }

  /** Total rows the live set's deletion vectors mask — the REORG-purge
    * trigger, from descriptors alone (no sidecar opened).
    */
  def dvMaskedRows(spark: SparkSession, table: String): Long =
    replay(spark, table, None).live
      .flatMap(_.dv.map(_.cardinality)).sum

  /** DESCRIBE HISTORY — one row per commit, METADATA-ONLY (the Delta twin
    * of [[IcebergSink.metaTable]]("history")): version, commit timestamp
    * (in-commit timestamp when the commit carries one, else file mtime —
    * same clock as [[versionAtTimestamp]]), and the OPERATION inferred
    * from the commit's action shape. Outside ICT stamps this engine
    * writes no commitInfo action, so the names are honest shape classes,
    * each unambiguous for the verbs this engine commits:
    * CREATE (metaData at v0) / METADATA (metaData later — constraints,
    * column mapping, schema evolution) / PROTOCOL (protocol-only) /
    * APPEND (adds only) / STREAMING (adds + txn watermark) /
    * MERGE_ON_READ (adds carrying deletion vectors) / OPTIMIZE
    * (removes + adds, dataChange=false — compact/reorg/clone shapes) /
    * REWRITE (removes + adds, dataChange=true — CoW delete/update/merge) /
    * DELETE (removes only). Runs as one distributed pass over the log
    * tail; the ops dashboard query at any table size.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val files = logFiles(table)
    require(files.nonEmpty, s"not a Delta table (no _delta_log): $table")
    import spark.implicits._
    val mtimes = files
      .map(f => (f.getName.stripSuffix(".json").toLong,
        ictOfFile(f).getOrElse(f.lastModified()))) // ICT when present
      .toDF("version", "timestamp_ms")
    val acts = actionsDF(spark, files)
      .groupBy("version")
      .agg(
        count(col("add")).as("n_added"),
        count(col("remove")).as("n_removed"),
        max(col("metaData").isNotNull).as("has_meta"),
        max(col("protocol").isNotNull).as("has_protocol"),
        max(col("txn").isNotNull).as("has_txn"),
        max(col("add.deletionVector").isNotNull).as("has_dv"),
        min(coalesce(col("add.dataChange"), lit(true)) &&
          coalesce(col("remove.dataChange"), lit(true))).as("data_change"))
    acts.join(broadcast(mtimes), Seq("version"))
      .select(col("version"), col("timestamp_ms"),
        when(col("has_meta") && col("version") === 0, "CREATE")
          .when(col("has_meta"), "METADATA")
          .when(col("n_added") > 0 && col("has_dv"), "MERGE_ON_READ")
          .when(col("n_added") > 0 && col("n_removed") > 0 && !col("data_change"),
            "OPTIMIZE")
          .when(col("n_added") > 0 && col("n_removed") > 0, "REWRITE")
          .when(col("n_added") > 0 && col("has_txn"), "STREAMING")
          .when(col("n_added") > 0, "APPEND")
          .when(col("n_removed") > 0, "DELETE")
          .otherwise("PROTOCOL").as("operation"),
        col("n_added"), col("n_removed"))
      .orderBy("version")
  }

  /** Declared schema of a Delta table (no data scan). */
  def tableSchema(spark: SparkSession, table: String): StructType =
    resolve(spark, table, None)._1.schema

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

  /** Reads a Delta table by replaying the `_delta_log`: from the newest
    * parquet checkpoint at or below the target version (if any), then the
    * JSON commits after it — add actions accumulate, removes retract.
    * `asOfVersion` stops the replay at that commit — snapshot time travel
    * over the same log.
    */
  def read(spark: SparkSession, table: String, asOfVersion: Option[Long] = None,
      store: CommitStore = CommitStore.Local): DataFrame =
    readState(spark, table, replay(spark, table, asOfVersion), store)

  /** TIMESTAMP → VERSION resolution (delta-spark's `timestampAsOf`):
    * the LAST version committed at or before `tsMs`. Per-commit clock:
    * the commit's in-commit timestamp when it carries one
    * ([[enableInCommitTimestamps]] — the durable clock that survives a
    * log copy/rsync/touch), else the commit file's modification time —
    * the spec's pre-ICT rule (each mtime is its atomic-rename instant,
    * commit-ordered on one filesystem clock). On a table enabled
    * mid-history this is exactly the spec's split: ICT from the
    * enablement version on, mtime before it. Before the first commit →
    * error, mirroring delta-spark.
    */
  def versionAtTimestamp(table: String, tsMs: Long): Long = {
    val clocks = logFiles(table)
      .map(f => (f.getName.stripSuffix(".json").toLong,
        ictOfFile(f), f.lastModified()))
      .sortBy(_._1)
    // the ICT region starts at the enablement commit (the first to carry
    // one) and is SELF-CONTAINED: a target inside it resolves by ICT
    // alone, so copy-mangled mtimes on older commits cannot corrupt it
    val ictRegion = clocks.dropWhile(_._2.isEmpty)
    val resolved =
      if (ictRegion.nonEmpty && ictRegion.head._2.exists(_ <= tsMs))
        ictRegion.takeWhile(_._2.exists(_ <= tsMs)).lastOption.map(_._1)
      else
        clocks.takeWhile(c => c._2.isEmpty && c._3 <= tsMs).lastOption.map(_._1)
    require(resolved.isDefined,
      s"no commit at or before timestamp $tsMs in $table")
    resolved.get
  }

  /** Time travel by TIMESTAMP — the audit-friendly twin of the version
    * read ("what did the table serve at 09:00").
    */
  def readAsOfTimestamp(spark: SparkSession, table: String, tsMs: Long,
      store: CommitStore = CommitStore.Local): DataFrame =
    read(spark, table, Some(versionAtTimestamp(table, tsMs)), store)

  /** Stats-based FILE SKIPPING read: only files whose recorded
    * [min, max] range for `column` overlaps [lo, hi] enter the scan —
    * the read-side payoff of the per-file stats every add action records
    * and of OPTIMIZE ZORDER's clustering (tight per-file ranges ⇒ most
    * files skipped). At 100 TB this is the difference between opening
    * every file and opening the few that can match.
    *
    * The pruning predicate runs DISTRIBUTEDLY over the live-set DataFrame
    * (stats parsed with `from_json`, the same last-wins resolution as any
    * read). Files without recorded stats for the column are always kept —
    * absent stats can never wrongly prune. Supported domains: numerics
    * (compared as double), strings (verbatim), dates (ISO text). The
    * result is a files-level superset of the matching rows: apply the
    * exact row filter on top, which Spark then also pushes into the
    * surviving files' row groups.
    */
  def readRange(spark: SparkSession, table: String, column: String,
      lo: String, hi: String, asOfVersion: Option[Long] = None): DataFrame =
    readRanges(spark, table, Seq((column, lo, hi)), asOfVersion)

  /** MULTI-COLUMN [[readRange]] — the clustered-table read path: a file
    * survives only when EVERY column's recorded [min, max] overlaps its
    * bound (bounds AND together; one stats parse serves all columns). On
    * a [[clusterBy]]'d table OPTIMIZE interleaves the declared columns
    * (Z-order), so a slice over any prefix/subset of them keeps tight
    * per-file ranges on each — the multi-dimensional skipping liquid
    * clustering exists for.
    */
  def readRanges(spark: SparkSession, table: String,
      bounds: Seq[(String, String, String)],
      asOfVersion: Option[Long] = None): DataFrame = {
    val (meta, live) = resolve(spark, table, asOfVersion)
    readState(spark, table,
      State(meta.version, meta.id, meta.createdTime, meta.schema, meta.partitionColumns,
        collectAdds(statsPruned(meta, live, bounds)), meta.txns))
  }

  /** METADATA-ONLY file inventory of a snapshot: one row per live data
    * file — (path, partitionValues, num_records, size_bytes) — derived
    * entirely from the `_delta_log` (the numRecords stats every add action
    * records; reference delta_destination.rs writer stats). No data file
    * is opened: per-partition/table COUNT(*) and file-layout audits
    * ("DESCRIBE DETAIL"-shape questions) answer from KBs of log instead
    * of a 100 TB scan. Runs distributedly over the live-set DataFrame.
    */
  def fileStats(spark: SparkSession, table: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    val (_, live) = resolve(spark, table, asOfVersion)
    val statsSchema = StructType(Seq(StructField("numRecords", LongType)))
    // a DV'd file's stats count the PHYSICAL rows; the descriptor's
    // cardinality subtracts the deleted ones without opening anything —
    // exactly what the cardinality field exists for
    live.select(col("path"), col("partitionValues"),
      (from_json(col("stats"), statsSchema).getField("numRecords") -
        org.apache.spark.sql.functions.coalesce(
          col("deletionVector.cardinality"),
          org.apache.spark.sql.functions.lit(0L)))
        .as("num_records"),
      col("size").as("size_bytes"))
  }

  /** The adds of `live` whose recorded [min, max] for `column` overlaps
    * [lo, hi] — plus any file without stats for it (absent stats can never
    * wrongly prune). Runs distributedly over the live-set DataFrame.
    */
  private def statsPruned(meta: MetaState, live: DataFrame, column: String,
      lo: String, hi: String): DataFrame =
    statsPruned(meta, live, Seq((column, lo, hi)))

  /** Multi-column variant: a file survives only when EVERY column's
    * recorded range overlaps its bound (bounds AND together — the r8
    * advice fix: a composite-key merge pruning only on `keys.head` scans
    * every file overlapping the first key's range even when a second key
    * rules it out). One stats parse serves all columns.
    */
  private def statsPruned(meta: MetaState, live: DataFrame,
      bounds: Seq[(String, String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json, lit}
    val statsSchema = StructType(Seq(
      StructField("numRecords", LongType),
      StructField("minValues", MapType(StringType, StringType)),
      StructField("maxValues", MapType(StringType, StringType))))
    val parsed = live.withColumn("__st", from_json(col("stats"), statsSchema))
    val keep = bounds.map { case (column, lo, hi) =>
      val dt = meta.schema(column).dataType
      // stats come from the file footers, which carry PHYSICAL names
      val phys = physName(meta.schema(column))
      val mn = col("__st.minValues")(phys)
      val mx = col("__st.maxValues")(phys)
      val overlaps = dt match {
        case _: NumericType =>
          mx.cast("double") >= lit(lo).cast("double") &&
            mn.cast("double") <= lit(hi).cast("double")
        case StringType | DateType =>
          mx >= lit(lo) && mn <= lit(hi)
        case _ => lit(true) // domain without a recorded ordering: no pruning
      }
      mn.isNull || mx.isNull || overlaps
    }.reduce(_ && _)
    parsed.filter(keep)
      .select("path", "partitionValues", "size", "modificationTime", "stats",
        "deletionVector", "baseRowId", "defaultRowCommitVersion")
  }

  /** Change feed: the rows ADDED in versions (`sinceVersion`, latest] —
    * what an incremental consumer processes after its last checkpoint.
    * Only `dataChange=true` adds count: compaction rewrites the same rows
    * into new files with `dataChange=false`, and a feed that re-emitted
    * them would double-process every OPTIMIZE. Conversely, a file
    * tombstoned by a later compaction still belongs to the feed — it stays
    * on disk until [[vacuum]], which is why feeds must be consumed within
    * the vacuum retention window (the same contract as Delta CDF).
    * Returns rows in the table's declared schema.
    */
  def readChangesSince(spark: SparkSession, table: String, sinceVersion: Long): DataFrame =
    readChangesBetween(spark, table, sinceVersion, Long.MaxValue)

  /** [[readChangesSince]] with an inclusive upper version bound — the form
    * a streaming consumer needs: the rows of versions (since, until] and
    * nothing newer, so a commit racing the offset read can't leak into the
    * batch and duplicate on the next one.
    */
  def readChangesBetween(spark: SparkSession, table: String, sinceVersion: Long,
      untilVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, max_by, struct}
    val state = replay(spark, table, None)
    val files = logFiles(table)
      .filter { f =>
        val v = f.getName.stripSuffix(".json").toLong
        v > sinceVersion && v <= untilVersion
      }
    if (files.isEmpty) return readState(spark, table, state.copy(live = Nil))
    val feed = actionsDF(spark, files)
      .where(col("add").isNotNull &&
        (col("add.dataChange").isNull || col("add.dataChange")))
      .groupBy(col("add.path").as("path"))
      .agg(max_by(struct(col("add.partitionValues").as("partitionValues"),
        col("add.size").as("size"),
        col("add.modificationTime").as("modificationTime"),
        col("add.stats").as("stats"),
        col("add.deletionVector").as("deletionVector"),
        col("add.baseRowId").as("baseRowId"),
        col("add.defaultRowCommitVersion").as("defaultRowCommitVersion")),
        col("version")).as("w"))
      .select(col("path"), col("w.*"))
    readState(spark, table, state.copy(live = collectAdds(feed)))
  }

  /** Change-data feed with row-level classification — the CDF surface a
    * merge-aware incremental consumer reads. Returns the rows changed in
    * versions (`sinceVersion`, `untilVersion`] with the standard
    * `_change_type` column (insert / update_preimage / update_postimage /
    * delete) plus `_commit_version`. A commit carrying cdc actions (a
    * MERGE with the feed on) contributes EXACTLY its change files — the
    * images [[merge]] computed and wrote at merge time, so the feed never
    * re-diffs the rewrite. Other dataChange commits reconstruct from the
    * log at file granularity: adds emit their rows as insert, removes as
    * delete (an append is pure inserts; a restore's re-adds and removes
    * are genuine inserts/deletes to a consumer); dataChange=false
    * rewrites (OPTIMIZE) emit nothing, same as [[readChangesBetween]].
    * Cost scales with the CHANGED files of the range, never the table;
    * tombstoned and CDC files must still be on disk — the same
    * consume-within-retention contract as the plain feed and [[vacuum]].
    */
  def readCdf(spark: SparkSession, table: String, sinceVersion: Long,
      untilVersion: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val state = replay(spark, table, None)
    val ctField = StructField("_change_type", StringType)
    val outSchema = StructType(state.schema.fields :+ ctField :+
      StructField("_commit_version", LongType))
    val versions = logFiles(table)
      .map(_.getName.stripSuffix(".json").toLong)
      .filter(v => v > sinceVersion && v <= untilVersion).sorted
    val frames = versions.flatMap { v =>
      // one commit's action list = the files THAT commit touched —
      // metadata-scale, driver-parsed like every other log-plane read
      val lines = Files.readAllLines(versionFile(table, v)).asScala
        .map(mapper.readTree).toSeq
      val cdc = lines.flatMap(n => Option(n.get("cdc"))).map(_.get("path").asText())
      if (cdc.nonEmpty) {
        // cdc files carry PHYSICAL column names under column mapping
        import org.apache.spark.sql.functions.col
        Seq(spark.read
          .schema(StructType(physicalSchema(state.schema).fields :+ ctField))
          .parquet(cdc.map(p => new File(table, p).getAbsolutePath): _*)
          .select(state.schema.fields.toIndexedSeq.map(f =>
            col(physName(f)).as(f.name)) :+ col("_change_type"): _*)
          .withColumn("_commit_version", lit(v)))
      } else {
        def pathsOf(key: String) = lines.flatMap(n => Option(n.get(key)))
          .filter(n => Option(n.get("dataChange")).forall(_.asBoolean(true)))
          .map { n =>
            // honor a DV on the reconstructed add: its insert images are
            // the SURVIVORS, never the deleted rows
            val dv = Option(n.get("deletionVector")).map(d =>
              DvInfo(Option(d.get("storageType")).map(_.asText()).getOrElse("p"),
                d.get("pathOrInlineDv").asText(),
                Option(d.get("offset")).map(_.asInt()),
                d.get("sizeInBytes").asLong(), d.get("cardinality").asLong()))
            AddEntry(n.get("path").asText(), Map.empty, 0L, 0L, null, dv)
          }
        val adds0 = pathsOf("add")
        val removes0 = pathsOf("remove")
        // the predecessor state's descriptors feed two reconstructions: a
        // REMOVED file may have carried a DV at remove time (its delete
        // images are that DV's survivors), and a RE-ADDED path whose DV
        // changed is a feed-off DV delete/update — the newly masked rows
        // are genuine 'delete' images, the newly unmasked ones (a restore
        // shrinking a DV) genuine 'insert's; without the diff, replaying
        // the feed would reconstruct the deleted rows as still alive
        // computed only when the commit carries a signal that needs it
        // (removes, or an add with a descriptor) — a plain append never
        // pays the extra replay; a restore re-add WITHOUT a descriptor
        // stays at the documented file-granularity reconstruction
        val prevDv: Map[String, Option[DvInfo]] =
          if (v == 0 || (removes0.isEmpty && adds0.forall(_.dv.isEmpty))) Map.empty
          else replay(spark, table, Some(v - 1)).live
            .map(a => a.path -> a.dv).toMap
        val removes = removes0.map(r =>
          r.copy(dv = prevDv.getOrElse(r.path, None)))
        val (reAdds, newAdds) = adds0.partition(a => prevDv.contains(a.path))
        // per re-added file: rows masked by (new \ old) → delete images,
        // rows unmasked by (old \ new) → insert images; the probe is the
        // same packed-bitmap expression the merged read plants, here
        // filtering FOR membership in the diff
        def bitmapOf(dv: Option[DvInfo]) = dv match {
          case Some(d) => graft.functions.DeletionVector.deserialize(
            dvBitmapBytes(table, d, CommitStore.Local))
          case None => new org.roaringbitmap.longlong.Roaring64Bitmap()
        }
        def dualKeys(path: String): Seq[String] = {
          val abs = dataAbs(table, path)
          val enc = new File(abs).toURI.toString
            .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
          Seq(abs, enc).distinct
        }
        // each re-added file's (new, old) bitmap pair loads ONCE and feeds
        // both diff directions; the two change-type frames then share one
        // lineage scan of the re-added files
        def andNot(a: org.roaringbitmap.longlong.Roaring64Bitmap,
            b: org.roaringbitmap.longlong.Roaring64Bitmap) = {
          val r = a.clone().asInstanceOf[org.roaringbitmap.longlong.Roaring64Bitmap]
          r.andNot(b); r
        }
        val dvPairs = reAdds.map(a => (a, bitmapOf(a.dv), bitmapOf(prevDv(a.path))))
        def diffMapOf(pick: (org.roaringbitmap.longlong.Roaring64Bitmap,
            org.roaringbitmap.longlong.Roaring64Bitmap) =>
            org.roaringbitmap.longlong.Roaring64Bitmap): Map[String, Array[Byte]] =
          dvPairs.flatMap { case (a, nw, old) =>
            val diff = pick(nw, old)
            if (diff.isEmpty) Nil
            else {
              val bytes = graft.functions.DeletionVector.serialize(diff)
              dualKeys(a.path).map(_ -> bytes)
            }
          }.toMap
        val delMap = diffMapOf((nw, old) => andNot(nw, old))
        val insMap = diffMapOf((nw, old) => andNot(old, nw))
        lazy val diffBase = readStateFiles(spark, table,
          state.copy(live = reAdds.map(_.copy(dv = None))), withLineage = true)
        def diffFrames(ct: String, diffMap: Map[String, Array[Byte]]): Seq[DataFrame] =
          if (diffMap.isEmpty) Nil
          else {
            import org.apache.spark.sql.functions.regexp_replace
            val packed = graft.functions.DeletionVector.packMap(diffMap)
            Seq(diffBase.filter(graft.functions.DeletionVector.dvDeleted(packed,
                regexp_replace(col("_gf_uri"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"),
                col("_gf_pos")))
              .select(state.schema.fieldNames.toIndexedSeq.map(col): _*)
              .withColumn("_change_type", lit(ct)))
          }
        val dvDeletes = diffFrames("delete", delMap)
        val dvInserts = diffFrames("insert", insMap)
        val ins =
          if (newAdds.isEmpty) Nil
          else Seq(readState(spark, table, state.copy(live = newAdds))
            .withColumn("_change_type", lit("insert")))
        val del =
          if (removes.isEmpty) Nil
          else Seq(readState(spark, table, state.copy(live = removes))
            .withColumn("_change_type", lit("delete")))
        (ins ++ del ++ dvDeletes ++ dvInserts)
          .map(_.withColumn("_commit_version", lit(v)))
      }
    }
    if (frames.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), outSchema)
    else frames.reduce(_.unionByName(_))
  }

  private def readState(spark: SparkSession, table: String, state: State,
      store: CommitStore = CommitStore.Local): DataFrame =
    readStateMerged(spark, table, state, keepLineage = false, store)

  /** Past this packed-map size the DV probe ships as a BROADCAST instead
    * of a plan literal: a literal serializes into EVERY task binary (at
    * 10k tasks a 16 MB map is 160 GB of task bytes), a broadcast once per
    * executor. Under it the literal wins — no broadcast bookkeeping, and
    * the map rides plan caching. (var: PlanSpec lowers it to drive the
    * broadcast path with test-sized bitmaps.)
    */
  private[graft] var DvLiteralMaxBytes: Int = 8 * 1024 * 1024

  /** Total DV bytes (by descriptor sizeInBytes — decided WITHOUT reading
    * a byte) past which the merged read stops materializing bitmaps on
    * the driver and applies deletes as a distributed anti-join (tasks
    * read vectors via TaskIO and explode positions). Broadcast carries
    * comfortably to a few hundred MB; beyond that the join is the
    * honest plan. Test override via the var.
    */
  private[graft] var DvBroadcastMaxBytes: Long = 256L * 1024 * 1024

  /** Content-keyed reuse cache for over-threshold DV broadcasts: without
    * it every read of a large-DV snapshot would mint a fresh multi-MB
    * broadcast at PLAN-BUILD time (several per DML verb) and rely on the
    * driver GC + ContextCleaner to reap them eventually. Eviction
    * unpersists (executors drop the blocks; a straggler plan re-fetches
    * from the driver, so an evicted-but-still-referenced broadcast stays
    * usable — destroy() would fail it).
    */
  private val dvBroadcasts =
    new java.util.LinkedHashMap[String,
        org.apache.spark.broadcast.Broadcast[Array[Byte]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String,
            org.apache.spark.broadcast.Broadcast[Array[Byte]]]): Boolean = {
        val evict = size() > 8
        if (evict) scala.util.Try(e.getValue.unpersist())
        evict
      }
    }

  private def dvBroadcast(spark: SparkSession, packed: Array[Byte])
      : org.apache.spark.broadcast.Broadcast[Array[Byte]] =
    dvBroadcasts.synchronized {
      val key = java.security.MessageDigest.getInstance("SHA-256")
        .digest(packed).map("%02x".format(_)).mkString
      Option(dvBroadcasts.get(key)).getOrElse {
        val bc = spark.sparkContext.broadcast(packed)
        dvBroadcasts.put(key, bc)
        bc
      }
    }

  /** The MERGED view of a snapshot: the live files' rows minus what their
    * deletion vectors erase. Zero overhead when no live add carries a DV
    * (the plain scan is returned untouched — no lineage columns read, no
    * filter planted). With DVs, every row's (file, row_index) — free from
    * the parquet reader's `_metadata` struct — probes ONE native
    * expression holding the bitmaps of exactly THIS state's files (a
    * stats-pruned readRange packs only the survivors' DVs — KBs–MBs
    * riding the plan as a literal; roaring compresses runs; past
    * [[DvLiteralMaxBytes]] the map ships as a broadcast instead): never a
    * join, never a shuffle, cost O(1) per row. `keepLineage` keeps
    * `_gf_uri`/`_gf_pos` for [[deleteWhereDV]]'s provenance.
    */
  private def readStateMerged(spark: SparkSession, table: String,
      state: State, keepLineage: Boolean,
      store: CommitStore = CommitStore.Local): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val dvAdds = state.live.filter(_.dv.isDefined)
    if (dvAdds.isEmpty && !keepLineage)
      return readStateFiles(spark, table, state, withLineage = false)
    val base = readStateFiles(spark, table, state, withLineage = true)
    val merged =
      if (dvAdds.isEmpty) base
      else {
        val key = regexp_replace(col("_gf_uri"),
          "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
        // tier decision from DESCRIPTOR metadata (sizeInBytes) — the
        // driver must not read a byte before knowing whether it may
        val estimate = dvAdds.map(_.dv.get.sizeInBytes).sum
        val taskIO = store.taskIO
        if (estimate > DvBroadcastMaxBytes && taskIO.isDefined) {
          // THIRD TIER (r16, the read-side twin of the sharded DV write):
          // past broadcast scale the driver never materializes bitmap
          // bytes — descriptors parallelize to tasks, each task reads its
          // files' vectors via TaskIO and EXPLODES them to (key, pos)
          // rows, and the deletes apply as a shuffled ANTI-JOIN. Work is
          // O(deleted rows) — the honest trade once the vectors of
          // ~10^5-10^6 files outgrow a plan literal or broadcast.
          import spark.implicits._
          val io = taskIO.get
          val descs: Seq[(Seq[String], DvInfo)] = dvAdds.map { a =>
            val abs = dataAbs(table, a.path)
            val enc = new File(abs).toURI.toString
              .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
            (Seq(abs, enc).distinct, a.dv.get)
          }
          val shards = math.max(1, math.min(descs.size,
            spark.sessionState.conf.numShufflePartitions))
          val tableRef = table
          val delRows = spark.sparkContext
            .parallelize(descs, shards)
            .flatMap { case (keys, dv) =>
              val bm = graft.functions.DeletionVector.deserialize(
                dvBitmapBytesVia(tableRef, dv, io.read))
              val it = bm.getLongIterator
              val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
              while (it.hasNext) { val p = it.next(); keys.foreach(k => out += ((k, p))) }
              out
            }.toDF("_gfd_key", "_gfd_pos")
          base.join(delRows,
            key === col("_gfd_key") && col("_gf_pos") === col("_gfd_pos"),
            "left_anti")
        } else {
          // dual-key map (raw absolute path + URI-encoded rendering), same
          // discipline as the Iceberg side: `_metadata.file_path` may
          // percent-encode characters the add path stores raw
          val dvMap = dvAdds.flatMap { a =>
            val abs = dataAbs(table, a.path)
            val bytes = dvBitmapBytes(table, a.dv.get, store)
            val enc = new File(abs).toURI.toString
              .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
            Seq(abs, enc).distinct.map(_ -> bytes)
          }.toMap
          val packed = graft.functions.DeletionVector.packMap(dvMap)
          val probe =
            if (packed.length <= DvLiteralMaxBytes)
              graft.functions.DeletionVector.dvDeleted(packed, key, col("_gf_pos"))
            else graft.functions.DeletionVector.dvDeletedBroadcast(
              dvBroadcast(spark, packed), key, col("_gf_pos"))
          base.filter(!probe)
        }
      }
    if (keepLineage) merged
    else merged.select(state.schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  private def readStateFiles(spark: SparkSession, table: String, state: State,
      withLineage: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    val lineageCols = Seq(col("_metadata.file_path").as("_gf_uri"),
      col("_metadata.row_index").as("_gf_pos"))
    val paths = state.live.map(a => dataAbs(table, a.path))
    if (paths.isEmpty) {
      val lineageFields =
        if (!withLineage) Array.empty[StructField]
        else Array(StructField("_gf_uri", StringType),
          StructField("_gf_pos", LongType))
      spark.createDataFrame(new java.util.ArrayList[Row](),
        StructType(state.schema.fields ++ lineageFields))
    } else if (state.partitionColumns.isEmpty) {
      // data files carry PHYSICAL column names (= logical until a
      // rename/drop enables column mapping); project back to logical
      val base = spark.read.schema(physicalSchema(state.schema)).parquet(paths: _*)
      val cols = state.schema.fields.toIndexedSeq.map(f =>
        col(physName(f)).as(f.name)) ++ (if (withLineage) lineageCols else Nil)
      if (!mappingEnabled(state.schema) && !withLineage) base
      else base.select(cols: _*)
    } else if (state.live.forall(_.path.startsWith(
        state.partitionColumns.head + "="))) {
      // Hive-style dirs + basePath: Spark's partition discovery restores the
      // partition columns (typed per the declared schema) and Catalyst
      // partition-prunes on them; select() pins the declared column order.
      // Partition columns refuse rename/drop, so their physical names are
      // their logical ones and directory discovery is mapping-agnostic.
      spark.read.schema(physicalSchema(state.schema)).option("basePath", table)
        .parquet(paths: _*)
        .select(state.schema.fields.toIndexedSeq.map(f =>
          col(physName(f)).as(f.name)) ++
          (if (withLineage) lineageCols else Nil): _*)
    } else {
      // NON-standard layout (a convertFromIceberg table, whose files sit
      // under data/stage-*/col=v/): directory discovery would choke on the
      // mixed depths, so partition values come from the LOG's
      // add.partitionValues — the spec's actual source of truth — injected
      // as typed literals per value group. One scan per distinct partition
      // tuple, same shape as the Iceberg reader's readEntries.
      import org.apache.spark.sql.functions.lit
      val dataSchema = StructType(physicalSchema(state.schema).fields
        .filterNot(f => state.partitionColumns.contains(f.name)))
      state.live.groupBy(_.partitionValues).toSeq.map { case (pv, adds) =>
        val base = spark.read.schema(dataSchema)
          .parquet(adds.map(a => dataAbs(table, a.path)): _*)
        val cols = state.schema.fields.toIndexedSeq.map { f =>
          if (state.partitionColumns.contains(f.name))
            lit(pv.getOrElse(f.name, null)).cast(f.dataType).as(f.name)
          else col(physName(f)).as(f.name)
        } ++ (if (withLineage) lineageCols else Nil)
        base.select(cols: _*)
      }.reduce(_.unionAll(_))
    }
  }

  /** Driver-held metadata plane of a snapshot: version, schema, layout,
    * txn watermarks — a handful of values regardless of table size.
    */
  private case class MetaState(version: Long, id: String, createdTime: Long,
      schema: StructType, partitionColumns: Seq[String], txns: Map[String, Long],
      minReader: Int = 1, minWriter: Int = 1,
      readerFeatures: Seq[String] = Nil, writerFeatures: Seq[String] = Nil,
      configuration: Map[String, String] = Map.empty,
      domains: Map[String, String] = Map.empty)

  /** JSON commit actions, as a Spark schema: what [[actionsDF]] extracts
    * from the log tail. PERMISSIVE json read turns a protocol line into
    * all-null columns — filtered out downstream, never an error.
    */
  private val JsonActionSchema = StructType(Seq(
    StructField("protocol", CheckpointSchema("protocol").dataType),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("createdTime", LongType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))),
    StructField("add", CheckpointSchema("add").dataType),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("dataChange", BooleanType)))),
    StructField("txn", CheckpointSchema("txn").dataType),
    StructField("domainMetadata", CheckpointSchema("domainMetadata").dataType)))

  /** The given commit files as a DataFrame of actions tagged with their
    * commit version — log replay as a Spark job instead of a driver loop.
    */
  private def actionsDF(spark: SparkSession, files: Seq[File]): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name, regexp_extract}
    // FAILFAST: a truncated/garbled commit line must abort the replay (the
    // driver-side parser's old behavior) — PERMISSIVE would turn it into
    // an all-null row that the action filters silently drop, and the adds
    // it carried would vanish from every reader without an error.
    spark.read.schema(JsonActionSchema).option("mode", "FAILFAST")
      .json(files.map(_.getPath): _*)
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
  }

  /** Resolves a snapshot: the tiny metadata plane on the driver, the live
    * add-set as a DataFrame computed DISTRIBUTEDLY — checkpoint adds union
    * the JSON tail's add/remove actions, last action per path wins
    * (`max_by` commit version). The driver never parses or holds the add
    * list; at millions of live files a driver-side replay is the classic
    * OOM that delta-spark's Snapshot machinery avoids the same way.
    * Returned live columns: path, partitionValues, size, modificationTime,
    * stats.
    */
  /** Tail-bytes ceiling for the driver-side fast replay in [[resolve]].
    * Above it (or with any checkpoint present) the snapshot replays
    * distributedly. 8 MiB of JSON tail is ~10⁴ add actions — far past the
    * point where two Spark job round-trips amortize; overridable for
    * experiments via -Dgraft.delta.fastReplayMaxBytes.
    */
  private def FastReplayMaxBytes: Long =
    sys.props.get("graft.delta.fastReplayMaxBytes").map(_.toLong)
      .getOrElse(8L << 20)

  /** The live-set columns [[resolve]] returns, as an explicit schema (the
    * driver fast path builds a local relation of exactly this shape).
    */
  private lazy val LiveSetSchema: StructType = {
    val add = CheckpointSchema("add").dataType.asInstanceOf[StructType]
    StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", add("partitionValues").dataType),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("stats", StringType),
      StructField("deletionVector", add("deletionVector").dataType),
      StructField("baseRowId", LongType),
      StructField("defaultRowCommitVersion", LongType)))
  }

  /** Thrown by [[DriverReplay.finish]]'s protocol/feature gates — the ONE
    * failure class the fast-replay fallback must rethrow instead of
    * falling back to the distributed replay (which might "succeed" by
    * mis-reading a table whose protocol it doesn't implement). Subclasses
    * IllegalArgumentException so existing require-style callers/tests see
    * the same contract.
    */
  private final class ProtocolGateException(msg: String)
    extends IllegalArgumentException(msg)

  /** Mutable state of a DRIVER-SIDE snapshot replay, shared by the
    * tail-only fast path ([[resolveTailOnDriver]]) and the small-checkpoint
    * fast path ([[resolveCheckpointOnDriver]]). Apply order matches the
    * distributed replay exactly: checkpoint base state first (its adds are
    * all live; its metadata plane rows replace/extend), then the JSON tail
    * in (version, line) order — the per-path max_by(version) + isAdd
    * reconciliation as a hash map, with line order inside one commit as
    * the deterministic tiebreak.
    */
  private final class DriverReplay {
    import com.fasterxml.jackson.databind.JsonNode
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Nil
    var tableId: String = null
    var createdTime = 0L
    val txns = scala.collection.mutable.Map.empty[String, Long]
    var tableConfig: Map[String, String] = Map.empty
    var minReader = 1
    var minWriter = 1
    var readerFeatures: Seq[String] = Nil
    var writerFeatures: Seq[String] = Nil
    val domains = scala.collection.mutable.Map.empty[String, String]
    // last action per path in (version, line) order: Some(row) = live add
    val lastAction = scala.collection.mutable.LinkedHashMap.empty[String, Option[Row]]

    private def field(n: JsonNode, f: String): Option[JsonNode] =
      Option(n.get(f)).filterNot(_.isNull)
    private def txt(n: JsonNode, f: String): String =
      field(n, f).map(_.asText).orNull
    private def lng(n: JsonNode, f: String): java.lang.Long =
      field(n, f).map(v => java.lang.Long.valueOf(v.asLong)).orNull
    private def strSeq(n: JsonNode, f: String): Option[Seq[String]] =
      field(n, f).map(_.elements().asScala.map(_.asText).toSeq)
    private def strMap(n: JsonNode, f: String): Option[Map[String, String]] =
      field(n, f).map(_.properties().asScala
        .map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText))
        .toMap)

    /** Applies the commit JSON tail in (version, line) order. A malformed
      * line throws (the distributed path's FAILFAST contract).
      */
    def applyTail(tail: Seq[File]): Unit = {
      for (file <- tail; line <- Files.readAllLines(file.toPath).asScala
           if line.trim.nonEmpty) {
        val n = mapper.readTree(line) // malformed line throws, like FAILFAST
        field(n, "metaData").foreach { m =>
          schema = Some(DataType.fromJson(txt(m, "schemaString")).asInstanceOf[StructType])
          partCols = strSeq(m, "partitionColumns").getOrElse(Nil)
          val id = txt(m, "id")
          if (id != null) tableId = id
          tableConfig = strMap(m, "configuration").getOrElse(Map.empty)
          val created = lng(m, "createdTime")
          if (createdTime == 0L && created != null) createdTime = created.longValue()
        }
        field(n, "protocol").foreach { p =>
          field(p, "minReaderVersion").foreach(v => minReader = math.max(minReader, v.asInt))
          field(p, "minWriterVersion").foreach(v => minWriter = math.max(minWriter, v.asInt))
          strSeq(p, "readerFeatures").foreach(readerFeatures = _)
          strSeq(p, "writerFeatures").foreach(writerFeatures = _)
        }
        field(n, "txn").foreach { t =>
          val app = txt(t, "appId")
          val v = lng(t, "version").longValue()
          if (txns.get(app).forall(_ < v)) txns += app -> v
        }
        field(n, "domainMetadata").foreach { d =>
          val name = txt(d, "domain")
          if (name != null) {
            if (field(d, "removed").exists(_.asBoolean)) domains -= name
            else domains += name -> txt(d, "configuration")
          }
        }
        field(n, "add").foreach { a =>
          val dv = field(a, "deletionVector").map { d =>
            Row(txt(d, "storageType"), txt(d, "pathOrInlineDv"),
              field(d, "offset").map(v => java.lang.Integer.valueOf(v.asInt)).orNull,
              lng(d, "sizeInBytes"), lng(d, "cardinality"))
          }.orNull
          lastAction(txt(a, "path")) = Some(Row(
            txt(a, "path"), strMap(a, "partitionValues").orNull,
            lng(a, "size"), lng(a, "modificationTime"), txt(a, "stats"), dv,
            lng(a, "baseRowId"), lng(a, "defaultRowCommitVersion")))
        }
        field(n, "remove").foreach(r => lastAction(txt(r, "path")) = None)
      }
    }

    /** Protocol gates + [[MetaState]] + the live set as a LOCAL relation of
      * [[LiveSetSchema]], so every consumer (collectAdds, checkpoint
      * writers, scans) is unchanged.
      */
    def finish(spark: SparkSession, table: String, version: Long)
        : (MetaState, DataFrame) = {
      require(schema.isDefined, s"Delta log has no metaData action: $table")
      if (tableId == null)
        tableId = java.util.UUID.nameUUIDFromBytes(
          logDir(table).toAbsolutePath.normalize.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
      // Protocol/feature refusals throw the DEDICATED gate type (r19
      // ADVICE): the caller's fallback-to-distributed catch must rethrow
      // exactly these — a parse-shaped IllegalArgumentException
      // (NumberFormatException, DataType.fromJson, the schema require
      // above) is a parse surprise and must FALL BACK to the
      // authoritative distributed replay, which re-applies the same gates.
      if (minReader > 3) throw new ProtocolGateException(
        s"unsupported Delta protocol: table requires reader version $minReader, " +
          "this engine supports up to 3 (deletion vectors)")
      val unknownReader = readerFeatures.toSet -- SupportedReaderFeatures
      if (unknownReader.nonEmpty) throw new ProtocolGateException(
        s"unsupported Delta reader feature(s) ${unknownReader.toSeq.sorted.mkString(", ")}: " +
          s"this engine implements ${SupportedReaderFeatures.toSeq.sorted.mkString(", ")}")
      val liveRows = lastAction.valuesIterator.flatten.toSeq
      (MetaState(version, tableId, createdTime, schema.get, partCols, txns.toMap,
        minReader, minWriter, readerFeatures, writerFeatures, tableConfig,
        domains.toMap),
        spark.createDataFrame(liveRows.asJava, LiveSetSchema))
    }
  }

  /** Driver-side replay of a TAIL-ONLY snapshot (no checkpoint, small
    * tail) — see [[DriverReplay]].
    */
  private def resolveTailOnDriver(spark: SparkSession, table: String,
      tail: Seq[File]): (MetaState, DataFrame) = {
    val r = new DriverReplay
    r.applyTail(tail)
    r.finish(spark, table, tail.last.getName.stripSuffix(".json").toLong)
  }

  /** Null-safe field access over parquet [[org.apache.parquet.example.data.Group]]
    * rows, for the driver-side checkpoint read. List/map accessors resolve
    * the repeated inner group's NAME from the file schema, so both the
    * standard layout (list/element, key_value) and a legacy writer's
    * (array/bag) read identically.
    */
  private object Gp {
    import org.apache.parquet.example.data.Group
    def has(g: Group, f: String): Boolean =
      g.getType.containsField(f) && g.getFieldRepetitionCount(f) > 0
    def str(g: Group, f: String): String =
      if (has(g, f)) g.getString(f, 0) else null
    def lng(g: Group, f: String): java.lang.Long =
      if (has(g, f)) java.lang.Long.valueOf(g.getLong(f, 0)) else null
    def int(g: Group, f: String): java.lang.Integer =
      if (has(g, f)) java.lang.Integer.valueOf(g.getInteger(f, 0)) else null
    def bool(g: Group, f: String): java.lang.Boolean =
      if (has(g, f)) java.lang.Boolean.valueOf(g.getBoolean(f, 0)) else null
    def sub(g: Group, f: String): Option[Group] =
      if (has(g, f)) Some(g.getGroup(f, 0)) else None
    def strList(g: Group, f: String): Option[Seq[String]] = sub(g, f).map { lg =>
      val t = lg.getType
      if (t.getFieldCount == 0) Nil
      else {
        val rep = t.getType(0).getName // "list" (standard) / "array"|"bag" (legacy)
        (0 until lg.getFieldRepetitionCount(rep)).map { i =>
          val e = lg.getGroup(rep, i)
          if (e.getFieldRepetitionCount(0) > 0) e.getString(0, 0) else null
        }
      }
    }
    def strMap(g: Group, f: String): Option[Map[String, String]] = sub(g, f).map { mg =>
      val t = mg.getType
      if (t.getFieldCount == 0) Map.empty[String, String]
      else {
        val rep = t.getType(0).getName // "key_value" (standard) / "map" (legacy)
        (0 until mg.getFieldRepetitionCount(rep)).map { i =>
          val kv = mg.getGroup(rep, i)
          val v =
            if (kv.getType.getFieldCount > 1 && kv.getFieldRepetitionCount(1) > 0)
              kv.getString(1, 0)
            else null
          kv.getString(0, 0) -> v
        }.toMap
      }
    }
  }

  /** Reads every row of the given LOCAL parquet files as Groups (driver,
    * no Spark job). Callers gate total bytes before calling.
    */
  private def parquetGroups(files: Seq[File],
      conf: org.apache.hadoop.conf.Configuration)
      : Vector[org.apache.parquet.example.data.Group] = {
    val out = Vector.newBuilder[org.apache.parquet.example.data.Group]
    files.foreach { f =>
      val rd = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(f.getPath))
        .withConf(conf).build()
      try {
        var g = rd.read()
        while (g != null) { out += g; g = rd.read() }
      } finally rd.close()
    }
    out.result()
  }

  /** Driver-side replay of a SMALL CHECKPOINT-BASED snapshot (r18, guide
    * §1.2/§2.4): once a table has a checkpoint, every sink op's resolve
    * paid ~4-6 Spark job round-trips (manifest read + sidecar-list
    * collect, two metadata-plane collects, and a SHUFFLED per-path
    * max_by for the live set) even when the whole checkpoint is a few KB —
    * measured as the second checkpointV2 in q_delta_checkpoint_v2 running
    * 3.5× the first, and every post-maintain op in q_lakehouse_maintain /
    * history / clone / restore paying the same tax. For a checkpoint
    * whose parquet bytes (+ tail) fit [[FastReplayMaxBytes]], read the
    * manifest + sidecars (v2) or the classic checkpoint parts on the
    * driver with the parquet Group API — zero Spark jobs — seed
    * [[DriverReplay]] with the base state, and apply the JSON tail as
    * usual. Returns None (→ distributed replay) for store-backed tables
    * (no local files) or once the checkpoint outgrows the budget — a
    * 100 TB table's add set must never land on the driver.
    */
  private def resolveCheckpointOnDriver(spark: SparkSession, table: String,
      ckptV: Long, manifestName: Option[String], tail: Seq[File])
      : Option[(MetaState, DataFrame)] = {
    val ld = logDir(table)
    val hconf = spark.sparkContext.hadoopConfiguration
    val budget = FastReplayMaxBytes - tail.map(_.length).sum
    val groups: Vector[org.apache.parquet.example.data.Group] = manifestName match {
      case Some(name) =>
        val mf = ld.resolve(name).toFile
        if (!mf.isFile || mf.length > budget) return None
        val manifest = parquetGroups(Seq(mf), hconf)
        val sidecars = manifest.flatMap(g => Gp.sub(g, "sidecar"))
          .map(s => ld.resolve("_sidecars").resolve(Gp.str(s, "path")).toFile)
        if (sidecars.exists(!_.isFile) ||
            mf.length + sidecars.map(_.length).sum > budget) return None
        manifest ++ parquetGroups(sidecars, hconf)
      case None =>
        val f = checkpointFile(table, ckptV).toFile
        val parts =
          if (f.isFile) Seq(f)
          else if (f.isDirectory) dataFiles(f)
          else return None
        if (parts.isEmpty || parts.map(_.length).sum > budget) return None
        parquetGroups(parts, hconf)
    }
    val r = new DriverReplay
    groups.foreach { g =>
      Gp.sub(g, "protocol").foreach { p =>
        Option(Gp.int(p, "minReaderVersion"))
          .foreach(v => r.minReader = math.max(r.minReader, v.intValue()))
        Option(Gp.int(p, "minWriterVersion"))
          .foreach(v => r.minWriter = math.max(r.minWriter, v.intValue()))
        Gp.strList(p, "readerFeatures").foreach(r.readerFeatures = _)
        Gp.strList(p, "writerFeatures").foreach(r.writerFeatures = _)
      }
      Gp.sub(g, "metaData").foreach { m =>
        r.schema = Some(DataType.fromJson(Gp.str(m, "schemaString"))
          .asInstanceOf[StructType])
        r.partCols = Gp.strList(m, "partitionColumns").getOrElse(Nil)
        val id = Gp.str(m, "id")
        if (id != null) r.tableId = id
        r.tableConfig = Gp.strMap(m, "configuration").getOrElse(Map.empty)
        val created = Gp.lng(m, "createdTime")
        if (r.createdTime == 0L && created != null) r.createdTime = created.longValue()
      }
      Gp.sub(g, "txn").foreach { t =>
        // CHECKPOINT-plane txn rows overwrite unconditionally — the same
        // rule as the distributed checkpoint collect (r19 ADVICE parity);
        // the tail then reapplies with the monotonic guard in applyTail
        r.txns += Gp.str(t, "appId") -> Gp.lng(t, "version").longValue()
      }
      Gp.sub(g, "domainMetadata").foreach { d =>
        val name = Gp.str(d, "domain")
        if (name != null) {
          if (Option(Gp.bool(d, "removed")).exists(_.booleanValue()))
            r.domains -= name
          else r.domains += name -> Gp.str(d, "configuration")
        }
      }
      Gp.sub(g, "add").foreach { a =>
        val dv = Gp.sub(a, "deletionVector").map { d =>
          Row(Gp.str(d, "storageType"), Gp.str(d, "pathOrInlineDv"),
            Gp.int(d, "offset"), Gp.lng(d, "sizeInBytes"),
            Gp.lng(d, "cardinality"))
        }.orNull
        val path = Gp.str(a, "path")
        r.lastAction(path) = Some(Row(path,
          Gp.strMap(a, "partitionValues").orNull, Gp.lng(a, "size"),
          Gp.lng(a, "modificationTime"), Gp.str(a, "stats"), dv,
          Gp.lng(a, "baseRowId"), Gp.lng(a, "defaultRowCommitVersion")))
      }
    }
    r.applyTail(tail)
    Some(r.finish(spark, table,
      tail.lastOption.map(_.getName.stripSuffix(".json").toLong).getOrElse(ckptV)))
  }

  private def resolve(spark: SparkSession, table: String,
      asOfVersion: Option[Long]): (MetaState, DataFrame) = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, max_by, struct}
    // pointer: version + (v2 checkpoints) the manifest file name
    val ckptPtr: Option[(Long, Option[String])] = {
      val f = lastCheckpointFile(table)
      if (Files.exists(f)) {
        val node = mapper.readTree(Files.readString(f))
        val v = node.get("version").asLong()
        if (asOfVersion.forall(_ >= v))
          Some((v, Option(node.get("path")).map(_.asText()).orElse {
            // SPEC-style v2 discovery: the spec finds v2 checkpoints by
            // the <v>.checkpoint.<uuid>.parquet NAME PATTERN — an
            // external writer's pointer may omit our "path" hint, so a
            // v2-named manifest FILE at the pointed version resolves too
            // (classic checkpoints are directories and don't match)
            Option(logDir(table).toFile.listFiles()).toSeq.flatten
              .filter(m => m.isFile &&
                m.getName.matches(f"$v%020d\\.checkpoint\\..+\\.parquet"))
              .map(_.getName).sorted.lastOption
          }))
        else None
      } else None
    }
    val ckptV: Option[Long] = ckptPtr.map(_._1)
    val tail = logFiles(table).filter { f =>
      val v = f.getName.stripSuffix(".json").toLong
      asOfVersion.forall(v <= _) && ckptV.forall(v > _)
    }
    require(tail.nonEmpty || ckptV.isDefined,
      s"not a Delta table (no _delta_log): $table")

    // FAST TAIL REPLAY (r18, guide §1.2/§2.4): a tail-only snapshot with a
    // KB/MB-scale tail replays on the DRIVER with jackson — the Spark path
    // below costs two job round-trips (metadata collect + a SHUFFLED
    // max_by(version) per path) per sink op, which dominates every small
    // commit (measured ~0.3-0.5 s per op at sf0.1; a Delta append ran 3×
    // an Iceberg append on identical frames). delta-spark's own Snapshot
    // machinery reads the JSON tail driver-side for the same reason. The
    // threshold keeps a 100 TB log (multi-MB tail or any checkpoint) on
    // the distributed replay, where the add set must never land on the
    // driver before the live-set reconciliation has shrunk it.
    if (ckptPtr.isEmpty && tail.map(_.length).sum <= FastReplayMaxBytes)
      return resolveTailOnDriver(spark, table, tail)

    // FAST CHECKPOINT REPLAY (r18): same driver-side replay for a snapshot
    // whose base is a KB/MB-scale checkpoint — the parquet Group API reads
    // manifest + sidecars (or classic parts) with zero Spark jobs. The byte
    // budget and the local-file requirement keep big tables and
    // store-backed logs on the distributed path; a parse surprise falls
    // back to the authoritative replay (which re-applies the same
    // protocol gates).
    if (ckptPtr.isDefined && tail.map(_.length).sum <= FastReplayMaxBytes) {
      try {
        resolveCheckpointOnDriver(spark, table, ckptPtr.get._1,
            ckptPtr.get._2, tail) match {
          case Some(res) => return res
          case None => () // store-backed or over-budget → distributed
        }
      } catch {
        case e: ProtocolGateException => throw e // protocol gates refuse
        case scala.util.control.NonFatal(e) =>
          // any OTHER failure — including parse-shaped
          // IllegalArgumentExceptions (NumberFormatException,
          // DataType.fromJson, a missing metaData row) — is a parse
          // surprise: the distributed replay below is authoritative and
          // re-applies the same protocol gates (r19 ADVICE)
          logWarning(
            s"fast checkpoint replay fell back to distributed: ${e.getMessage}")
      }
    }

    val ckptDF = ckptPtr.map {
      case (_, Some(manifestName)) =>
        // V2: the manifest carries the metadata plane + the sidecar list;
        // adds live in the sidecars — readers fan out over them in
        // parallel, never listing a monolithic checkpoint dir. Normalize
        // both planes back to the classic checkpoint shape so the replay
        // below is layout-agnostic.
        val manifest = spark.read.schema(V2ManifestReadSchema)
          .parquet(logDir(table).resolve(manifestName).toString)
        val sidecarPaths = manifest.where(col("sidecar").isNotNull)
          .select("sidecar.path").collect().map(r =>
            logDir(table).resolve("_sidecars").resolve(r.getString(0)).toString)
        // inline add actions ride along (spec-permitted in a sidecar-less
        // manifest) — previously forced to null here while the driver fast
        // path read them, so the same external table could resolve to two
        // different live sets depending on checkpoint size (r19 ADVICE)
        val metaPart = manifest
          .where(col("protocol").isNotNull || col("metaData").isNotNull ||
            col("txn").isNotNull || col("domainMetadata").isNotNull ||
            col("add").isNotNull)
          .select(col("protocol"), col("metaData"), col("add"),
            col("txn"), col("domainMetadata"))
        if (sidecarPaths.isEmpty) metaPart
        else metaPart.unionByName(
          spark.read.schema(StructType(Seq(CheckpointSchema("add"))))
            .parquet(sidecarPaths.toIndexedSeq: _*)
            .select(lit(null).cast(CheckpointSchema("protocol").dataType).as("protocol"),
              lit(null).cast(CheckpointSchema("metaData").dataType).as("metaData"),
              col("add"),
              lit(null).cast(CheckpointSchema("txn").dataType).as("txn"),
              lit(null).cast(CheckpointSchema("domainMetadata").dataType)
                .as("domainMetadata")))
      case (v, None) =>
        spark.read.schema(CheckpointSchema)
          .parquet(checkpointFile(table, v).toString)
    }
    val tailDF = if (tail.isEmpty) None else Some(actionsDF(spark, tail))

    // Metadata plane: metaData/txn rows are a bounded handful — collect
    // them through Spark filters (the driver still never touches adds).
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Nil
    var tableId: String = null
    var createdTime = 0L
    val txns = scala.collection.mutable.Map.empty[String, Long]
    var tableConfig: Map[String, String] = Map.empty
    def applyMeta(id: String, created: java.lang.Long, schemaString: String,
        pc: Seq[String], conf: scala.collection.Map[String, String]): Unit = {
      schema = Some(DataType.fromJson(schemaString).asInstanceOf[StructType])
      partCols = pc
      if (id != null) tableId = id
      // configuration REPLACES wholesale per the spec: each metaData
      // action carries the complete map (rows apply in version order)
      tableConfig = Option(conf).map(_.toMap).getOrElse(Map.empty)
      // first metaData's createdTime is the table birth; later metaData
      // actions (schema evolution) repeat it — keep the first non-zero
      if (createdTime == 0L && created != null) createdTime = created.longValue()
    }
    var minReader = 1
    var minWriter = 1
    var readerFeatures: Seq[String] = Nil
    var writerFeatures: Seq[String] = Nil
    def applyProtocol(r: Row, idx: Int): Unit = if (!r.isNullAt(idx)) {
      val p = r.getStruct(idx)
      if (!p.isNullAt(0)) minReader = math.max(minReader, p.getInt(0))
      if (!p.isNullAt(1)) minWriter = math.max(minWriter, p.getInt(1))
      // feature lists: a protocol action REPLACES them (spec); actions
      // apply in version order, so last non-null wins — and a checkpoint
      // written before this field existed reads as null, keeping whatever
      // the JSON tail establishes
      if (p.size > 2 && !p.isNullAt(2))
        readerFeatures = p.getSeq[String](2).toSeq
      if (p.size > 3 && !p.isNullAt(3))
        writerFeatures = p.getSeq[String](3).toSeq
    }
    val domains = scala.collection.mutable.Map.empty[String, String]
    def applyDomain(r: Row, idx: Int): Unit = if (!r.isNullAt(idx)) {
      val d = r.getStruct(idx)
      val name = d.getAs[String]("domain")
      if (name != null) {
        if (Option(d.getAs[java.lang.Boolean]("removed")).exists(_.booleanValue()))
          domains -= name
        else domains += name -> d.getAs[String]("configuration")
      }
    }
    ckptDF.foreach {
      _.where(col("metaData").isNotNull || col("txn").isNotNull ||
          col("protocol").isNotNull || col("domainMetadata").isNotNull)
        .select("metaData", "txn", "protocol", "domainMetadata")
        .collect().foreach { r =>
          if (!r.isNullAt(0)) {
            val m = r.getStruct(0)
            applyMeta(m.getAs[String]("id"), m.getAs[java.lang.Long]("createdTime"),
              m.getAs[String]("schemaString"),
              m.getSeq[String](m.fieldIndex("partitionColumns")),
              m.getAs[scala.collection.Map[String, String]]("configuration"))
          }
          if (!r.isNullAt(1)) {
            val t = r.getStruct(1)
            txns += t.getAs[String]("appId") -> t.getAs[Long]("version")
          }
          applyProtocol(r, 2)
          applyDomain(r, 3)
        }
    }
    tailDF.foreach {
      _.where(col("metaData").isNotNull || col("txn").isNotNull ||
          col("protocol").isNotNull || col("domainMetadata").isNotNull)
        .select("metaData", "txn", "version", "protocol", "domainMetadata")
        .orderBy("version")
        .collect().foreach { r =>
          if (!r.isNullAt(0)) {
            val m = r.getStruct(0)
            applyMeta(m.getAs[String]("id"), m.getAs[java.lang.Long]("createdTime"),
              m.getAs[String]("schemaString"),
              Option(m.getSeq[String](m.fieldIndex("partitionColumns")))
                .getOrElse(Nil),
              m.getAs[scala.collection.Map[String, String]]("configuration"))
          }
          if (!r.isNullAt(1)) {
            val t = r.getStruct(1)
            val app = t.getAs[String]("appId")
            val v = t.getAs[Long]("version")
            if (txns.get(app).forall(_ < v)) txns += app -> v
          }
          applyProtocol(r, 3)
          applyDomain(r, 4)
        }
    }
    require(schema.isDefined, s"Delta log has no metaData action: $table")
    // An external log whose metaData carries no id (allowed by the spec's
    // readers, written by some engines) would otherwise thread `null`
    // downstream — an evolving append would literally record the string
    // "null" and every checkpoint would mint a different random id
    // (ADVICE r7). Derive DETERMINISTICALLY from the table location so
    // every replay — including two concurrent ones that each re-write
    // metaData (checkpoint vs evolving append) before either persists —
    // agrees on the same id; the first persisted metaData then fixes it
    // for the table's remaining lifetime.
    if (tableId == null)
      tableId = java.util.UUID.nameUUIDFromBytes(
        logDir(table).toAbsolutePath.normalize.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
    val version = tail.lastOption.map(_.getName.stripSuffix(".json").toLong)
      .orElse(ckptV).get

    // Data plane: adds resolve distributedly, last action per path wins.
    val ckptAdds = ckptDF.map(
      _.where(col("add").isNotNull).select(
        col("add.path").as("path"),
        col("add.partitionValues").as("partitionValues"),
        col("add.size").as("size"),
        col("add.modificationTime").as("modificationTime"),
        col("add.stats").as("stats"),
        col("add.deletionVector").as("deletionVector"),
        col("add.baseRowId").as("baseRowId"),
        col("add.defaultRowCommitVersion").as("defaultRowCommitVersion"),
        lit(ckptV.get).as("version"),
        lit(true).as("isAdd")))
    val tailActs = tailDF.map(
      _.where(col("add").isNotNull || col("remove").isNotNull).select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.partitionValues").as("partitionValues"),
        col("add.size").as("size"),
        col("add.modificationTime").as("modificationTime"),
        col("add.stats").as("stats"),
        col("add.deletionVector").as("deletionVector"),
        col("add.baseRowId").as("baseRowId"),
        col("add.defaultRowCommitVersion").as("defaultRowCommitVersion"),
        col("version"),
        col("add").isNotNull.as("isAdd")))
    val all = (ckptAdds.toSeq ++ tailActs.toSeq).reduce(_.unionByName(_))
    val live = all
      .groupBy("path")
      .agg(max_by(struct(col("partitionValues"), col("size"),
        col("modificationTime"), col("stats"), col("deletionVector"),
        col("baseRowId"), col("defaultRowCommitVersion"), col("isAdd")),
        col("version")).as("w"))
      .where(col("w.isAdd"))
      .select(col("path"), col("w.partitionValues").as("partitionValues"),
        col("w.size").as("size"),
        col("w.modificationTime").as("modificationTime"),
        col("w.stats").as("stats"),
        col("w.deletionVector").as("deletionVector"),
        col("w.baseRowId").as("baseRowId"),
        col("w.defaultRowCommitVersion").as("defaultRowCommitVersion"))
    // PROTOCOL GATE: refuse tables demanding reader capabilities beyond
    // this engine's (v3 + deletionVectors). Silently mis-reading a table
    // whose protocol promises semantics we don't implement is the one
    // unforgivable failure mode of a log-replicated format. (The protocol
    // rows ride the SAME metadata collects above — no extra Spark job.)
    require(minReader <= 3,
      s"unsupported Delta protocol: table requires reader version $minReader, " +
        "this engine supports up to 3 (deletion vectors)")
    // v3 reader features gate the SAME way (spec: a reader must refuse a
    // table listing a feature it does not implement — this is exactly
    // what protects a v2-checkpointed table from a reader that would
    // otherwise replay past the manifest it cannot resolve)
    val unknownReader = readerFeatures.toSet -- SupportedReaderFeatures
    require(unknownReader.isEmpty,
      s"unsupported Delta reader feature(s) ${unknownReader.toSeq.sorted.mkString(", ")}: " +
        s"this engine implements ${SupportedReaderFeatures.toSeq.sorted.mkString(", ")}")
    (MetaState(version, tableId, createdTime, schema.get, partCols, txns.toMap,
      minReader, minWriter, readerFeatures, writerFeatures, tableConfig,
      domains.toMap), live)
  }

  /** Live-set columns of [[resolve]] → driver [[AddEntry]]s — the
    * scan-construction step (Spark's file scan wants its file list on the
    * driver, the same collect delta-spark's file index does). Everything
    * upstream of this stays distributed.
    */
  private def collectAdds(live: DataFrame): Seq[AddEntry] =
    live.collect().toSeq.map { r =>
      val dv = Option(r.getAs[Row]("deletionVector")).map(d =>
        DvInfo(Option(d.getAs[String]("storageType")).getOrElse("p"),
          d.getAs[String]("pathOrInlineDv"),
          Option(d.getAs[java.lang.Integer]("offset")).map(_.intValue()),
          d.getAs[Long]("sizeInBytes"), d.getAs[Long]("cardinality")))
      AddEntry(r.getAs[String]("path"),
        Option(r.getAs[Map[String, String]]("partitionValues")).getOrElse(Map.empty),
        r.getAs[Long]("size"), r.getAs[Long]("modificationTime"),
        r.getAs[String]("stats"), dv,
        Option(r.getAs[java.lang.Long]("baseRowId")).map(_.longValue()),
        Option(r.getAs[java.lang.Long]("defaultRowCommitVersion"))
          .map(_.longValue()))
    }.sortBy(_.path) // deterministic scan order regardless of agg partitioning

  private def replay(spark: SparkSession, table: String, asOfVersion: Option[Long]): State = {
    val (meta, live) = resolve(spark, table, asOfVersion)
    State(meta.version, meta.id, meta.createdTime, meta.schema, meta.partitionColumns,
      collectAdds(live), meta.txns, meta.minWriter, meta.configuration,
      meta.domains)
  }

  /** Metadata-only live-file inventory for format interop
    * ([[IcebergSink.convertFromDelta]]'s UniForm-style convert): the
    * current snapshot's schema, partition columns, live adds as
    * (relative path, partitionValues, hasDeletionVector), and whether
    * column mapping is enabled. No data file is opened.
    */
  private[sinks] def liveInventory(spark: SparkSession, table: String)
      : (StructType, Seq[String], Seq[(String, Map[String, String], Boolean)],
         Boolean) = {
    val st = replay(spark, table, None)
    (st.schema, st.partitionColumns,
      st.live.map(a => (a.path, a.partitionValues, a.dv.isDefined)),
      mappingEnabled(st.schema))
  }

  /** EVERY data path ANY version of the log ever added — tombstones
    * included. The protection set the Iceberg-plane janitors honor on a
    * dual-format table: a Delta tombstone still inside vacuum's retention
    * window serves time travel and restore, so it is NOT an orphan and
    * not reclaimable by the other plane. Metadata-scale (path strings).
    */
  private[sinks] def allReferencedFiles(spark: SparkSession, table: String)
      : Set[String] = {
    import org.apache.spark.sql.functions.col
    val tail = logFiles(table)
    val fromTail =
      if (tail.isEmpty) Set.empty[String]
      else actionsDF(spark, tail).where(col("add").isNotNull)
        .select("add.path").distinct().collect().map(_.getString(0)).toSet
    val fromCkpt = {
      val f = lastCheckpointFile(table)
      if (!Files.exists(f)) Set.empty[String]
      else {
        val node = mapper.readTree(Files.readString(f))
        val v = node.get("version").asLong()
        // v2 pointers name their manifest; adds live in the sidecars
        val addsDF = Option(node.get("path")).map(_.asText()) match {
          case Some(manifestName) =>
            val manifest = spark.read.schema(V2ManifestReadSchema)
              .parquet(logDir(table).resolve(manifestName).toString)
            val sidecarPaths = manifest.where(col("sidecar").isNotNull)
              .select("sidecar.path").collect().map(r =>
                logDir(table).resolve("_sidecars").resolve(r.getString(0)).toString)
            // a sidecar-less external manifest may carry its adds INLINE
            // (r19 ADVICE): they are referenced files too — missing them
            // here would classify live data as vacuum-able orphans
            val inline = manifest.select(col("add"))
            if (sidecarPaths.isEmpty) Some(inline)
            else Some(inline.unionByName(spark.read
              .schema(StructType(Seq(CheckpointSchema("add"))))
              .parquet(sidecarPaths.toIndexedSeq: _*)
              .select(col("add"))))
          case None => Some(spark.read.schema(CheckpointSchema)
            .parquet(checkpointFile(table, v).toString))
        }
        addsDF.map(_.where(col("add").isNotNull)
          .select("add.path").distinct().collect().map(_.getString(0)).toSet)
          .getOrElse(Set.empty)
      }
    }
    fromTail ++ fromCkpt
  }

  /** WRITER-side protocol gate, symmetrical to resolve()'s reader gate:
    * committing to a table whose protocol demands writer features beyond
    * v7/deletionVectors would violate invariants we don't implement.
    */
  private def requireWritable(minWriter: Int, table: String): Unit =
    require(minWriter <= 7,
      s"unsupported Delta protocol: $table requires writer version " +
        s"$minWriter, this engine supports up to 7 (deletion vectors)")

  /** Reader features this engine implements — the v3 feature gate's
    * allowlist (anything else refuses in [[resolve]]).
    */
  private val SupportedReaderFeatures =
    Set("deletionVectors", "columnMapping", "v2Checkpoint", "timestampNtz",
      "variantType")

  private def protocolJson: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":1}}"""

  /** Create-time protocol for `schema`: a VARIANT column anywhere in the
    * schema requires the `variantType` reader+writer table feature (Delta
    * 4.0 spec §Variant Data Type — readers that can't decode the binary
    * encoding must refuse the table); everything else keeps the minimal
    * legacy protocol.
    */
  private def protocolJsonFor(schema: StructType): String = {
    def hasVariant(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.VariantType => true
      case s: StructType => s.fields.exists(f => hasVariant(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasVariant(a.elementType)
      case m: org.apache.spark.sql.types.MapType =>
        hasVariant(m.keyType) || hasVariant(m.valueType)
      case _ => false
    }
    if (hasVariant(schema))
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["variantType"],"writerFeatures":["variantType"]}}"""
    else protocolJson
  }

  private def metaDataJson(id: String, schemaString: String,
      partitionBy: Seq[String], now: Long,
      config: Map[String, String] = Map.empty): String = {
    val conf = config.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${esc(k)}:${esc(v)}" }.mkString("{", ",", "}")
    s"""{"metaData":{"id":"$id","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${esc(schemaString)},""" +
      s""""partitionColumns":${partitionBy.map(esc).mkString("[", ",", "]")},""" +
      s""""configuration":$conf,"createdTime":$now}}"""
  }

  private def addJson(a: AddEntry, dataChange: Boolean = true): String = {
    val pv = a.partitionValues.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${esc(k)}:${if (v == null) "null" else esc(v)}" }
      .mkString("{", ",", "}")
    val dv = a.dv.map(d =>
      s""","deletionVector":{"storageType":${esc(d.storageType)},""" +
        s""""pathOrInlineDv":${esc(d.pathOrInlineDv)},""" +
        d.offset.map(o => s""""offset":$o,""").getOrElse("") +
        s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}""")
      .getOrElse("")
    val brid = a.baseRowId.map(b => s""","baseRowId":$b""").getOrElse("")
    val drcv = a.defaultRowCommitVersion
      .map(v => s""","defaultRowCommitVersion":$v""").getOrElse("")
    s"""{"add":{"path":${esc(a.path)},"partitionValues":$pv,"size":${a.size},""" +
      s""""modificationTime":${a.modificationTime},"dataChange":$dataChange,""" +
      s""""stats":${if (a.stats == null) "null" else esc(a.stats)}$dv$brid$drcv}}"""
  }

  /** All parquet data files under `dir`, partition subdirs included,
    * deterministic order.
    */
  private def dataFiles(dir: File): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory && f.getName != "_delta_log")
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap(walk)
      else if (f.getName.startsWith("part-") && f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(dir).sortBy(_.getPath)
  }

  /** Publishes one staged data file into the table at `rel` and returns its
    * log entry. Plain stores rename into place (same-FS atomic move); an
    * [[ObjectStore]] multipart-UPLOADS the staged bytes so the data file
    * reaches the table over the store protocol, never a local write —
    * stats come from the staged copy (identical bytes). Buffering one
    * file is bounded by maxRecordsPerFile; a production S3A path would
    * stream parts instead.
    */
  private def publishFile(store: CommitStore, tableDir: File, src: File,
      rel: String, conf: Configuration): AddEntry = store match {
    case os: ObjectStore =>
      val entry = toAddEntryAt(rel, src, conf)
      os.putObject(new File(tableDir, rel).toPath, Files.readAllBytes(src.toPath))
      entry
    case _ =>
      val target = new File(tableDir, rel)
      target.getParentFile.mkdirs()
      Files.move(src.toPath, target.toPath)
      toAddEntry(tableDir, target, conf)
  }

  /** Publishes every staged file under `staging` into the table with
    * `relOf(rel, i)`-named targets. A publication failure (a part upload
    * 500ing, the store unreachable) RECLAIMS the files already published
    * in this batch before rethrowing — the reference's whole-write abort
    * (delta_destination.rs:120-229): an uncommitted transaction leaves
    * zero bytes behind.
    */
  private def publishAll(store: CommitStore, tableDir: File, staging: File,
      conf: Configuration, relOf: (java.nio.file.Path, Int) => String): Seq[AddEntry] = {
    val published = scala.collection.mutable.ArrayBuffer[AddEntry]()
    try {
      dataFiles(staging).zipWithIndex.foreach { case (src, i) =>
        val rel = staging.toPath.relativize(src.toPath)
        published += publishFile(store, tableDir, src, relOf(rel, i), conf)
      }
      published.toSeq
    } catch { case e: Throwable =>
      published.foreach(a =>
        scala.util.Try(deleteData(store, tableDir, a.path)))
      throw e
    }
  }

  /** Abort-path reclaim of a published-but-uncommitted data file. */
  private def deleteData(store: CommitStore, tableDir: File, rel: String): Unit =
    store match {
      case os: ObjectStore => os.deleteObject(new File(tableDir, rel).toPath)
      case _ => new File(tableDir, rel).delete(): Unit
    }

  private def toAddEntry(tableDir: File, f: File, conf: Configuration): AddEntry =
    toAddEntryAt(tableDir.toPath.relativize(f.toPath).toString, f, conf)

  /** Log entry for a data file whose TABLE path is `rel` but whose bytes
    * are read from `f` (which may be a staged copy outside the table).
    */
  private def toAddEntryAt(rel0: String, f: File, conf: Configuration): AddEntry = {
    val rel = rel0
    // partition values from the Hive-style dir segments (col=value), Hive
    // escaping undone; the marker dir name means a null partition value
    val pv = rel.split('/').dropRight(1).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) None
      else {
        val v = ExternalCatalogUtils.unescapePathName(seg.substring(i + 1))
        Some(seg.substring(0, i) ->
          (if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null else v))
      }
    }.toMap
    val (rows, mins, maxs) = fileStats(f, conf)
    val st = mapper.createObjectNode()
    st.put("numRecords", rows)
    val mnNode = st.putObject("minValues")
    mins.toSeq.sortBy(_._1).foreach { case (k, v) => mnNode.put(k, v) }
    val mxNode = st.putObject("maxValues")
    maxs.toSeq.sortBy(_._1).foreach { case (k, v) => mxNode.put(k, v) }
    AddEntry(rel, pv, f.length(), f.lastModified(), st.toString)
  }

  /** Row count + per-column min/max from the parquet footer (no data
    * read — the same footer open that was already counting rows). The
    * min/max maps hold STRING encodings ordered consistently with the
    * column's own ordering — numerics as decimal text (compared after a
    * double cast), strings verbatim, DATE as ISO (lexicographic ==
    * chronological). Columns whose domain doesn't stringify
    * order-faithfully (timestamps' variable ISO precision, booleans,
    * nested fields) are skipped — absent stats mean "never pruned",
    * not "wrongly pruned". This is the log-level data-skipping surface
    * [[readRange]] consumes and OPTIMIZE ZORDER exists to sharpen.
    */
  private def fileStats(f: File, conf: Configuration)
      : (Long, Map[String, String], Map[String, String]) = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.toURI), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // merge per-row-group statistics in the column's NATIVE ordering
      // (parquet's own merge), then stringify once at the end — string
      // min/max over numeric encodings would order "9" above "10"
      val merged = scala.collection.mutable.Map
        .empty[String, org.apache.parquet.column.statistics.Statistics[_]]
      val skip = scala.collection.mutable.Set.empty[String]
      val prims = scala.collection.mutable.Map
        .empty[String, org.apache.parquet.schema.PrimitiveType]
      for (block <- blocks; c <- block.getColumns.asScala) {
        val pathParts = c.getPath.toArray
        if (pathParts.length == 1) { // top-level leaf columns only
          val name = pathParts(0)
          val stats = c.getStatistics
          if (stats == null || stats.isEmpty || !stats.hasNonNullValue) skip += name
          else {
            prims += name -> c.getPrimitiveType
            merged.get(name) match {
              case Some(acc) => mergeStats(acc, stats)
              case None => merged += name -> stats.copy()
            }
          }
        }
      }
      skip.foreach(merged -= _)
      val mins = scala.collection.mutable.Map.empty[String, String]
      val maxs = scala.collection.mutable.Map.empty[String, String]
      merged.foreach { case (name, stats) =>
        val prim = prims(name)
        val logical = prim.getLogicalTypeAnnotation
        def encode(v: Any): Option[String] = prim.getPrimitiveTypeName match {
          case INT32 if logical.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
            Some(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Integer].longValue()).toString)
          case INT32 | INT64 | FLOAT | DOUBLE
            if !logical.isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation] &&
              !logical.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] =>
            Some(v.toString)
          case BINARY if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
            Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
          case _ => None
        }
        (encode(stats.genericGetMin), encode(stats.genericGetMax)) match {
          case (Some(mn), Some(mx)) => mins += name -> mn; maxs += name -> mx
          case _ => ()
        }
      }
      (rows, mins.toMap, maxs.toMap)
    } finally reader.close()
  }

  /** Erasure bridge for parquet's self-comparable Statistics generic. */
  private def mergeStats[T <: Comparable[T]](
      acc: org.apache.parquet.column.statistics.Statistics[_],
      s: org.apache.parquet.column.statistics.Statistics[_]): Unit =
    acc.asInstanceOf[org.apache.parquet.column.statistics.Statistics[T]]
      .mergeStatistics(s.asInstanceOf[org.apache.parquet.column.statistics.Statistics[T]])

  /** First-line in-commit timestamp of a commit file, if the commit
    * carries one. The feature requires commitInfo to be the FIRST action
    * of every commit, so one line is the whole probe — no replay, no
    * full-file read.
    */
  private val IctRe = """"inCommitTimestamp"\s*:\s*(\d+)""".r
  private def ictOfFile(f: File): Option[Long] = {
    if (!f.exists()) return None
    val in = new java.io.BufferedReader(new java.io.FileReader(f))
    try Option(in.readLine()).filter(_.startsWith("""{"commitInfo""""))
      .flatMap(l => IctRe.findFirstMatchIn(l).map(_.group(1).toLong))
    finally in.close()
  }

  /** The single choke point every Delta commit flows through — which is
    * what makes in-commit timestamps (spec §in-commit-timestamps) an
    * invariant instead of a per-verb chore: once a commit carries a
    * leading commitInfo with `inCommitTimestamp`
    * ([[enableInCommitTimestamps]] plants the first), EVERY subsequent
    * commit is stamped here with max(wall clock, previous ICT + 1) — the
    * spec's monotonicity rule — by probing just the PREVIOUS commit's
    * first line. Commits that already lead with their own commitInfo
    * (the enablement commit) pass through untouched.
    */
  private def commitAtomic(store: CommitStore, target: java.nio.file.Path,
      lines: Seq[String]): Unit = {
    val name = target.getFileName.toString
    val all =
      if (!name.matches("\\d{20}\\.json") ||
          lines.headOption.exists(_.startsWith("""{"commitInfo""""))) lines
      else {
        val v = name.stripSuffix(".json").toLong
        val prevIct =
          if (v == 0) None
          else ictOfFile(target.getParent.resolve(f"${v - 1}%020d.json").toFile)
        prevIct match {
          case Some(p) =>
            val ict = math.max(System.currentTimeMillis(), p + 1)
            s"""{"commitInfo":{"inCommitTimestamp":$ict,"timestamp":$ict}}""" +: lines
          case None => lines
        }
      }
    store.putIfAbsent(target, (all.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Parquet footer record count (shared by both sinks' stats). */
  private[sinks] def numRecords(f: File, conf: Configuration): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.toURI), conf))
    try reader.getRecordCount finally reader.close()
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
