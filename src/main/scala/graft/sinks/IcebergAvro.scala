package graft.sinks

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Genuine Avro OCF manifests and manifest lists for the Iceberg sink,
  * per the Iceberg V2 table-spec Avro schemas (field-id annotated
  * `manifest_entry` / `manifest_file` records, the required key-metadata
  * entries) — what the reference emits through iceberg-rust's
  * ManifestWriter/ManifestListWriter
  * (/root/reference/src/iceberg_destination.rs:271-324). The optional
  * per-column stats fields (`value_counts` / `null_value_counts` /
  * `lower_bounds` / `upper_bounds`, spec-standard k/v-pair maps keyed by
  * field id) ARE emitted, from the same parquet-footer open that counts
  * rows — that is what lets an external Iceberg reader skip files on these
  * tables. `column_sizes`/`nan_value_counts` stay omitted (spec-permitted).
  * avro-1.12 ships in Spark's own jars, so this closes the earlier
  * JSON-manifest divergence without new dependencies.
  */
private[graft] object IcebergAvro {

  /** One identity-partition field of the manifest's partition struct
    * (r102): `avroType` is the plain Avro primitive ("string" / "int" /
    * "long" / "boolean"), `logicalType` the optional Iceberg annotation
    * ("date" for DateType partitions), `fieldId` the spec's partition
    * field id (1000+). All fields are written optional (union with null):
    * a Hive `__HIVE_DEFAULT_PARTITION__` directory is a NULL partition
    * value.
    */
  case class PartitionField(name: String, avroType: String, fieldId: Int,
      logicalType: Option[String] = None)

  /** Builds the manifest_entry schema with the given partition struct —
    * the static [[EntrySchema]] is the unpartitioned (empty-struct) case.
    * Splices the partition fields into the raw JSON template (NOT into a
    * parsed schema's toString, whose property ordering Avro normalizes).
    */
  def entrySchemaFor(pf: Seq[PartitionField]): Schema =
    if (pf.isEmpty) EntrySchema
    else {
      val fieldsJson = pf.map { f =>
        val t = f.logicalType match {
          case Some(lt) => s"""{"type":"${f.avroType}","logicalType":"$lt"}"""
          case None => "\"" + f.avroType + "\""
        }
        s"""{"name":"${f.name}","type":["null",$t],"default":null,"field-id":${f.fieldId}}"""
      }.mkString(",")
      new Schema.Parser().parse(EntryJson.replace(PartitionHole, fieldsJson))
    }

  private val PartitionHole = "/*PARTITION-FIELDS*/"

  private val EntryJson: String =
    s"""{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int","field-id":134},
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[/*PARTITION-FIELDS*/]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104},
      |{"name":"value_counts","field-id":109,"default":null,"type":["null",
      |  {"type":"array","logicalType":"map","items":{"type":"record","name":"k119_v120","fields":[
      |    {"name":"key","type":"int","field-id":119},{"name":"value","type":"long","field-id":120}]}}]},
      |{"name":"null_value_counts","field-id":110,"default":null,"type":["null",
      |  {"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[
      |    {"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]}}]},
      |{"name":"lower_bounds","field-id":125,"default":null,"type":["null",
      |  {"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[
      |    {"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]}}]},
      |{"name":"upper_bounds","field-id":128,"default":null,"type":["null",
      |  {"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[
      |    {"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]}}]},
      |{"name":"equality_ids","field-id":135,"default":null,"type":["null",
      |  {"type":"array","items":"int","element-id":136}]},
      |{"name":"first_row_id","type":["null","long"],"default":null,"field-id":142},
      |{"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
      |{"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
      |{"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}
      |]}}]}""".stripMargin

  val EntrySchema: Schema =
    new Schema.Parser().parse(EntryJson.replace(PartitionHole, ""))

  private val DataFileSchema = EntrySchema.getField("data_file").schema()

  val ManifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin)

  /** Per-column stats keyed by Iceberg field id; bounds hold the spec's
    * single-value binary serialization. Empty maps → the optional manifest
    * fields stay null.
    */
  case class ColumnStats(
      valueCounts: Map[Int, Long] = Map.empty,
      nullCounts: Map[Int, Long] = Map.empty,
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty)

  /** `partitionValues` align positionally with the spec's partition
    * fields: String / java.lang.Integer / java.lang.Long /
    * java.lang.Boolean, or null for a Hive default (null) partition.
    */
  /** `dv`: V3 deletion-vector linkage for a content=1 entry — the Puffin
    * blob's (referenced_data_file, content_offset, content_size_in_bytes),
    * spec v3 field ids 143/144/145; absPath is then the Puffin file.
    */
  /** `firstRowId`: V3 row lineage — the id assigned to this file's first
    * row at commit (spec v3 field id 142); rows derive
    * `_row_id = first_row_id + position`. None for delete entries, for
    * files predating lineage enablement, and for rewrites that
    * MATERIALIZE `_row_id` into the parquet instead.
    */
  case class DataFileInfo(absPath: String, sizeBytes: Long, recordCount: Long,
      stats: ColumnStats = ColumnStats(), partitionValues: Seq[Any] = Nil,
      dv: Option[(String, Long, Long)] = None,
      firstRowId: Option[Long] = None)

  private def kvLongs(sch: Schema, m: Map[Int, Long]): GenericData.Array[GenericRecord] = {
    val itemSchema = sch.getElementType
    val arr = new GenericData.Array[GenericRecord](m.size, sch)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k); r.put("value", v); arr.add(r)
    }
    arr
  }

  private def kvBytes(sch: Schema, m: Map[Int, Array[Byte]]): GenericData.Array[GenericRecord] = {
    val itemSchema = sch.getElementType
    val arr = new GenericData.Array[GenericRecord](m.size, sch)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k); r.put("value", java.nio.ByteBuffer.wrap(v)); arr.add(r)
    }
    arr
  }

  private def arraySchemaOf(fieldName: String): Schema =
    DataFileSchema.getField(fieldName).schema().getTypes.asScala
      .find(_.getType == Schema.Type.ARRAY).get

  /** Writes one manifest; returns its byte length (the manifest list
    * records it). `content` is the V2 file-content code shared by the
    * manifest meta and every entry's data_file record: 0 = DATA,
    * 1 = POSITION_DELETES (spec §Manifests / §Delete Formats).
    */
  /** `entrySeqs`: paths whose entries must carry an EXPLICIT data
    * sequence (status EXISTING) instead of inheriting the new snapshot's
    * — a replace manifest re-listing files an earlier snapshot added
    * (UniForm sync) writes them this way so sequence-scoped consumers
    * (streaming tail, MoR delete application) see no change.
    */
  def writeManifest(target: File, files: Seq[DataFileInfo], snapshotId: Long,
      icebergSchemaJson: String, partitionSpecJson: String,
      partitionFields: Seq[PartitionField] = Nil, content: Int = 0,
      equalityIds: Seq[Int] = Nil, specId: Int = 0,
      entrySeqs: Map[String, Long] = Map.empty): Long = {
    val entrySchema = entrySchemaFor(partitionFields)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partitionSchema = dataFileSchema.getField("partition").schema()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("schema", icebergSchemaJson)
    w.setMeta("schema-id", "0")
    w.setMeta("partition-spec", partitionSpecJson)
    w.setMeta("partition-spec-id", specId.toString)
    w.setMeta("format-version", "2")
    w.setMeta("content", if (content == 0) "data" else "deletes")
    w.create(entrySchema, target)
    try files.foreach { f =>
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", content)
      df.put("file_path", f.absPath)
      df.put("file_format", "PARQUET")
      val part = new GenericData.Record(partitionSchema)
      partitionFields.zip(f.partitionValues).foreach { case (pf, v) =>
        part.put(pf.name, v)
      }
      df.put("partition", part)
      df.put("record_count", f.recordCount)
      df.put("file_size_in_bytes", f.sizeBytes)
      if (f.stats.valueCounts.nonEmpty)
        df.put("value_counts", kvLongs(arraySchemaOf("value_counts"), f.stats.valueCounts))
      if (f.stats.nullCounts.nonEmpty)
        df.put("null_value_counts", kvLongs(arraySchemaOf("null_value_counts"), f.stats.nullCounts))
      if (f.stats.lowerBounds.nonEmpty)
        df.put("lower_bounds", kvBytes(arraySchemaOf("lower_bounds"), f.stats.lowerBounds))
      if (f.stats.upperBounds.nonEmpty)
        df.put("upper_bounds", kvBytes(arraySchemaOf("upper_bounds"), f.stats.upperBounds))
      if (equalityIds.nonEmpty) {
        // V2 equality-delete entries carry the schema field ids their
        // delete rows equate on (spec field 135)
        val idsSchema = dataFileSchema.getField("equality_ids").schema()
          .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
        val arr = new GenericData.Array[Integer](equalityIds.size, idsSchema)
        equalityIds.foreach(i => arr.add(Int.box(i)))
        df.put("equality_ids", arr)
      }
      f.dv.foreach { case (ref, off, size) =>
        df.put("referenced_data_file", ref)
        df.put("content_offset", off)
        df.put("content_size_in_bytes", size)
      }
      f.firstRowId.foreach(id => df.put("first_row_id", id))
      val e = new GenericData.Record(entrySchema)
      entrySeqs.get(f.absPath) match {
        case Some(seq) =>
          e.put("status", 0) // EXISTING, original sequence preserved
          e.put("sequence_number", seq)
          e.put("file_sequence_number", seq)
        case None =>
          e.put("status", 1) // ADDED; sequence numbers inherit from the snapshot
      }
      e.put("snapshot_id", snapshotId)
      e.put("data_file", df)
      w.append(e)
    } finally w.close()
    target.length()
  }

  /** Reads back each entry's (file_path, partition values by field name) —
    * the read path's source of partition truth (Iceberg readers take
    * partition values from the manifest, never from file paths). Reads
    * with the file's own writer schema, so any partition struct shape
    * round-trips.
    */
  def readManifestPartitions(f: File): Seq[(String, Map[String, Any])] =
    readManifestPartitionsWithSchema(f)._1.map(e => (e._1, e._2))

  /** Same pass also surfaces the manifest's "schema" key metadata — ONE
    * file open serves both (the hot snapshot-resolution path reads every
    * manifest of every query; a separate schema open would double it).
    * Each entry's third element is its EXPLICIT sequence number when the
    * manifest carries one (entries of a rewritten/merged manifest keep
    * their original data sequence this way — V2 inheritance only applies
    * to entries added by the manifest's own snapshot); None inherits the
    * manifest-list row's sequence as before.
    */
  def readManifestPartitionsWithSchema(f: File)
      : (Seq[(String, Map[String, Any], Option[Long])], Option[String]) = {
    val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
    try {
      val entries = r.iterator().asScala.toList.map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val part = df.get("partition").asInstanceOf[GenericRecord]
        val values = part.getSchema.getFields.asScala.map { pf =>
          pf.name() -> (part.get(pf.name()) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case other => other
          })
        }.toMap
        val seq = Option(e.getSchema.getField("sequence_number"))
          .flatMap(_ => Option(e.get("sequence_number")))
          .map(_.asInstanceOf[Long])
        (df.get("file_path").toString, values, seq)
      }
      (entries, Option(r.getMetaString("schema")))
    } finally r.close()
  }

  /** A manifest's PARTITION FIELDS reconstructed from its own Avro writer
    * schema (the r102 partition record): name, Avro primitive, field-id,
    * logicalType — everything [[writeManifest]] needs to re-emit entries
    * under the same struct (the row-lineage retro-assignment's partitioned
    * path). Plus the manifest's spec id and spec JSON from key metadata.
    */
  def readManifestPartitionFields(f: File)
      : (Seq[PartitionField], Int, String) = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try {
      val part = r.getSchema.getField("data_file").schema()
        .getField("partition").schema()
      val fields = part.getFields.asScala.toSeq.map { pf =>
        val t = pf.schema().getTypes.asScala
          .find(_.getType != Schema.Type.NULL).get
        PartitionField(pf.name(), t.getName,
          Option(pf.getObjectProp("field-id"))
            .map(_.toString.toInt).getOrElse(1000),
          Option(t.getObjectProp("logicalType")).map(_.toString))
      }
      (fields,
        Option(r.getMetaString("partition-spec-id")).map(_.toInt).getOrElse(0),
        Option(r.getMetaString("partition-spec")).getOrElse(
          """{"spec-id":0,"fields":[]}"""))
    } finally r.close()
  }

  /** Merges several manifests written under the SAME spec/schema into one
    * (the metadata-compaction half of Iceberg's rewrite_manifests): every
    * entry is copied VERBATIM (partition tuple, stats, bounds — the
    * writer schema and key metadata come from the first source), with
    * status flipped to 0 = EXISTING and its data sequence made EXPLICIT
    * (the entry's own if it already carries one, else the source
    * manifest-list row's — inheritance from the NEW snapshot would
    * corrupt delete-application ordering). No data file is opened.
    * Returns (byte length, entries, total rows, min sequence).
    */
  def mergeManifests(target: File, sources: Seq[(File, Long)])
      : (Long, Int, Long, Long) = {
    require(sources.nonEmpty, "mergeManifests needs at least one source")
    val first = new DataFileReader[GenericRecord](sources.head._1,
      new GenericDatumReader[GenericRecord]())
    val (writerSchema, keyMeta) =
      try (first.getSchema,
        Seq("schema", "schema-id", "partition-spec", "partition-spec-id",
          "format-version", "content")
          .flatMap(k => Option(first.getMetaString(k)).map(k -> _)))
      finally first.close()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](writerSchema))
    keyMeta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(writerSchema, target)
    var (n, rows, minSeq) = (0, 0L, Long.MaxValue)
    try sources.foreach { case (src, listSeq) =>
      val r = new DataFileReader[GenericRecord](src,
        new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.foreach { e =>
        val seq = Option(e.get("sequence_number"))
          .map(_.asInstanceOf[Long]).getOrElse(listSeq)
        e.put("status", 0) // EXISTING
        e.put("sequence_number", seq)
        e.put("file_sequence_number", seq)
        w.append(e)
        n += 1
        rows += e.get("data_file").asInstanceOf[GenericRecord]
          .get("record_count").asInstanceOf[Long]
        minSeq = math.min(minSeq, seq)
      } finally r.close()
    } finally w.close()
    (target.length(), n, rows, if (minSeq == Long.MaxValue) 0L else minSeq)
  }

  /** A manifest's Avro key metadata (schema / partition-spec /
    * partition-spec-id / content) — the grouping identity for
    * rewrite_manifests (only like-written manifests merge faithfully).
    */
  def readManifestMeta(f: File): Map[String, String] = {
    val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
    try Seq("schema", "schema-id", "partition-spec", "partition-spec-id",
      "format-version", "content")
      .flatMap(k => Option(r.getMetaString(k)).map(k -> _)).toMap
    finally r.close()
  }

  /** Per entry: (file_path, file_size_in_bytes, record_count,
    * first_row_id) — the row-lineage plane's metadata read. Reads with
    * the file's own writer schema, so manifests predating field 142
    * surface None.
    */
  def readManifestDataEntries(f: File): Seq[(String, Long, Long, Option[Long])] = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      (df.get("file_path").toString,
        df.get("file_size_in_bytes").asInstanceOf[Long],
        df.get("record_count").asInstanceOf[Long],
        Option(df.get("first_row_id")).map(_.asInstanceOf[Long]))
    }.toList
    finally r.close()
  }

  /** manifest_file row for a REWRITTEN manifest: all entries EXISTING,
    * min_sequence_number preserved from the merged entries so
    * sequence-based pruning stays exact.
    */
  def manifestRowExisting(absPath: String, length: Long, commitSeq: Long,
      minSeq: Long, snapshotId: Long, nFiles: Int, nRows: Long,
      specId: Int): GenericRecord = {
    val r = new GenericData.Record(ManifestFileSchema)
    r.put("manifest_path", absPath)
    r.put("manifest_length", length)
    r.put("partition_spec_id", specId)
    r.put("content", 0)
    r.put("sequence_number", commitSeq)
    r.put("min_sequence_number", minSeq)
    r.put("added_snapshot_id", snapshotId)
    r.put("added_files_count", 0)
    r.put("existing_files_count", nFiles)
    r.put("deleted_files_count", 0)
    r.put("added_rows_count", 0L)
    r.put("existing_rows_count", nRows)
    r.put("deleted_rows_count", 0L)
    r
  }

  /** Reads back every entry's ColumnStats (test surface: the stats must
    * round-trip through the Avro manifest).
    */
  def readManifestStats(f: File): Seq[(String, ColumnStats)] = {
    def longs(v: AnyRef): Map[Int, Long] = v match {
      case null => Map.empty
      case a: java.util.Collection[_] => a.asScala.map { r0 =>
        val r = r0.asInstanceOf[GenericRecord]
        r.get("key").asInstanceOf[Int] -> r.get("value").asInstanceOf[Long]
      }.toMap
    }
    def bytes(v: AnyRef): Map[Int, Array[Byte]] = v match {
      case null => Map.empty
      case a: java.util.Collection[_] => a.asScala.map { r0 =>
        val r = r0.asInstanceOf[GenericRecord]
        val bb = r.get("value").asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out)
        r.get("key").asInstanceOf[Int] -> out
      }.toMap
    }
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord](EntrySchema))
    try r.iterator().asScala.toList.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_path").toString -> ColumnStats(
        longs(df.get("value_counts")), longs(df.get("null_value_counts")),
        bytes(df.get("lower_bounds")), bytes(df.get("upper_bounds")))
    } finally r.close()
  }

  /** manifest_file row for a manifest newly written by `snapshotId`;
    * `content` 0 = data manifest, 1 = deletes manifest (field 517).
    */
  def manifestRow(absPath: String, length: Long, sequenceNumber: Long,
      snapshotId: Long, addedFiles: Int, addedRows: Long,
      content: Int = 0, specId: Int = 0): GenericRecord = {
    val r = new GenericData.Record(ManifestFileSchema)
    r.put("manifest_path", absPath)
    r.put("manifest_length", length)
    r.put("partition_spec_id", specId)
    r.put("content", content)
    r.put("sequence_number", sequenceNumber)
    r.put("min_sequence_number", sequenceNumber)
    r.put("added_snapshot_id", snapshotId)
    r.put("added_files_count", addedFiles)
    r.put("existing_files_count", 0)
    r.put("deleted_files_count", 0)
    r.put("added_rows_count", addedRows)
    r.put("existing_rows_count", 0L)
    r.put("deleted_rows_count", 0L)
    r
  }

  /** Writes a manifest list: carried-forward rows first (append keeps the
    * previous snapshot's manifests verbatim, reference :302-312), the new
    * manifest last.
    */
  def writeManifestList(target: File, rows: Seq[GenericRecord],
      snapshotId: Long, sequenceNumber: Long): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](ManifestFileSchema))
    w.setMeta("snapshot-id", snapshotId.toString)
    w.setMeta("sequence-number", sequenceNumber.toString)
    w.setMeta("format-version", "2")
    w.create(ManifestFileSchema, target)
    try rows.foreach(w.append) finally w.close()
  }

  def readManifestList(f: File): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord](ManifestFileSchema))
    try r.iterator().asScala.toList finally r.close()
  }

  /** Delete-file entries of a deletes manifest: (path, entry content code
    * — 1 positional / 2 equality —, equality field ids, recordCount).
    */
  def readManifestDeleteFiles(f: File): Seq[(String, Int, Seq[Int], Long)] =
    readManifestDeleteEntries(f).map(e => (e._1, e._2, e._3, e._4))

  /** Delete-file entries WITH their manifest partition values — a
    * partition-scoped delete manifest (deleteWhere on a partitioned
    * table) lets pruned readers skip delete files of other partitions.
    * Reads with the file's own writer schema so any partition struct
    * shape round-trips (same contract as [[readManifestPartitions]]).
    */
  def readManifestDeleteEntries(f: File)
      : Seq[(String, Int, Seq[Int], Long, Map[String, Any])] =
    readManifestDeleteEntriesWithSchema(f)._1
      .map(e => (e._1, e._2, e._3, e._4, e._5))

  def readManifestDeleteEntriesWithSchema(f: File)
      : (Seq[(String, Int, Seq[Int], Long, Map[String, Any],
          Option[(String, Long, Long)])], Option[String]) = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try {
      val entries = r.iterator().asScala.toList
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val ids = df.get("equality_ids") match {
            case null => Nil
            case a: java.util.Collection[_] =>
              a.asScala.map(_.asInstanceOf[Int]).toSeq
          }
          val part = df.get("partition").asInstanceOf[GenericRecord]
          val pvals = part.getSchema.getFields.asScala.map { pf =>
            pf.name() -> (part.get(pf.name()) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case other => other
            })
          }.toMap
          // V3 deletion-vector linkage (guarded: pre-v3 manifests' writer
          // schemas lack the fields entirely)
          val dv =
            if (df.getSchema.getField("referenced_data_file") == null) None
            else Option(df.get("referenced_data_file")).map(ref =>
              (ref.toString,
                df.get("content_offset").asInstanceOf[Long],
                df.get("content_size_in_bytes").asInstanceOf[Long]))
          (df.get("file_path").toString, df.get("content").asInstanceOf[Int],
            ids, df.get("record_count").asInstanceOf[Long], pvals, dv)
        }
      (entries, Option(r.getMetaString("schema")))
    } finally r.close()
  }

  /** The Iceberg schema JSON this manifest was written under (the
    * spec-mandated "schema" key metadata every [[writeManifest]] call
    * stamps) — the read side's truth for resolving each data file's
    * columns BY FIELD ID after a rename/drop/widen evolution.
    */
  def readManifestSchema(f: File): Option[String] = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try Option(r.getMetaString("schema")) finally r.close()
  }

  /** Data-file (path, recordCount) pairs of live entries (status ≠ 2
    * DELETED) in a manifest.
    */
  def readManifestDataFiles(f: File): Seq[(String, Long)] = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord](EntrySchema))
    try r.iterator().asScala.toList
      .filter(_.get("status").asInstanceOf[Int] != 2)
      .map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        (df.get("file_path").toString, df.get("record_count").asInstanceOf[Long])
      }
    finally r.close()
  }
}
