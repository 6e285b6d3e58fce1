package graft

import org.apache.spark.sql.SparkSession

/** Command-line driver mirroring the reference CLI's subcommand surface
  * (/root/reference/src/lib.rs:18-80 — P16 in SURVEY.md §2.1), adapted to
  * the Spark-native engine: the reference ran `-q` on Postgres and loaded
  * the stream; here the query runs inside the engine over the corpus
  * tables (no Postgres driver on the offline classpath — SURVEY.md §7.1).
  *
  * Usage:
  * {{{
  *   query-to-delta    <dataDir> <sql> <table> [--overwrite] [--partition-by c1,c2] [--max-records-per-file N]
  *   query-to-iceberg  <dataDir> <sql> <table> [--overwrite | --append]
  *   parquet-to-delta  <file>    <table> [--overwrite]
  *   parquet-to-iceberg <file>   <table> [--overwrite | --append]
  *   append-to-delta   <dataDir> <sql> <table> [--merge-schema]
  *   compact-delta     <table>
  *   vacuum-delta      <table> [retentionMs]
  *   merge-delta       <sourceParquet> <table> <k1,k2> [--delete-col c]
  *   delete-iceberg / update-iceberg / upsert-iceberg [... --branch b]  (audit-fix on a staging ref)
  *   append-branch-iceberg <sourceParquet> <table> <branch> ; publish-branch-iceberg <table> <branch>
  *   expire-iceberg    <table> [keepLast]
  *   compact-iceberg   <table>
  *   enable-row-lineage-iceberg <table> ; write-stats-iceberg <table> <cols>
  *   write-partition-stats-iceberg <table>
  *   add-column-iceberg <table> <name> <type> [default]
  *   enable-row-tracking-delta <table>
  *   write-stats-delta <table> <cols> ; cluster-by-delta <table> <cols>
  *   csv-to-delta      <file.csv> <table> [--overwrite]
  *   json-to-delta     <file.jsonl> <table> [--overwrite]
  *   export-jsonl      <dataDir> <sql> <outDir>
  *   pgcopy-to-delta   <colSpec> <table> <stream.pgcopy>... [--overwrite]
  *   pg-to-delta       <host:port> <database> <user> <colSpec> <sql> <table> [--overwrite]
  *   pg-to-iceberg     <host:port> <database> <user> <colSpec> <sql> <table> [--overwrite | --append]
  * }}}
  *
  * `pgcopy-to-delta` is the reference's flagship pg→lakehouse verb fed
  * from recorded COPY BINARY streams (one Spark partition per stream);
  * colSpec is comma-separated `name:pgtype[:typmod]`, e.g.
  * `id:int8,price:numeric:524295`.
  */
object Cli {
  /** Splits a `--partition-by` list on TOP-LEVEL commas only, so transform
    * specs keep their argument commas: "bucket(4,id),day(ts)" →
    * ["bucket(4,id)", "day(ts)"] (a plain split(',') would shear every
    * transform spec in half and misparse it as identity columns).
    */
  private[graft] def splitSpecs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  /** Comma-separated `name:pgtype[:typmod]` → PgTypeMapping column triples. */
  private[graft] def parseColSpec(spec: String): Seq[(String, String, Int)] =
    spec.split(',').toSeq.map { s =>
      s.split(':') match {
        case Array(n, t) => (n, t, -1)
        case Array(n, t, m) => (n, t, m.toInt)
        case _ => throw new IllegalArgumentException(
          s"bad column spec '$s' (want name:pgtype[:typmod])")
      }
    }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "missing subcommand")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // index-based parse: "--partition-by X" consumes exactly its own value
    // token, so a positional that happens to equal the partition column
    // (e.g. a table named like the column) is never swallowed
    var overwrite = false
    var append = false
    var partitionBy: Seq[String] = Nil
    // The reference's --batch-size throughput knob (src/lib.rs:43-50)
    // translated to the Spark sink's lever: rows per output parquet file.
    var maxRecordsPerFile = sinks.DeltaSink.MaxRecordsPerFile
    var deleteCol: Option[String] = None
    var mergeSchema = false
    var branch: Option[String] = None
    val pos = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--overwrite" => overwrite = true
        case "--append" => append = true
        case "--merge-schema" => mergeSchema = true
        case "--partition-by" =>
          require(i + 1 < args.length, "--partition-by requires a column list")
          partitionBy = splitSpecs(args(i + 1))
          i += 1
        case "--delete-col" =>
          require(i + 1 < args.length, "--delete-col requires a column name")
          deleteCol = Some(args(i + 1))
          i += 1
        case "--branch" =>
          require(i + 1 < args.length, "--branch requires a ref name")
          branch = Some(args(i + 1))
          i += 1
        case "--max-records-per-file" =>
          require(i + 1 < args.length, "--max-records-per-file requires a count")
          maxRecordsPerFile = args(i + 1).toLong
          i += 1
        case flag if flag.startsWith("--") =>
          throw new IllegalArgumentException(s"unknown flag: $flag")
        case p => pos += p
      }
      i += 1
    }

    args(0) match {
      case "query-to-delta" =>
        val ok = Engine.sqlToDelta(spark, pos(0), pos(1), pos(2), overwrite,
          partitionBy, maxRecordsPerFile)
        if (!ok) { // reference refuse-and-exit, delta_destination.rs:421-427
          System.err.println("Table exists. Pass --overwrite to overwrite data")
          sys.exit(1)
        }
      case "query-to-iceberg" =>
        Engine.sqlToIceberg(spark, pos(0), pos(1), pos(2), overwrite, append, partitionBy)
      case "parquet-to-delta" =>
        if (!Engine.parquetToDelta(spark, pos(0), pos(1), overwrite, maxRecordsPerFile)) {
          System.err.println("Table exists. Pass --overwrite to overwrite data")
          sys.exit(1)
        }
      case "parquet-to-iceberg" =>
        Engine.parquetToIceberg(spark, pos(0), pos(1), overwrite, append, partitionBy)
      case "append-to-delta" =>
        val v = Engine.sqlAppendToDelta(spark, pos(0), pos(1), pos(2), mergeSchema)
        println(s"committed version $v")
      case "compact-delta" =>
        val (before, after) = Engine.compactDelta(spark, pos(0))
        println(s"compacted $before files into $after")
      case "vacuum-delta" =>
        val retention = pos.lift(1).map(_.toLong).getOrElse(7L * 24 * 3600 * 1000)
        val n = sinks.DeltaSink.vacuum(spark, pos(0), retention)
        println(s"deleted $n files")
      case "compact-iceberg" =>
        val (b, a) = sinks.IcebergSink.compact(spark, pos(0))
        println(s"compacted $b files into $a")
      case "remove-orphans-iceberg" =>
        // remove-orphans-iceberg <table> [olderThanMs] — reclaim files no
        // snapshot references (default 3-day age gate)
        val age = pos.lift(1).map(_.toLong).getOrElse(3L * 24 * 3600 * 1000)
        val gone = sinks.IcebergSink.removeOrphanFiles(spark, pos(0), age)
        println(s"reclaimed ${gone.size} orphan files")
      case "rewrite-manifests-iceberg" =>
        // rewrite-manifests-iceberg <table> — metadata-only manifest merge
        val (b, a) = sinks.IcebergSink.rewriteManifests(pos(0))
        println(s"merged $b data manifests into $a")
      case "expire-iceberg" =>
        val keep = pos.lift(1).map(_.toInt).getOrElse(2)
        val n = sinks.IcebergSink.expireSnapshots(pos(0), keep)
        println(s"expired snapshots, deleted $n data files")
      case "delete-delta" =>
        // delete-delta <table> <predicate> — copy-on-write row-level delete
        val n = sinks.DeltaSink.deleteWhere(spark, pos(0), pos(1))
        println(s"deleted $n rows")
      case "update-delta" =>
        // update-delta <table> <predicate> <col=expr[,col=expr...]> —
        // splitSpecs keeps commas inside function calls (coalesce(v,0))
        val sets = splitSpecs(pos(2)).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"want col=expr, got $kv")
          kv.take(i).trim -> kv.drop(i + 1).trim
        }.toMap
        val n = sinks.DeltaSink.updateWhere(spark, pos(0), pos(1), sets)
        println(s"updated $n rows")
      case "delete-iceberg" =>
        // delete-iceberg <table> <predicate> [--branch b] — positional
        // delete files (MoR); --branch targets a staging ref (audit-fix)
        val n = sinks.IcebergSink.deleteWhere(spark, pos(0), pos(1),
          branch = branch)
        println(s"deleted $n rows")
      case "upsert-iceberg" =>
        // upsert-iceberg <sourceParquet> <table> <k1,k2> [--branch b] —
        // atomic keyed upsert via equality deletes
        val src = spark.read.parquet(pos(0))
        val n = sinks.IcebergSink.upsert(spark, pos(1), src,
          pos(2).split(',').toSeq, branch = branch)
        println(s"upserted $n rows")
      case "evolve-iceberg" =>
        // evolve-iceberg <sourceParquet> <table> — add-column append
        sinks.IcebergSink.evolve(spark.read.parquet(pos(0)), pos(1),
          partitionBy = partitionBy)
        println("evolved and appended")
      case "parquet-to-delta-generated" =>
        // parquet-to-delta-generated <sourceParquet> <table> <col> <expr>
        // — create with a generated column (use --partition-by to lay out)
        sinks.DeltaSink.writeGenerated(spark.read.parquet(pos(0)), pos(1),
          Map(pos(2) -> pos(3)), partitionBy = partitionBy)
        println(s"created with generated column ${pos(2)}")
      case "add-constraint-delta" =>
        // add-constraint-delta <table> <name> <sqlExpr> — CHECK constraint
        sinks.DeltaSink.addCheckConstraint(spark, pos(0), pos(1), pos(2))
        println(s"added CHECK constraint ${pos(1)}")
      case "drop-constraint-delta" =>
        // drop-constraint-delta <table> <name>
        sinks.DeltaSink.dropCheckConstraint(spark, pos(0), pos(1))
        println(s"dropped CHECK constraint ${pos(1)}")
      case "maintain-delta" =>
        // maintain-delta <table> [maxSmallFiles] [dvPurgeRatio] — the
        // policy janitor: purge/compact/checkpoint/vacuum as thresholds say
        val (p, c, v, sy) = sinks.Maintenance.maintainDelta(spark, pos(0),
          maxSmallFiles = pos.lift(1).map(_.toInt).getOrElse(64),
          dvPurgeRatio = pos.lift(2).map(_.toDouble).getOrElse(0.1))
        println(s"purged=$p compacted=$c vacuumed=$v uniformSynced=$sy")
      case "maintain-iceberg" =>
        // maintain-iceberg <table> [maxManifests] [keepLast]
        val (r, e, o, dc) = sinks.Maintenance.maintainIceberg(spark, pos(0),
          maxManifests = pos.lift(1).map(_.toInt).getOrElse(64),
          keepLast = pos.lift(2).map(_.toInt).getOrElse(5))
        println(s"manifestsMerged=$r filesExpired=$e orphansRemoved=$o dvCompacted=$dc")
      case "history-delta" =>
        // history-delta <table> — DESCRIBE HISTORY (metadata-only)
        sinks.DeltaSink.history(spark, pos(0)).collect().foreach(r =>
          println(s"v${r.getLong(0)}  ${new java.sql.Timestamp(r.getLong(1))}  " +
            s"${r.getString(2)}  +${r.getLong(3)}/-${r.getLong(4)}"))
      case "reorg-delta" =>
        // reorg-delta <table> — REORG APPLY (PURGE): rewrite DV-carrying
        // files as survivors, drop the deletion vectors
        val (nf, nr) = sinks.DeltaSink.reorgPurge(spark, pos(0))
        println(s"purged $nr rows from $nf files")
      case "delete-dv-delta" =>
        // delete-dv-delta <table> <predicate> — merge-on-read delete via
        // deletion vectors (bumps protocol to reader v3/writer v7)
        val n = sinks.DeltaSink.deleteWhereDV(spark, pos(0), pos(1))
        println(s"deleted $n rows (deletion vectors)")
      case "update-dv-delta" =>
        // update-dv-delta <table> <predicate> <col=expr>[,<col=expr>...] —
        // merge-on-read update via deletion vectors
        val sets = splitSpecs(pos(2)).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"want col=expr, got $kv")
          kv.take(i).trim -> kv.drop(i + 1).trim
        }.toMap
        val n = sinks.DeltaSink.updateWhereDV(spark, pos(0), pos(1), sets)
        println(s"updated $n rows (deletion vectors)")
      case "delete-dv-iceberg" =>
        // delete-dv-iceberg <table> <predicate> — V3 deletion vectors
        // (Puffin; ratchets format-version to 3)
        val n = sinks.IcebergSink.deleteWhereDV(spark, pos(0), pos(1))
        println(s"deleted $n rows (v3 deletion vectors)")
      case "update-dv-iceberg" =>
        // update-dv-iceberg <table> <predicate> <col=expr>[,...] — V3 DV
        // merge-on-read update: one overwrite snapshot masks + replaces
        val sets = splitSpecs(pos(2)).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"want col=expr, got $kv")
          kv.take(i).trim -> kv.drop(i + 1).trim
        }.toMap
        val n = sinks.IcebergSink.updateWhereDV(spark, pos(0), pos(1), sets)
        println(s"updated $n rows (v3 deletion vectors)")
      case "enable-ict-delta" =>
        // enable-ict-delta <table> — in-commit timestamps: the durable
        // commit clock (writer v7 feature; survives log copy/rsync)
        sinks.DeltaSink.enableInCommitTimestamps(spark, pos(0))
        println("in-commit timestamps enabled")
      case "checkpoint-v2-delta" =>
        // checkpoint-v2-delta <table> — v2 checkpoint (manifest +
        // sidecars; feature-gates reader 3 / v2Checkpoint first)
        val v = sinks.DeltaSink.checkpointV2(spark, pos(0))
        println(s"v2 checkpoint at version $v")
      case "enable-row-tracking-delta" =>
        // enable-row-tracking-delta <table> — the Iceberg row-lineage
        // twin: stable row ids, metadata-only retroactive assignment
        val n = sinks.DeltaSink.enableRowTracking(spark, pos(0))
        println(s"row tracking enabled; $n rows assigned")
      case "add-column-iceberg" =>
        // add-column-iceberg <table> <name> <icebergType> [default] —
        // metadata-only ALTER ADD COLUMN with v3 default values: old
        // rows read the initial-default, omitting writers get the
        // write-default filled
        val dflt: Option[Any] = pos.lift(3).map { raw =>
          pos(2) match {
            case "int" | "long" => raw.toLong
            case "float" | "double" => raw.toDouble
            case "boolean" => raw.toBoolean
            case _ => raw
          }
        }
        sinks.IcebergSink.evolveAddColumn(pos(0), pos(1), pos(2), dflt)
        println(s"added column ${pos(1)}" +
          dflt.map(d => s" default $d").getOrElse(""))
      case "enable-row-lineage-iceberg" =>
        // enable-row-lineage-iceberg <table> — V3 row lineage: assigns
        // stable row ids retroactively (metadata-only) and starts the
        // next-row-id clock; later commits keep assigning
        val n = sinks.IcebergSink.enableRowLineage(spark, pos(0))
        println(s"row lineage enabled; $n rows assigned")
      case "write-stats-iceberg" =>
        // write-stats-iceberg <table> <col1,col2,...> — Puffin table
        // statistics: per-column theta sketches + the ndv property the
        // NDV-driven broadcast hook reads
        val ndvs = sinks.IcebergStats.writeStats(spark, pos(0),
          splitSpecs(pos(1)))
        println(ndvs.toSeq.sortBy(_._1)
          .map { case (c, n) => s"$c=$n" }.mkString("ndv: ", ", ", ""))
      case "write-stats-delta" =>
        // write-stats-delta <table> <col1,col2,...> — the Delta twin:
        // theta NDV Puffin registered through the graft.stats domain
        val ndvs = sinks.DeltaSink.writeStats(spark, pos(0),
          splitSpecs(pos(1)))
        println(ndvs.toSeq.sortBy(_._1)
          .map { case (c, n) => s"$c=$n" }.mkString("ndv: ", ", ", ""))
      case "write-partition-stats-iceberg" =>
        // write-partition-stats-iceberg <table> — spec §Partition
        // statistics: per-partition census parquet, registered
        val n = sinks.IcebergStats.writePartitionStats(spark, pos(0))
        println(s"partition statistics written for $n partitions")
      case "cluster-by-delta" =>
        // cluster-by-delta <table> <col1,col2,...> — liquid clustering:
        // metadata-only declaration; the next compact clusters by it
        sinks.DeltaSink.clusterBy(spark, pos(0), splitSpecs(pos(1)))
        println(s"clustering declared: ${pos(1)}")
      case "rename-column-delta" =>
        // rename-column-delta <table> <from> <to> — metadata-only (column mapping)
        sinks.DeltaSink.renameColumn(spark, pos(0), pos(1), pos(2))
        println(s"renamed ${pos(1)} to ${pos(2)}")
      case "drop-column-delta" =>
        // drop-column-delta <table> <column> — metadata-only (column mapping)
        sinks.DeltaSink.dropColumn(spark, pos(0), pos(1))
        println(s"dropped ${pos(1)}")
      case "update-iceberg" =>
        // update-iceberg <table> <predicate> <col=expr>[,...] — MoR update
        val sets = splitSpecs(pos(2)).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"want col=expr, got $kv")
          kv.take(i).trim -> kv.drop(i + 1).trim
        }.toMap
        val n = sinks.IcebergSink.updateWhere(spark, pos(0), pos(1), sets,
          branch = branch)
        println(s"updated $n rows (merge-on-read)")
      case "drop-column-iceberg" =>
        // drop-column-iceberg <table> <column> — metadata-only evolution
        sinks.IcebergSink.evolveDrop(pos(0), pos(1))
        println(s"dropped ${pos(1)}")
      case "rename-column-iceberg" =>
        // rename-column-iceberg <table> <from> <to> — metadata-only
        sinks.IcebergSink.evolveRename(pos(0), pos(1), pos(2))
        println(s"renamed ${pos(1)} to ${pos(2)}")
      case "widen-column-iceberg" =>
        // widen-column-iceberg <table> <column> — int→long / float→double
        sinks.IcebergSink.evolveWiden(pos(0), pos(1))
        println(s"widened ${pos(1)}")
      case "evolve-partition-iceberg" =>
        // evolve-partition-iceberg <table> — re-layout future writes to
        // the --partition-by spec; metadata-only (spec §partition-evolution)
        val id = sinks.IcebergSink.evolvePartition(pos(0), partitionBy)
        println(s"default partition spec is now $id")
      case "tag-iceberg" =>
        // tag-iceberg <table> <name> <snapshotId> [branch] — named ref
        sinks.IcebergSink.createRef(pos(0), pos(1), pos(2).toLong,
          pos.lift(3).getOrElse("tag"))
        println(s"ref ${pos(1)} -> ${pos(2)}")
      case "drop-ref-iceberg" =>
        // drop-ref-iceberg <table> <name>
        sinks.IcebergSink.dropRef(pos(0), pos(1))
        println(s"dropped ref ${pos(1)}")
      case "publish-branch-iceberg" =>
        // publish-branch-iceberg <table> <branch> — fast-forward main to
        // the branch head (write-audit-publish's publish step)
        val h = sinks.IcebergSink.fastForward(pos(0), pos(1))
        println(s"main -> $h")
      case "append-branch-iceberg" =>
        // append-branch-iceberg <sourceParquet> <table> <branch> — commit
        // to a named branch ref; main untouched (write-audit-publish lane)
        val head = sinks.IcebergSink.appendBranch(
          spark.read.parquet(pos(0)), pos(1), pos(2))
        println(s"branch ${pos(2)} -> $head")
      case "sync-iceberg-from-delta" =>
        // sync-iceberg-from-delta <table> — refresh the Iceberg view of a
        // dual-format table after Delta commits (metadata-only)
        val ns = sinks.IcebergSink.syncFromDelta(spark, pos(0))
        println(if (ns == 0) "already in sync" else s"synced $ns live files")
      case "convert-iceberg-to-delta" =>
        // convert-iceberg-to-delta <table> — reverse in-place convert
        val nf2 = sinks.DeltaSink.convertFromIceberg(spark, pos(0))
        println(s"converted $nf2 live files")
      case "convert-delta-to-iceberg" =>
        // convert-delta-to-iceberg <table> — UniForm-style in-place
        // metadata-only convert; both front-ends stay readable
        val nf = sinks.IcebergSink.convertFromDelta(spark, pos(0))
        println(s"converted $nf live files")
      case "clone-delta" =>
        // clone-delta <source> <target> — zero-copy shallow clone
        val n = sinks.DeltaSink.cloneTable(spark, pos(0), pos(1))
        println(s"cloned: $n files referenced, zero copied")
      case "restore-delta" =>
        // restore-delta <table> <version> — metadata-only undo
        val (re, rm) = sinks.DeltaSink.restore(spark, pos(0), pos(1).toLong)
        println(s"restored: re-added $re files, removed $rm")
      case "rollback-iceberg" =>
        // rollback-iceberg <table> <snapshotId> — metadata-only undo
        sinks.IcebergSink.rollback(pos(0), pos(1).toLong)
        println("rolled back")
      case "merge-delta" =>
        // merge-delta <sourceParquet> <table> <k1,k2> [--delete-col c]
        val src = spark.read.parquet(pos(0))
        val (rw, sk, ad) = sinks.DeltaSink.merge(spark, pos(1), src,
          pos(2).split(',').toSeq, deleteCol)
        println(s"rewrote $rw files, skipped $sk, added $ad")
      case "pgcopy-to-delta" =>
        val df = sources.PgCopyBinarySource
          .fromFiles(pos.drop(2).toSeq, parseColSpec(pos(0))).load(spark)
        if (!sinks.DeltaSink.write(df, pos(1), overwrite,
            maxRecordsPerFile = maxRecordsPerFile)) {
          System.err.println("Table exists. Pass --overwrite to overwrite data")
          sys.exit(1)
        }
      case "csv-to-delta" =>
        // csv-to-delta <file.csv> <table> [--overwrite] — header + inferred
        // schema (Engine.csvToDelta documents the pin-a-schema production path)
        if (!Engine.csvToDelta(spark, pos(0), pos(1), overwrite)) {
          System.err.println("Table exists. Pass --overwrite to overwrite data")
          sys.exit(1)
        }
      case "json-to-delta" =>
        if (!Engine.jsonToDelta(spark, pos(0), pos(1), overwrite)) {
          System.err.println("Table exists. Pass --overwrite to overwrite data")
          sys.exit(1)
        }
      case "export-jsonl" =>
        // export-jsonl <dataDir> <sql> <outDir> — query → JSON-lines shards,
        // the hand-off format training loaders consume; sharding follows the
        // query's partitioning, so a repartition in <sql> controls shard count
        val n = Engine.exportJsonl(spark, pos(0), pos(1), pos(2))
        println(s"wrote $n rows")
      case "pg-to-delta" | "pg-to-iceberg" =>
        // pg-to-{delta,iceberg} <host:port> <database> <user> <colSpec>
        // <sql> <table> — the reference's live verbs (lib.rs:18-41): run
        // <sql> on Postgres over a real socket (PGPASSWORD picked up from
        // the environment, pg_arrow_source.rs:206-209) and load the COPY
        // BINARY stream into a lakehouse table. TLS follows the libpq env
        // contract: PGSSLMODE = disable | prefer (default) | require —
        // the transport negotiates the SSLRequest preamble and speaks
        // trust/cleartext/md5/scram-sha-256 auth (r9).
        val hp = pos(0).split(':')
        require(hp.length == 2, "want host:port")
        val transport = sources.PgSocketTransport(hp(0), hp(1).toInt,
          user = pos(2), database = pos(1), query = pos(4))
        val df = sources.PgCopyBinarySource(Seq(transport), parseColSpec(pos(3)))
          .load(spark)
        if (args(0) == "pg-to-iceberg")
          sinks.IcebergSink.writeWithRetry(df, pos(5),
            sinks.IcebergSink.resolveMode(overwrite, append))
        else if (!sinks.DeltaSink.write(df, pos(5), overwrite,
            maxRecordsPerFile = maxRecordsPerFile)) {
          System.err.println("Table exists. Pass --overwrite to overwrite data")
          sys.exit(1)
        }
      case other =>
        System.err.println(s"unknown subcommand: $other")
        sys.exit(2)
    }
  }
}
