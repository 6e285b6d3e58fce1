package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.{DeltaSink, IcebergSink}

/** The engine's user-facing pipeline API — the Spark-native analogue of the
  * reference CLI's four subcommands (/root/reference/src/lib.rs:18-80):
  *
  *  - `pg-to-delta`/`pg-to-iceberg` ran an arbitrary SQL query on Postgres
  *    and loaded the stream into a table. Here the query runs INSIDE the
  *    engine (`sql`): the corpus parquet tables are registered as views and
  *    Catalyst plans the query — same contract, no external database.
  *  - `parquet-to-delta`/`parquet-to-iceberg` loaded a single parquet file
  *    verbatim ([[parquetToDelta]] / [[parquetToIceberg]]).
  *
  * Iceberg writes go through the OCC retry loop (≤3 attempts,
  * lib.rs:82,168-196) exactly like the reference.
  */
object Engine {

  /** Registers every corpus table under `dir` as a temp view, plus graft's
    * native SQL functions (`graft_dot`).
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    org.apache.spark.sql.GraftColumnBridge.registerFunctions(spark)
    Tables.all.foreach { name =>
      Tables(spark, dir, name).createOrReplaceTempView(name)
    }
  }

  /** The `-q` contract: run an arbitrary SQL query over the corpus
    * (reference lib.rs:39-41 — there delegated to Postgres, here planned
    * natively by Catalyst with pushdown/pruning/AQE).
    */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }

  /** Query → brand-new Delta table. Returns false if the target is
    * non-empty and overwrite was not requested (reference refuse-and-return,
    * delta_destination.rs:421-427). `partitionBy` lays the table out in
    * Hive-style partition dirs recorded in the Delta log — the layout lever
    * that makes 100 TB scans prunable.
    */
  def sqlToDelta(spark: SparkSession, dir: String, query: String,
      table: String, overwrite: Boolean = false,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = DeltaSink.MaxRecordsPerFile): Boolean =
    DeltaSink.write(sql(spark, dir, query), table, overwrite,
      maxRecordsPerFile = maxRecordsPerFile, partitionBy = partitionBy)

  /** OPTIMIZE: bin-packs a Delta table's live files (per partition) and
    * commits the rewrite as a `dataChange=false` version — see
    * [[sinks.DeltaSink.compact]]. Returns (filesBefore, filesAfter).
    */
  def compactDelta(spark: SparkSession, table: String): (Int, Int) =
    DeltaSink.compact(spark, table)

  /** Writes a parquet checkpoint of the Delta log so readers replay
    * O(commits-since-checkpoint) — see [[sinks.DeltaSink.checkpoint]].
    */
  def checkpointDelta(spark: SparkSession, table: String): Long =
    DeltaSink.checkpoint(spark, table)

  /** Query → Iceberg table with the reference's flag matrix
    * (overwrite/append resolve per iceberg_destination.rs:32-37) and OCC
    * commit retry.
    */
  def sqlToIceberg(spark: SparkSession, dir: String, query: String,
      table: String, overwrite: Boolean = false, append: Boolean = false,
      partitionBy: Seq[String] = Nil): Unit =
    IcebergSink.writeWithRetry(sql(spark, dir, query), table,
      IcebergSink.resolveMode(overwrite, append), partitionBy = partitionBy)

  /** Single parquet file → Delta table (reference lib.rs:86-105). */
  def parquetToDelta(spark: SparkSession, file: String, table: String,
      overwrite: Boolean = false,
      maxRecordsPerFile: Long = DeltaSink.MaxRecordsPerFile): Boolean =
    DeltaSink.write(spark.read.parquet(file), table, overwrite,
      maxRecordsPerFile = maxRecordsPerFile)

  /** Single parquet file → Iceberg table (reference lib.rs:121-158). */
  def parquetToIceberg(spark: SparkSession, file: String, table: String,
      overwrite: Boolean = false, append: Boolean = false,
      partitionBy: Seq[String] = Nil): Unit =
    IcebergSink.writeWithRetry(spark.read.parquet(file), table,
      IcebergSink.resolveMode(overwrite, append), partitionBy = partitionBy)

  /** CSV file(s) → Delta table — a source format the reference lacks but a
    * loader's users expect; header + schema inference mirror the reference's
    * discover-schema-then-stream contract (pg_arrow_source.rs:220-236).
    * Pass `schema` to pin types instead of inferring (the production path:
    * inference costs an extra pass and can flip types between loads).
    */
  def csvToDelta(spark: SparkSession, file: String, table: String,
      overwrite: Boolean = false, schema: Option[String] = None): Boolean = {
    val r = spark.read.option("header", "true")
    val df = schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(file)
    DeltaSink.write(df, table, overwrite)
  }

  /** JSON-lines file(s) → Delta table. */
  def jsonToDelta(spark: SparkSession, file: String, table: String,
      overwrite: Boolean = false, schema: Option[String] = None): Boolean = {
    val r = spark.read
    val df = schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).json(file)
    DeltaSink.write(df, table, overwrite)
  }

  /** Query → JSON-lines shards under `out` (gzip-free, one shard per task)
    * — the hand-off format training data loaders consume. Returns the row
    * count (one extra pass; acceptable for an export verb, and the count
    * doubles as the ingest-side manifest check).
    */
  def exportJsonl(spark: SparkSession, dir: String, query: String,
      out: String): Long = {
    val df = sql(spark, dir, query)
    df.write.mode("overwrite").json(out)
    // count the WRITTEN rows with the query's own schema: re-inferring
    // would fail on an empty (but valid) export and cost an extra
    // schema-inference pass
    spark.read.schema(df.schema).json(out).count()
  }

  /** Appends the result of a query to an existing Delta table (one new log
    * version, OCC retry) — see [[sinks.DeltaSink.append]].
    */
  def sqlAppendToDelta(spark: SparkSession, dir: String, query: String,
      table: String, mergeSchema: Boolean = false): Long =
    DeltaSink.append(sql(spark, dir, query), table, mergeSchema = mergeSchema)
}
