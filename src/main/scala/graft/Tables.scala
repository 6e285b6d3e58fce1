package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet corpus (TESTDATA.md).
  *
  * The reference reads exactly one table per run (a Postgres query result or
  * a single Parquet file — /root/reference/src/lib.rs:86-135); this engine
  * exposes the whole corpus as named tables so queries can be declared
  * relationally and Catalyst can plan scans with pushdown + pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Catalog-style plan cache: `spark.read.parquet` lists files and infers
  // the footer schema on every call; reusing the (immutable) DataFrame per
  // (session, dir, table) does that once — the same planning work a real
  // metastore amortizes. Keyed by session too, so test sessions and driver
  // sessions never share plans.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name (expected one of ${all.mkString(", ")})")
    cache.computeIfAbsent((System.identityHashCode(spark).toString, dir, name), { _ =>
      if (name == "events") {
        // events.ts has shipped in two physical layouts across testdata
        // generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
        // reader rejects, so it is read as raw nanos (legacy conf) and
        // rebased with integer `div` (2024 epoch-nanos ≈ 1.7e18 overflows
        // double's 53-bit mantissa; a double division would corrupt
        // timestamps) — and TIMESTAMP(MICROS, isAdjustedToUTC=false),
        // which Spark reads as TIMESTAMP_NTZ. Dispatch on the footer
        // schema and normalize both to session-zone TIMESTAMP (the session
        // is pinned UTC, so the NTZ wall-clock maps to the same instant
        // the oracle sees).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
      } else spark.read.parquet(s"$dir/$name.parquet")
    })
  }

  /** The ts-normalization transform shared by batch and streaming reads of
    * the events table (see the layout note above): raw-nanos LongType and
    * TIMESTAMP_NTZ both become session-zone TIMESTAMP.
    */
  private def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already session-zone TIMESTAMP
    }
  }

  /** The events table as an UNBOUNDED file-source stream (schema pinned
    * from the footer, same ts normalization as the batch path) — the input
    * for the e2e streaming declarations (q_stream_upsert) and any
    * readStream-based test that wants the real corpus instead of a
    * MemoryStream.
    */
  def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val footer = spark.read.parquet(s"$dir/events.parquet").schema
    // the file stream source accepts only directories or globs (it
    // monitors for file arrivals); the corpus is one file per table, so
    // glob it, anchored at the corpus dir for partition discovery
    normalizeEventsTs(
      spark.readStream.schema(footer).option("basePath", dir)
        .parquet(s"$dir/events*.parquet"))
  }
}
