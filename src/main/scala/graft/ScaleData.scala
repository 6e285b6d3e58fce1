package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-corpus generator for the sf-scaling check (VERDICT r7 #2): the
  * 100 TB arguments are shape arguments, so one 5–10× data point catches
  * any super-linear surprise cheaply. Replicates a driver-generated SF
  * directory `copies`× with CONSISTENT key offsets — every join
  * relationship (l_orderkey↔o_orderkey, o_custkey↔c_custkey,
  * events.user_id↔c_custkey, …) holds within each copy, so every declared
  * query runs unchanged on `copies`× the rows.
  *
  * Replication must widen every DOMAIN the queries join or group on, not
  * only the key space — otherwise cross-copy coincidences manufacture
  * quadratic work no real corpus growth would (first 5× run measured
  * exactly this: unshifted dates made the temporal band joins match every
  * copy against every copy — 25× output at 5× data):
  *  - TEMPORAL columns (o_orderdate, l_shipdate, events.ts) shift by
  *    copyIndex × (global corpus time span + 7 d), one shared unit so
  *    every cross-table temporal relationship (as-of, bands, sessions)
  *    holds within a copy and never across copies — and span-derived
  *    work (gap-fill grids) grows linearly, not with an inter-copy void;
  *  - `c_acctbal`/`s_acctbal` shift by copyIndex × 1e6 (beyond the ±10k
  *    range) so the VALUE-band joins stay within-copy;
  *  - `documents.text` is alphabet-ROTATED per copy: identical replicated
  *    texts would make every doc a 5-way near-duplicate and blow the
  *    dedup operators' candidate-pair counts up QUADRATICALLY in the copy
  *    count. Rotation keeps each copy's internal near-dup structure
  *    identical (shingles rotate together) while cross-copy Jaccard
  *    drops to ~0, so dedup work scales exactly linearly;
  *  - dimension tables region/nation copy as-is (they are genuinely
  *    fixed-cardinality at any SF, like TPC-H).
  * The one operator that legitimately stays quadratic under ANY growth of
  * both inputs is q_join_range's intentional BroadcastNestedLoopJoin —
  * the demonstrator whose scale path IS the binned/auto variants.
  *
  * Usage: `runMain graft.ScaleData <fromDir> <outDir> <copies>`.
  */
object ScaleData {

  private def rotated(k: Int): (String, String) = {
    val lower = ('a' to 'z').mkString
    val upper = ('A' to 'Z').mkString
    def rot(s: String) = s.drop(k % 26) + s.take(k % 26)
    (lower + upper, rot(lower) + rot(upper))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <fromDir> <outDir> <copies>")
    val Array(fromDir, outDir, copiesS) = args
    val copies = copiesS.toInt
    // upper bound = the alphabet-rotation period: copy 26's text would be
    // verbatim copy 0 again, reintroducing the cross-copy dup blowup the
    // rotation exists to prevent
    require(copies >= 1 && copies <= 26,
      s"copies must be in [1, 26] (text rotation period); got $copies")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = Tables(spark, fromDir, name)
    def unit(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1

    val uOrder = unit(t("orders"), "o_orderkey")
    val uCust = unit(t("customer"), "c_custkey")
    val uSupp = unit(t("supplier"), "s_suppkey")
    val uPart = unit(t("part"), "p_partkey")
    val uEvent = unit(t("events"), "event_id")
    val uDoc = unit(t("documents"), "doc_id")
    val uVec = unit(t("embeddings"), "vec_id")
    // ONE shared temporal shift unit: the widest span among all temporal
    // columns (+7 d buffer), so copies never overlap in time anywhere
    val uTimeDays: Long = Seq(
      ("orders", "o_orderdate"), ("lineitem", "l_shipdate"), ("events", "ts"))
      .map { case (tb, c) =>
        t(tb).agg(datediff(max(col(c)), min(col(c)))).head().getInt(0).toLong
      }.max + 7
    val uBal = 1000000.0

    /** df × copies, with the listed bigint key columns shifted by
      * copyIndex·unit so each copy is a self-consistent universe.
      */
    def scale(df: DataFrame, shifts: Map[String, Long],
        extra: (DataFrame, org.apache.spark.sql.Column) => DataFrame = (d, _) => d): DataFrame = {
      val k = col("__graft_copy")
      val crossed = df.crossJoin(
        spark.range(copies.toLong).select(col("id").as("__graft_copy")))
      val shifted = shifts.foldLeft(crossed) { case (d, (c, u)) =>
        d.withColumn(c, col(c) + k * u)
      }
      extra(shifted, k).drop("__graft_copy")
    }

    def shiftTime(c: String)(d: DataFrame, k: org.apache.spark.sql.Column): DataFrame =
      d.withColumn(c, expr(s"timestampadd(DAY, __graft_copy * $uTimeDays, $c)"))
    def shiftBal(c: String)(d: DataFrame, k: org.apache.spark.sql.Column): DataFrame =
      d.withColumn(c, col(c) + k * uBal)

    val out: Seq[(String, DataFrame)] = Seq(
      "region" -> t("region"),
      "nation" -> t("nation"),
      "customer" -> scale(t("customer"), Map("c_custkey" -> uCust),
        extra = shiftBal("c_acctbal")),
      "supplier" -> scale(t("supplier"), Map("s_suppkey" -> uSupp),
        extra = shiftBal("s_acctbal")),
      "part" -> scale(t("part"), Map("p_partkey" -> uPart)),
      "orders" -> scale(t("orders"),
        Map("o_orderkey" -> uOrder, "o_custkey" -> uCust),
        extra = shiftTime("o_orderdate")),
      "lineitem" -> scale(t("lineitem"),
        Map("l_orderkey" -> uOrder, "l_partkey" -> uPart, "l_suppkey" -> uSupp),
        extra = shiftTime("l_shipdate")),
      "events" -> scale(t("events"),
        Map("event_id" -> uEvent, "user_id" -> uCust),
        extra = shiftTime("ts")),
      "documents" -> scale(t("documents"), Map("doc_id" -> uDoc),
        extra = (d, k) => {
          // per-copy alphabet rotation (see object doc); copy 0 verbatim
          val (from, _) = rotated(0)
          (1 until copies).foldLeft(d.withColumn("__t", col("text"))) {
            case (acc, i) =>
              val (_, to) = rotated(i)
              acc.withColumn("__t",
                when(k === i, translate(col("text"), from, to))
                  .otherwise(col("__t")))
          }.withColumn("text", col("__t")).drop("__t")
            .withColumn("n_chars", length(col("text")).cast("long"))
        }),
      "embeddings" -> scale(t("embeddings"), Map("vec_id" -> uVec)))

    out.foreach { case (name, df) =>
      // realistic multi-file layout (r18): the crossJoin replication
      // inherits the source scan's 1-2 partitions, so every scaled table
      // landed as ONE file — one mapper feeding every downstream shuffle,
      // which distorted the skew audit (AQE's local shuffle read slices a
      // single mapper's output into ~2 chunks, reading as share≈0.5
      // "skew" on perfectly uniform keys) and caps map parallelism no
      // real 5× corpus would. Fixed-width tables spread round-robin over
      // 16 files (deterministic: sort-before-repartition is on);
      // dimension tables stay single-file like the source corpus.
      val big = Set("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")
      val laid = if (big(name)) df.repartition(16) else df
      laid.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] wrote $name")
    }
    spark.stop()
  }
}
