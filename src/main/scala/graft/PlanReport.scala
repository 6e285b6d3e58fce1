package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: formatted physical plans for the flagship queries with
  * the scale-relevant facts (join strategies, pushdown, codegen spans)
  * visible for review without running anything.
  * Usage: sbt "runMain graft.PlanReport [sfDir] [outFile]"
  */
object PlanReport {
  private val flagship = Seq(
    "q_agg_group" -> "partial+final hash aggregation, fixed-point long sums",
    "q_join_skew_salted" -> "salted keys + shuffle-hash join, no sort passes",
    "q_join_broadcast" -> "dimension joins must broadcast, never shuffle",
    "q_scan_filter" -> "predicates pushed into the parquet scan",
    "q_sim_cosine_topk" -> "broadcast probe set, no cartesian product",
    "q_dedup_minhash" -> "band-bucket equi-joins, exchange reuse at runtime",
    "q_topk_agg" -> "map-side partial top-k bounds the shuffle",
    "q_join_asof" -> "union + single window pass, one shuffle by key",
    "q_sort_limit" -> "global top-N via TakeOrderedAndProject",
    "q_percentile" -> "sort-based exact quantiles, no per-group buffering",
    "q_tfidf" -> "df derives from tf: one explode, AQE stage reuse",
    "q_agg_cube" -> "two-level: Expand runs over the pre-aggregated base",
    "q_chunk_overlap" -> "map-side stride explode + slice, shuffle only to sort",
    "q_sim_ann_lsh" -> "L OR'd band tables: one fused signature expression, equi-joins only",
    "q_text_repetition" -> "one exploded exchange, partial counts, rollup reuses partitioning",
    "q_text_pii_scrub" -> "pure map-side regexp projection inside codegen",
    "q_corpus_shuffle" -> "range-partitioned sort on a uniform hash key, map-side shard assignment",
    "q_pack_sequences" -> "per-shard windowed cumsum — parallel across shards, no global partition",
    "q_rfm" -> "exact distributed NTILE: bucket-partitioned rank windows + broadcast offsets, no global window",
    "q_join_bloom" -> "bloom probe inside the scan's codegen span, broadcast semi-join after",
    "q_bm25" -> "df reuses the tf exchange; 1-row corpus stats broadcast",
    "q_decontaminate" -> "inverted-index gram equi-join, never eval×train all-pairs",
    "q_cluster_kmeans" -> "assignment = literal-centroid dots, map-side only",
    "q_join_range_binned" -> "band join as a binned equi shuffle join — no nested loop",
    "q_join_range_auto" -> "custom optimizer rule bins the naive band join automatically",
    "q_stream_join" -> "interval join: time-bounded equi-join, stream-stream-safe",
    "q_funnel" -> "per-stage per-user min-aggs joined forward — slim keyed shuffles, payload never joins",
    "q_anomaly_zscore" -> "group moments from exact long sums; 5-row stats broadcast; score map-side",
    "q_stats_moments" -> "variance/corr from primitive-long moment sums — one combined shuffle, no decimal agg",
    "q_ngram_topk" -> "map-side gram explode, combined counts, global top-k via TakeOrdered",
    "q_join_interval_overlap" -> "two-sided interval overlap as a binned equi join — no nested loop",
    "q_graph_pagerank" -> "iterated slim keyed joins + combined sums; per-iteration materialization keeps the plan constant-size",
    "q_tpch_q5" -> "6-table chain: dims broadcast, date predicates pushed, one orderkey shuffle",
    "q_graph_triangles" -> "ordered wedges: equi joins + closure semi-join, never all-pairs",
    "q_sessionize_islands" -> "lag + running-sum share ONE window spec: a single per-user sort",
    "q_trend_ols" -> "normal equations from primitive-long moment sums; dims broadcast",
    "q_scd2_build" -> "lag + lead share the user-keyed sort — one shuffle builds the history",
    "q_changepoint_cusum" -> "event-scale work is one combined date rollup; windows run on the tiny series frame",
    "q_join_asof_nearest" -> "two union+window as-of passes — keyed shuffles only, no per-row subquery",
    "q_dedup_keep_best" -> "fingerprint-keyed window ranking, one shuffle",
    "q_text_diversity" -> "two map-side-combined keyed aggs, exact-integer divisions",
    "q_agg_mode" -> "struct-max argmax: two combined aggs, no window, no per-group sort",
    "q_scd2_pit" -> "interval containment compiled to the union+window as-of — no join operator",
    "q_lm_score" -> "vocabulary join cost-based; decimal-rounded ln sums combine map-side",
    "q_percentile_weighted" -> "weighted median: tie-collapsed cumsum, broadcast totals, integer crossing test",
    "q_concurrency_peak" -> "sweep line: pre-aggregated boundary deltas, per-type cumsum, no self-join",
    "q_dedup_lines" -> "map-side sequence+slice chunking; frequency + reassembly are the only shuffles",
    "q_image_phash" -> "per-partition decode, band equi-join candidates — never all-pairs",
    "q_sim_ann_ivfpq" -> "PQ codes (not vectors) shuffle through the cell join; ADC is map-side literal lookups",
    "q_graph_bfs" -> "min-propagation supersteps: slim (node,dist) shuffles, paths never materialize",
    "q_quantile_sketch" -> "constant-size bucket arrays as partial aggregates; quantile walk per group",
    "q_tpch_q4" -> "EXISTS as a hash semi join with the date residual",
    "q_tpch_q6" -> "the pure scan-agg: all predicates pushed, join-free, partial sums",
    "q_tpch_q19" -> "OR'd brand/size/qty blocks stay a residual on one equi join",
    "q_iceberg_delete" -> "merge-on-read census: delete application is a broadcast anti-join, data side never shuffles",
    "q_delta_delete" -> "post-delete read is a plain pruned scan; the CDF feed reads cdc files, never re-diffs",
    "q_iceberg_upsert" -> "upserted state: equality deletes broadcast per key-set, new files scan in place",
    "q_delta_cdf_merge" -> "the merge feed is a cdc-file scan + census — no join back to the table")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.drop(1).headOption.getOrElse("PLANS.md")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans of the flagship queries\n\n"
    sb ++= s"Generated by `graft.PlanReport` over `$sfDir`. The plan-shape\n"
    sb ++= "assertions in `src/test/scala/graft/PlanSpec.scala` keep these from\n"
    sb ++= "regressing; this file makes them reviewable at a glance.\n"
    for ((name, why) <- flagship) {
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      // keep the operator tree; drop the verbose per-node field dumps
      val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).mkString("\n")
      sb ++= s"\n## $name — $why\n\n```\n$tree\n```\n"
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
