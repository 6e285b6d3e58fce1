package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must be independent of physical partitioning — the property that
  * makes the engine's answers stable from local[4] to a 1000-executor
  * cluster. Each representative query is run under different shuffle
  * partition counts and compared row-for-row (every query ends in a total
  * order per the determinism contract, SURVEY.md §2.2).
  */
class DeterminismSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val representative = Seq(
    "q_agg_group",      // shuffle agg with decimal sums
    "q_win_rank",       // window functions over partitions
    "q_join_inner",     // shuffle join
    "q_join_asof",      // union+window as-of rewrite
    "q_sim_cosine_topk",// float scoring + top-k
    "q_dedup_minhash",  // multi-stage hash pipeline
    "q_chunk_overlap",  // stride explode + slice (map-side chunking)
    "q_percentile",     // sort-based quantile interpolation
    "q_percentile_hist",// histogram two-pass quantiles (bucket arithmetic)
    "q_corpus_shuffle", // hash shuffle key + shard assignment
    "q_pack_sequences", // per-shard cumsum offsets
    "q_dedup_cluster",  // iterative CC with per-round materialization
    "q_stats_moments",  // fixed-point moment sums → double formulas
    "q_graph_pagerank", // iterated fixed-point joins
    "q_heavy_hitters",  // CMS merge across partitions feeds a compared bool
    "q_mad_outliers",   // two-pass windowed medians + threshold filter
    "q_rfm",            // global NTILE windows with tiebreaks
    "q_sessionize_islands", // lag + running-sum session numbering
    "q_trend_ols",      // fixed-point normal equations → double formulas
    "q_scd2_build",     // lag run-starts + lead interval close
    "q_changepoint_cusum", // windowed scaled-exact prefix sums + argmax
    "q_join_asof_nearest", // two as-of passes + distance pick
    "q_dedup_keep_best",   // fingerprint window ranking
    "q_text_diversity",    // two keyed aggs → exact-integer divisions
    "q_winsorize",         // interpolated cutpoints + exact-component mean
    "q_rolling_actives",   // explode-based rolling distinct + exact ratio
    "q_agg_mode",          // lexicographic struct-max argmax
    "q_scd2_pit",          // as-of against SCD2 change rows
    "q_incremental_mv",    // change-feed partials additively merged
    "q_lm_score",          // decimal-rounded ln sums → IEEE formula
    "q_percentile_weighted", // collapsed-tie cumsum + integer crossing test
    "q_concurrency_peak",  // sweep-line cumsum over pre-aggregated deltas
    "q_time_travel",       // pinned-version Delta replay
    "q_quality_audit",     // multi-rule counts + anti-join orphans
    "q_tpch_q18",          // having semi-join + reused grouping + top-k
    "q_join_nullsafe",     // EqualNullSafe as a hash-join key
    "q_iceberg_roundtrip", // create + append + manifest read-back
    "q_cumulative_distinct", // first-sighting rewrite of running distinct
    "q_sequence_pattern",  // array_sort-canonicalized journey strings
    "q_delta_merge",       // keyed CDC merge + log read-back
    "q_delta_zorder_read", // compaction + stats-pruned range read
    "q_schema_evolution",  // mergeSchema append + null-filled read
    "q_delta_partition_read", // partition-pruned log-driven scan
    "q_hll_sketch",        // register max-merge partial aggregation
    "q_iceberg_partition_evolve", // metadata-only re-layout + mixed-spec pruned read
    "q_delta_reorg",       // DV purge: round-robin survivor bins + census
    "q_uniform_sync",      // dual-format replace snapshot + cross-plane census
    "q_delta_history",     // action-shape classification census
    "q_delta_ict",         // ICT clock resolution after mtime mangling
    "q_delta_checkpoint_v2", // cold replay through manifest + sidecars
    "q_iceberg_dv",        // V3 DV probe census after superseding deletes
    "q_iceberg_update_dv", // one-snapshot DV mask + replacement census
    "q_stream_iceberg_branch") // branch tail + fastForward handover census

  for (name <- representative)
    test(s"$name is invariant under shuffle-partition count") {
      val fn = SparkEntry.queries(name)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = fn(spark, dir).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        val b = fn(spark, dir).collect().map(_.toString).toSeq
        assert(a.nonEmpty)
        assert(a == b)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
}
