package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live in `graft.queries.*` (one object per block); this
  * object only concatenates them so the driver has a single entry point.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.j3BroadcastStarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TextLLM.queries ++
      graft.queries.Extras.queries ++ graft.queries.GraphInfra.queries ++
      graft.queries.Tpch.queries

  /** Headline subset Bench times (Verify still runs every query):
    * representative of each operator family, excluding the iterative
    * composite demos whose cost is job-scheduling overhead at bench SF. */
  val headline: Seq[String] = Seq(
    "a1_sum_by_flag_status", "j1_orders_customer_segment",
    "j3_broadcast_star_join", "j6_range_join_exec",
    "j9_semi_topk_filter", "w1_top3_per_nation",
    "w3_share_normalization", "a5_dense_weekly", "a6_rollup_worldwide",
    "a11_combo_frequencies",
    "t_heavy_hitters", "a2_exact_dedup_docs", "a9_pivot_by_flag",
    "a10_explode_positions", "skew_salted_agg",
    "t_token_stats", "t_bpe_encode", "t_langid_confusion", "t_bm25_top5",
    "t_repetition_stats", "t_pii_redaction", "t_hash_split",
    "t_decontaminate", "t_fuzzy_decontaminate", "t_lm_transitions",
    "t_boilerplate_lines", "a_exact_moments",
    "j_bloom_prefilter_join",
    "d_minhash_neardups", "s_ann_brute_top5",
    "s_ann_ivfpq_top3",
    "j_asof_prior_view",
    "c_session_stats", "g_pagerank_hosts", "l_snapshot_diff",
    "h3_shipping_priority", "h5_local_supplier_volume",
    "h6_forecast_revenue", "h10_returned_items", "h14_promotion_effect",
    "h18_large_volume_customer", "h4_order_priority",
    "h19_disjunctive_revenue", "l_merge_apply",
    "h8_market_share", "h13_customer_distribution", "l_quality_report",
    "h21_shape_waiting_supplier", "h16_shape_supplier_count",
    "a_quantile_sketch",
    "h2_shape_min_cost_supplier", "h11_shape_important_stock",
    "h20_shape_concentrated_supplier", "d_duplicate_spans",
    "h9_shape_product_profit", "h12_shape_shipping_modes",
    "w_topk_agg_orders")
  // a_kmv_distinct stays out of headline: one more name would overflow
  // the driver's ~1800-char stdout tail (HarnessContractSpec enforces)
  // Trimmed from headline in round 10 so the stdout line keeps its
  // per-query map inside the driver's ~1800-char tail (63 names would
  // overflow into the truncated fallback): a14_histogram_quantity
  // (when-chain binning, timed by the a1/a5 agg family — its slot went
  // to t_heavy_hitters, the only mapPartitions-candidate + verify-count
  // shape in the registry), j6_size_band_when_chain
  // (j6_range_join_exec times the same semantics via the Catalyst
  // extension), c7_weekly_counts (a5_dense_weekly), o4_topk_parts /
  // a8_first_order_per_customer (w1 covers top-k-per-group),
  // s_ann_lsh_top3 (bracketed by brute + ivfpq), t_fingerprint_md5
  // (a2 family), t_chunking / t_mixture_sample (scan-speed column ops),
  // m_binary_meta (metadata-only). All remain in Verify's correctness
  // gate; every r9-flagged regression query stays headline for
  // round-over-round tracking. HarnessContractSpec enforces the budget.
  /** Queries flagged as bench regressions in the latest VERDICT. A
    * flagged query may NOT be rotated out of [[headline]] until a later
    * verdict clears it — rotation is exactly how round 10 lost
    * round-over-round comparability when its regression cluster appeared.
    * HarnessContractSpec enforces `benchPinned ⊆ headline`; update this
    * list (only) from each round's VERDICT.md. Current entries (r14):
    * the three largest clean-to-clean drifters of the r14 +14% uniform
    * drift (33.88s→38.59s at flat calibration) — pinned until VERDICT
    * accepts the round-15 drift adjudication (SCALE.md §round-15):
    * h2_shape_min_cost_supplier (+0.36s, the judge's named profile
    * target), t_heavy_hitters (+0.29s), t_lm_transitions (+0.26s).
    * Rotated out per VERDICT r14: d_minhash_neardups (driver receipt
    * 1.455s ≤ the ~1.7s done-bar) and a11_combo_frequencies (driver
    * 0.52s after the counters-backed cold-codegen adjudication). */
  val benchPinned: Seq[String] = Seq(
    "h2_shape_min_cost_supplier", "t_heavy_hitters", "t_lm_transitions")

  // d_incremental_dedup is deliberately NOT headline: its id-bounded
  // fixture is constant-size at every SF, so the bench would time ~5.6s
  // of iterative-job scheduling overhead (the CC loop's per-round
  // actions), not data throughput. Incremental-dedup scale numbers live
  // in SCALE.md (dedupCorpus/CC rows), where the corpus actually grows.

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.TextLLM.oracle ++
      graft.queries.Extras.oracle ++ graft.queries.GraphInfra.oracle ++
      graft.queries.Tpch.oracle
}
