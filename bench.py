"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE COMPACT JSON line (kept well under 1 kB so the driver's tail
capture can parse it — round 3's full per-query dict overflowed the 2 kB
capture and shipped `parsed: null`):
    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {<10 slowest>: sec}, "n": <count>, "sf": "<dir>"}

Full per-query timings are written to BENCH_DETAIL.json next to this file
for round-over-round diffing.

Each query is executed to completion (count() over the result — forces the
full plan without driver-side materialization of every row).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q01_pricing_summary",
    "q02_range_filter",
    "q04_validation_split",
    "q06_duplicate_check",
    "q08_zscore_outliers",
    "q10_lookup_semi_join",
    "q11_summary_group_agg",
    "q14_projection_cast",
    "q16_dedup_exact_content",
    "q18_term_counts",
    "q20_doc_quality",
    "q22_similarity_topk",
    "q24_window_counts",
    "q25_sessionization",
    "q26_ngram_jaccard",
    "q27_minhash_lsh",
    "q28_simhash",
    "q31_bpe_token_count",
    "q32_winnowing",
    "q35_asof_join",
    "q36_range_join",
    "q37_time_rollup",
    "q43_shipping_priority",
    "q46_local_supplier_volume",
    "q47_window_analytics",
    "q48_training_corpus",
    "q50_multiset_ops",
    "q52_near_dup_candidates",
    "q53_date_rules",
    "q54_composed_validation",
    "q55_simhash_near_dups",
    "q56_dedup_clusters",
    "q57_stratified_sample",
    "q59_tfidf",
    "q61_rolling_time",
    "q62_training_mix",
    "q64_grouping_sets",
    "q65_window_suite",
    "q68_repetition_stats",
    "q69_contamination",
    "q71_minhash_clusters",
    "q72_quality_cutoff",
    "q75_event_transitions",
    "q76_top_terms_per_lang",
    "q77_chunk_documents",
    "q78_chunk_dedup",
    "q79_quantize_embeddings",
    "q80_knn_classify",
    "q81_volume_shipping",
    "q82_order_count_distribution",
    "q83_promo_share",
    "q84_large_volume_customers",
    "q85_idle_customers",
    "q89_source_caps",
    "q90_priority_sample",
    "q91_semantic_dedup",
    "q92_disjunctive_pred",
    "q93_small_qty_orders",
    "q94_waiting_suppliers",
    "q95_top_supplier",
    "q96_nation_year_profit",
    "q97_fuzzy_name_match",
    "q98_daily_reconciliation",
    "q99_quality_deciles",
    "q100_approx_quantiles",
    "q101_variant_json",
    "q102_stats_aggs",
    "q103_latest_per_key",
    "q104_json_key_freq",
    "q105_sliding_windows",
    "q106_incremental_dedup",
    "q107_token_budget_fill",
    "q108_sketch_rollup",
    "q109_temperature_mix",
    "q110_gap_fill",
    "q111_mad_outliers",
    "q112_pii_scrub",
    "q113_vocab_coverage",
    "q114_boilerplate_strip",
    "q115_value_trend",
    "q118_benford_digits",
    "q119_column_profile",
    "q120_cohort_retention",
    "q121_knn_classify_lsh",
    "q122_corpus_ingest_batch",
    "q124_order_priority_counts",
    "q125_forecast_revenue",
    "q126_market_share",
    "q127_returned_items",
    "q128_important_parts",
    "q129_late_priority_matrix",
    "q130_parts_supplier_counts",
    "q131_dominant_suppliers",
    "q132_min_cost_supplier",
    "q133_scd2_intervals",
    "q134_funnel_conversion",
    "q135_price_histogram",
    "q136_pair_degree_histogram",
    "q137_revenue_running_share",
    "q138_source_concentration",
    "q139_bigram_lm",
    "q140_lsh_recall_audit",
    "q141_containment_dedup",
    "q142_key_skew_profile",
    "q143_equidepth_deciles",
    "q144_merge_upsert",
    "q145_bpe_pair_counts",
    "q147_mix_rebalance",
    "q148_sequence_packing",
    "q149_segment_dedup",
    "q150_gopher_quality",
    "q151_char_entropy",
    "q152_pagerank",
    "q153_dsir_admission",
    "q154_frequent_terms",
    "q156_pca_embeddings",
    "q157_bm25_retrieval",
    "q158_c4_line_filter",
    "q159_encoding_screen",
    "q160_source_overlap",
    "q161_unigram_drift",
    "q162_lm_quality_filter",
    "q163_prefix_jaccard",
    "q164_rfm_segments",
    "q165_weighted_median",
    "q166_triangle_counts",
    "q167_mmr_rerank",
    "q168_contrastive_negatives",
    "q169_ewma_user_value",
    "q170_mad_price_outliers",
    "q171_cusum_drift",
    "q172_token_pmi",
    "q174_first_touch_attribution",
    "q175_inverted_postings",
    "q176_centroid_similarity",
    "q177_fd_violations",
    "q178_longest_streak",
    "q179_kcore",
    "q180_decay_attribution",
    "q181_percentile_trend",
    "q182_quality_vs_dup",
    "q184_xbar_r_chart",
    "q185_validation_p_chart",
    "q186_we_run_rules",
    "q187_process_capability",
    "q188_ewma_chart",
    "q189_duplicate_spans",
    "q190_countmin_frequency",
    "q191_kmv_distinct",
    "q192_reachable_docs",
    "q193_leakage_safe_split",
    "q194_part_skyline",
    "q195_brand_skyline",
    "q196_quality_auc",
    "q197_rrf_fusion",
    "q198_brand_basket_lift",
    "q199_calibration_bins",
    "q200_open_order_concurrency",
    "q201_pr_curve",
    "q202_event_twap",
    "q203_bloom_prefilter",
    "q204_lang_source_chisq",
    "q205_source_vocab_jaccard",
    "q206_price_hdr_quantiles",
    "q207_sorted_neighborhood",
    "q208_rolling_corr",
    "q209_fd_repair",
    "q210_entity_clusters",
    "q211_snapshot_diff",
    "q212_mutual_best_match",
    "q213_seasonal_residuals",
    "q214_jsonl_scan",
    "q215_value_quantiles_by_type",
    "q216_kfold_assignment",
    "q217_changepoint",
    "q218_window_funnel",
    "q219_blocking_audit",
    "q220_return_rate_wilson",
    "q221_fifo_costing",
    "q222_abc_xyz_matrix",
    "q223_readability",
    "q224_kneser_ney_bigrams",
    "q225_quantile_normalize",
    "q226_fixed_width_scan",
    "q227_reorder_points",
    "q228_mann_kendall",
    "q229_span_corruption",
    "q230_oee_daily",
    "q231_source_ks_drift",
    "q232_customer_gini",
    "q233_mtbf",
    "q234_tokenizer_fertility",
    "q235_conformal_threshold",
    "q236_cuped_adjustment",
    "q237_shapley_attribution",
    "q238_trimmed_value_mean",
    "q239_otif_rate",
    "q240_lexical_richness",
    "q241_xml_scan",
    "q242_theil_sen",
    "q243_forecast_backtest",
    "q244_mix_ess",
    "q245_runs_test",
    "q246_supplier_scorecard",
    "q247_hazard_table",
    "q248_did_estimator",
    "q249_price_index",
    "q250_term_burstiness",
    "q251_covariate_balance",
    "q252_embedding_norms",
    "q253_seasonality_strength",
    "q254_conversion_ztest",
    "q255_langid_confusion",
    "q256_cold_start_audit",
    "q257_screen_kappa",
    "q258_decile_lift",
    "q259_revenue_drawdown",
    "q260_demand_intermittency",
    "q261_abc_migration",
    "q262_hll_bounds_audit",
    "q263_quantile_rank_audit",
    "q264_rollup_consistency_audit",
    "q265_psi_value_drift",
    "q266_quantity_woe",
    "q267_customer_target_encoding",
    "q268_kaplan_meier",
    "q269_qini_uplift",
    "q270_weighted_sample",
    "q271_chao1_richness",
    "q272_source_jsd",
    "q273_cell_purity",
    "q274_lang_source_mi",
    "q275_histogram_calibration",
    "q276_ndcg_bm25",
    "q277_spearman_length_tokens",
    "q278_screen_mcnemar",
    "q279_cramers_v",
    "q280_poisson_bootstrap",
    "q281_revenue_acf",
    "q282_keyword_routing",
    "q283_hits_scores",
    "q284_transition_entropy",
    "q285_srm_check",
    "q286_source_diversity",
    "q287_zorder_layout",
    "q288_rake_keywords",
    "q289_good_turing",
    "q290_eb_return_rates",
    "q291_croston_forecast",
    "q292_link_prediction",
    "q293_burrows_delta",
    "q294_economic_order_qty",
    "q295_simpson_screen",
    "q296_price_elasticity",
    "q297_newsvendor_stock",
    "q298_cochran_q",
    "q299_nelson_aalen",
    "q300_brier_decomposition",
    "q301_fs_weights",
    "q303_bh_fdr_cells",
    "q304_kruskal_wallis",
    "q305_zipf_fit",
    "q306_heaps_fit",
    "q307_dunn_posthoc",
    "q308_brown_forsythe",
    "q309_cliffs_delta",
    "q310_wilcoxon_signed_rank",
    "q311_friedman_event_mix",
    "q312_jonckheere_trend",
    "q313_mood_median",
    "q314_cvm_quantity_drift",
    "q315_ad_lang_tails",
    "q316_kendall_tau_qty_discount",
    "q317_ipf_raking",
    "q318_forecast_scorecard",
    "q321_page_trend",
    "q322_durbin_watson",
    "q323_seasonal_mann_kendall",
    "q324_oneway_anova_f",
    "q325_welch_t_quantity",
    "q326_orc_roundtrip",
    "q328_bartlett",
    "q329_g_test",
    "q330_pca_bounds_audit",
    "q332_jarque_bera",
    "q333_mood_scale",
    "q334_kendall_w",
    "q335_degree_assortativity",
    "q336_bullwhip_ratio",
    "q337_holt_linear",
    "q338_neyman_allocation",
    "q339_fleiss_kappa",
    "q340_winsorized_mean",
    "q341_benford_gof",
    "q342_logrank_arms",
    "q343_cochran_armitage",
    "q344_cmh_test",
    "q345_cronbach_alpha",
    "q346_embedding_mmd",
    "q348_hosmer_lemeshow",
    "q349_mrr_bm25",
    "q350_somers_tau_c",
    "q351_mann_whitney",
    "q352_kuiper_lang_drift",
    "q353_tv_hellinger",
    "q354_wasserstein_energy",
    "q355_ljung_box",
    "q356_periodogram",
    "q357_kpss",
    "q358_arch_lm",
    "q359_ols_pricing",
    "q360_inequality_indices",
    "q361_grubbs_extreme",
    "q362_map_recall",
    "q363_cluster_validity",
    "q364_fosd_check",
    "q365_quade",
    "q366_pacf",
    "q367_cointegration",
    "q368_hurst",
    "q369_info_gain",
    "q370_boxcox",
    "q371_permutation_entropy",
    "q372_turning_points",
    "q373_partial_corr",
    "q374_gumbel_pwm",
    "q375_lins_ccc",
    "q376_youden",
    "q377_partitioned_scan",
    "q378_cochran_c",
    "q379_breusch_pagan",
    "q380_chow_test",
    "q381_bland_altman",
    "q382_shard_skew",
    "q383_ansari_bradley",
    "q386_bmp_decode",
    "q387_wav_decode",
    "q388_granger_lag1",
    "q389_pettitt",
    "q390_avi_frames",
    "q391_stuart_maxwell",
    "q392_diebold_mariano",
    "q393_png_decode",
    "q395_bucketed_join",
    "q397_bucketed_shipping_priority",
    "q398_bloom_semijoin_reduction",
    "q400_dynamic_partition_pruning",
    "q402_parquet_layout_audit",
    "q403_aqe_skew_join",
    "q404_label_propagation",
    "q406_bucket_pruning",
    "q407_python_datasource",
]

# No-silent-caps ledger (r7): every registered query is either in HEADLINE
# or named here with the reason it is not timed. main() asserts the union
# covers queries() exactly, so a new registration that is neither benched
# nor excluded fails the bench loudly instead of dropping off the radar.
_VARIANT = "light variant of a benched family (same operators, smaller plan)"
_STUB = "multimodal byte-math stub; timing would measure the fake codec, not Spark"
EXCLUDED = {
    "q03_regex_filter": _VARIANT + " — q02/q04 cover the rule compiler",
    "q05_error_report": _VARIANT + " — q13 covers the error sink shape",
    "q07_unique_daily": _VARIANT + " — q06/q54 cover dedup rules",
    "q09_referential_anti_join": _VARIANT + " — q10 covers broadcast anti/semi",
    "q12_top_k": _VARIANT + " — q43 covers TakeOrderedAndProject",
    "q13_preview_truncate": "limit-5 preview; sub-ms by construction",
    "q15_json_extract": _VARIANT + " — q101/q104 cover JSON paths",
    "q17_dedup_exact_keys": _VARIANT + " — q16 covers exact dedup",
    "q19_lang_stats": _VARIANT + " — q21/q59 cover text scans",
    "q21_language_id": _VARIANT + " — q255 benches the same classifier + confusion",
    "q23_multimodal_join": _STUB,
    "q29_lsh_ann": _VARIANT + " — q52/q121/q140 bench the LSH ANN path",
    "q30_multimodal_decode": _STUB,
    "q33_ivf_ann": _VARIANT + " — q121/q140 bench the bucketed ANN joins",
    "q34_embedding_near_dups": "gated quadratic oracle baseline (allow_quadratic)"
    "; deliberately never on the production path",
    "q38_set_ops": _VARIANT + " — q50 benches INTERSECT/EXCEPT ALL",
    "q39_cube": _VARIANT + " — q64 benches Expand+agg",
    "q40_pivot": _VARIANT + " — pinned-values single scan, sub-second",
    "q41_percentiles": _VARIANT + " — q143/q206 bench quantiles",
    "q42_salted_join": _VARIANT + " — correctness twin of the plain join",
    "q44_two_stage_agg": _VARIANT + " — q11/q45 cover partial aggs",
    "q45_distinct_agg": _VARIANT + " — q11 covers group-aggs",
    "q49_frame_sample": _STUB,
    "q51_session_window": _VARIANT + " — q25 benches sessionization",
    "q58_train_split": _VARIANT + " — q57/q193 bench split assignment",
    "q60_vocab": _VARIANT + " — q113 benches the top-N vocab window",
    "q63_normalize_text": _VARIANT + " — q112/q114 bench text rewrites",
    "q66_correlated_subquery": _VARIANT + " — q85/q95 bench decorrelation",
    "q67_unpivot": _VARIANT + " — stack() projection, sub-second",
    "q70_shard_pack": _VARIANT + " — q148 benches packing",
    "q73_asof_tolerance": _VARIANT + " — q35 benches the as-of join",
    "q74_hll_distinct": "engine-private sketch, rows-only; q191 benches KMV twin",
    "q86_unigram_logprob": _VARIANT + " — q139/q224 bench LM scoring",
    "q87_ngram_novelty": _VARIANT + " — q69/q161 bench n-gram overlap",
    "q88_label_centroids": _VARIANT + " — q91/q176 bench centroid paths",
    "q116_media_resize": _STUB,
    "q117_media_features": _STUB,
    "q123_csv_scan": "pinned-schema CSV scan; I/O-bound read, benched via pytest",
    "q319_orc_scan": "pinned-schema ORC scan of a 9-row golden fixture; same "
    "class as q123_csv_scan — timing measures fixture-read overhead, not "
    "plan cost (r8 advisor note)",
    "q327_schema_drift": "driver-side metadata pre-flight over a 9-row "
    "fixture header; timing would measure Spark session overhead, not a plan",
    "q146_bpe_merges": "iterative driver-round loop (documented residual); "
    "wall time is fixed per-round latency, pinned by pytest not bench",
    "q155_bpe_encode": "same driver-round loop family as q146",
    "q183_phonetic_match": _VARIANT + " — q97/q207 bench blocking joins",
    "q302_streaming_bloom_state": "real foreachBatch streaming run; wall "
    "time is micro-batch startup latency, not plan cost — the bloom "
    "arithmetic it accumulates is benched via q203 and the stream==batch "
    "merge is pinned by tests/test_streaming.py",
    "q320_streaming_cms_state": "same foreachBatch streaming-run family "
    "as q302 (additive CMS merge); the sketch arithmetic is benched via "
    "q190 and the stream==batch merge is pinned by tests/test_streaming.py",
    "q347_streaming_kmv_state": "foreachBatch streaming run (lands files + "
        "drains a stream); timing measures stream machinery, not plan cost — "
        "same class as q302/q320/q331",
    "q331_streaming_minhash_index": "same foreachBatch streaming-run "
    "family as q302/q320 (append-only index accumulator); the MinHash "
    "pipeline it runs per batch is benched via q27 and stream==batch is "
    "pinned by tests/test_streaming.py",
    "q384_streaming_running_stats": "streaming run (lands files + drains "
    "an applyInPandasWithState stream); timing measures micro-batch + "
    "Python state-worker startup, not plan cost — same class as "
    "q302/q320/q331/q347; the batch aggregate it must equal is benched "
    "via q11/q45 and stream==batch is pinned by the oracle + pytest",
    "q385_streaming_interval_join": "streaming run (lands files + drains "
    "a stream-stream interval join); timing measures stream machinery — "
    "the equivalent batch interval join is benched via q35/q73's as-of "
    "family and stream==batch is pinned by the oracle + pytest",
    "q394_streaming_dedup": "streaming run (lands a doubled copy of events "
    "+ drains a dropDuplicatesWithinWatermark stream); timing measures "
    "stream machinery — the batch dedup it must equal is benched via "
    "q16's exact-dedup family and the dedup state semantics are pinned "
    "by the oracle + tests/test_streaming.py",
    "q396_streaming_session_window": "streaming run (time-range-split "
    "landing + sentinel flush batch through the merging-session-window "
    "state store); timing measures stream machinery — the batch "
    "session_window it must equal is benched via q25/q51's "
    "sessionization family and stream==batch is pinned by the oracle",
    "q399_streaming_outer_interval_join": "streaming run (time-range-"
    "split dual landing + sentinel flush through the LEFT OUTER "
    "stream-stream join state's expiry-driven emission); timing "
    "measures stream machinery — the batch left interval join it must "
    "equal is benched via q35/q73's as-of family and stream==batch is "
    "pinned by the oracle",
    "q401_streaming_chained_stateful": "streaming run (re-delivered + "
    "time-ranged landing through TWO chained state stores: watermarked "
    "dedup feeding a windowed aggregation); timing measures stream "
    "machinery — the batch dedup and window-agg it must equal are "
    "benched via q16's dedup family and q23's windowed counts, and "
    "stream==batch is pinned by the oracle",
    "q405_streaming_cdc_merge": "streaming run (three ordered change "
    "batches MERGEd into a parquet snapshot via foreachBatch + atomic "
    "swap); timing measures micro-batch/rewrite machinery — the "
    "merge_upsert join it applies per batch is benched via q144's "
    "batch MERGE family, and snapshot==set-algebra is pinned by the "
    "oracle",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mdi-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # no-silent-caps tripwire: every registered query is benched or has a
    # written exclusion above
    uncovered = set(qs) - set(HEADLINE) - set(EXCLUDED)
    stale = (set(HEADLINE) | set(EXCLUDED)) - set(qs)
    overlap = set(HEADLINE) & set(EXCLUDED)
    if uncovered or stale or overlap:
        raise SystemExit(
            f"bench ledger out of sync: uncovered={sorted(uncovered)} "
            f"stale={sorted(stale)} overlap={sorted(overlap)}"
        )
    # Warm-up: JVM/codegen init plus one touch of every input file, so the
    # first timed query isn't charged session init, parquet footer reads,
    # or OS page-cache misses the later queries don't pay either.
    spark.range(10).count()
    from pathlib import Path as _P

    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    for p in sorted(_P(sf_dir).glob("*.parquet")):
        read_table(spark, sf_dir, p.stem).count()  # nanos-safe for events
    # Each query runs twice; the reported time is the min (steady state).
    # Run 1 pays per-query-shape JIT/codegen compilation that a long-lived
    # cluster pays once per application, not per query — reporting it would
    # benchmark the JIT, not the plan.
    def _release_cached_blocks() -> None:
        # r11 verdict item #3: the checkpointed graph family (q152/q283)
        # leaks localCheckpoint blocks into the storage memory of every
        # LATER query — the in-batch crowding that made q152 read 12.8s
        # in-batch vs 6.6s isolated. Drop each query's cached tables and
        # persistent RDD blocks before the next timing so every query
        # starts from the same clean storage pool, in-batch as isolated.
        # py4j-private + local-mode lever, same guard class as the GC
        # drain below (no-op under Spark Connect).
        try:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass

    def _gc_drain() -> None:
        # r12: the r11-verdict release fix closed most of the in-batch vs
        # isolated gap, but heap inheritance remained (r12 pre-fix run:
        # q140 5.45 s in-batch vs 3.37 s isolated on identical plans) —
        # the isolated tail pass already drains GC before timing, so the
        # headline loop now starts every query from the same clean heap.
        # The drain runs OUTSIDE the timed region (between queries), so
        # the methodology — min-of-2 count() per query — is unchanged.
        # LOCAL-MODE-ONLY lever, same guard class as the tail drain.
        try:
            spark.sparkContext._jvm.System.gc()
        except AttributeError:
            pass

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt
        _release_cached_blocks()
        _gc_drain()

    # Isolated heavy-tail pass (r7 verdict #7, RULE-BASED since r10 per
    # the r9 verdict #2): after the crowded batch, re-time with nothing
    # else in flight (n=3, min) every query that needs adjudication:
    #   (a) fixed members — the checkpoint-heavy graph family plus the
    #       recurring watch list (q207's benign broadcast->SMJ size flip
    #       and the q175-q177 trio) the r8 verdict pinned;
    #   (b) the 5 slowest in-batch queries;
    #   (c) MECHANICAL REGRESSION RULE: every query whose in-batch time
    #       exceeds 2x its previous run's best known time (the prior
    #       BENCH_DETAIL entry, preferring its isolated number when one
    #       exists) and is >= 0.3 s now — sub-0.3 s deltas are pure
    #       fixed-overhead noise per the r9 host-contention adjudication.
    # Everything is recorded alongside the crowded numbers so a
    # round-over-round regression can be adjudicated (crowding vs real)
    # from BENCH_DETAIL alone, with no manual isolated re-run ritual.
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    prev_best: dict[str, float] = {}
    prev_soft: set[str] = set()
    if detail_path.exists():
        try:
            prev = json.loads(detail_path.read_text())
            prev_iso = prev.get("isolated_tail", {})
            prev_best = {
                k: min(v, prev_iso.get(k, v))
                for k, v in prev.get("queries", {}).items()
            }
            prev_soft = set(prev.get("tail_rule", {}).get("soft_flags", []))
        except (ValueError, OSError, AttributeError):
            prev_best = {}
    regressed = sorted(
        n
        for n, t in timings.items()
        if n in prev_best and t >= 0.3 and t > 2.0 * prev_best[n]
    )
    # SUB-THRESHOLD DRIFT TRIPWIRE (r11 verdict item #6): the 2.0x gate
    # alone lets a query step 1.9x per round and compound invisibly
    # (q62 drifted 3.15s -> 3.60s isolated across r10 -> r11 without ever
    # tripping). Any query >1.5x its prev-best in-batch is soft-flagged
    # in BENCH_DETAIL; a query soft-flagged in TWO consecutive rounds is
    # force-adjudicated isolated this round regardless of the 2.0x gate.
    soft_flags = sorted(
        n
        for n, t in timings.items()
        if n in prev_best and t >= 0.3 and t > 1.5 * prev_best[n]
    )
    two_round_drift = sorted(set(soft_flags) & prev_soft)
    tail = set(
        q for q in ("q152_pagerank", "q179_kcore", "q283_hits_scores",
                    "q292_link_prediction", "q207_sorted_neighborhood",
                    "q175_inverted_postings", "q176_centroid_similarity",
                    "q177_fd_violations") if q in timings
    ) | {n for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])[:5]}
    tail |= set(regressed)
    tail |= set(two_round_drift)
    # bound the pass on a pathologically noisy host: keep the largest
    # absolute regressions, and SAY what was dropped (no silent caps)
    capped_out: list[str] = []
    if len(tail) > 40:
        keep = set(
            sorted(tail, key=lambda n: -(timings[n] - prev_best.get(n, 0.0)))[:40]
        )
        capped_out = sorted(tail - keep)
        tail = keep
    isolated: dict[str, float] = {}
    for name in sorted(tail):
        _release_cached_blocks()
        # one throwaway invocation before the timed runs: the r10
        # driver bench showed isolated > in-batch for q341/q348 —
        # the first isolated run was absorbing session warm-up
        # (GC debt, code-cache churn from the 342-query batch), which
        # an adjudication pass must not bill to the query (r10 verdict
        # item 2). The warm-up is the query itself so scratch-reusing
        # queries (q377-style _SUCCESS guards) measure their steady
        # state, same as their in-batch posture.
        qs[name](spark, sf_dir).count()
        # drain the batch's accumulated GC debt before timing: without
        # this the first heavy tail query (q283-class, checkpointed
        # loop tables) pays a major collection the batch incurred.
        # LOCAL-MODE-ONLY lever (driver == executor here): on a real
        # cluster this collects only the driver JVM, and under Spark
        # Connect the py4j _jvm handle doesn't exist at all — hence
        # the guard (r11 ADVICE)
        try:
            spark.sparkContext._jvm.System.gc()
        except AttributeError:
            pass
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        isolated[name] = round(best, 3)

    detail = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "isolated_tail": isolated,
        "tail_rule": {
            "threshold_x": 2.0,
            "floor_sec": 0.3,
            "regressed_vs_prev": regressed,
            "soft_threshold_x": 1.5,
            "soft_flags": soft_flags,
            "two_round_drift_adjudicated": two_round_drift,
            "prev_best_for_tail": {
                n: prev_best[n] for n in sorted(tail) if n in prev_best
            },
            "capped_out": capped_out,
        },
        "n": len(HEADLINE),
        "sf": sf_dir,
        "cpus": cpus,
    }
    detail_path.write_text(json.dumps(detail, indent=1) + "\n")

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": slowest,
                "n": len(HEADLINE),
                "sf": sf_dir,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
