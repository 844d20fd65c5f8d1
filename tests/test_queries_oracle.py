"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against its oracle_sql() via DuckDB
(row count + column names + values after canonical sorting)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


SQL_KEYS = ["q1_pricing_summary", "q2_range_violations", "q3_nullity_events",
            "q4_uniqueness_events_user", "q5_referential_orders",
            "q6_revenue_by_nation", "q7_colstats_documents",
            "q8_quantiles_lineitem", "q9_hist2d_lineitem", "q10_snowline_band",
            "q11_drift_psi_events", "q12_exact_dedup_documents",
            "q13_token_count_documents", "q14_fingerprint_documents",
            "q15_quality_documents", "q20_ann_topk", "q22_topk_orders",
            "q23_window_events_hourly", "q26_ngram_jaccard_documents",
            "q27_embdup_exact", "q28_hashjoin_revenue",
            "q29_ivf_exhaustive_topk", "q30_hamming_pairs",
            "q31_asof_events_orders", "q32_sessions_events",
            "q33_topk_orders_per_cust", "q34_interval_join_events",
            "q35_semijoin_customers", "q36_antijoin_customers",
            "q37_running_events", "q38_audio_features",
            "q39_hash_sample_documents", "q40_hash_split_documents",
            "q41_distinct_users_by_type", "q42_pivot_events_by_user",
            "q43_users_intersect_customers", "q44_users_except_customers",
            "q45_token_counts_documents", "q46_corr_lineitem",
            "q47_quantiles_qty_by_flag", "q48_rollup_revenue",
            "q49_json_props_events", "q50_hopping_window_events",
            "q51_ntile_events", "q52_broadcast_revenue_by_region",
            "q53_argmax_order_per_cust", "q54_string_features_documents",
            "q55_multijoin_revenue_priority", "q56_dateparts_orders",
            "q57_profile_documents", "q58_leadlag_events",
            "q59_rank_events", "q60_regex_documents",
            "q61_mode_priority", "q62_outlier_events",
            "q63_regslope_lineitem", "q64_centroid_embeddings",
            "q65_dupclusters_documents", "q66_topterms_documents",
            "q67_cube_revenue", "q68_vq_assign_embeddings",
            "q69_event_types_by_user", "q70_median_mad_lineitem",
            "q71_entropy_events", "q72_skew_profile_orders",
            "q74_cooccurrence_events", "q75_tfidf_documents",
            "q76_hist1d_events", "q77_outer_join_customer_revenue",
            "q78_share_lineitem", "q79_bpe_tokens_documents",
            "q82_rolling_events", "q83_minmax_norm_events",
            "q84_stratified_sample_documents",
            "q85_exact_heavy_hitters_documents",
            "q86_bloom_semijoin_customers", "q87_checksum_events",
            "q88_normalize_documents", "q89_funnel_events",
            "q90_editdist_pairs_documents", "q91_unpivot_lineitem",
            "q92_weighted_avg_lineitem", "q93_quantile_cont_lineitem",
            "q94_order_consistency", "q95_embnorm_stats",
            "q96_rolling_time_events", "q97_winsorized_mean_lineitem",
            "q98_crossjoin_nation_region", "q99_redact_documents",
            "q100_dedup_survivorship_documents",
            "q101_contamination_documents", "q102_repetition_documents",
            "q103_ngram_vocab_by_source", "q104_upsample_documents",
            "q105_token_shards_documents", "q106_decile_stats_events",
            "q107_mad_outlier_events", "q108_collocations_documents",
            "q109_transitions_events", "q110_table_diff_customer",
            "q111_global_decile_events", "q112_lm_quality_documents",
            "q113_vocab_drift_documents", "q114_zscore_events",
            "q115_hourly_anomaly_events", "q116_rebalance_documents",
            "q117_ttr_documents", "q118_journey_events",
            "q119_weighted_median_lineitem", "q120_region_share_orders",
            "q121_cume_dist_events", "q122_gini_lineitem",
            "q123_hhi_events", "q124_cohort_events",
            "q125_skyline_orders", "q126_runs_events",
            "q127_interarrival_events", "q128_degree_hist_documents",
            "q129_percent_rank_events", "q130_spearman_lineitem",
            "q131_weighted_sample_documents", "q132_ohlc_events",
            "q133_sorted_neighborhood_documents", "q134_resample_events",
            "q135_debounce_events", "q136_tail_sum_lineitem",
            "q137_audience_overlap_events", "q138_chi2_events",
            "q139_activity_coverage_events", "q140_auc_events",
            "q141_longest_run_events", "q142_cluster_sizes_documents",
            "q143_triangles_events", "q144_pagerank_events",
            "q145_postings_documents", "q146_rolling_active_events",
            "q147_zipf_documents", "q148_bfs_events",
            "q149_ks_events", "q150_ewma_events", "q151_welch_events",
            "q152_assortativity_events", "q153_twap_events",
            "q154_zorder_lineitem", "q155_kendall_events",
            "q156_benford_orders", "q157_rolling_median_events",
            "q158_kcore_events", "q159_coverage_events",
            "q160_lagprod_events", "q161_qselect_events",
            "q163_tri_per_node_events", "q164_containment_documents",
            "q165_drawdown_events", "q166_merge_customer",
            "q167_dcstats_documents", "q168_charclass_documents",
            "q169_coactivity_events", "q170_retention_events",
            "q171_exposure_documents", "q172_letterbox_documents",
            "q173_color_documents", "q174_sharpness_documents",
            "q175_pngaudit_documents", "q176_lumahist_documents",
            "q177_tilediff_documents",
            "q178_triage_exposure_documents",
            "q179_movwind_documents", "q180_scenecut_documents",
            "q181_histdrift_documents", "q182_jpegquality_documents",
            "q183_embcov_embeddings", "q184_normdedup_documents",
            "q185_repetition_documents", "q186_stripes_documents",
            "q188_pcont_lineitem", "q189_psnr_documents",
            "q190_groupcov_embeddings", "q191_chanstats_documents",
            "q192_spandup_documents", "q193_tilecensus_documents",
            "q194_blob_census_documents", "q195_banding_documents",
            "q196_cusum_events", "q197_gradients_documents",
            "q198_exprcheck_lineitem", "q199_fd_orders",
            "q200_assoc_events", "q201_km_events",
            "q202_dihedral_documents", "q203_seqmatch_events",
            "q204_audiorun_documents", "q205_mi_documents",
            "q206_bm25_documents", "q207_running_distinct_events",
            "q208_burstiness_events", "q209_weighted_sample_documents",
            "q210_calibration_events", "q211_rrf_documents",
            "q213_changepoint_events",
            "q214_acf_events",
            "q216_funnel_latency_events", "q217_audiospec_documents",
            "q218_trimmed_mean_lineitem", "q219_theil_events",
            "q220_volatility_events", "q221_setjoin_documents",
            "q222_bigram_nll_documents", "q224_ols_events",
            "q225_vocab_overlap_documents",
            "q226_weighted_quantile_lineitem",
            "q227_top_tokens_by_source",
            "q228_unigram_kl_documents",
            "q229_centroid_distances_embeddings",
            "q230_curation_pipeline_documents"]


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(entry_mod, oracle_con, name):
    ray_df = _canon(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    sql = entry_mod.oracle_sql()[name]
    ora_df = _canon(oracle_con.execute(sql).df())
    assert list(ray_df.columns) == list(ora_df.columns), (
        f"columns: {list(ray_df.columns)} vs {list(ora_df.columns)}")
    assert len(ray_df) == len(ora_df), f"rows: {len(ray_df)} vs {len(ora_df)}"
    pd.testing.assert_frame_equal(ray_df, ora_df, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)


ROWS_ONLY_KEYS = ["q16_langid_documents", "q17_minhash_dedup_documents",
                  "q18_simhash_documents", "q19_embdup_embeddings",
                  "q21_ivf_ann_topk", "q24_rolling_fp_documents",
                  "q25_validate_documents", "q73_dedup_corpus_documents",
                  "q80_heavy_hitters_documents", "q81_kmeans_embeddings",
                  "q162_compress_documents", "q187_pca_embeddings",
                  "q223_pca_rerank_topk"]


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(entry_mod, name):
    df = _to_pandas(entry_mod.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries(entry_mod):
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    assert set(SQL_KEYS) == o
    # completeness: EVERY queries() key runs under this replica gate —
    # either oracle-checked (SQL_KEYS) or rows-only (ROWS_ONLY_KEYS);
    # a new key that registers in neither fails here (VERDICT r4 #3)
    assert set(SQL_KEYS) | set(ROWS_ONLY_KEYS) == q, (
        sorted((set(SQL_KEYS) | set(ROWS_ONLY_KEYS)) ^ q))


def test_entry_smoke(entry_mod):
    res = _to_pandas(entry_mod.entry())
    assert len(res) > 0
    assert "check" in res.columns and "pass" in res.columns


def test_q30_both_reduction_paths_match_oracle(entry_mod, oracle_con,
                                               monkeypatch):
    """The near-dup machinery's single-task AND distributed group scans
    must both reproduce the exact bit_count(xor) ground truth
    (VERDICT r2 Next #1)."""
    ora_df = _canon(oracle_con.execute(
        entry_mod.oracle_sql()["q30_hamming_pairs"]).df())
    for env in ("0", "1"):
        monkeypatch.setenv("RAQC_DISTRIBUTED_SCAN", env)
        ray_df = _canon(_to_pandas(
            entry_mod.queries()["q30_hamming_pairs"](SF_DIR)))
        pd.testing.assert_frame_equal(ray_df, ora_df, check_dtype=False)
    monkeypatch.delenv("RAQC_DISTRIBUTED_SCAN", raising=False)
