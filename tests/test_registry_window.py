"""Guard the driver's 50-query correctness window.

The driver hash-checks only the first 50 registered queries. These tests
fail loudly if a future registration pushes an oracle-backed query out of
the window or leaves a SURVEY §2 component with NO driver signal — where
"signal" is an in-window slot this round OR a driver-green row from a
previous round (the rotation ledger below). Round 6 rotation: round 5 came
back 50/50 green, so the window now holds the 34 oracle-backed queries
still awaiting their first driver row (x140-x172 + pipe_graph_insights),
the 6 round-6 debuts (the two noise-moment audits, the three forced
distributed graph flavors, plus x173-x175), and re-checks of the
operators whose plans changed this round (size-gated broadcasts:
c01/c02/c04/pipes/x08; exact-flag refactor: x23).
No Spark session needed — pure registration-order checks.
"""

from dbms_data_anonymity_differential_privacy_spark.queries_registry import (
    _WINDOW_R7,
    ORACLE_SQL,
    QUERIES,
)

WINDOW = 50

# Queries with hash_match=true in a driver-issued CORRECTNESS report —
# the union of CORRECTNESS_r01..r04.json green rows. A
# component may rotate out of the window ONLY if its queries are all here.
DRIVER_GREEN_PRIOR = {
    "c01_k_anonymize_suppress", "c02_k_anonymity_audit", "c04_class_emd",
    "c04_t_closeness_reference", "c04_t_closeness_strict", "c05_reid_risk",
    "c06_uniqueness_classes", "c06_uniqueness_rows", "c07_suppression_rate",
    "c08_ncp", "c09_t_violations", "p01_scan", "p02_drop_null", "p03_project",
    "p04_cast_coerce", "p05_group_frequency", "p06_threshold_filter",
    "p07_join_back", "p08_semi_join", "p09_group_stat_to_rows",
    "p10_minmax_class_size", "p11_counts", "p12_nunique", "p13_value_counts",
    "p14_distribution", "p15_singletons", "p16_mean_derived",
    "p17_equal_width_bin", "p18_explicit_bin", "p19_range_generalize",
    "p20_union", "p21_sorted_distinct", "p22_limit", "p23_scalar_arithmetic",
    "pipe_corpus_curation", "pipe_lm_buckets", "pipe_naive_metrics",
    "pipe_tcloseness_metrics", "x01_dp_avg_exact", "x01_dp_count_exact",
    "x01_dp_histogram_exact", "x01_dp_mode_exact", "x01_dp_quantile_exact",
    "x01_dp_sum_exact", "x01_dp_topk_exact", "x01_svt_exact",
    "x02_dedup_exact", "x02_dedup_fingerprint", "x03_dedup_corpus",
    "x03_dedup_corpus_cc", "x03_ngram_jaccard", "x04_cosine_pairs",
    "x04_cosine_pairs_topm", "x04_cosine_topk", "x05_lang_id",
    "x05_text_features", "x05_text_stats", "x06_dedup_stream",
    "x06_dp_stream_release_exact", "x06_kanon_gate",
    "x06_stream_window_kanon", "x08_l_diversity", "x09_json_props",
    "x10_hash_sample", "x10_hash_split", "x10_stratified_sample",
    "x11_sessionize", "x12_equal_freq_bin", "x13_pii_detect",
    "x13_pii_report", "x14_repetition", "x15_mondrian_exact",
    "x16_asof_join", "x17_session_errors", "x18_contamination", "x19_vocab",
    "x20_bm25_search", "x21_pack_chunks", "x22_group_percentiles",
    "x23_bigram_lm", "x24_text_clean", "x25_line_filter",
    "x26_mixture_rates", "x27_gopher_quality", "x28_incremental_admit",
    "x30_curate_stats", "x31_fuzzy_pairs", "x32_linkage_audit",
    "x33_rollup_release", "x34_user_contrib", "x35_kmap_audit",
    "x37_pseudonymize", "x38_vgh", "x39_entropy_stats", "x39_recursive_cl",
    "x40_span_stats", "x43_profile", "x44_centroid_sums", "x45_quantize",
    # round 4 (CORRECTNESS_r04.json, 50/50 green):
    "pipe_event_analytics", "pipe_training_export", "x04_cosine_pairs_topm",
    "x41_pairs_exact", "x46_dp_distinct_exact", "x47_shard_plan",
    "x48_snapshot_diff", "x49_heavy_hitters_exact", "x50_weighted_sample",
    "x51_beta_likeness", "x52_gapfill", "x53_mad_outliers",
    "x54_funnel", "x55_retention", "x56_continual_exact",
    "x57_fk_orphans", "x57_key_unique", "x58_apply_changes",
    "x59_skew_report", "x60_kmv_distinct", "x60_quantile_sketch",
    "x61_ohlc_bars", "x62_lag_features", "x63_group_ols",
    "x64_mutual_information", "x66_trending", "x67_psi_drift",
    "x68_dp_covariance_exact", "x69_corr_matrix", "x70_km_anonymity",
    "x71_chi_squared", "x72_transitions", "x73_range_counts_exact",
    "x74_ab_test", "x75_benford", "x76_seasonality",
    "x77_expectations", "x78_attribution", "x79_kaplan_meier",
    "x80_mann_whitney", "x81_knn_join", "x82_quality_dedup",
    "x83_bm25_many", "x84_stratified_split", "x85_domain_gate",
    "x85_domain_quality", "x86_temperature_sample", "x87_rolling_anomaly",
    "x88_cusum", "x89_set_union_exact",
    # round 5 (CORRECTNESS_r05.json, 50/50 green):
    "pipe_corpus_datasheet", "pipe_private_export", "x03_dedup_corpus_cc", "x100_qi_search",
    "x101_ak_anonymity", "x102_copurchase", "x103_entities", "x104_ewma", "x105_pivot_release",
    "x106_m_invariance", "x107_funnel_windowed", "x108_ks_test", "x109_spearman",
    "x110_anova", "x111_gini", "x112_novelty", "x113_source_overlap", "x114_dp_heatmap_exact",
    "x115_weighted_median", "x116_top_p", "x117_oov_rate", "x119_interp_gapfill",
    "x120_burstiness", "x121_rolling_wau", "x122_label_consistency", "x123_path_trigrams",
    "x124_decay_attribution", "x125_scd2", "x126_pagerank", "x127_anatomy", "x128_zipf",
    "x129_bloom", "x130_chunks", "x131_containment", "x132_negative_samples",
    "x133_hard_negatives", "x134_nelson_aalen", "x135_cuped", "x136_decile_lift",
    "x137_rfm", "x138_triangles", "x139_hitk", "x90_linear_attribution", "x91_winsorize",
    "x92_user_growth", "x94_step_latency", "x95_zorder", "x97_delta_presence",
    "x98_session_impact", "x99_tfidf_topk",
}


def component_of(name: str) -> str:
    return name.split("_", 1)[0]


def test_window_is_all_oracle_backed():
    inside = list(QUERIES)[:WINDOW]
    missing = [n for n in inside if n not in ORACLE_SQL]
    assert not missing, f"rows-only queries waste the driver window: {missing}"


def test_window_list_matches_registration():
    """_WINDOW_R7 IS the window: every listed name registered, exactly 50,
    occupying the first 50 slots in order."""
    assert len(_WINDOW_R7) == WINDOW
    assert len(set(_WINDOW_R7)) == WINDOW
    unregistered = [n for n in _WINDOW_R7 if n not in QUERIES]
    assert not unregistered, f"window names not registered: {unregistered}"
    assert list(QUERIES)[:WINDOW] == _WINDOW_R7


def test_every_oracle_component_has_driver_signal():
    """Every component with an oracle either sits in this round's window or
    is fully covered by prior driver-green rows (rotation ledger)."""
    inside = {component_of(n) for n in list(QUERIES)[:WINDOW]}
    unsignalled = [
        n
        for n in QUERIES
        if n in ORACLE_SQL
        and component_of(n) not in inside
        and n not in DRIVER_GREEN_PRIOR
        and n not in NEW_THIS_ROUND
    ]
    assert not unsignalled, (
        f"oracle queries with neither an in-window component nor a prior "
        f"driver-green row: {unsignalled}"
    )


# Oracle-backed queries registered this round that debut OUTSIDE the
# window (only allowed when every window slot holds a query still awaiting
# its first driver row). Round 6: empty — the four r6 debuts
# (x01_dp_noise_moments, x126_pagerank_dist, x160_label_prop_dist,
# x166_bfs_dist) all sit IN the window alongside the 34-query backlog
# and 12 re-checks of plan-changed operators. Round 4: after the 38-query backlog plus eleven
# new r4 queries (x41_pairs_exact, x81-x89) filled the window — every slot
# now holds a query with no driver row except the deliberately re-checked
# x04_cosine_pairs_topm — the later r4 registrations debut outside and
# rotate in next round; until then their check is the dual-SF local
# oracle sweep.
# Round 5: the x125-x139 debuts fill the window alongside the 34-query
# backlog; later round-5 registrations (x140+) debut outside — every slot
# already holds a query awaiting its first driver row — and rotate in
# next round; until then their check is the dual-SF local oracle sweep.
NEW_THIS_ROUND: set[str] = set()


def test_rotated_out_queries_were_driver_green():
    """Nothing rotates out of the window without a driver-issued green row:
    the union of rounds must keep every oracle-backed query checked."""
    inside = set(list(QUERIES)[:WINDOW])
    unchecked = [
        n for n in QUERIES
        if n in ORACLE_SQL
        and n not in inside
        and n not in DRIVER_GREEN_PRIOR
        and n not in NEW_THIS_ROUND
    ]
    assert not unchecked, f"oracle queries that never got a driver row: {unchecked}"


def test_rows_only_queries_registered_last():
    names = list(QUERIES)
    first_rows_only = next((i for i, n in enumerate(names) if n not in ORACLE_SQL), len(names))
    assert all(n not in ORACLE_SQL for n in names[first_rows_only:]), (
        "oracle-backed query registered after a rows-only query"
    )


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's headline surface counts must track the registry —
    stale counts were a round-3 verdict finding; this pins them."""
    import pathlib
    import re

    text = pathlib.Path(__file__).parent.parent.joinpath("COVERAGE.md").read_text()
    m = re.search(
        r"the full (\d+)-query oracle surface — (\d+)\s*\nregistered queries, (\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md headline count sentence not found"
    n_oracle, n_registered, n_rows_only = map(int, m.groups())
    assert n_oracle == len(ORACLE_SQL), (n_oracle, len(ORACLE_SQL))
    assert n_registered == len(QUERIES), (n_registered, len(QUERIES))
    assert n_rows_only == len(QUERIES) - len(ORACLE_SQL)


def test_bench_headline_names_registered():
    """Every bench.py HEADLINE name must be a registered query — a typo
    here would crash the driver's per-round bench run."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench HEADLINE names not registered: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
