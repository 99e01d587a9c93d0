"""Named query catalog — the driver-checkable contract (SURVEY §2 / §7.4).

Every entry pairs a Spark implementation with an equivalent DuckDB oracle SQL
string. The driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- double aggregates go through ``decimal(38,6)`` sums (order-independent,
  exact) and are cast back to double, so Spark's partition-parallel summation
  matches DuckDB bit-for-bit;
- timestamps are projected as formatted strings;
- any LIMIT is preceded by a total ORDER BY (unique key tiebreak) so both
  engines pick the same rows.

Coverage keys follow SURVEY §2.B (relational surface + function allowlist)
plus the events-stream semantics of §2.A and the LLM-pipeline extensions
(dedup / similarity / text analysis).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import TESTDATA_TABLES, load_tables


@dataclass(frozen=True)
class QueryCase:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""
    # True when the Spark side and the DuckDB oracle are the SAME SQL text
    # (set automatically by sql_case). Such entries hash-match BY
    # CONSTRUCTION even if the formula is wrong, so the differential gate
    # cannot falsify them — each one must carry a named planted-data /
    # Python-recompute semantics test, machine-enforced by
    # tests/test_shared_body_semantics.py (VERDICT r5 "Next round #8").
    shared_body: bool = False


_REGISTRY: dict[str, QueryCase] = {}


def staged_sort(df: DataFrame, *cols: str) -> DataFrame:
    """``orderBy`` with a hash exchange under it, so the range-sampling
    pass re-executes a shuffle read instead of the query (r12, guide
    §7.2/§2.4).

    A range Exchange computes its partition bounds by SAMPLING ITS CHILD
    — executing every operator down to the nearest materialized shuffle
    a second time. A final sort that sits directly on an expensive,
    exchange-free segment (a complete aggregation over a broadcast join,
    an array-intersect verify join reading a checkpoint) therefore runs
    that whole segment twice. Hash-repartitioning on the leading sort
    key first inserts the missing boundary: the extra exchange carries
    only the final output rows (linear, usually tiny), and the sampling
    pass then reads shuffle files. Rows and final order are identical —
    orderBy is a total sort regardless of input partitioning. Only worth
    it when the segment below is expensive relative to one extra
    exchange of the output: q90 (the one caller) measured 12.4 → 7.1 s
    at sf1.0, while the same staging on q49/q96/q168/q190 — whose
    under-sort segments are cheap or whose outputs are large — measured
    flat to 2× WORSE and was reverted (see OPTIMIZATION_r12.md)."""
    from pyspark.sql import functions as F

    return df.repartition(F.col(cols[0])).orderBy(*cols)


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryCase(name, fn, oracle, doc)
        return fn

    return deco


def sql_case(name: str, spark_sql: str, oracle: str, doc: str = "") -> None:
    """Register a case whose Spark side is a plain Spark-SQL string (Catalyst
    plans it; these are fully declarative — pushdown/pruning for free).

    The testdata views the SQL references are inferred from its text
    (case-insensitively — FROM EVENTS and from "events" both count, so a
    future uppercase/quoted identifier can't skip registration and
    silently read a view left behind by an earlier query, possibly from a
    different sf_dir), so each run registers (≈8 ms of driver round-trip
    apiece) only the views it actually reads — a false positive from a
    name inside a string literal merely over-registers, which is
    harmless."""
    used = tuple(
        t
        for t in TESTDATA_TABLES
        if re.search(rf"\b{t}\b", spark_sql, re.IGNORECASE)
    )

    def fn(
        spark: SparkSession, sf_dir: str, _sql=spark_sql, _names=used or None
    ) -> DataFrame:
        load_tables(spark, sf_dir, names=_names)
        return spark.sql(_sql)

    _REGISTRY[name] = QueryCase(
        name, fn, oracle, doc, shared_body=spark_sql.strip() == oracle.strip()
    )


# The correctness harness scores at most the first 50 catalog entries per
# round (CORRECTNESS_r01/r02 each contain exactly the first 50 in dict
# order).  With >50 registered cases we rotate: entries already proven green
# in a prior round's CORRECTNESS file move to the back so the not-yet-scored
# ones land inside the scoring window.  Every case stays registered and
# pytest-covered regardless of position; rotation only changes which subset
# gets a fresh official row this round.  See README "Correctness coverage".
#
# Hash-robustness convention (VERDICT r5 "Next round #2"): a derived
# ratio that appears in a hashed projection must be witnessed by exact
# integer/decimal(38,0) rationals (numerator + denominator columns) or
# be itself computed in exact arithmetic; an engine-rounded
# ``round(x/y, k)`` double may sit BESIDE the witnesses for readability
# but must never be the only column carrying the statistic (q147's r5
# red — locally bit-identical, flagged by the driver env anyway — is the
# case study; its rounded quotient is now dropped entirely).
#
# Round-6 window (VERDICT r5 "Next round #1"): the 42 entries with no
# official green row — q147 first (the r5 red, hashed projection now
# hardened to exact rationals only), then the 41 never-scored entries
# that landed after the r5 window filled (ranking/time-series/SCD-2/
# k-anonymity q156/q158-q170, statistics audits q171-q178, calibration/
# AUC/Brier q179-q181/q184-q185, survival q182-q183, experimentation
# q186-q187, plus q142/q143/q145/q146/q148-q153) — then the 8 stalest
# r03-green entries (q10-q15, q17, q19) to fill the 50-slot window.
# Everything rotated out holds an official green row in
# CORRECTNESS_r03/r04/r05; every case stays registered and
# pytest-covered regardless of position, and the full local gate
# (tools/check.py) covers all entries every run.
_ROUND6_FRONT = [
    # the r5 official red, hardened (exact-rational projection) for re-score
    "q147_cohens_kappa",
    # never officially scored (landed after the r5 scoring cutoff)
    "q142_random_projection", "q143_calibration_bins",
    "q145_survivor_selection", "q146_confusion_matrix",
    "q148_langid_agreement", "q149_cross_source_dups",
    "q150_shrunk_quality", "q151_pmi_collocations",
    "q152_term_burstiness", "q153_conditional_entropy",
    "q156_template_mining",
    "q158_decayed_engagement", "q159_gap_quantiles", "q160_ab_ztest",
    "q161_top_eigenvector", "q162_degree_assortativity",
    "q163_rrf_fusion", "q164_zipf_tail_index", "q165_ndcg_eval",
    "q166_theil_sen_trend", "q167_volume_acf", "q168_scd2_history",
    "q169_mean_shift_changepoint", "q170_k_anonymity",
    "q171_mann_whitney_u", "q172_spearman_rho", "q173_assoc_rules",
    "q174_countmin_sketch", "q175_ols_trend", "q176_benford_digits",
    "q177_chi2_independence", "q178_permutation_entropy",
    "q179_isotonic_calibration", "q180_cumulative_gains",
    "q181_youden_threshold", "q182_kaplan_meier", "q183_logrank_test",
    "q184_roc_auc", "q185_brier_decomposition",
    "q186_cuped_reduction", "q187_minimum_detectable_effect",
    # stalest r03-green entries — official re-confirmation after three
    # rounds of churn (fills the window to 50)
    "q10_having", "q11_window_topk", "q12_window_running",
    "q13_cte", "q14_scalar_subquery", "q15_correlated_subquery",
    "q17_recursive_cte", "q19_agg_of_agg",
]

# Round-7 window (active; VERDICT r6 "Next round #3" revised the r6-
# committed ledger): the FIVE r6 official reds go first — all five were
# one bug (decimal(38,0) OUTPUT columns hash-fail at the driver even
# when bit-identical locally, VERDICT r6 "What's wrong #1"), now fixed
# by casting the exact witnesses to plain-digit strings on both
# engines, so their first green beats a stale re-confirmation. They
# displace the five youngest r03-stales (q63-q66, q69 — moved to the
# r8 ledger below). Then the 10 round-6 additions q188-q197 (never
# scored; q191/q193 carried the same decimal landmine, defused the
# same way) and the 33 remaining r03-stale re-confirmations, plus the
# two oldest r04-greens to fill 50.
_ROUND7_FRONT = [
    # the five r6 reds, decimal-purged for re-score (first green > stale)
    "q147_cohens_kappa", "q150_shrunk_quality", "q158_decayed_engagement",
    "q161_top_eigenvector", "q162_degree_assortativity",
    # the 10 round-6 additions (q188-q197, never scored — a never-scored
    # entry's first official row beats a re-confirmation)
    "q188_expected_calibration_error", "q189_mrr_eval",
    "q190_precision_recall_at_k", "q191_fleiss_kappa",
    "q192_rfm_segments", "q193_interevent_burstiness",
    "q194_heaps_law", "q195_mann_kendall",
    "q196_wilson_interval", "q197_cochran_armitage",
    # r03-green, not re-confirmed since (33 of the 38; q63-q66/q69
    # yielded their slots to the fixed reds)
    "q01_pricing_summary", "q02_filter_project", "q03_revenue_by_nation",
    "q18_ineq_join", "q24_group_concat", "q26_json_extract",
    "q30_events_page", "q32_events_type_stats", "q33_events_time_buckets",
    "q34_events_sessionize", "q38_json_set_patch",
    "q40_dedup_exact", "q41_dedup_normalized", "q42_text_quality",
    "q43_lang_stats", "q44_token_totals", "q45_fingerprint",
    "q46_word_jaccard_pairs", "q47_cosine_topk", "q48_embedding_neardup",
    "q50_simhash", "q51_ann_lsh", "q52_document_profile",
    "q53_multimodal_meta", "q54_ann_ivf", "q55_dedup_clusters",
    "q56_salted_agg", "q57_salted_join", "q58_repetition_metrics",
    "q59_crossdoc_ngram_overlap", "q60_pii_scrub", "q61_decontaminate",
    "q62_line_dedup",
    # oldest r04-green entries fill the remaining 2 slots
    "q49_minhash_lsh", "q67_train_split",
]

# Committed round-8 rotation plan (VERDICT r6 "Next round #4" — the
# auditable ahead-of-time ledger): the three entries added after the r7
# ledger filled (q198-q200, never scored; q200's decimal witnesses are
# already string-cast), the five r03-stales displaced by the fixed reds,
# and the 42 oldest remaining r04-stale re-confirmations (catalog
# order). The final 6 r04-stales (q111-q116) queue for r9 with the
# r05-stales. r8 activates this by swapping the name in _ordered().
_ROUND8_FRONT = [
    # never scored (landed after the r7 ledger filled)
    "q198_top_trigram_paths", "q199_dow_seasonality", "q200_fisher_ratio",
    # r03-stale, displaced from the r7 window by the fixed reds
    "q63_sketch_distinct", "q64_sketch_quantiles",
    "q65_asof_attribution", "q66_error_window_rollup",
    "q69_stratified_sample",
    # r04-green, not re-confirmed since (42 oldest in catalog order)
    "q68_source_mix", "q70_pack_sequences", "q71_bm25_topk",
    "q72_gopher_filter", "q73_semantic_dedup", "q74_corpus_stats",
    "q75_unigram_logprob", "q76_clean_pipeline", "q77_incremental_dedup",
    "q78_window_breadth", "q79_rollup_stats", "q80_editdist_blocked",
    "q81_temperature_mix", "q82_asof_bucketed", "q83_chunk_windows",
    "q84_ngram_novelty", "q85_tfidf_top_terms", "q86_kmeans_clusters",
    "q87_cdc_chunks", "q88_bigram_logprob", "q89_dsir_importance",
    "q90_containment_dedup", "q91_build_postings", "q92_quality_deciles",
    "q93_budget_allocation", "q94_decay_ess", "q95_label_balance",
    "q96_pagerank", "q97_triplet_mining", "q98_int8_quant_stats",
    "q99_conversation_examples", "q100_cluster_histogram",
    "q101_zscore_outliers", "q102_doc_contamination",
    "q103_rendezvous_shards", "q104_systematic_sample",
    "q105_weighted_sample", "q106_feature_hash", "q107_source_overlap",
    "q108_packing_efficiency", "q109_bpe_merges", "q110_bpe_encode",
]

# Committed round-9 rotation plan (VERDICT r7 "Next round #6" — ledger
# ahead of time so the rotation is auditable): the final six r04-stales
# (q111-q116), then the 44 oldest entries whose last official green is
# r05, in catalog order (relational/function r03->r05 re-confirmations
# q04-q39, the events trio q31/q35/q36, and the oldest of the
# q117-q146 stats block). The remaining 50 r05-greens (ledgered in the
# comment trail above _ordered()) queue for r10, completing a full
# 4-round sweep of the 200-entry catalog. r9 activates this by
# swapping the name in _ordered().
_ROUND9_FRONT = [
    # final r04-stales
    "q111_hash_vector_ann", "q112_psi_drift", "q113_label_noise",
    "q114_column_profile", "q115_mmr_selection", "q116_leakage_free_split",
    # r05-green relational/function basics (last re-confirmed r05)
    "q04_left_join", "q05_semi_join", "q06_anti_join", "q07_distinct",
    "q08_set_ops", "q09_order_limit_offset", "q10_having",
    "q11_window_topk", "q12_window_running", "q13_cte",
    "q14_scalar_subquery", "q15_correlated_subquery", "q16_cross_join",
    "q17_recursive_cte", "q19_agg_of_agg", "q20_conditional",
    "q21_string_fns", "q22_math", "q23_datetime", "q25_total",
    "q27_json_object", "q28_json_group_array", "q29_like_glob",
    "q37_typeof", "q39_json_each",
    # r05-green events entries
    "q31_events_range_scan", "q35_events_topk_users", "q36_events_two_pages",
    # oldest r05-green stats/pipeline entries (catalog order)
    "q124_png_decode_stats", "q123_pagerank_checkpointed",
    "q138_doc_graph_triangles", "q131_quota_dedup_rank",
    "q132_prefix_dedup", "q133_minhash_error", "q135_source_znorm_quality",
    "q136_stratified_eval_holdout", "q137_vocab_coverage_curve",
    "q140_source_jsd", "q141_embedding_covariance",
    "q142_random_projection", "q143_calibration_bins",
    "q144_ks_statistic", "q145_survivor_selection",
    "q146_confusion_matrix",
]
# Committed round-10 rotation plan (VERDICT r8 "Next round #5" — the
# ahead-of-time ledger): the remaining 50 catalog entries not covered
# by the r07/r08 windows or _ROUND9_FRONT — the q117-q130
# diversity/privacy block and the q148-q187 stats/eval family, in
# catalog-number order. Activating this in r10 completes the first
# full 4-round sweep of the 200-entry catalog: every entry's official
# green will then be no older than 4 rounds. r10 activates this by
# swapping the name in _ordered().
_ROUND10_FRONT = [
    "q117_entropy_kl", "q118_activity_gini", "q119_cohort_retention",
    "q120_session_funnel", "q121_ann_label_noise", "q122_grouped_gini",
    "q125_simpson_diversity", "q126_label_balance", "q127_dp_noise_count",
    "q128_bootstrap_ci", "q129_dataset_card", "q130_out_of_order_rate",
    "q134_winsorized_stats", "q139_length_histogram",
    "q148_langid_agreement", "q149_cross_source_dups",
    "q151_pmi_collocations", "q152_term_burstiness",
    "q153_conditional_entropy", "q154_markov_transitions",
    "q155_bradley_terry", "q156_template_mining", "q157_mad_outliers",
    "q159_gap_quantiles", "q160_ab_ztest", "q163_rrf_fusion",
    "q164_zipf_tail_index", "q165_ndcg_eval", "q166_theil_sen_trend",
    "q167_volume_acf", "q168_scd2_history",
    "q169_mean_shift_changepoint", "q170_k_anonymity",
    "q171_mann_whitney_u", "q172_spearman_rho", "q173_assoc_rules",
    "q174_countmin_sketch", "q175_ols_trend", "q176_benford_digits",
    "q177_chi2_independence", "q178_permutation_entropy",
    "q179_isotonic_calibration", "q180_cumulative_gains",
    "q181_youden_threshold", "q182_kaplan_meier", "q183_logrank_test",
    "q184_roc_auc", "q185_brier_decomposition", "q186_cuped_reduction",
    "q187_minimum_detectable_effect",
]


# Committed round-11 rotation plan (VERDICT r9 "Next round #5" — the
# ahead-of-time ledger; second sweep begins): once _ROUND10_FRONT
# scores in r10, every entry's official green is <=4 rounds old and
# the stalest block is the r07 window (last scored r07, 4 rounds old
# at r11). That block — verbatim the 50 names in CORRECTNESS_r07.json
# — is the r11 front, in the same order the driver scored them.
# r11 activates this by swapping the name in _ordered().
_ROUND11_FRONT = [
    "q147_cohens_kappa", "q150_shrunk_quality", "q158_decayed_engagement",
    "q161_top_eigenvector", "q162_degree_assortativity",
    "q188_expected_calibration_error", "q189_mrr_eval",
    "q190_precision_recall_at_k", "q191_fleiss_kappa", "q192_rfm_segments",
    "q193_interevent_burstiness", "q194_heaps_law", "q195_mann_kendall",
    "q196_wilson_interval", "q197_cochran_armitage",
    "q01_pricing_summary", "q02_filter_project", "q03_revenue_by_nation",
    "q18_ineq_join", "q24_group_concat", "q26_json_extract",
    "q30_events_page", "q32_events_type_stats", "q33_events_time_buckets",
    "q34_events_sessionize", "q38_json_set_patch",
    "q40_dedup_exact", "q41_dedup_normalized", "q42_text_quality",
    "q43_lang_stats", "q44_token_totals", "q45_fingerprint",
    "q46_word_jaccard_pairs", "q47_cosine_topk", "q48_embedding_neardup",
    "q50_simhash", "q51_ann_lsh", "q52_document_profile",
    "q53_multimodal_meta", "q54_ann_ivf", "q55_dedup_clusters",
    "q56_salted_agg", "q57_salted_join", "q58_repetition_metrics",
    "q59_crossdoc_ngram_overlap", "q60_pii_scrub", "q61_decontaminate",
    "q62_line_dedup", "q49_minhash_lsh", "q67_train_split",
]


# Committed round-12 rotation plan (same mechanics as every round since
# r8 — the ahead-of-time ledger for the sweep's second block): once
# _ROUND11_FRONT scores in r11, the stalest official block is the r08
# window (last scored r08, 4 rounds old at r12). That block — verbatim
# the 50 names in CORRECTNESS_r08.json, in the order the driver scored
# them — is the r12 front. r12 activates this by swapping the name in
# _ordered().
_ROUND12_FRONT = [
    "q198_top_trigram_paths", "q199_dow_seasonality", "q200_fisher_ratio",
    "q63_sketch_distinct", "q64_sketch_quantiles", "q65_asof_attribution",
    "q66_error_window_rollup", "q69_stratified_sample", "q68_source_mix",
    "q70_pack_sequences", "q71_bm25_topk", "q72_gopher_filter",
    "q73_semantic_dedup", "q74_corpus_stats", "q75_unigram_logprob",
    "q76_clean_pipeline", "q77_incremental_dedup", "q78_window_breadth",
    "q79_rollup_stats", "q80_editdist_blocked", "q81_temperature_mix",
    "q82_asof_bucketed", "q83_chunk_windows", "q84_ngram_novelty",
    "q85_tfidf_top_terms", "q86_kmeans_clusters", "q87_cdc_chunks",
    "q88_bigram_logprob", "q89_dsir_importance", "q90_containment_dedup",
    "q91_build_postings", "q92_quality_deciles", "q93_budget_allocation",
    "q94_decay_ess", "q95_label_balance", "q96_pagerank",
    "q97_triplet_mining", "q98_int8_quant_stats",
    "q99_conversation_examples", "q100_cluster_histogram",
    "q101_zscore_outliers", "q102_doc_contamination",
    "q103_rendezvous_shards", "q104_systematic_sample",
    "q105_weighted_sample", "q106_feature_hash", "q107_source_overlap",
    "q108_packing_efficiency", "q109_bpe_merges", "q110_bpe_encode",
]


# Committed round-13 rotation plan. The base block is the r09 window
# (stalest official block — last scored r09, 4 rounds old at r13),
# AMENDED per VERDICT r12 "Next round #3": the r12 optimization round
# rewrote the minhash/text/LSH families AFTER their last oracle scoring,
# so their post-rewrite correctness rested on builder-run differentials
# only. The 13 rewritten entries (q49/q50/q51/q52/q55/q58/q59/q60/q61/
# q72/q121/q155/q194) replace the 13 stalest UNTOUCHED simple
# relational/function entries from the r09 block (q07-q10, q13, q14,
# q19-q23, q25, q29 — single-operator queries whose code is unchanged
# since their r09 green and which share their operator families with
# retained entries like q04-q06/q11/q12/q15-q17). r13 activates this
# ledger in _ordered().
#
# Session-2 amendment (same logic as VERDICT r12 #3): the r13 job-count
# pass changed connected_components (q100's clustering) and the BPE
# training loop (q109/q110) AFTER their r12 oracle scoring, so those
# three replace three more stale untouched single-operator function
# entries (q27/q28/q37 — JSON/typeof, unchanged since their r09 green;
# q39_json_each stays as the family's scored representative).
_ROUND13_FRONT = [
    "q111_hash_vector_ann", "q112_psi_drift", "q113_label_noise",
    "q114_column_profile", "q115_mmr_selection", "q116_leakage_free_split",
    "q04_left_join", "q05_semi_join", "q06_anti_join",
    "q49_minhash_lsh", "q50_simhash", "q51_ann_lsh",
    "q11_window_topk", "q12_window_running",
    "q52_document_profile", "q55_dedup_clusters",
    "q58_repetition_metrics", "q15_correlated_subquery", "q16_cross_join",
    "q17_recursive_cte", "q59_crossdoc_ngram_overlap", "q60_pii_scrub",
    "q61_decontaminate", "q72_gopher_filter", "q121_ann_label_noise",
    "q155_bradley_terry", "q194_heaps_law",
    "q109_bpe_merges", "q110_bpe_encode",
    "q100_cluster_histogram", "q39_json_each", "q31_events_range_scan",
    "q35_events_topk_users", "q36_events_two_pages",
    "q124_png_decode_stats", "q123_pagerank_checkpointed",
    "q138_doc_graph_triangles", "q131_quota_dedup_rank",
    "q132_prefix_dedup", "q133_minhash_error",
    "q135_source_znorm_quality", "q136_stratified_eval_holdout",
    "q137_vocab_coverage_curve", "q140_source_jsd",
    "q141_embedding_covariance", "q142_random_projection",
    "q143_calibration_bins", "q144_ks_statistic",
    "q145_survivor_selection", "q146_confusion_matrix",
]


def _ordered(reg: dict[str, QueryCase]) -> dict[str, QueryCase]:
    front = [n for n in _ROUND13_FRONT if n in reg]
    rest = [n for n in reg if n not in set(front)]
    return {n: reg[n] for n in [*front, *rest]}


def all_cases() -> dict[str, QueryCase]:
    # import for side effects: modules register their cases on import
    from . import queries_relational  # noqa: F401
    from . import queries_functions  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_training  # noqa: F401
    from . import queries_search  # noqa: F401
    from . import queries_mining  # noqa: F401
    from . import queries_curation  # noqa: F401
    from . import queries_quality  # noqa: F401
    from . import queries_ranking  # noqa: F401
    from . import queries_retrieval  # noqa: F401
    from . import queries_stats  # noqa: F401
    from . import queries_eval  # noqa: F401

    return _ordered(dict(_REGISTRY))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: c.spark_fn for n, c in all_cases().items()}


def oracle_sql() -> dict[str, str]:
    return {n: c.oracle for n, c in all_cases().items() if c.oracle is not None}
