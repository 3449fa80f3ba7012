"""Central query registry.

Every operator the engine claims is registered here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string over the same tables.
``__spark_entry__.py`` re-exports these to the driver harness.

Keeping the Spark query and its oracle side-by-side in the defining
module is the main defense against alias/rounding drift (SURVEY.md
§7.3 determinism rules).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Resources acquired while building the CURRENT query's plan —
# persisted DataFrames (track_persist) and streaming memory-sink temp
# views (track_temp_view). A query function can't release its own:
# the caller materializes the returned DataFrame only after the
# function exits. So every registered query releases the PREVIOUS
# query's tracked resources on entry, and a sequential sweep (the
# driver gate, verify_local, bench) holds at most one query's cached
# blocks / sink tables at a time instead of accumulating 424 of them
# in one session (r5 ADVICE #4; the sf1 streaming screen OOMed a 1g
# session purely on leftover memory-sink tables). Both releases are
# safe for stale frames: an unpersisted frame recomputes, and a
# DataFrame returned by spark.table() was analyzed eagerly, so
# dropping the temp view later only unregisters the name.
_TRACKED_CLEANUPS: list[Callable[[], None]] = []
# >0 while inside a registered query fn: composed queries (an outer
# query building on an inner registered one, e.g. dedup_cluster_
# survivors -> dedup_clusters) must NOT release the caches the outer
# build just tracked.
_QUERY_DEPTH = 0


def track_persist(df: DataFrame) -> DataFrame:
    """persist() a reused frame and track it for end-of-query release.

    Default storage level (MEMORY_AND_DISK_DESER) — eviction spills,
    never OOMs."""
    persisted = df.persist()
    _TRACKED_CLEANUPS.append(persisted.unpersist)
    return persisted


def track_temp_view(spark: SparkSession, name: str) -> None:
    """Track a temp view (e.g. a streaming memory sink) for
    end-of-query deregistration so its backing rows become
    GC-reclaimable once the caller drops the result frame."""
    _TRACKED_CLEANUPS.append(
        lambda: spark.catalog.dropTempView(name)
    )


def release_tracked_caches() -> None:
    while _TRACKED_CLEANUPS:
        try:
            _TRACKED_CLEANUPS.pop()()
        except Exception:
            # session may already be stopped (test teardown) — the
            # blocks died with it, nothing to release
            pass


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            global _QUERY_DEPTH
            if _QUERY_DEPTH == 0:
                release_tracked_caches()
            _QUERY_DEPTH += 1
            try:
                return fn(spark, sf_dir)
            finally:
                _QUERY_DEPTH -= 1

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    Import order IS driver-check order (the harness iterates queries()
    in registration order and stops at a budget — r1 covered only the
    first 50). Modules whose queries had no official correctness row in
    r1, or were fixed this round, register first; the long-green core
    operators register last.
    """
    # Imports are inside the function so a syntax error in one category
    # is easy to localize, and so `import parquet_playground_spark`
    # stays cheap.
    from parquet_playground_spark.functions import (  # noqa: F401
        curation,
        dedup,
        multimodal,
        scalars,
        similarity,
        text,
        udfs,
    )
    from parquet_playground_spark.sources import (  # noqa: F401
        avro,
        corpus,
        encrypted,
        stream_pysource,
        writes,
    )
    from parquet_playground_spark.streaming import stream_queries  # noqa: F401
    from parquet_playground_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        flatten,
        joins,
        maintenance,
        reshape,
        scale,
        scans,
        selections,
        setops,
        sorts,
        stats,
        timeseries,
        windows,
    )
    _apply_check_order()


# The driver's correctness run iterates queries() in registration order
# under a budget (r1 and r2 each stopped at exactly 50), so order ==
# which queries get an OFFICIAL correctness row this round. Names
# listed here are moved to the front, in this order; everything else
# keeps registration order after them. r1+r2 covered 98 distinct
# queries; r3's window leads with this round's fixes, then rotates
# through the never-driver-checked remainder. Long-green checked
# queries sort last — the local full-repr sweep still covers them.
_CHECK_ORDER = [
    # ---- r8 window: backlog burn-down, tranche 2 of 4 ----
    # The driver checks the first ~50 registered queries each round.
    # r7 came back 50/50 green (CORRECTNESS_r07): H scalars and I
    # streaming are fully retired and L is checked through
    # pipeline_dq_rules (L 1-14). Those 50 heads drop off the list;
    # this round's window is the next 50 never-driver-checked keys per
    # the r7 VERDICT item 1 schedule: L(15-35) — sample_weighted_
    # reservoir alphabetically through the zorder_* pair — then
    # M(1-29) — agg_percentile_within_group through
    # ts_time_weighted_avg. Surface stays frozen at 424; ever-checked
    # reaches ~355 after this window. Any key whose code changes in r8
    # takes a redemption slot at the head, displacing the tail of the
    # window to the next round.
    #
    # REDEMPTION SLOTS (r8): seven keys' code changed this round.
    # embedding_random_projection_jl joins them late: the sf100
    # strict screen caught its 64-term float dot splitting the 4dp
    # norm round (order-dependent ulps), fixed with per-term integer
    # nano-unit quantization and re-verified strict at sf0.01/1/10/
    # 100 (it was already an in-window fresh key; moved to the head).
    # dedup_semantic_clustered (r7 VERDICT item 4: IVF coarse-
    # quantizer prune, nprobe=3, + persisted assignment) and
    # q9_product_type_profit (r7 VERDICT item 8: the 'red' predicate
    # pushed upstream of the derived-partsupp aggregate + explicit
    # red-parts broadcast — output-identical, sf100 DNF -> 40.5 s)
    # lead: both were driver-green before, but changed code always
    # re-certifies before backlog. The other four are the r7 VERDICT
    # item 6 exact-cents conversions of round(avg) oracle sites; all
    # four are themselves never-driver-checked, so the window is 2
    # re-checks + 48 fresh keys: ts_seasonal_baseline and
    # stat_bootstrap_ci were already inside it (moved to the head);
    # corpus_dataset_card and text_bigram_lm_perplexity are pulled
    # forward from the r9 K-tranche. Displaced to r9: the window's
    # former tail (text_inverted_index, ts_business_days,
    # ts_interval_union_coverage, ts_time_weighted_avg).
    #
    # Burn-down schedule (driver window ~50/round, list is consumed
    # head-first; after each round the freshly-checked heads drop off
    # and the list shifts up):
    #   r7: DONE — semantic_clustered + H(25) + I(10) + L(1-14)
    #   r8: slots 1-50  = 6 redemption + L(15-35 minus seasonal)
    #                     + M(1-25)
    #   r9: slots 51-100 = M(26-30) + K(29 left) + D(1-16)
    #   r10: slots 101-121 = D(17-20) + A(5) + C(4) + G(3) + J(3)
    #                      + E(1) + F(1)  — backlog fully retired
    # (119 left after r7; every key stays covered by the local
    # 424-query strict sweep meanwhile.)
    # Long-green keys are unlisted and register last in module order.
    #
    # SECOND-SESSION REDEMPTIONS (r8): the r10-window sf100 pre-screen
    # caught two scale defects whose fixes changed query code, so both
    # keys take the head of THIS round's window (displacing
    # stat_mann_whitney_u and text_classify_naive_bayes to r9 — each
    # already holds an sf100 strict point): udf_cogrouped_pandas
    # (unfiltered cogroup fact side = one Python callback per
    # order-only key; probe predicate mirrored, 1138 s -> 8 s at
    # sf100) and scan_metadata_columns (per-bucket rescan +
    # serial coalesce(1) staging -> one shuffle + dynamic partitionBy,
    # group on _metadata.file_path; 530 s -> 68 s at sf100).
    # agg_unpivot joins them from the D-category sf100 breadth sweep:
    # its sum_disc round(sum(l_discount),4) split at sf100 (2e8 terms
    # reach 1e7; double-sum ulp crossed the 4dp round) — converted to
    # exact integer cents on both engines, strict-green at
    # sf0.01/1/10/100. Displaced to r9: stat_mann_whitney_u,
    # text_classify_naive_bayes, stat_mahalanobis_outliers (each
    # holds an sf100 strict point already).
    # join_inner_broadcast joins from the C-category sweep: its
    # round(sum(c_acctbal),4) split one ulp at sf100 (~2.5e9/group)
    # — converted to exact cents, strict-green at sf0.01/1/10/100;
    # displaces stat_cohort_survival_km (sf100 strict point held).
    # text_contamination_ngram and sim_search_mmr_rerank join from the
    # K-category sf100 breadth sweep (oracle-only rewrites, Spark
    # plans untouched): both oracles read a big column through a
    # multi-referenced CTE, which DuckDB auto-MATERIALIZES — at sf100
    # the contamination gram CTE and the MMR embedding CTE each
    # spilled >30 GB of temp and aborted the sweep. Rewritten to
    # reference the base table per use site (filters pushed below the
    # unnest / the K-row candidate set built before the pairwise
    # join); re-verified strict at sf0.01/sf1 and sf10 (contamination
    # is count-match at sf10 — its PAIR output is SF-quadratic on the
    # replica corpus, the declared fuzzy_minhash class). Displaced to
    # r9 (slots 51-52): stat_benford_digits and stat_chi_square —
    # both hold sf100 strict points from the r9-window pre-screen.
    # write_orc_roundtrip joins from the A-category sf100 sweep: its
    # round(sum(s_acctbal),4) split one ulp at ~4.6e9 (1M 2dp terms)
    # — converted to exact cents, strict-green at sf0.01/1/10/100;
    # displaces sql_partition_hints to r9 (slot 51; it holds an sf100
    # strict point from the r8-window pre-screen).
    "udf_cogrouped_pandas", "scan_metadata_columns", "agg_unpivot",
    "join_inner_broadcast",
    "text_contamination_ngram", "sim_search_mmr_rerank",
    "write_orc_roundtrip",
    "dedup_semantic_clustered", "q9_product_type_profit",
    "ts_seasonal_baseline", "stat_bootstrap_ci", "corpus_dataset_card",
    "text_bigram_lm_perplexity", "embedding_random_projection_jl",
    "sample_weighted_reservoir", "scd2_dimension_build",
    "skew_diagnose_keys", "ts_alert_hysteresis", "ts_anomaly_mad",
    "ts_anomaly_zscore", "ts_autocorrelation", "ts_changepoint_cusum",
    "ts_ewma_bounded", "ts_gapfill_locf", "ts_holt_linear_forecast",
    "ts_periodogram_dft", "ts_resample_ohlc", "ts_sliding_windows_batch", "ts_theil_sen_slope", "ts_window_time_range",
    "window_rolling_median", "window_running_distinct",
    "zorder_morton_layout", "zorder_prune_selectivity",
    "agg_percentile_within_group", "agg_weighted_median", "df_transpose",
    "events_attribution_touch",
    "events_heatmap_hour_dow", "events_seq_pattern", "fn_from_csv_parse",
    "fn_timestamp_ntz", "fn_unicode_lengths", "fn_uuid_deterministic",
    "geo_nearest_hub", "join_natural_using", "ml_kfold_cross_validation",
    "ml_linear_normal_equation", "ml_logistic_gradient_steps",
    "recon_symmetric_diff", "sql_partition_hints", "stat_benford_digits",
    "stat_chi_square", "stat_cohort_survival_km",
    "stat_mahalanobis_outliers", "stat_mann_whitney_u",
    "text_classify_naive_bayes", "text_inverted_index", "ts_business_days",
    "ts_interval_union_coverage", "ts_time_weighted_avg",
    "udf_pandas_iterator", "anonymize_k_audit", "corpus_importance_resampling", "corpus_lang_rebalance",
    "corpus_quality_ensemble", "corpus_source_divergence_jsd",
    "dedup_minhash_index_merge", "dedup_paragraph_exact",
    "dedup_prefix_boilerplate", "dedup_shingle_containment",
    "dedup_winnowing_fingerprints", "doc_chunk_overlap",
    "embedding_product_quantization", "fn_interval_arithmetic",
    "gdpr_delete_cascade", "ml_decision_stump",
    "multimodal_webdataset_shards", "part_co_occurrence",
    "seq_len_distribution", "sim_search_ivf_pq", "stream_windowed_topk",
    "text_doc_entropy",
    "text_ngram_novelty_rate", "text_repetition_rep_n",
    "text_vocab_freq_spectrum", "tokenizer_bpe_merges",
    "tokenizer_unigram_em", "tokenizer_vocab_build", "ts_downsample_lttb",
    "ts_kalman_filter_1d", "agg_approx_top_k", "agg_bitmap_distinct",
    "agg_boolean_bitwise", "agg_covariance", "agg_grouping_id",
    "agg_listagg", "agg_mode_deterministic", "agg_regression",
    "agg_session_window_batch", "agg_width_bucket_histogram",
    "incremental_variance_merge", "q11_important_stock",
    "q16_supplier_part_counts", "q20_part_promotion", "q2_min_cost_supplier",
    "sketch_hll_union", "sketch_kll_quantiles", "sql_pivot_syntax",
    "sql_scripting_control_flow", "stat_crosstab", "avro_ingest",
    "scan_ignore_corrupt_files",
    "sink_python_datasource", "synthetic_data_generate", "join_asof_nearest",
    "join_asof_tolerance", "join_interval_overlap", "join_mark_existence",
    "set_except_all", "set_intersect_all", "set_union_byname",
    "udf_arrow_optimized", "udtf_analyze_dynamic",
    "window_nth_first_ignore", "topk_offset_pagination",
]


def _apply_check_order() -> None:
    """Reorder QUERIES/ORACLES so _CHECK_ORDER names register first."""
    ordered = [n for n in _CHECK_ORDER if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in ordered if n in snapshot})
