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
    # ---- r9 window: backlog burn-down, tranche 3 of 4 ----
    # The driver checks the first ~50 registered queries each round
    # (r8 came back 50/50 green, CORRECTNESS_r08; those heads drop
    # off). This round's window = 10 REDEMPTION slots + the next 40
    # never-driver-checked backlog keys.
    #
    # REDEMPTION SLOTS (r9): the r8 VERDICT item 2 order — convert
    # the last 11 round(avg/sum) float oracle sites (10 keys) to the
    # exact-integer pattern NOW; engine round(avg(..)) split three
    # certified keys in r8's sf100 screen. All ten keys below were
    # long-green (driver-checked in r1-r6) but both their Spark and
    # oracle expressions changed this round, and changed code always
    # re-certifies before backlog. Conversions: integer-unit
    # quantization (cents / nano-units) + exact sum + one IEEE
    # division + portable floor; events_uplift_cuped additionally
    # derives theta from cleared-denominator HUGEINT/DECIMAL(38,0)
    # sums so it is now BIT-identical across engines; the two LM keys
    # use the text_bigram_lm_perplexity NANO-unit NLL pattern. Each
    # re-verified strict at sf0.01 + sf1 + sf10 (sf100 screens in
    # BENCH_local.md r9 section).
    # dedup_semantic_clustered joins them (11th redemption slot): the
    # r8 VERDICT item 4 test pins required extracting the GEMM kernel
    # to module level (_semantic_cluster_pairs, block parameterized
    # for the cross-block completeness unit test) plus a 1-arg
    # applyInPandas wrapper — behavior-identical, but changed code
    # always re-certifies; strict-green at sf0.01/sf1 post-change.
    # basket_association_lift joins them (12th redemption slot,
    # oracle-only rewrite, r8 VERDICT item 5): its DuckDB oracle's
    # distinct-(order, brand) self-join — ~1.2e9 intermediate pairs
    # at sf100 — ground past a 75 GB cap; rewritten to the
    # brand-BITMASK formulation (each basket collapses to one
    # UBIGINT bit_or mask; pair/support expansion over distinct
    # masks x 25 brands). Counts provably identical, float
    # expressions byte-identical; strict-green at sf0.01/sf1/sf10 +
    # the sf100 point recorded in BENCH_local.md r9.
    # (text_contamination_ngram's oracle was also touched this round
    # — the duplicated gram subquery now renders from one helper —
    # but the rendered SQL is token-identical to the r8-certified
    # text modulo whitespace/comments, verified by diff, so it keeps
    # its r8 row and takes no slot.)
    #
    # Burn-down schedule (driver window ~50/round, list consumed
    # head-first; freshly-checked heads drop off after each round):
    #   r7: DONE - semantic_clustered + H(25) + I(10) + L(1-14)
    #   r8: DONE - 7 redemption + L tail + M(1-25) (50/50 green)
    #   r9: slots 1-50  = 12 redemption (above) + backlog 1-38
    #                     (M-tail 12 incl. the r8-displaced
    #                     stat/text/ts keys, then K 26)
    #   r10: slots 51-88 = K tail (tokenizer_vocab_build,
    #                      ts_downsample_lttb, ts_kalman_filter_1d)
    #                      + D(10, incl. the sketches) + A(4) + C(4)
    #                      + G(3) + J(2: udf_arrow_optimized,
    #                      udtf_analyze_dynamic) + E(1) + F(1) +
    #                      q-suite stragglers - backlog fully
    #                      retired; ever-checked = 424/424.
    # Every backlog key already passes the local 424-query strict
    # sweep at sf0.01 AND holds an sf100/sf30 strict or fingerprint
    # pre-screen point (BENCH_local.md r8 sections).
    #
    # POST-BACKLOG POLICY (from r11, per r8 VERDICT item 7): once the
    # ledger closes at 424/424, each round's window becomes a
    # rotating RE-certification of the ~50 keys whose last driver
    # row is OLDEST (oldest-first by round, alphabetical within a
    # round), with changed-code redemption slots still taking the
    # head. That re-certifies the whole surface roughly every 9
    # rounds and keeps the driver gate sensitive to regressions in
    # long-green code.
    "dedup_semantic_clustered", "basket_association_lift", "agg_global",
    "agg_stats",
    "window_moving_avg",
    "events_uplift_cuped",
    "text_lang_stats",
    "pipeline_corpus_prep",
    "text_lm_kneser_ney",
    "text_lm_interpolation_tuning",
    "curriculum_quality_stages",
    "embedding_mean_pool",
    "sql_partition_hints",
    "stat_benford_digits",
    "stat_chi_square",
    "stat_cohort_survival_km",
    "stat_mahalanobis_outliers",
    "stat_mann_whitney_u",
    "text_classify_naive_bayes",
    "text_inverted_index",
    "ts_business_days",
    "ts_interval_union_coverage",
    "ts_time_weighted_avg",
    "udf_pandas_iterator",
    "anonymize_k_audit",
    "corpus_importance_resampling",
    "corpus_lang_rebalance",
    "corpus_quality_ensemble",
    "corpus_source_divergence_jsd",
    "dedup_minhash_index_merge",
    "dedup_paragraph_exact",
    "dedup_prefix_boilerplate",
    "dedup_shingle_containment",
    "dedup_winnowing_fingerprints",
    "doc_chunk_overlap",
    "embedding_product_quantization",
    "fn_interval_arithmetic",
    "gdpr_delete_cascade",
    "ml_decision_stump",
    "multimodal_webdataset_shards",
    "part_co_occurrence",
    "seq_len_distribution",
    "sim_search_ivf_pq",
    "stream_windowed_topk",
    "text_doc_entropy",
    "text_ngram_novelty_rate",
    "text_repetition_rep_n",
    "text_vocab_freq_spectrum",
    "tokenizer_bpe_merges",
    "tokenizer_unigram_em",
    "tokenizer_vocab_build",
    "ts_downsample_lttb",
    "ts_kalman_filter_1d",
    "agg_approx_top_k",
    "agg_bitmap_distinct",
    "agg_boolean_bitwise",
    "agg_covariance",
    "agg_grouping_id",
    "agg_listagg",
    "agg_mode_deterministic",
    "agg_regression",
    "agg_session_window_batch",
    "agg_width_bucket_histogram",
    "incremental_variance_merge",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_part_promotion",
    "q2_min_cost_supplier",
    "sketch_hll_union",
    "sketch_kll_quantiles",
    "sql_pivot_syntax",
    "sql_scripting_control_flow",
    "stat_crosstab",
    "avro_ingest",
    "scan_ignore_corrupt_files",
    "sink_python_datasource",
    "synthetic_data_generate",
    "join_asof_nearest",
    "join_asof_tolerance",
    "join_interval_overlap",
    "join_mark_existence",
    "set_except_all",
    "set_intersect_all",
    "set_union_byname",
    "udf_arrow_optimized",
    "udtf_analyze_dynamic",
    "window_nth_first_ignore",
    "topk_offset_pagination",
]



def _apply_check_order() -> None:
    """Reorder QUERIES/ORACLES so _CHECK_ORDER names register first."""
    ordered = [n for n in _CHECK_ORDER if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in ordered if n in snapshot})
