"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps one
entry per implemented operator (SURVEY.md section 2) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL. Computed columns are aliased identically on
both sides; floating-point aggregates are rounded to 6 decimals on both
sides so value hashes are stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fiap_machine_learning_tech_challenge_2_etl_spark.plans.pipeline import (
    flagship_events_pipeline,
)
from fiap_machine_learning_tech_challenge_2_etl_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_events_pipeline(spark, "/root/testdata/sf0.001")


# The driver attests 50 queries per round (registry order). Round 3 leads
# with (a) the 11 queries that missed every prior window, (b) the 2 queries
# whose array-typed outputs broke the driver canonicalizer in r02 (now
# stringified), (c) embedding_ann_lsh (gained a full value oracle this
# round), and (d) the 3 near-dup/cluster queries whose plans or oracles
# changed this round and deserve a FRESH green row. Everything else already
# carries a green row in CORRECTNESS_r01/r02 (locally,
# tools/verify_queries.py still runs the full registry every round).
_PRIORITY = (
    # (a) never attested in r01/r02 (50-cap misses)
    "decontaminate_ngram_overlap", "quality_upsample_repeat",
    "regex_functions", "rollup_grouping_id", "sequence_packing",
    "set_ops_all", "sort_nulls_family", "tfidf_top_terms",
    "try_arithmetic_family", "variant_shred_props", "window_value_family",
    # (b) r02 driver artifact failures, outputs now driver-hashable
    "array_functions", "embedding_quantize_int8",
    # (c) newly oracle'd
    "embedding_ann_lsh",
    # (d) changed this round (LSH-banded CC edges / shared oracle CTEs)
    "dedup_canonical_docs", "leakage_safe_split", "embedding_near_dup",
    # (e) new this round — warehouse maintenance, data quality, corpus
    # curation (segment dedup/unigram LM/mixture rebalance/budget select/
    # span corruption), graph analytics (PageRank), distributed ranking,
    # funnel/debounce/PIT analytics. Keep this list <= 50 (the driver's
    # per-round attestation cap); everything below the cap must already
    # hold a green row from an earlier round.
    # ROUND-4 NOTE: lead the next round's list with the queries that
    # landed after this round's cap filled — psi_drift_report,
    # triangle_count_near_dup, shingle_containment_pairs, knn_label_noise,
    # robust_mad_scores, co_purchase_pairs, event_transition_matrix,
    # cohort_retention, multimodal_resize_thumb (all locally hash-verified
    # at sf0.01 via tools/verify_queries.py this round).
    "zorder_clustered_pruned_scan",
    "interval_coalesce",
    "scd2_user_history",
    "data_quality_report",
    "char_entropy_quality",
    "compaction_roundtrip",
    "incremental_cross_dedup",
    "snapshot_diff_orders",
    "cdc_apply_events",
    "weighted_sample_docs",
    "outlier_clip_iqr",
    "zscore_normalize",
    "temporal_split_embargo",
    "stream_static_enrich_roundtrip",
    "generator_functions",
    "embedding_matryoshka_truncate",
    "unigram_logprob_quality",
    "segment_dedup_reconstruct",
    "mixture_rebalance_downsample",
    "pagerank_supply_graph",
    "equidepth_binning",
    "sliding_window_agg",
    "incremental_rollup_maintain",
    "event_debounce",
    "funnel_view_click_purchase",
    "token_budget_select",
    "hard_negative_mining",
    "bpe_pair_merge_candidates",
    "corpus_curation_pipeline",
    "point_in_time_state_join",
    "span_corruption_pairs",
    "source_overlap_matrix",
    "pmi_collocations",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2,
    ordered so queries needing a (fresh) driver attestation come first."""
    q = queries_catalog.SPARK_QUERIES
    ordered = {k: q[k] for k in _PRIORITY if k in q}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same aliases as queries()."""
    return queries_catalog.ORACLE_SQL
