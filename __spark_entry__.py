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


# The driver attests the FIRST 50 queries() entries per round. This
# window is GENERATED from the CORRECTNESS_r*.json history by
#   python tools/attestation_ledger.py --changed pagerank_supply_graph
# (the one registry query whose operator took a round-7 edit:
# ``pagerank_fixed`` now frees edg/deg/universe on the empty-graph
# early return per round-6 ADVICE — value-neutral for the registry
# inputs, but the changed-operator rule outranks freshness, so it
# leads. ``materialized_rollup`` also changed this round — enforced
# days-per-batch bound — but it backs no registry query; it is
# test-attested only, see COVERAGE.md Streaming row.) Then pure
# stalest-first: the 5 remaining r02 streaming-roundtrip rows, the 42
# r03 rows, and the 2 oldest r04 rows. Registry growth is deliberately
# stopped per the round-4 verdict. ``attestation_ledger.py --check
# --changed pagerank_supply_graph`` verifies this tuple without
# writing the committed ledger.
# ROUND-8 NOTE: lead with any new/operator-changed queries (pass them
# via --changed), then regenerate via the ledger tool — expected window
# if nothing changes: mixture_rebalance_downsample + the remaining r04
# rows, then the oldest r05 rows.
_PRIORITY = (
    "pagerank_supply_graph",  # r06 (changed: empty-graph checkpoint free)
    "incremental_stream_roundtrip",  # r02
    "stream_upsert_cdc_roundtrip",  # r02
    "stream_dedup_roundtrip",  # r02
    "stream_running_stats_roundtrip",  # r02
    "stream_interval_join_roundtrip",  # r02
    "embedding_ann_lsh",  # r03
    "embedding_near_dup",  # r03
    "array_functions",  # r03
    "variant_shred_props",  # r03
    "regex_functions",  # r03
    "window_value_family",  # r03
    "sequence_packing",  # r03
    "quality_upsample_repeat",  # r03
    "tfidf_top_terms",  # r03
    "decontaminate_ngram_overlap",  # r03
    "set_ops_all",  # r03
    "sort_nulls_family",  # r03
    "rollup_grouping_id",  # r03
    "try_arithmetic_family",  # r03
    "embedding_quantize_int8",  # r03
    "incremental_cross_dedup",  # r03
    "interval_coalesce",  # r03
    "scd2_user_history",  # r03
    "data_quality_report",  # r03
    "char_entropy_quality",  # r03
    "snapshot_diff_orders",  # r03
    "cdc_apply_events",  # r03
    "weighted_sample_docs",  # r03
    "outlier_clip_iqr",  # r03
    "zscore_normalize",  # r03
    "temporal_split_embargo",  # r03
    "generator_functions",  # r03
    "embedding_matryoshka_truncate",  # r03
    "unigram_logprob_quality",  # r03
    "segment_dedup_reconstruct",  # r03
    "sliding_window_agg",  # r03
    "incremental_rollup_maintain",  # r03
    "event_debounce",  # r03
    "funnel_view_click_purchase",  # r03
    "bpe_pair_merge_candidates",  # r03
    "point_in_time_state_join",  # r03
    "span_corruption_pairs",  # r03
    "source_overlap_matrix",  # r03
    "pmi_collocations",  # r03
    "zorder_clustered_pruned_scan",  # r03
    "compaction_roundtrip",  # r03
    "stream_static_enrich_roundtrip",  # r03
    "embedding_ann_ivf",  # r04
    "frequent_tokens_sketch",  # r04
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
