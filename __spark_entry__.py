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
#   python tools/attestation_ledger.py --changed dedup_cluster_cc,\
#     dedup_canonical_docs,leakage_safe_split,pagerank_supply_graph,\
#     bfs_reachable_hops,label_propagation_nations,shortest_path_weighted
# (the 7 queries riding operators/graph.py, which took round-6 ADVICE
# fixes — failure-path checkpoint freeing, pagerank edg/universe freeing,
# explicit-level log4j restore; all value-neutral, but the
# changed-operator rule outranks freshness, so they lead). Then the
# stalest greens rotate in: the 7 r01 pure-SQL rows + the 36 oldest r02
# rows. Registry growth is deliberately stopped per the round-4 verdict.
# ``attestation_ledger.py --check --changed ...`` verifies this tuple.
# ROUND-7 NOTE: lead with any new/operator-changed queries, then
# regenerate via the ledger tool — expected window if nothing changes:
# the 5 remaining r02 rows (incremental_stream_roundtrip,
# stream_upsert_cdc_roundtrip, stream_dedup_roundtrip,
# stream_running_stats_roundtrip, stream_interval_join_roundtrip) +
# the 42 r03 rows + the 3 oldest r04 rows.
_PRIORITY = (
    "dedup_cluster_cc",  # changed r05 -> fresh
    "dedup_canonical_docs",  # changed r05 -> fresh
    "leakage_safe_split",  # changed r05 -> fresh
    "pagerank_supply_graph",  # changed r05 -> fresh
    "bfs_reachable_hops",  # changed r05 -> fresh
    "label_propagation_nations",  # changed r05 -> fresh
    "shortest_path_weighted",  # changed r05 -> fresh
    "set_ops",  # r01
    "rollup_agg",  # r01
    "cube_agg",  # r01
    "grouping_sets_agg",  # r01
    "pivot_event_counts",  # r01
    "unpivot_stats",  # r01
    "distinct_agg",  # r01
    "simhash_near_dup",  # r02
    "window_ranking_family",  # r02
    "string_functions",  # r02
    "date_functions",  # r02
    "sql_entry_tpch_q3",  # r02
    "label_centroids",  # r02
    "word_count_topk",  # r02
    "stats_agg_family",  # r02
    "regr_agg_family",  # r02
    "conditional_agg_family",  # r02
    "percentile_agg_family",  # r02
    "range_frame_window",  # r02
    "gapfill_forward_fill",  # r02
    "exists_subquery_agg",  # r02
    "scalar_subquery_agg",  # r02
    "hash_split_corpus",  # r02
    "stratified_sample_docs",  # r02
    "gapfill_interpolate",  # r02
    "profile_documents",  # r02
    "value_histogram",  # r02
    "chunk_documents",  # r02
    "min_cost_supplier",  # r02
    "map_functions",  # r02
    "ewma_user_daily",  # r02
    "null_semantics_family",  # r02
    "fuzzy_match_levenshtein",  # r02
    "bitwise_functions",  # r02
    "event_sequence_assembly",  # r02
    "pii_redaction",  # r02
    "repetition_ngram_stats",  # r02
    "sink_partition_overwrite_roundtrip",  # r02
    "sink_upsert_merge_roundtrip",  # r02
    "catalog_partition_registry",  # r02
    "file_list_scan",  # r02
    "bucketed_join_colocated",  # r02
    "range_clustered_pruned_scan",  # r02
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
