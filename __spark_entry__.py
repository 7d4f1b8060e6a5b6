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


# The driver attests 50 queries per round (registry order). Round 5 leads
# with (a) the only 2 registry rows without ANY driver attestation
# (landed after round 4's 50-slot window filled) — a green r05 row for
# each completes driver attestation of the full registry; (b) the one
# query whose plan changed this round (theta_sketch_overlap: pair frame
# now derived relationally instead of a driver-side Python list, per
# round-4 ADVICE) and so needs a FRESH green row; then (c) rotates the
# STALEST green rows back through the window — 39 of the 46 queries
# whose latest attestation is still round 1 (operators under them —
# windows, dedup, similarity, text — have been refactored since) plus
# the oldest round-2 row touched by dedup refactors
# (minhash_lsh_near_dup). Note
# seasonal_decompose_daily also changed this round (explicit
# floor-division replaces the sign-fragile `div`, per round-4 ADVICE),
# which its lead slot covers; and operators/graph.py gained 100x-scale
# memory fixes (per-round checkpoint freeing + problem-sized shuffle
# width — value-neutral, full 186-query oracle sweep green), so the 7
# registry queries riding it get fresh rows in section (b2) ahead of
# freshness-only rotations. Keep <= 50.
_PRIORITY = (
    # (a) the last 2 never-attested rows (round-4 50-cap misses)
    "seasonal_decompose_daily",
    "attribution_first_last_touch",
    # (b) plan changed this round (relational pair frame, ADVICE fix)
    "theta_sketch_overlap",
    # (b2) operator under them changed this round (graph.py scale fixes)
    "dedup_cluster_cc",
    "dedup_canonical_docs",
    "leakage_safe_split",
    "pagerank_supply_graph",
    "bfs_reachable_hops",
    "label_propagation_nations",
    "shortest_path_weighted",
    # (c) stale rotation: latest attestation r01, oldest first
    "flagship_pipeline",
    "tpch_q1_agg",
    "select_filter_project",
    "all_null_column_drop",
    "fill_defaults",
    "sanitize_numeric",
    "distinct_rows",
    "dedup_keep_first",
    "moving_average",
    "group_total",
    "rank_in_group",
    "group_min_date",
    "rolling_stats",
    "top_k_orders",
    "join_topk_revenue",
    "star_join_agg",
    "semi_join_customers",
    "anti_join_customers",
    "asof_join_events",
    "range_join_shipments",
    "skew_salted_agg",
    "session_window_agg",
    "tumbling_window_agg",
    "json_extract_agg",
    "exact_dedup_docs",
    "minhash_signatures",
    "ngram_jaccard_topk",
    "simhash_docs",
    "doc_fingerprint",
    "winnowing_fingerprints",
    "text_stats",
    "text_quality",
    "language_id",
    "corpus_clean_pipeline",
    "embedding_cosine_topk",
    "embedding_topk_pairs",
    "embedding_near_dup_exact",
    "multimodal_features",
    "multimodal_frame_sample",
    # (c cont.) oldest r02 row under refactored dedup operators
    "minhash_lsh_near_dup",
    # ROUND-6 NOTE: exactly 50 entries above. After a green r05, EVERY
    # registry query has a driver attestation (the r01-r05 union), every
    # query riding a round-5-changed operator has a fresh row, and the
    # only r01-stale greens left are 7 pure built-in-SQL surfaces
    # (pivot_event_counts, unpivot_stats, cube_agg, rollup_agg,
    # grouping_sets_agg, distinct_agg, set_ops — swapped out for the
    # graph.py-dependent rows, which the changed-operator rule outranks).
    # Round 6 should lead with any new or operator/oracle-changed
    # queries, then rotate: those 7 r01 rows first, then the remaining
    # 42 r02 rows (bitwise_functions ... word_count_topk, minus
    # minhash_lsh_near_dup attested here), then r03. Registry growth is
    # deliberately stopped per the round-4 verdict — depth over breadth.
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
