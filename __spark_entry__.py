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
#   python tools/attestation_ledger.py --changed \
#     embedding_near_dup,dedup_canonical_docs,leakage_safe_split,\
#     triangle_count_near_dup,lsh_recall_eval,pagerank_supply_graph,\
#     bfs_reachable_hops,label_propagation_nations,shortest_path_weighted,\
#     minhash_lsh_near_dup,minhash_recall_eval,simhash_docs,\
#     simhash_near_dup,incremental_cross_dedup,incremental_stream_roundtrip,\
#     stream_upsert_cdc_roundtrip,stream_interval_join_roundtrip,\
#     sink_upsert_merge_roundtrip,outlier_clip_iqr,association_rules_lift,\
#     funnel_time_to_convert,recsys_negative_sampling,asof_join_events,\
#     point_in_time_state_join,rolling_stats,value_histogram,\
#     snapshot_diff_orders
# Round-8 leads: (1) materialized_rollup_roundtrip — NEW registry row
# (swapped in for the thin distinct_agg per the round-7 verdict; registry
# stays frozen at 186) attesting the incremental materialized rollup's
# late-data recompute + untouched-partition survival; (2) the five
# queries riding embedding_near_dup_pairs, whose DEFAULT path changed
# TWICE in round 8: corpus-sized band width (lsh_band_width + a combined
# count/dim stats job replacing the old first() probe), then
# recall-targeted band COUNT (bands = lsh_bands_for_recall(threshold,
# width), 64-band cap) — the oracle SQL derives the same width from
# count(*) and the same band count from a Python-generated width->bands
# CASE table, so both engines track the full auto default at any scale;
# pair sets DID change (recall up), re-verified via
# tools/verify_queries.py; (3) the four iterative-graph queries, whose
# operators changed in the round-8 review sweep: pagerank_fixed moved to
# relative-to-uniform rank6 (absolute micro-probabilities truncate to
# {0,1} at N ~ 1e5+ — oracle SQL updated in lockstep, values changed),
# bfs_hops/shortest_paths_weighted gained delta-frontier rounds + seed
# dedup (result-identical on clean input), label_propagation collapses
# duplicate seed rows deterministically; (4) the five dedup-family
# queries riding the round-8 dedup.py review batch: shared
# signature/banding helpers (one semantics-bearing definition), loud
# band/num_perm + pigeonhole validation, a token-axis-chunked simhash
# vote (value-identical; bounds the Python-worker transient), and the
# corpus-hash broadcast hint dropped from cross_dedup_status (AQE picks
# the strategy; a forced broadcast dies at the petabyte corpus the op is
# documented for) — all re-verified bit-identical vs the oracles;
# (5) the four streaming/sink queries riding the round-8 incremental.py
# review batch: run_incremental_pipeline's sink is now a
# touched-partition MERGE with an __ingest_epoch replay filter (a bare
# per-batch dynamic overwrite silently lost rows whenever one output
# partition spanned two micro-batches), upsert_by_key gained a versioned
# order_col merge (a late redelivery of an OLD version can no longer
# regress a newer stored row; stream_upsert_by_key delegates to it),
# stream_stream_interval_join emits flat suffixed columns (the bare
# two-sided join was unsinkable: duplicate names), and
# materialized_rollup gained the maxFilesPerTrigger lever its over-cap
# error used to (impossibly) recommend; (6) late-round additions:
# sink_upsert_merge_roundtrip also rides the contested-slice split
# (uncontested rows of touched partitions skip the version window) and
# the AQE-decided (unhinted) key joins, and four queries whose
# data-proportional broadcast hints were dropped (outlier_clip_iqr's
# keyed fences, association_rules_lift's per-part counts,
# funnel_time_to_convert's |users|-row stage frames,
# recsys_negative_sampling's part-key validation join — AQE still
# broadcasts them when small; values re-verified identical), plus the
# two queries riding asof_join, whose carry semantics were FIXED (the
# matched right row now travels as one struct — per-column
# last(ignorenulls) back-filled a legitimately-NULL value column from an
# OLDER right row, stitching two right rows into one output; NULL keys
# now never match), and rolling_stats, whose exact median now survives an
# all-NULL frame (empty collect_list -> element_at index 0 threw under
# ANSI; try_element_at + clamp returns NULL like percentile_approx), and
# value_histogram, whose width-0 (constant column) case threw
# DIVIDE_BY_ZERO under ANSI (try_divide + coalesce-to-bucket-0; coalesce
# BEFORE least, which skips NULLs and would pick the last bucket), and
# snapshot_diff_orders — snapshot_diff's presence test now uses literal
# markers (key.isNotNull() misclassified a null-key row present on both
# sides of the null-safe join as an insert).
# Then pure stalest-first: the 22 oldest r04 rows. Bare
# ``attestation_ledger.py --check`` verifies this tuple (it reads
# max_round and the changed set from the committed ledger).
# ROUND-9 NOTE: lead with any new/operator-changed queries (pass them
# via --changed), then regenerate via the ledger tool — expected window
# if nothing changes: the remaining r04 rows (mode_per_group,
# lateral_join_topk, sql_pipe_syntax_entry, benford_first_digit,
# sessionize_gap_islands, time_weighted_average, join_key_skew_report
# onward), then the r05 rows in registry order.
_PRIORITY = (
    "materialized_rollup_roundtrip",  # NEW (r08 swap-in; sink now shared writer + mfpt lever)
    "triangle_count_near_dup",  # changed: near-dup auto width+bands
    "recsys_negative_sampling",  # changed: part-key join unhinted (AQE) — also r04-stale
    "funnel_time_to_convert",  # changed: stage join-backs unhinted (AQE) — also r04-stale
    "association_rules_lift",  # changed: per-part count joins unhinted (AQE) — also r04-stale
    "lsh_recall_eval",  # changed: near-dup auto width+bands
    "minhash_recall_eval",  # changed: shared signature helper
    "rolling_stats",  # changed: exact median NULL-frame fix (try_element_at)
    "simhash_docs",  # changed: chunked vote (value-identical)
    "minhash_lsh_near_dup",  # changed: shared band helpers + validation
    "asof_join_events",  # changed: asof struct carry (franken-row fix) — also r04-stale
    "simhash_near_dup",  # changed: chunked vote + pigeonhole guard
    "value_histogram",  # changed: width-0 DIVIDE_BY_ZERO fix (try_divide) — also r04-stale
    "dedup_canonical_docs",  # changed: near-dup auto width+bands
    "leakage_safe_split",  # changed: near-dup auto width+bands
    "bfs_reachable_hops",  # changed: bfs_hops delta frontier + seed dedup
    "label_propagation_nations",  # changed: label_propagation seed dedup
    "shortest_path_weighted",  # changed: sssp delta frontier + seed dedup
    "sink_upsert_merge_roundtrip",  # changed: versioned merge + contested-slice split, AQE key joins
    "embedding_near_dup",  # changed: near-dup auto width+bands
    "incremental_cross_dedup",  # changed: broadcast hint dropped + shared helpers
    "snapshot_diff_orders",  # changed: null-safe presence markers in snapshot_diff
    "outlier_clip_iqr",  # changed: keyed fences join unhinted (AQE)
    "pagerank_supply_graph",  # changed: pagerank relative-scale rank6
    "point_in_time_state_join",  # changed: asof struct carry (franken-row fix)
    "incremental_stream_roundtrip",  # changed: touched-partition merge sink (epoch-idempotent)
    "stream_upsert_cdc_roundtrip",  # changed: versioned cross-batch merge (order_col)
    "stream_interval_join_roundtrip",  # changed: flat suffixed output columns
    "mixture_rebalance_downsample",  # r04
    "equidepth_binning",  # r04
    "token_budget_select",  # r04
    "hard_negative_mining",  # r04
    "corpus_curation_pipeline",  # r04
    "psi_drift_report",  # r04
    "shingle_containment_pairs",  # r04
    "knn_label_noise",  # r04
    "robust_mad_scores",  # r04
    "co_purchase_pairs",  # r04
    "event_transition_matrix",  # r04
    "cohort_retention",  # r04
    "multimodal_resize_thumb",  # r04
    "rolling_distinct_users",  # r04
    "churn_label_next_gap",  # r04
    "seasonal_naive_error",  # r04
    "histogram2d_heatmap",  # r04
    "feature_hashing_cross",  # r04
    "stratified_kfold",  # r04
    "class_balance_weights",  # r04
    "winsorized_stats",  # r04
    "string_agg_family",  # r04
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
