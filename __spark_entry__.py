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
#     bfs_reachable_hops,label_propagation_nations,shortest_path_weighted
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
# duplicate seed rows deterministically. Then pure stalest-first: the 40
# oldest r04 rows. Bare ``attestation_ledger.py --check`` verifies this
# tuple (it reads max_round and the changed set from the committed
# ledger).
# ROUND-9 NOTE: lead with any new/operator-changed queries (pass them
# via --changed), then regenerate via the ledger tool — expected window
# if nothing changes: the remaining r04 rows (value_histogram onward),
# then the r05 rows in registry order.
_PRIORITY = (
    "materialized_rollup_roundtrip",  # NEW (r08: materialized_rollup swap-in)
    "triangle_count_near_dup",  # r04 (changed: near-dup auto width+bands)
    "lsh_recall_eval",  # r04 (changed: near-dup auto width+bands)
    "dedup_canonical_docs",  # r06 (changed: near-dup auto width+bands)
    "leakage_safe_split",  # r06 (changed: near-dup auto width+bands)
    "bfs_reachable_hops",  # r06 (changed: bfs_hops delta frontier + seed dedup)
    "label_propagation_nations",  # r06 (changed: label_propagation seed dedup)
    "shortest_path_weighted",  # r06 (changed: sssp delta frontier + seed dedup)
    "embedding_near_dup",  # r07 (changed: near-dup auto width+bands)
    "pagerank_supply_graph",  # r07 (changed: pagerank relative-scale rank6)
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
    "recsys_negative_sampling",  # r04
    "stratified_kfold",  # r04
    "class_balance_weights",  # r04
    "winsorized_stats",  # r04
    "string_agg_family",  # r04
    "mode_per_group",  # r04
    "lateral_join_topk",  # r04
    "sql_pipe_syntax_entry",  # r04
    "benford_first_digit",  # r04
    "sessionize_gap_islands",  # r04
    "time_weighted_average",  # r04
    "join_key_skew_report",  # r04
    "funnel_time_to_convert",  # r04
    "association_rules_lift",  # r04
    "multimodal_audio_energy",  # r04
    "minhash_recall_eval",  # r04
    "cusum_drift_detection",  # r04
    "quantile_normalize_by_lang",  # r04
    "hll_distinct_rollup",  # r04
    "runner_batch_roundtrip",  # r04
    "jsonl_quarantine_roundtrip",  # r04
    "msck_repair_discovery",  # r04
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
