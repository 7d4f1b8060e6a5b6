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


# The driver attests 50 queries per round (registry order). Round 4 leads
# with (a) the 9 round-3 queries that landed after that round's cap
# filled (the only registry rows with no driver attestation yet — all
# locally hash-verified at sf0.01 each round), (b) the 2 queries that
# GAINED a full value oracle this round (embedding_ann_ivf via the
# integer-exact k-means replay; frequent_tokens_sketch via the
# capacity>=vocab exactness contract), and (c) queries whose operator or
# oracle changed this round (ADVICE fixes: robust-MAD try_divide,
# NULL-group oracle mirror, NULL-label hard negatives, pinned-partition
# global rank/cumsum) and deserve a FRESH green row. Everything else
# already carries a green row in CORRECTNESS_r01-r03. Keep <= 50.
_PRIORITY = (
    # (a) never attested in r01-r03 (round-3 50-cap misses)
    "psi_drift_report",
    "triangle_count_near_dup",
    "shingle_containment_pairs",
    "knn_label_noise",
    "robust_mad_scores",
    "co_purchase_pairs",
    "event_transition_matrix",
    "cohort_retention",
    "multimodal_resize_thumb",
    # (b) newly oracle'd this round (were rows-only by design in r03)
    "embedding_ann_ivf",
    "frequent_tokens_sketch",
    # (c) operator/oracle changed this round (ADVICE fixes)
    "mixture_rebalance_downsample",
    "corpus_curation_pipeline",
    "hard_negative_mining",
    "equidepth_binning",
    "token_budget_select",
    # (d) new queries added in round 4 (each needs its first driver row)
    "rolling_distinct_users",
    "churn_label_next_gap",
    "seasonal_naive_error",
    "histogram2d_heatmap",
    "feature_hashing_cross",
    "recsys_negative_sampling",
    "stratified_kfold",
    "class_balance_weights",
    "winsorized_stats",
    "string_agg_family",
    "mode_per_group",
    "lateral_join_topk",
    "sql_pipe_syntax_entry",
    "bfs_reachable_hops",
    "label_propagation_nations",
    "benford_first_digit",
    "sessionize_gap_islands",
    "time_weighted_average",
    "join_key_skew_report",
    "funnel_time_to_convert",
    "association_rules_lift",
    "lsh_recall_eval",
    "stream_session_window_roundtrip",
    "quantile_normalize_by_lang",
    "msck_repair_discovery",
    "runner_batch_roundtrip",
    "minhash_recall_eval",
    "stream_tumbling_late_data_roundtrip",
    "multimodal_audio_energy",
    "jsonl_quarantine_roundtrip",
    "cusum_drift_detection",
    "theta_sketch_overlap",
    "hll_distinct_rollup",
    "shortest_path_weighted",
    # ROUND-5 NOTE: exactly 50 entries above — the window is full. TWO
    # round-4 queries landed after it filled and are the only registry
    # rows without a driver attestation: seasonal_decompose_daily and
    # attribution_first_last_touch (both locally hash-verified at sf0.01
    # AND sf0.1). Round 5 must lead _PRIORITY with those two, then any
    # new/changed queries, keep <= 50; a fully-green r05 then attests
    # the complete 186-query registry (r04 green covers the other 184
    # via the r01-r04 union).
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
