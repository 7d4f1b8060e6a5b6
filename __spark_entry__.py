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
#     catalog_partition_registry,msck_repair_discovery,file_list_scan,\
#     flagship_pipeline,runner_batch_roundtrip,\
#     sink_partition_overwrite_roundtrip,asof_join_events,\
#     point_in_time_state_join,sink_upsert_merge_roundtrip,\
#     stream_upsert_cdc_roundtrip,incremental_stream_roundtrip,\
#     stream_interval_join_roundtrip,ewma_user_daily
# Round-9 leads, three groups:
# (0) TWO NEW registry rows (186 -> 188): csv_quarantine_roundtrip
#     (the CSV twin of the JSONL quarantine — headerless gzip CSV
#     landing zone, 3 injected malformed lines, clean rows byte-exact
#     vs the parquet source) and orc_sink_roundtrip (the shared
#     partitioned writer generalized with fmt='orc' — dynamic
#     overwrite + partition discovery + type fidelity through ORC);
# (1) the six queries whose operators changed in the round-8 LATE sweep
#     and missed the full r08 window (the verdict's top item): the
#     catalog DDL partition-order fix (ensure_external_table), the
#     parquet layout probe (read_parquet_dir), the --window-days runner
#     wiring, and the shared partitioned writer;
# (2) the six queries riding the round-9 ADVICE fixes: asof_join now
#     drops right rows with NULL timestamps (SQL semantics — NULL ts can
#     never satisfy ts <= left.ts; property test extended with NULL
#     keys/ts on both sides), the touched-partition pruning in
#     run_incremental_pipeline now shares upsert_by_key's two-regime
#     helper (literal OR-chain <= 100 partitions, broadcast semi-join
#     beyond — sinks.filter_touched_partitions), the incremental sink
#     raises on a reserved __ingest_epoch column in transform output,
#     read_parquet_dir raises on MIXED partition layouts instead of
#     silently skipping plain subdirs, and stream_stream_interval_join
#     raises on right-suffix/left-column name collisions.
# Then pure stalest-first: the remaining 14 r04 rows, then r05 rows in
# registry order. Bare ``attestation_ledger.py --check`` verifies this
# tuple (it reads max_round and the changed set from the committed
# ledger).
# ROUND-13 NOTE: window regenerated stalest-first via
# ``query_provenance.py -> attestation_ledger.py --changed``. Leads:
# the 14 never-attested r13 queries (REAL multimodal decode kernels —
# PPM image + WAV PCM audio, oracle-replayed closed forms; the four
# TPC-H alias rows making all 22 queries greppable as tpch_qN;
# parquet staging through the manifest log; checkpoint-accelerated
# log resolution; manifest-level min/max file skipping;
# stream-log compaction -> retention; OPTIMIZE
# small-file compaction through the log; ADDITIVE schema
# evolution with null projection; DESCRIBE HISTORY; the manifest
# log as a STREAMING SOURCE tailed incrementally), then 5
# changed-since-attestation rows (pysink gained cross-family guards /
# checkpoints / the _LAST_CHECKPOINT hint / vacuum grace / pinned
# read schemas, flagging the manifest queries; the chained stream
# query gained its batch fallback branch; Q21/Q8 docstring citation
# fixes). Then the r08 cohort rotates in registry order. Post-r13
# oldest green should be >= r08 still (the r08 cohort is 56 rows —
# larger than the 36 free slots — so it retires across r13+r14;
# pytest gate: test_attestation_ledger.py asserts
# oldest_green >= max_round - (ceil(N/50)+1), derived from the live
# registry size).
_PRIORITY = (
    "ppm_decode_gray_stats",  # NEVER-attested: new r13 query leads window
    "wav_pcm_decode_stats",  # NEVER-attested: new r13 query leads window
    "tpch_q3_shipping_priority",  # NEVER-attested: new r13 query leads window
    "tpch_q4_order_priority",  # NEVER-attested: new r13 query leads window
    "tpch_q17_small_quantity_revenue",  # NEVER-attested: new r13 query leads window
    "tpch_q2_min_cost_supplier",  # NEVER-attested: new r13 query leads window
    "manifest_sink_parquet_roundtrip",  # NEVER-attested: new r13 query leads window
    "manifest_checkpoint_resolve_roundtrip",  # NEVER-attested: new r13 query leads window
    "manifest_schema_evolution_roundtrip",  # NEVER-attested: new r13 query leads window
    "manifest_stats_pruned_read",  # NEVER-attested: new r13 query leads window
    "manifest_optimize_roundtrip",  # NEVER-attested: new r13 query leads window
    "manifest_history_report",  # NEVER-attested: new r13 query leads window
    "manifest_log_stream_tail_roundtrip",  # NEVER-attested: new r13 query leads window
    "stream_manifest_compaction_roundtrip",  # NEVER-attested: new r13 query leads window
    "tpch_q21_suppliers_kept_waiting",  # green; changed-since-attestation (r13 edit)
    "tpch_q8_national_market_share",  # green; changed-since-attestation (r13 edit)
    "stream_dedup_windowed_chain_roundtrip",  # green; changed-since-attestation (r13 edit)
    "manifest_sink_roundtrip",  # green; changed-since-attestation (r13 edit)
    "manifest_sink_time_travel",  # green; changed-since-attestation (r13 edit)
    "minhash_lsh_near_dup",  # r8-green; stale rotation
    "simhash_near_dup",  # r8-green; stale rotation
    "embedding_near_dup",  # r8-green; stale rotation
    "value_histogram",  # r8-green; stale rotation
    "dedup_canonical_docs",  # r8-green; stale rotation
    "leakage_safe_split",  # r8-green; stale rotation
    "incremental_cross_dedup",  # r8-green; stale rotation
    "outlier_clip_iqr",  # r8-green; stale rotation
    "mixture_rebalance_downsample",  # r8-green; stale rotation
    "pagerank_supply_graph",  # r8-green; stale rotation
    "hard_negative_mining",  # r8-green; stale rotation
    "psi_drift_report",  # r8-green; stale rotation
    "triangle_count_near_dup",  # r8-green; stale rotation
    "shingle_containment_pairs",  # r8-green; stale rotation
    "knn_label_noise",  # r8-green; stale rotation
    "robust_mad_scores",  # r8-green; stale rotation
    "co_purchase_pairs",  # r8-green; stale rotation
    "event_transition_matrix",  # r8-green; stale rotation
    "cohort_retention",  # r8-green; stale rotation
    "multimodal_resize_thumb",  # r8-green; stale rotation
    "rolling_distinct_users",  # r8-green; stale rotation
    "churn_label_next_gap",  # r8-green; stale rotation
    "seasonal_naive_error",  # r8-green; stale rotation
    "histogram2d_heatmap",  # r8-green; stale rotation
    "feature_hashing_cross",  # r8-green; stale rotation
    "recsys_negative_sampling",  # r8-green; stale rotation
    "stratified_kfold",  # r8-green; stale rotation
    "class_balance_weights",  # r8-green; stale rotation
    "winsorized_stats",  # r8-green; stale rotation
    "string_agg_family",  # r8-green; stale rotation
    "bfs_reachable_hops",  # r8-green; stale rotation
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
