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
# ROUND-10 NOTE: lead with any new/operator-changed queries (pass them
# via --changed), then regenerate via the ledger tool — expected window
# if nothing changes: the three rows the r09 leads pushed out
# (exact_dedup_docs, ngram_jaccard_topk, minhash_signatures), then the
# remaining r05 rows in registry order (minhash_lsh_candidates onward),
# then r06. ewma_user_daily's r09 operator change (NaN-poisoned tails
# emit as NULL, SQL parity; value-identical on null-free input) is IN
# the r09 window — no attestation debt carried.
_PRIORITY = (
    "csv_quarantine_roundtrip",  # NEW r09: CSV landing-zone quarantine (never attested)
    "orc_sink_roundtrip",  # NEW r09: shared sink with fmt="orc" (never attested)
    "runner_batch_roundtrip",  # changed r08 (--window-days wiring), never re-attested; also r04-stale
    "msck_repair_discovery",  # rides ensure_external_table's r08 partition-order fix; r04-stale
    "flagship_pipeline",  # rides read_parquet_dir's layout probe (r08 + r09 mixed-layout raise)
    "ewma_user_daily",  # changed r09: NaN-poisoned tails emit as NULL (SQL parity)
    "sink_partition_overwrite_roundtrip",  # rides the r08 shared-writer refactor; r06-stale
    "catalog_partition_registry",  # rides ensure_external_table's r08 partition-order fix
    "file_list_scan",  # rides read_parquet_dir's layout probe (r08 + r09)
    "asof_join_events",  # changed r09: right NULL-ts rows dropped (SQL semantics)
    "point_in_time_state_join",  # changed r09: same asof NULL-ts fix
    "sink_upsert_merge_roundtrip",  # changed r09: pruning factored into filter_touched_partitions
    "incremental_stream_roundtrip",  # changed r09: two-regime pruning + reserved __ingest_epoch guard
    "stream_upsert_cdc_roundtrip",  # changed r09: delegates to upsert_by_key (shared pruning helper)
    "stream_interval_join_roundtrip",  # changed r09: suffix-collision guard
    "mode_per_group",  # r04-stale rotation
    "lateral_join_topk",  # r04-stale rotation
    "sql_pipe_syntax_entry",  # r04-stale rotation
    "benford_first_digit",  # r04-stale rotation
    "sessionize_gap_islands",  # r04-stale rotation
    "time_weighted_average",  # r04-stale rotation
    "join_key_skew_report",  # r04-stale rotation
    "multimodal_audio_energy",  # r04-stale rotation
    "cusum_drift_detection",  # r04-stale rotation
    "quantile_normalize_by_lang",  # r04-stale rotation
    "hll_distinct_rollup",  # r04-stale rotation
    "jsonl_quarantine_roundtrip",  # r04-stale rotation
    "stream_session_window_roundtrip",  # r04-stale rotation
    "stream_tumbling_late_data_roundtrip",  # r04-stale rotation
    "select_filter_project",  # r05-stale rotation
    "distinct_rows",  # r05-stale rotation
    "fill_defaults",  # r05-stale rotation
    "sanitize_numeric",  # r05-stale rotation
    "dedup_keep_first",  # r05-stale rotation
    "moving_average",  # r05-stale rotation
    "group_total",  # r05-stale rotation
    "group_min_date",  # r05-stale rotation
    "rank_in_group",  # r05-stale rotation
    "all_null_column_drop",  # r05-stale rotation
    "tpch_q1_agg",  # r05-stale rotation
    "star_join_agg",  # r05-stale rotation
    "join_topk_revenue",  # r05-stale rotation
    "semi_join_customers",  # r05-stale rotation
    "anti_join_customers",  # r05-stale rotation
    "top_k_orders",  # r05-stale rotation
    "json_extract_agg",  # r05-stale rotation
    "text_stats",  # r05-stale rotation
    "text_quality",  # r05-stale rotation
    "language_id",  # r05-stale rotation
    "doc_fingerprint",  # r05-stale rotation
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
