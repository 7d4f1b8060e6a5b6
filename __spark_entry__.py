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
# ROUND-11 NOTE: window regenerated stalest-first via
# ``query_provenance.py -> attestation_ledger.py --changed``. Leads:
# the fourteen never-attested r11 queries (recursive-CTE
# reachability, TPC-H Q5/Q7/Q10/Q14/Q18/
# Q19, the SQL-scripting entry, the footer-skipping report, the LEFT-OUTER
# watermarked stream-stream interval join, the state-store-reader
# roundtrip, the binaryFile ingest roundtrip, the Python streaming
# DataSource roundtrip, the manifest-committed Python sink roundtrip),
# then the 8
# changed-since-attestation rows (asof_join grew call-site interval/
# degenerate-call validation; temperature_mix/weighted samplers now
# reject pre-existing rate/score columns; temporal_split_embargo
# validates the embargo body; stream_stream_interval_join grew
# ``how=`` outer modes) — all behavior-preserving on valid input, but
# the operators' AST hashes moved so they re-attest. Then the whole
# r06 cohort retires, then r07 in registry order. Post-r11 oldest
# green should be >= r07 (pytest gate: test_attestation_ledger.py
# asserts oldest_green >= max_round - (ceil(N/50)+1), derived from the
# live registry size).
_PRIORITY = (
    "tpch_q5_local_supplier_volume",  # NEVER-attested: new r11 query leads window
    "tpch_q10_returned_items",  # NEVER-attested: new r11 query leads window
    "tpch_q14_promo_effect",  # NEVER-attested: new r11 query leads window
    "sql_scripting_entry",  # NEVER-attested: new r11 query leads window
    "recursive_cte_reachability",  # NEVER-attested: new r11 query leads window
    "tpch_q19_disjunctive_predicate",  # NEVER-attested: new r11 query leads window
    "tpch_q7_volume_shipping",  # NEVER-attested: new r11 query leads window
    "tpch_q18_large_volume_customer",  # NEVER-attested: new r11 query leads window
    "stream_interval_join_outer_roundtrip",  # NEVER-attested: new r11 query leads window
    "state_store_inspect_roundtrip",  # NEVER-attested: new r11 query leads window
    "binary_file_ingest_roundtrip",  # NEVER-attested: new r11 query leads window
    "python_stream_source_roundtrip",  # NEVER-attested: new r11 query leads window
    "manifest_sink_roundtrip",  # NEVER-attested: new r11 query leads window
    "footer_skipping_report",  # NEVER-attested: new r11 query leads window
    "weighted_sample_docs",  # r7-green; changed-since-attestation (query_provenance)
    "temporal_split_embargo",  # r7-green; changed-since-attestation (query_provenance)
    "stream_interval_join_roundtrip",  # r9-green; changed-since-attestation (query_provenance)
    "asof_join_events",  # r10-green; changed-since-attestation (query_provenance)
    "asof_join_tolerance",  # r10-green; changed-since-attestation (query_provenance)
    "temperature_mix_corpus",  # r10-green; changed-since-attestation (query_provenance)
    "weighted_sample_per_lang",  # r10-green; changed-since-attestation (query_provenance)
    "point_in_time_state_join",  # r10-green; changed-since-attestation (query_provenance)
    "sql_entry_tpch_q3",  # r6-green; stale rotation
    "label_centroids",  # r6-green; stale rotation
    "word_count_topk",  # r6-green; stale rotation
    "stats_agg_family",  # r6-green; stale rotation
    "regr_agg_family",  # r6-green; stale rotation
    "conditional_agg_family",  # r6-green; stale rotation
    "percentile_agg_family",  # r6-green; stale rotation
    "range_frame_window",  # r6-green; stale rotation
    "gapfill_forward_fill",  # r6-green; stale rotation
    "exists_subquery_agg",  # r6-green; stale rotation
    "scalar_subquery_agg",  # r6-green; stale rotation
    "hash_split_corpus",  # r6-green; stale rotation
    "stratified_sample_docs",  # r6-green; stale rotation
    "gapfill_interpolate",  # r6-green; stale rotation
    "profile_documents",  # r6-green; stale rotation
    "chunk_documents",  # r6-green; stale rotation
    "min_cost_supplier",  # r6-green; stale rotation
    "map_functions",  # r6-green; stale rotation
    "null_semantics_family",  # r6-green; stale rotation
    "fuzzy_match_levenshtein",  # r6-green; stale rotation
    "bitwise_functions",  # r6-green; stale rotation
    "event_sequence_assembly",  # r6-green; stale rotation
    "pii_redaction",  # r6-green; stale rotation
    "repetition_ngram_stats",  # r6-green; stale rotation
    "bucketed_join_colocated",  # r6-green; stale rotation
    "range_clustered_pruned_scan",  # r6-green; stale rotation
    "embedding_ann_ivf",  # r7-green; stale rotation
    "array_functions",  # r7-green; stale rotation
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
