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
# ROUND-12 NOTE: window regenerated stalest-first via
# ``query_provenance.py -> attestation_ledger.py --changed``. Leads:
# the 15 never-attested r12 queries (TPC-H Q1/Q6/Q8/Q9/Q11/Q12/Q13/Q15/
# Q16/Q20/Q21/Q22 — completing the 22-query TPC-H suite alongside the
# existing Q2-Q5/Q7/Q10/Q14/Q17-Q19 shapes — plus the chained
# dedup->windowed-agg multi-stateful stream, manifest-sink time
# travel, and the salted skew join), then 3 changed-since-attestation
# rows (pysink rewritten as
# a versioned commit log; footer_stats_report listing ported to the
# Hadoop FS API; SynthDocsStreamReader offset-rollback clamp — the
# last added manually: provenance tracks SynthDocsDataSource, whose
# AST does not include the stream-reader class). Then the r07 cohort
# retires, then r08 in registry order. Post-r12 oldest green should
# be >= r08 (pytest gate: test_attestation_ledger.py asserts
# oldest_green >= max_round - (ceil(N/50)+1), derived from the live
# registry size).
_PRIORITY = (
    "skew_salted_join",  # NEVER-attested: new r12 query leads window
    "tpch_q13_customer_distribution",  # NEVER-attested: new r12 query leads window
    "tpch_q21_suppliers_kept_waiting",  # NEVER-attested: new r12 query leads window
    "tpch_q22_global_sales_opportunity",  # NEVER-attested: new r12 query leads window
    "tpch_q1_pricing_summary",  # NEVER-attested: new r12 query leads window
    "tpch_q6_forecasting_revenue",  # NEVER-attested: new r12 query leads window
    "tpch_q8_national_market_share",  # NEVER-attested: new r12 query leads window
    "tpch_q9_product_type_profit",  # NEVER-attested: new r12 query leads window
    "tpch_q11_important_stock",  # NEVER-attested: new r12 query leads window
    "tpch_q12_shipping_priority_split",  # NEVER-attested: new r12 query leads window
    "tpch_q15_top_supplier",  # NEVER-attested: new r12 query leads window
    "tpch_q16_supplier_relationship",  # NEVER-attested: new r12 query leads window
    "tpch_q20_potential_part_promotion",  # NEVER-attested: new r12 query leads window
    "stream_dedup_windowed_chain_roundtrip",  # NEVER-attested: new r12 query leads window
    "manifest_sink_time_travel",  # NEVER-attested: new r12 query leads window
    "python_stream_source_roundtrip",  # r11-green; changed-since-attestation (r12 rewrite)
    "manifest_sink_roundtrip",  # r11-green; changed-since-attestation (r12 rewrite)
    "footer_skipping_report",  # r11-green; changed-since-attestation (r12 rewrite)
    "frequent_tokens_sketch",  # r7-green; stale rotation
    "variant_shred_props",  # r7-green; stale rotation
    "regex_functions",  # r7-green; stale rotation
    "window_value_family",  # r7-green; stale rotation
    "sequence_packing",  # r7-green; stale rotation
    "quality_upsample_repeat",  # r7-green; stale rotation
    "tfidf_top_terms",  # r7-green; stale rotation
    "decontaminate_ngram_overlap",  # r7-green; stale rotation
    "set_ops_all",  # r7-green; stale rotation
    "sort_nulls_family",  # r7-green; stale rotation
    "rollup_grouping_id",  # r7-green; stale rotation
    "try_arithmetic_family",  # r7-green; stale rotation
    "embedding_quantize_int8",  # r7-green; stale rotation
    "char_entropy_quality",  # r7-green; stale rotation
    "zscore_normalize",  # r7-green; stale rotation
    "generator_functions",  # r7-green; stale rotation
    "embedding_matryoshka_truncate",  # r7-green; stale rotation
    "unigram_logprob_quality",  # r7-green; stale rotation
    "segment_dedup_reconstruct",  # r7-green; stale rotation
    "sliding_window_agg",  # r7-green; stale rotation
    "incremental_rollup_maintain",  # r7-green; stale rotation
    "event_debounce",  # r7-green; stale rotation
    "funnel_view_click_purchase",  # r7-green; stale rotation
    "bpe_pair_merge_candidates",  # r7-green; stale rotation
    "span_corruption_pairs",  # r7-green; stale rotation
    "source_overlap_matrix",  # r7-green; stale rotation
    "zorder_clustered_pruned_scan",  # r7-green; stale rotation
    "stream_dedup_roundtrip",  # r7-green; stale rotation
    "stream_running_stats_roundtrip",  # r7-green; stale rotation
    "compaction_roundtrip",  # r7-green; stale rotation
    "rolling_stats",  # r8-green; stale rotation
    "simhash_docs",  # r8-green; stale rotation
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
