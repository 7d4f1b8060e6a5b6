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
    "variant_props_agg",  # NEVER-attested: new r10 query leads window
    "asof_join_tolerance",  # NEVER-attested: new r10 query leads window
    "url_functions",  # NEVER-attested: new r10 query leads window
    "temperature_mix_corpus",  # NEVER-attested: new r10 query leads window
    "weighted_sample_per_lang",  # NEVER-attested: new r10 query leads window
    "psi_drift_orders",  # NEVER-attested: new r10 query leads window
    "overlap_span_dedup",  # NEVER-attested: new r10 query leads window
    "xml_quarantine_roundtrip",  # NEVER-attested: new r10 query leads window
    "skew_salted_agg",  # r05-green; changed-since-attestation (query_provenance)
    "corpus_clean_pipeline",  # r05-green; changed-since-attestation (query_provenance)
    "range_join_shipments",  # r05-green; changed-since-attestation (query_provenance)
    "theta_sketch_overlap",  # r05-green; changed-since-attestation (query_provenance)
    "dedup_cluster_cc",  # r06-green; changed-since-attestation (query_provenance)
    "embedding_ann_lsh",  # r07-green; changed-since-attestation (query_provenance)
    "interval_coalesce",  # r07-green; changed-since-attestation (query_provenance)
    "scd2_user_history",  # r07-green; changed-since-attestation (query_provenance)
    "data_quality_report",  # r07-green; changed-since-attestation (query_provenance)
    "cdc_apply_events",  # r07-green; changed-since-attestation (query_provenance)
    "pmi_collocations",  # r07-green; changed-since-attestation (query_provenance)
    "stream_static_enrich_roundtrip",  # r07-green; changed-since-attestation (query_provenance)
    "snapshot_diff_orders",  # r08-green; changed-since-attestation (query_provenance)
    "equidepth_binning",  # r08-green; changed-since-attestation (query_provenance)
    "token_budget_select",  # r08-green; changed-since-attestation (query_provenance)
    "corpus_curation_pipeline",  # r08-green; changed-since-attestation (query_provenance)
    "asof_join_events",  # r09-green; changed-since-attestation (query_provenance)
    "point_in_time_state_join",  # r09-green; changed-since-attestation (query_provenance)
    "jsonl_quarantine_roundtrip",  # r09-green; changed-since-attestation (query_provenance)
    "csv_quarantine_roundtrip",  # r09-green; changed-since-attestation (query_provenance)
    "exact_dedup_docs",  # r05-green; stale rotation
    "ngram_jaccard_topk",  # r05-green; stale rotation
    "minhash_signatures",  # r05-green; stale rotation
    "embedding_cosine_topk",  # r05-green; stale rotation
    "embedding_topk_pairs",  # r05-green; stale rotation
    "multimodal_features",  # r05-green; stale rotation
    "multimodal_frame_sample",  # r05-green; stale rotation
    "winnowing_fingerprints",  # r05-green; stale rotation
    "embedding_near_dup_exact",  # r05-green; stale rotation
    "tumbling_window_agg",  # r05-green; stale rotation
    "session_window_agg",  # r05-green; stale rotation
    "seasonal_decompose_daily",  # r05-green; stale rotation
    "attribution_first_last_touch",  # r05-green; stale rotation
    "set_ops",  # r06-green; stale rotation
    "rollup_agg",  # r06-green; stale rotation
    "cube_agg",  # r06-green; stale rotation
    "grouping_sets_agg",  # r06-green; stale rotation
    "pivot_event_counts",  # r06-green; stale rotation
    "unpivot_stats",  # r06-green; stale rotation
    "window_ranking_family",  # r06-green; stale rotation
    "string_functions",  # r06-green; stale rotation
    "date_functions",  # r06-green; stale rotation
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
