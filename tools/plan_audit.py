"""Catalog-wide physical-plan audit: source-scan budgets per query.

DataFrame plans have no CTE/subtree reuse — a frame referenced N times
re-runs its whole lineage N times. At sf0.1 that hides inside the noise
floor; at 100 TB a duplicated SHUFFLE subtree is the difference between
one pass and five. This tool builds every registry query's executed
plan and counts ``Scan parquet`` occurrences, failing any query whose
count exceeds its budget. NOTE: "builds the plan" is not free for every
query — round-trip queries execute real work inside their builder
(scratch-dir writes, quarantine collects, eager localCheckpoints), so
the audit costs roughly one light pass over the registry, which is why
it is a slow-gated test rather than a default one.

The default budget is SCAN_BUDGET_DEFAULT; queries that legitimately
read sources many times carry explicit entries in SCAN_ALLOWLIST with
the reason recorded next to the number. The audit rule of thumb:
re-running map-side work per reference is fine; re-running a shuffle
subtree per reference is a bug (see BENCH_NOTES "catalog-wide scan-count
audit" — corpus_curation_pipeline was 57 scans before this existed).

KNOWN BLIND SPOT: queries that materialize driver-side and return
``spark.createDataFrame(rows, ...)`` (the CSV/JSONL/XML quarantine
round trips — they must collect to release their cached scan) audit as
a LocalRelation with zero parquet scans, so their internal scan
discipline is NOT covered here; it is pinned by their operators'
docstrings and the quarantine unit tests instead. They are listed in
LOCAL_RELATION_QUERIES so the audit can assert the blind spot stays
exactly this size — a new zero-scan query outside that list fails the
audit as suspicious rather than passing silently.

``run_audit`` is importable (tests/test_plans.py wraps it as a slow
gate). Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN_BUDGET_DEFAULT = 6

# query -> (budget, reason) for deliberate multi-scan designs
SCAN_ALLOWLIST: dict[str, tuple[int, str]] = {
    "corpus_curation_pipeline": (8, "4-stage composition; boundaries checkpointed"),
    "incremental_cross_dedup": (12, "two corpora x LSH stages; r08 stress-adjudicated"),
    "minhash_recall_eval": (9, "eval query comparing two methods, multi-read by design"),
    "lsh_recall_eval": (8, "eval query comparing two methods"),
    "shingle_containment_pairs": (9, "inverted-index self-join, df-capped"),
    "funnel_time_to_convert": (9, "one pushed-filter scan per funnel stage"),
    "funnel_view_click_purchase": (8, "one pushed-filter scan per funnel stage"),
    "data_quality_report": (7, "fact agg + per-dimension anti-join probes"),
    "pmi_collocations": (7, "tokenize x (top-vocab, doc-count); pair frame checkpointed"),
    "set_ops": (7, "six set-operation operands"),
    "set_ops_all": (7, "set-operation operands"),
    "association_rules_lift": (7, "item/pair/total supports off one basket frame"),
    "tpch_q8_national_market_share": (
        8,
        "8-way join: 7 sources + nation in two roles; each scanned once",
    ),
}

# Queries whose builder collects and returns a local frame (plan =
# LocalRelation, 0 parquet scans by construction). Kept explicit so a
# NEW zero-scan query is flagged as suspicious instead of silently
# passing the budget with a vacuous plan.
LOCAL_RELATION_QUERIES = {
    "csv_quarantine_roundtrip",
    "jsonl_quarantine_roundtrip",
    "xml_quarantine_roundtrip",
    # SQL scripting executes the whole BEGIN..END eagerly inside
    # spark.sql() (each statement runs as it is reached — the scans DID
    # happen, driven by the script engine); the returned frame is the
    # last SELECT's materialized result, so the audit sees no scan.
    "sql_scripting_entry",
}

# Queries whose returned frame is a distributed METADATA pass: a
# driver-listed path frame (LocalTableScan of file names — metadata-class,
# same bound as the catalog ops) fanned out through MapInPandas that reads
# footers, never data pages. Zero data-source scans is their CONTRACT, not
# an audit dodge; kept explicit with the same no-silent-growth rule.
METADATA_PASS_QUERIES = {
    "footer_skipping_report",  # parquet.py:footer_stats_report
}


def run_audit(spark, sf_dir: str, emit=print) -> list[tuple[str, int, int]]:
    """Build every query's executed plan; return [(name, scans, budget)]
    for queries OVER budget (empty list = clean). Queries that cannot
    build (environment-gated) are skipped, not failed."""
    import fiap_machine_learning_tech_challenge_2_etl_spark.queries_catalog as qc

    over: list[tuple[str, int, int]] = []
    for name, fn in qc.SPARK_QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — env-gated queries skip
            emit(f"plan_audit: SKIP {name}: {type(exc).__name__}")
            continue
        scans = plan.count("Scan parquet")
        # legitimate zero-parquet plans: iterative ops rooted at their
        # localCheckpoint blocks (Scan ExistingRDD), non-parquet readbacks
        # (Scan orc/csv/json/xml/text), and the known collect-and-return
        # set. Anything else with zero scans is the audit being dodged —
        # flag it rather than passing a vacuous budget check.
        has_other_source = (
            any(
                f"Scan {fmt}" in plan
                for fmt in ("ExistingRDD", "orc", "csv", "json", "xml", "text", "binaryFile")
            )
            or "StateScan" in plan  # statestore reader (state_reader.py)
            # recursive CTE: the engine-managed iteration renders as a
            # UnionLoop whose per-level source (the localCheckpoint-ed
            # edge frame) lives inside the loop body, not as a top-level
            # Scan node (recursive_cte_reachability)
            or "UnionLoop" in plan
        )
        if name in METADATA_PASS_QUERIES:
            # contract: MapInPandas over a path list AND zero data-source
            # scans — a fallback table scan creeping in next to the footer
            # pass must fail here, not ride the carve-out
            if "MapInPandas" not in plan or scans > 0:
                over.append((name, scans, -1))
                emit(f"plan_audit: SUSPICIOUS {name}: metadata-pass contract "
                     f"broken (MapInPandas={'MapInPandas' in plan}, "
                     f"data scans={scans})")
            continue
        if scans == 0 and not has_other_source and (
            name not in LOCAL_RELATION_QUERIES
        ):
            over.append((name, scans, -1))
            emit(f"plan_audit: SUSPICIOUS {name}: no data-source scan in "
                 "plan and not in LOCAL_RELATION_QUERIES")
            continue
        budget = SCAN_ALLOWLIST.get(name, (SCAN_BUDGET_DEFAULT, ""))[0]
        if scans > budget:
            over.append((name, scans, budget))
            emit(f"plan_audit: OVER {name}: {scans} scans > budget {budget}")
    return over


def main() -> None:
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    over = run_audit(spark, sf_dir)
    print(f"plan_audit: {'CLEAN' if not over else f'{len(over)} queries over budget'}")
    spark.stop()
    if over:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
