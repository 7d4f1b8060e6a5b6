"""Catalog-wide physical-plan audit: source-scan budgets per query.

DataFrame plans have no CTE/subtree reuse — a frame referenced N times
re-runs its whole lineage N times. At sf0.1 that hides inside the noise
floor; at 100 TB a duplicated SHUFFLE subtree is the difference between
one pass and five. This tool builds every registry query's executed
plan (plan-time only, nothing runs) and counts ``Scan parquet``
occurrences, failing any query whose count exceeds its budget.

The default budget is SCAN_BUDGET_DEFAULT; queries that legitimately
read sources many times carry explicit entries in SCAN_ALLOWLIST with
the reason recorded next to the number. The audit rule of thumb:
re-running map-side work per reference is fine; re-running a shuffle
subtree per reference is a bug (see BENCH_NOTES "catalog-wide scan-count
audit" — corpus_curation_pipeline was 57 scans before this existed).

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
