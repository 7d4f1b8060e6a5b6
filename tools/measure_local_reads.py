"""One-off instrumented scan measurement for LOCAL_RELATION_QUERIES.

tools/plan_audit.py's scan-count audit reads the EXECUTED PLAN of each
registry query; the three CSV/JSONL/XML quarantine round trips collect()
their tiny rollup and return ``spark.createDataFrame(rows, ...)``, so
their plan is a LocalRelation with zero parquet scans — a documented
blind spot (the audit pins its exact size via LOCAL_RELATION_QUERIES,
but their internal scan discipline was only docstring-pinned).

This tool closes the gap by MEASURING: it runs each blind-spot query
builder under a UI-enabled session and diffs Spark's own task input
metrics (completed-stage ``inputRecords``/``inputBytes`` from the status
REST API — the same accounting the Spark UI shows) before and after the
builder. Records read from files are counted once per actual task read;
cache hits and shuffle traffic are NOT input, so the number is exactly
"how many source records did this builder pull off disk".

A calibration row (plain pushed-filter parquet aggregate over the same
orders table) anchors the scale. Results are recorded in BENCH_NOTES.md.

Usage: python tools/measure_local_reads.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4053


def stage_totals(app_id: str) -> tuple[int, int]:
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    data = json.load(urllib.request.urlopen(url))
    return (
        sum(s.get("inputRecords", 0) for s in data),
        sum(s.get("inputBytes", 0) for s in data),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from fiap_machine_learning_tech_challenge_2_etl_spark.queries_catalog import SPARK_QUERIES
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session
    from tools.plan_audit import LOCAL_RELATION_QUERIES

    spark = get_session(
        "measure-local-reads",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    app_id = spark.sparkContext.applicationId

    def measure(label, fn):
        # settle async stage bookkeeping, then snapshot
        time.sleep(1.0)
        r0, b0 = stage_totals(app_id)
        out = fn()
        if out is not None:
            out.collect()
        time.sleep(1.0)
        r1, b1 = stage_totals(app_id)
        print(f"{label}: inputRecords={r1 - r0:,} inputBytes={b1 - b0:,}")
        return r1 - r0, b1 - b0

    results = {}
    # calibration: one pushed-filter scan of the same source table the
    # quarantine queries slice (orders), so the rows below have a scale
    results["calibration_orders_scan"] = measure(
        "calibration_orders_scan",
        lambda: spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_orderkey") % 7 == 1)
        .groupBy("o_orderstatus")
        .count(),
    )
    for name in sorted(LOCAL_RELATION_QUERIES):
        fn = SPARK_QUERIES[name]
        results[name] = measure(name, lambda fn=fn: fn(spark, sf_dir))
    print(json.dumps({k: {"inputRecords": v[0], "inputBytes": v[1]}
                      for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
