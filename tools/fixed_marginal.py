"""Fixed vs marginal cost decomposition for the slowest bench rows
(VERDICT r08 stretch item 8).

Per-query bench numbers at sf0.1 bundle per-invocation FIXED costs
(streaming checkpoint setup + availableNow lifecycle, graph edge-frame
materialization, UDF/plane broadcast) with data-proportional MARGINAL
cost. Running the same query at sf0.001 / sf0.01 / sf0.1 (min of
``--runs``) separates them: the sf0.001 wall is ~pure fixed cost (data
is negligible), and (sf0.1 - sf0.001) is the marginal cost of 100x the
rows. A future "query X regressed" adjudication can then say whether
the fixed or the marginal leg moved.

Usage: python tools/fixed_marginal.py [q1,q2,...] [--runs 2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = (
    "dedup_canonical_docs,leakage_safe_split,pagerank_supply_graph,"
    "stream_interval_join_roundtrip,materialized_rollup_roundtrip"
)
SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    names = (sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
             else DEFAULT).split(",")
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2

    from pyspark.sql import SparkSession

    import __spark_entry__ as ent

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    # one warm-up job so JVM/codegen startup doesn't land in the first cell
    qs[names[0]](spark, SFS[0]).write.format("noop").mode("overwrite").save()

    print("| query | sf0.001 (fixed) | sf0.01 | sf0.1 | marginal (0.1-0.001) | fixed share of sf0.1 |")
    print("|---|---|---|---|---|---|")
    for name in names:
        walls = []
        for sf in SFS:
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            walls.append(best)
        fixed, mid, full = walls
        print(
            f"| {name} | {fixed:.2f} | {mid:.2f} | {full:.2f} "
            f"| {full - fixed:.2f} | {100 * fixed / full:.0f}% |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
