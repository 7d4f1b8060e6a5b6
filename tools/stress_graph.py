"""10x-scale stress smoke for the iterative graph operators.

Replicates the sf0.1 customer-supplier edge list 10x as DISJOINT copies
(vertex ids shifted per replica), so the graph's diameter and component
structure are unchanged while edge/vertex volume grows 10x. The things
being validated: (a) iteration count stays constant (rounds are a
function of structure, not size — the O(log d) / fixed-iter design
claims), (b) wall time grows ~linearly (each round is one equi-join +
one hash agg over the edge list), (c) no OOM and no lineage blowup (the
per-round localCheckpoint bounds plan size).

Usage: python tools/stress_graph.py [base_sf_dir]
Prints a markdown table; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators import graph as G

    spark = get_session("stress-graph")
    t = load_testdata(spark, base_dir, ["lineitem", "orders"])
    l, o = t["lineitem"], t["orders"]
    edges1 = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint()
    )
    n1 = edges1.count()
    reps = spark.range(10).select((F.col("id") * F.lit(10**9)).alias("shift"))
    edges10 = (
        edges1.crossJoin(F.broadcast(reps))
        .select(
            (F.col("src") + F.col("shift")).alias("src"),
            (F.col("dst") + F.col("shift")).alias("dst"),
            "w",
        )
        .localCheckpoint()
    )
    n10 = edges10.count()
    assert n10 == 10 * n1

    def run(name, fn):
        ts = {}
        for e, n in ((edges1, n1), (edges10, n10)):
            t0 = time.time()
            cnt = fn(e).count()
            ts[n] = (time.time() - t0, cnt)
        r = ts[n10][0] / ts[n1][0]
        print(
            "| %s | %.2f s (%d rows) | %.2f s (%d rows) | %.2fx |"
            % (name, ts[n1][0], ts[n1][1], ts[n10][0], ts[n10][1], r),
            flush=True,
        )

    seeds1 = edges1.select(F.col("src").alias("vertex")).distinct().limit(5)
    seeds10 = edges10.select(F.col("src").alias("vertex")).distinct().limit(50)
    print("| op | n=%d edges | n=%d edges | time ratio |" % (n1, n10))
    print("|---|---|---|---|")
    run("connected_components", lambda e: G.connected_components(e))
    run("pagerank_fixed(3)", lambda e: G.pagerank_fixed(e, weight="w", iters=3))
    run(
        "bfs_hops(3)",
        lambda e: G.bfs_hops(e, seeds1 if e is edges1 else seeds10, iters=3),
    )
    run(
        "label_propagation(2)",
        lambda e: G.label_propagation(
            e,
            (seeds1 if e is edges1 else seeds10).withColumn(
                "label", F.col("vertex") % 100
            ),
            weight="w",
            iters=2,
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
