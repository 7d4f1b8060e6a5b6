"""Replica-scale stress smoke for the iterative graph operators.

Replicates the sf0.1 customer-supplier edge list N times as DISJOINT
copies (vertex ids shifted per replica), so the graph's diameter and
component structure are unchanged while edge/vertex volume grows Nx.
The things being validated: (a) iteration count stays constant (rounds
are a function of structure, not size — the O(log d) / fixed-iter
design claims; connected_components reports its observed round count
via the ``stats`` out-param and the two legs must match), (b) wall
time grows ~linearly (each round is one equi-join + one hash agg over
the edge list), (c) no OOM and no lineage blowup (the per-round
localCheckpoint bounds plan size), (d) replica isolation: seeds are
replica-ALIGNED (the same base seeds shifted into every replica), so
every per-vertex result row count must scale by EXACTLY the replica
factor — any cross-replica label/frontier leakage breaks the equality.

``run_stress`` is importable (tests/test_stress_slow.py wraps it as a
``pytest -m slow`` gate at 10x); the CLI takes an optional replica
count for the 100x evidence runs recorded in BENCH_NOTES.md.

Usage: python tools/stress_graph.py [--ops cc,pagerank,bfs,sssp,label_prop] [base_sf_dir] [reps]
Prints a markdown table; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SHIFT = 10**9  # replica r occupies vertex-id range [r*SHIFT, (r+1)*SHIFT)

KNOWN_OPS = frozenset({"cc", "pagerank", "bfs", "sssp", "label_prop"})


def run_stress(
    spark, base_dir: str, reps: int = 10, emit=print, ops: set[str] | None = None
) -> list[dict]:
    """Run each graph op on the 1x and the ``reps``x edge list; return one
    dict per op with timings, row counts and the scale invariants already
    ASSERTED (row count x reps; CC round count equal on both legs).

    ``ops`` optionally restricts which ops run (names: cc, pagerank,
    bfs, sssp, label_prop) — the 200x envelope runs target single ops because
    the full sequence at that scale holds edge-sized checkpoints the
    48 GiB heap cannot fit all of (pagerank needs 80g there)."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators import graph as G

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
    shifts = spark.range(reps).select((F.col("id") * F.lit(SHIFT)).alias("shift"))
    edgesN = (
        edges1.crossJoin(F.broadcast(shifts))
        .select(
            (F.col("src") + F.col("shift")).alias("src"),
            (F.col("dst") + F.col("shift")).alias("dst"),
            "w",
        )
        .localCheckpoint()
    )
    nN = edgesN.count()
    assert nN == reps * n1, (nN, reps, n1)

    # replica-ALIGNED seeds: the same 5 base vertices shifted into every
    # replica, so per-seed frontiers are congruent across replicas and the
    # scaled result row count must be exactly reps x the base row count.
    seeds1 = (
        edges1.select(F.col("src").alias("vertex"))
        .distinct()
        .orderBy("vertex")
        .limit(5)
        .localCheckpoint()
    )
    seedsN = (
        seeds1.crossJoin(F.broadcast(shifts))
        .select((F.col("vertex") + F.col("shift")).alias("vertex"))
        .localCheckpoint()
    )

    results: list[dict] = []
    emit(f"| op | n={n1} edges | n={nN} edges ({reps}x) | time ratio |")
    emit("|---|---|---|---|")

    def run(name, fn, exact_scale=True, extra=None):
        ts = {}
        for tag, e, n in (("base", edges1, n1), ("scaled", edgesN, nN)):
            t0 = time.time()
            cnt = fn(e, tag).count()
            ts[tag] = (time.time() - t0, cnt)
        r = ts["scaled"][0] / ts["base"][0]
        row = {
            "op": name,
            "reps": reps,
            "t_base": ts["base"][0],
            "rows_base": ts["base"][1],
            "t_scaled": ts["scaled"][0],
            "rows_scaled": ts["scaled"][1],
            "ratio": r,
        }
        if extra:
            row.update(extra)
        if exact_scale:
            # disjoint congruent replicas: any deviation = replica leakage
            assert ts["scaled"][1] == reps * ts["base"][1], row
        results.append(row)
        emit(
            "| %s | %.2f s (%d rows) | %.2f s (%d rows) | %.2fx |"
            % (name, ts["base"][0], ts["base"][1], ts["scaled"][0], ts["scaled"][1], r)
        )

    def wants(name):
        return ops is None or name in ops

    if wants("cc"):
        cc_stats = {"base": {}, "scaled": {}}
        run(
            "connected_components",
            lambda e, tag: G.connected_components(e, stats=cc_stats[tag]),
            extra={"rounds": cc_stats},
        )
        # structure-invariant round count: the replicas are disjoint
        # congruent copies, so pointer-jumping must converge in the SAME
        # number of rounds
        assert cc_stats["base"].get("rounds") == cc_stats["scaled"].get("rounds"), cc_stats
        emit(
            "| ^ cc rounds | %d | %d | equal (structure-invariant) |"
            % (cc_stats["base"]["rounds"], cc_stats["scaled"]["rounds"])
        )
    if wants("pagerank"):
        run("pagerank_fixed(3)", lambda e, tag: G.pagerank_fixed(e, weight="w", iters=3))
    if wants("bfs"):
        run(
            "bfs_hops(3)",
            lambda e, tag: G.bfs_hops(e, seeds1 if tag == "base" else seedsN, iters=3),
        )
    if wants("sssp"):
        run(
            "shortest_paths_weighted(3)",
            lambda e, tag: G.shortest_paths_weighted(
                e, seeds1 if tag == "base" else seedsN, iters=3
            ),
        )
    if wants("label_prop"):
        run(
            "label_propagation(2)",
            lambda e, tag: G.label_propagation(
                e,
                (seeds1 if tag == "base" else seedsN).withColumn(
                    # label is replica-invariant (mod SHIFT strips the shift)
                    "label",
                    (F.col("vertex") % SHIFT) % 100,
                ),
                weight="w",
                iters=2,
            ),
        )
    return results


def main() -> None:
    argv = list(sys.argv[1:])
    ops = None
    if "--ops" in argv:
        i = argv.index("--ops")
        ops = set(argv[i + 1].split(","))
        del argv[i : i + 2]
        # a typo (--ops ssp) would otherwise silently run ZERO ops and
        # print an empty table — an evidence run that no-ops without error
        unknown = ops - KNOWN_OPS
        if unknown:
            raise SystemExit(
                f"unknown --ops {sorted(unknown)}; known: {sorted(KNOWN_OPS)}"
            )
    base_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    reps = int(argv[1]) if len(argv) > 1 else 10
    # replica-scale runs hold multiple 10^8-row checkpoints; default the
    # single-JVM heap to a size that fits them (still overridable via env)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    spark = get_session("stress-graph")
    run_stress(spark, base_dir, reps=reps, ops=ops)
    spark.stop()


if __name__ == "__main__":
    main()
