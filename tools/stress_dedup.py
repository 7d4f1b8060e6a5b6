"""Replica-scale stress smoke for the text-dedup family.

Replicates the documents table N times as DISJOINT copies (doc_id
shifted per replica, and every word prefixed with the replica tag so
every shingle carries the replica id — cross-replica Jaccard is exactly
0). Like tools/stress_graph.py, this holds the near-dup STRUCTURE
constant (each replica contains the same true-pair set as the base
corpus) while data volume grows Nx, validating: (a) wall time grows
~linearly with corpus size when pair density is constant, (b) no OOM /
task retries, (c) replica ISOLATION — the pair ops must emit ZERO
cross-replica pairs (asserted in-engine on the id ranges, the direct
test that banding/blocking never leaks candidates across disjoint
vocabularies).

Pass --dense for the ADVERSARIAL construction instead (replica tag
appended once at the end, so all N replicas of a doc are near-dups of
each other): true pair count grows ~N^2/2 per doc and per-shingle
document frequency grows Nx (join volume ~N^2) — the hot-shingle
regime the document-frequency caps exist for. (The cross-replica-pair
assertion is skipped there: cross-replica pairs are the POINT of the
dense construction.)

``run_stress`` is importable (tests/test_stress_slow.py wraps it as a
``pytest -m slow`` gate at 10x).

Usage: python tools/stress_dedup.py [base_sf_dir] [--dense]
Prints a markdown table; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SHIFT = 10**9  # replica r occupies doc-id range [r*SHIFT, (r+1)*SHIFT)


def run_stress(
    spark, base_dir: str, reps: int = 10, dense: bool = False, emit=print
) -> list[dict]:
    """Run each dedup op on the 1x and the ``reps``x corpus; return one
    dict per op with timings and row counts. For the disjoint (default)
    construction, asserts IN-ENGINE that every emitted pair stays inside
    one replica's id range."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators import dedup as D

    docs_base = (
        load_testdata(spark, base_dir, ["documents"])["documents"]
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n1 = docs_base.count()
    rep_frame = spark.range(reps).select(F.col("id").alias("rep"))
    if dense:
        # near-dup replicas: tag appended once -> shingle sets overlap ~fully
        textN = F.concat(
            F.col("text"), F.lit(" replica-"), F.col("rep").cast("string")
        )
    else:
        # disjoint replicas via per-replica vocabulary RENAMING: prefix
        # every word with the replica tag. Token count, shingle count,
        # document-frequency distribution, and simhash statistics are all
        # IDENTICAL to the base corpus within each replica (hashes of the
        # renamed vocabulary are fresh but equidistributed), while
        # cross-replica shingle overlap is exactly 0.
        textN = F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("_$1")),
        )
    docsN = (
        docs_base.crossJoin(F.broadcast(rep_frame))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(SHIFT)).alias("doc_id"),
            textN.alias("text"),
        )
        .localCheckpoint()
    )
    nN = docsN.count()
    assert nN == reps * n1, (nN, reps, n1)
    # the 1x leg must share the Nx leg's pair STRUCTURE: use replica 0
    # of the same construction, not the raw corpus (the replica prefix
    # changes which word-3-grams exist)
    docs1 = docsN.filter(F.col("doc_id") < SHIFT).localCheckpoint()
    assert docs1.count() == n1

    results: list[dict] = []
    emit(f"docs: 1x={n1:,} {reps}x={nN:,} dense={dense}")
    emit(f"| op | 1x | {reps}x | time ratio |")
    emit("|---|---|---|---|")

    def run(name: str, fn, pair_cols: tuple[str, str] | None) -> None:
        ts = {}
        cross = None
        for tag, df in (("base", docs1), ("scaled", docsN)):
            best = None
            cnt = 0
            for _ in range(2):
                t0 = time.time()
                out = fn(df)
                if pair_cols:
                    # total AND cross-replica count in the SAME timed pass
                    # (a separate verification count would re-execute the
                    # whole uncached pipeline a third time)
                    a, b = pair_cols
                    row = out.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(
                            (
                                (F.col(a) / SHIFT).cast("long")
                                != (F.col(b) / SHIFT).cast("long")
                            ).cast("long")
                        ).alias("x"),
                    ).first()
                    cnt, run_cross = row["n"], row["x"] or 0
                    if tag == "scaled":
                        cross = run_cross
                        if not dense:
                            assert cross == 0, (name, cross)
                else:
                    cnt = out.count()
                dt = time.time() - t0
                if best is None or dt < best:
                    best = dt
            ts[tag] = (best, cnt)
        r = ts["scaled"][0] / ts["base"][0]
        results.append(
            {
                "op": name,
                "reps": reps,
                "t_base": ts["base"][0],
                "rows_base": ts["base"][1],
                "t_scaled": ts["scaled"][0],
                "rows_scaled": ts["scaled"][1],
                "ratio": r,
                "cross_replica_pairs": cross,
            }
        )
        emit(
            f"| {name} | {ts['base'][0]:.2f} s ({ts['base'][1]:,} rows) "
            f"| {ts['scaled'][0]:.2f} s ({ts['scaled'][1]:,} rows) | {r:.2f}x |"
        )

    run("exact_dedup", lambda d: D.exact_dedup(d, column="text"), None)
    run(
        "minhash_lsh_pairs",
        lambda d: D.minhash_near_dup_pairs(d, column="text", threshold=0.5),
        ("id_a", "id_b"),
    )
    run(
        "simhash_pairs",
        lambda d: D.simhash_near_dup_pairs(d, column="text", max_hamming=3),
        ("id_a", "id_b"),
    )
    run(
        "ngram_jaccard_pairs",
        lambda d: D.ngram_jaccard_pairs(
            d, column="text", min_jaccard=0.5, max_shingle_freq=1000
        ),
        ("id_a", "id_b"),
    )
    run(
        "containment_pairs",
        lambda d: D.shingle_containment_pairs(d, column="text", min_containment=0.7),
        ("id_a", "id_b"),
    )

    # Overlapping-span dedup: per-replica vocab renaming preserves the
    # base corpus's duplicate-window structure exactly, so on the
    # DISJOINT construction both the row count AND the total surviving
    # token mass must scale EXACTLY reps-x — any deviation means a window
    # matched across replicas (vocabulary leak) or position bookkeeping
    # drifted with data volume. (Skipped for --dense: appending the
    # replica tag changes window alignment per replica.)
    if not dense:
        ts = {}
        for tag, df in (("base", docs1), ("scaled", docsN)):
            best = None
            agg = None
            for _ in range(2):
                t0 = time.time()
                agg = (
                    D.remove_duplicated_spans(df, k=8, stride=4)
                    .agg(
                        F.count(F.lit(1)).alias("n_rows"),
                        F.sum("n_kept").alias("kept_mass"),
                    )
                    .first()
                )
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            ts[tag] = (best, agg["n_rows"], agg["kept_mass"])
        assert ts["scaled"][1] == reps * ts["base"][1], ts
        assert ts["scaled"][2] == reps * ts["base"][2], ts
        r = ts["scaled"][0] / ts["base"][0]
        results.append(
            {
                "op": "overlap_span_dedup",
                "reps": reps,
                "t_base": ts["base"][0],
                "rows_base": ts["base"][1],
                "t_scaled": ts["scaled"][0],
                "rows_scaled": ts["scaled"][1],
                "ratio": r,
                "cross_replica_pairs": None,
            }
        )
        emit(
            f"| overlap_span_dedup | {ts['base'][0]:.2f} s ({ts['base'][1]:,} rows) "
            f"| {ts['scaled'][0]:.2f} s ({ts['scaled'][1]:,} rows) | {r:.2f}x | "
            f"kept mass exact {reps}x |"
        )
    return results


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--dense"]
    dense = "--dense" in sys.argv[1:]
    base_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 10
    # replica-scale runs hold multiple 10^8-row checkpoints; default the
    # single-JVM heap to a size that fits them (still overridable via env)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    spark = get_session("stress-dedup")
    run_stress(spark, base_dir, reps=reps, dense=dense)
    spark.stop()


if __name__ == "__main__":
    main()
