"""10x-scale stress smoke for the text-dedup family.

Replicates the sf0.1 documents table 10x as DISJOINT copies (doc_id
shifted per replica, and a replica token interleaved between every word
so every 3-gram shingle carries the replica id — cross-replica Jaccard
is exactly 0). Like tools/stress_graph.py, this holds the near-dup
STRUCTURE constant (each replica contains the same true-pair set as the
base corpus) while data volume grows 10x, validating: (a) wall time
grows ~linearly with corpus size when pair density is constant, (b) no
OOM / task retries, (c) the inverted-index join volume scales with
sum(df^2) per replica, not globally.

Pass --dense for the ADVERSARIAL construction instead (replica tag
appended once at the end, so all 10 replicas of a doc are near-dups of
each other): true pair count grows ~45x per doc and per-shingle document
frequency grows 10x (join volume ~100x) — the hot-shingle regime the
document-frequency caps exist for.

Usage: python tools/stress_dedup.py [base_sf_dir] [--dense]
Prints a markdown table; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--dense"]
    dense = "--dense" in sys.argv[1:]
    base_dir = args[0] if args else "/root/testdata/sf0.1"
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators import dedup as D

    spark = get_session("stress-dedup")
    docs1 = (
        load_testdata(spark, base_dir, ["documents"])["documents"]
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n1 = docs1.count()
    reps = spark.range(10).select(F.col("id").alias("rep"))
    if dense:
        # near-dup replicas: tag appended once -> shingle sets overlap ~fully
        text10 = F.concat(
            F.col("text"), F.lit(" replica-"), F.col("rep").cast("string")
        )
    else:
        # disjoint replicas via per-replica vocabulary RENAMING: prefix
        # every word with the replica tag. Token count, shingle count,
        # document-frequency distribution, and simhash statistics are all
        # IDENTICAL to the base corpus within each replica (hashes of the
        # renamed vocabulary are fresh but equidistributed), while
        # cross-replica shingle overlap is exactly 0.
        text10 = F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("_$1")),
        )
    docs10 = (
        docs1.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10**9)).alias("doc_id"),
            text10.alias("text"),
        )
        .localCheckpoint()
    )
    n10 = docs10.count()
    assert n10 == 10 * n1
    # the 1x leg must share the 10x leg's pair STRUCTURE: use replica 0
    # of the same construction, not the raw corpus (the interleaved
    # replica token changes which word-3-grams exist)
    docs1 = docs10.filter(F.col("doc_id") < 10**9).localCheckpoint()
    assert docs1.count() == n1

    def run(name: str, fn) -> None:
        ts = {}
        for tag, df in (("1x", docs1), ("10x", docs10)):
            best = None
            for _ in range(2):
                t0 = time.time()
                out = fn(df)
                cnt = out.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            ts[tag] = (best, cnt)
        r = ts["10x"][0] / ts["1x"][0]
        print(
            f"| {name} | {ts['1x'][0]:.2f} s ({ts['1x'][1]:,} rows) "
            f"| {ts['10x'][0]:.2f} s ({ts['10x'][1]:,} rows) | {r:.2f}x |"
        )

    print(f"docs: 1x={n1:,} 10x={n10:,}")
    print("| op | 1x | 10x | time ratio |")
    print("|---|---|---|---|")
    run("exact_dedup", lambda d: D.exact_dedup(d, column="text"))
    run(
        "minhash_lsh_pairs",
        lambda d: D.minhash_near_dup_pairs(d, column="text", threshold=0.5),
    )
    run(
        "simhash_pairs",
        lambda d: D.simhash_near_dup_pairs(d, column="text", max_hamming=3),
    )
    run(
        "ngram_jaccard_pairs",
        lambda d: D.ngram_jaccard_pairs(d, column="text", min_jaccard=0.5, max_shingle_freq=1000),
    )
    run(
        "containment_pairs",
        lambda d: D.shingle_containment_pairs(d, column="text", min_containment=0.7),
    )
    spark.stop()


if __name__ == "__main__":
    main()
