"""Committed recall/cost curve for the auto band count (VERDICT r08 item 5).

Sweeps the banded-LSH band count for ``embedding_near_dup_pairs`` at a
fixed corpus and threshold, measuring per point: candidate pairs (the
linear-in-bands cost driver), verified pairs, recall vs the exact
brute-force pair set, and wall time. The AUTO row is what the operator
picks by default (``lsh_bands_for_recall(threshold, lsh_band_width(n))``).

Usage: python tools/band_curve.py [sf_dir] [threshold]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
        lsh_band_width,
        lsh_bands_for_recall,
    )
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_testdata(spark, sf_dir, ["embeddings"])["embeddings"].cache()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    width = lsh_band_width(n)
    auto_bands = lsh_bands_for_recall(threshold, width)

    # exact ground truth: brute-force all-pairs at threshold (grid join)
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.similarity import (
        exact_near_dup_pairs,
    )

    truth = {
        (r["id_a"], r["id_b"])
        for r in exact_near_dup_pairs(emb, threshold=threshold).collect()
    }
    print(f"corpus n={n} dim={dim} width={width} auto_bands={auto_bands} "
          f"threshold={threshold} exact_pairs={len(truth)}")
    print(f"| bands | n_planes | candidate pairs | verified pairs | recall | wall (s) |")
    print(f"|---|---|---|---|---|---|")
    for bands in (4, 8, 16, 32, auto_bands):
        tag = " (AUTO)" if bands == auto_bands else ""
        t0 = time.time()
        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                emb, threshold=threshold, bands=bands, n_rows=n, dim=dim
            ).collect()
        }
        wall = time.time() - t0
        # candidate count: re-run the candidate stage only (cheap, cached input)
        from fiap_machine_learning_tech_challenge_2_etl_spark.operators.similarity import (
            add_lsh_band_values,
        )

        sigged = add_lsh_band_values(emb, dim, bands * width, bands)
        chunks = sigged.select(
            F.col("vec_id"), F.posexplode("lsh_bands").alias("band_id", "band_val")
        )
        a, b = chunks.alias("a"), chunks.alias("b")
        n_cand = (
            a.join(
                b,
                on=[
                    F.col("a.band_id") == F.col("b.band_id"),
                    F.col("a.band_val") == F.col("b.band_val"),
                    F.col("a.vec_id") < F.col("b.vec_id"),
                ],
            )
            .select("a.vec_id", "b.vec_id")
            .distinct()
            .count()
        )
        recall = len(got & truth) / len(truth) if truth else 1.0
        print(
            f"| {bands}{tag} | {bands * width} | {n_cand} | {len(got)} "
            f"| {recall:.3f} | {wall:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
