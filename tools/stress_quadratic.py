"""Replica-scale stress smoke for the O(n^2) exact embedding kernels.

There is no driver-generated sf1 fixture, so this script synthesizes
one: base embeddings replicated N times with distinct vec_ids and a
deterministic per-replica perturbation (so duplicates don't collapse
the top-k structure). It then runs each exact kernel at BOTH scales and
reports wall time and the observed scaling exponent — the kernels are
inherently O(n^2 d), so the expected exponent is ~2; the things being
validated are (a) no OOM with the default ``n_blocks`` guidance scaled
as sqrt(n-ratio) (per-task memory is corpus/n_blocks * 2 rows —
keeping n_blocks proportional to sqrt(n) holds per-cell work and
memory constant-ish), and (b) no driver collect / cartesian anywhere
(the plan gates in tests/test_plans.py pin that; this script pins the
runtime side).

``run_stress`` is importable (tests/test_stress_slow.py wraps it as a
``pytest -m slow`` gate at 10x).

Usage: python tools/stress_quadratic.py [base_sf_dir] [reps]
Appends a markdown row per kernel to stdout; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def replicate(emb, times: int):
    """times replicas with distinct ids; replica r shifts ids by r*10^9 and
    deterministically scales one dimension so replicas aren't bit-equal."""
    reps = emb.sparkSession.range(times).select(F.col("id").alias("rep"))
    return emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * F.lit(10**9)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + (F.col("rep").cast("float") * F.lit(0.001)) * (i % 7).cast("float"),
        ).alias("embedding"),
        "label",
    )


def run_stress(spark, base_dir: str, reps: int = 10, emit=print) -> list[dict]:
    """Run each exact quadratic kernel at 1x and ``reps``x (with n_blocks
    scaled ~sqrt(reps)); return one dict per kernel with timings and the
    observed scaling exponent. Completing the scaled leg IS the memory
    invariant — per-cell task memory is held constant by the n_blocks
    scaling, so an OOM/regression fails the run rather than a number."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators import similarity as S

    emb1 = load_testdata(spark, base_dir, ["embeddings"])["embeddings"]
    n1 = emb1.count()
    embN = replicate(emb1, reps).localCheckpoint()  # materialize the Nx input
    nN = embN.count()
    assert nN == reps * n1, (nN, reps, n1)
    # warm python workers
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    # n_blocks guidance: per-cell work/memory ~ (n/n_blocks)^2; scale
    # n_blocks with sqrt(n-ratio) to keep cells constant-sized.
    nb1 = 16
    nbN = max(nb1, int(round(nb1 * math.sqrt(reps))))
    kernels = {
        "all_pairs_cosine_topk": lambda df, nb: S.all_pairs_cosine_topk(
            df, k=20, n_blocks=nb
        ),
        "exact_near_dup_pairs": lambda df, nb: S.exact_near_dup_pairs(
            df, threshold=0.9, n_blocks=nb
        ),
        "hard_negative_topk": lambda df, nb: S.hard_negative_topk(
            df, k=3, n_blocks=nb
        ),
        "knn_neighbors": lambda df, nb: S.knn_neighbors(df, k=5, n_blocks=nb),
    }
    results: list[dict] = []
    emit("| kernel | n=%d (nb=%d) | n=%d (nb=%d) | exponent |" % (n1, nb1, nN, nbN))
    emit("|---|---|---|---|")
    for name, fn in kernels.items():
        ts = {}
        for tag, df, nb in (("base", emb1, nb1), ("scaled", embN, nbN)):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(df, nb).write.mode("overwrite").format("noop").save()
                best = min(best or 9e9, time.time() - t0)
            ts[tag] = best
        # reps=1 is a legal smoke invocation: both legs identical, no
        # defined exponent (log 1 = 0 would divide by zero)
        expo = (
            math.log(ts["scaled"] / ts["base"]) / math.log(reps)
            if reps > 1
            else float("nan")
        )
        results.append(
            {
                "kernel": name,
                "reps": reps,
                "t_base": ts["base"],
                "t_scaled": ts["scaled"],
                "exponent": expo,
            }
        )
        emit(
            "| %s | %.2f s | %.2f s | %.2f |"
            % (name, ts["base"], ts["scaled"], expo),
        )
    return results


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # replica-scale runs hold multiple 10^8-row checkpoints; default the
    # single-JVM heap to a size that fits them (still overridable via env)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    spark = get_session("stress-quadratic")
    run_stress(spark, base_dir, reps=reps)
    spark.stop()


if __name__ == "__main__":
    main()
