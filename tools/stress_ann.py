"""Replica-scale stress smoke for the ANN family — the designed path
past the exact kernels' single-box envelope.

tools/stress_quadratic.py records the exact all-pairs kernels dying at
200x (400,000 x 64 vectors: blocked-grid shuffle bytes exceed one box's
/tmp budget — see BENCH_NOTES). This harness runs the ANN operators at
the SAME scales to substantiate the claim that they are the production
path there: banded-LSH near-dup (candidates via bucket join, no
all-pairs shuffle) and the probe-pruned searches (IVF, signature-probed
LSH top-k).

Construction (all margins measured on the real testdata before the
thresholds were chosen):

- **Planted twins**: each base vector v gets a twin v + 0.05*roll(v,1)
  — cosine(v, twin) in [0.99875, 0.99902] on the sf0.1 corpus, while
  the max non-planted base cosine is 0.627. At threshold 0.98 the true
  pair set is EXACTLY the planted set.
- **Per-replica dense rotations**: replica r applies a seeded Haar
  orthogonal matrix Q_r (QR of seeded gaussian). Orthogonality
  preserves every within-replica cosine to ~1e-15, so each replica
  carries the identical planted structure; cross-replica cosines
  concentrate as N(0, 1/dim) (measured max 0.64 over 5e8 sampled
  pairs) — far under the 0.98 cut, so the exact-verify stage keeps the
  found set == the planted set.
- **Band width as the scale lever**: bucket occupancy is n / 2^width
  per band, so width must grow ~log2(n) to hold the candidate join
  linear. TWO near-dup legs pin this: a hand-tuned 256-plane/16-band
  leg (16-bit bands: ~12 rows/bucket at 200x = 800k rows incl. twins),
  and the operator's UNTUNED DEFAULT (embedding_near_dup_pairs with no
  sizing args), which must derive the same log2(n) widths by itself —
  the proof that the scale lever is the default path, not an opt-in.
  The default also recall-targets its band COUNT
  (lsh_bands_for_recall(0.98, width): 10 bands at width 15 — fewer
  planes than the tuned leg, recall held by design). Twin recall at
  cosine 0.99875 with 10 width-15 bands (the 100x auto size) is
  1 - (1 - 0.984^15)^10 ~ 1 - 3e-7 over 200k pairs — the exact
  rows_scaled == reps * rows_base assert remains safe for both legs.

Asserted invariants (in-engine, same timed pass):
- near-dup: every found pair is a planted twin pair (id_b - id_a ==
  TWIN_OFF AND same replica, asserted separately: with SHIFT - TWIN_OFF
  != TWIN_OFF no cross-replica delta can alias TWIN_OFF, and the
  explicit replica check keeps that true under any future offset
  change), count == reps * base;
- searches: self-retrieval — the query vector (a replica-0 corpus row)
  comes back as top-1 with cosine 1.0 at both scales.

``run_stress`` is importable (tests/test_stress_slow.py wraps it as a
``pytest -m slow`` gate at 10x).

Usage: python tools/stress_ann.py [base_sf_dir] [reps]
Prints a markdown table; paste into BENCH_NOTES.md.
"""

from __future__ import annotations


import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

SHIFT = 10**9  # replica r occupies vec-id range [r*SHIFT, (r+1)*SHIFT)
# twin of base id v is v + TWIN_OFF (< SHIFT). Deliberately NOT SHIFT/2:
# SHIFT - TWIN_OFF must differ from TWIN_OFF or a cross-replica pair
# (replica-r twin, replica-r+1 base) would alias the planted delta and
# could cancel a missed pair in the count assert.
TWIN_OFF = 4 * 10**8
assert SHIFT - TWIN_OFF != TWIN_OFF
N_PLANES, BANDS = 256, 16  # 16-bit bands: log2(n)-sized buckets at 200x
THRESHOLD = 0.98  # planted twins ~0.999, max noise cosine ~0.64


def plant_twins(emb, eps: float = 0.05):
    """Union the corpus with one near-dup twin per vector:
    twin = v + eps * roll(v, 1), twin id = id + TWIN_OFF."""
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    dim = dim_row["d"]
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    rolled = F.transform(
        idx,
        lambda i: (
            F.element_at(F.col("embedding"), i + 1)
            + F.lit(float(eps))
            * F.element_at(F.col("embedding"), F.pmod(i + 1, F.lit(dim)) + 1)
        ).cast("float"),
    )
    twins = emb.select(
        (F.col("vec_id") + F.lit(TWIN_OFF)).alias("vec_id"),
        rolled.alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(twins), dim


def replicate_rotated(planted, reps: int, dim: int):
    """reps disjoint replicas: ids shifted by r*SHIFT, vectors rotated by
    the per-replica orthogonal Q_r (within-replica cosines preserved,
    cross-replica cosines ~N(0, 1/dim))."""
    import numpy as np

    rep_frame = planted.sparkSession.range(reps).select(
        F.col("id").alias("rep")
    )

    # rotation built inside the UDF so cloudpickle ships everything by
    # VALUE (module-level helpers in a script run as __main__ are
    # unresolvable on the workers); the dict caches one QR per replica
    # per worker process
    rot_cache: dict = {}

    @F.pandas_udf("array<float>")
    def _rot(rep: pd.Series, vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        out = np.empty((len(v), dim), dtype=np.float32)
        for r in np.unique(rep.to_numpy()):
            r = int(r)
            if r not in rot_cache:
                rot_cache[r], _ = np.linalg.qr(
                    np.random.default_rng(r).standard_normal((dim, dim))
                )
            m = (rep.to_numpy() == r)
            out[m] = (v[m] @ rot_cache[r].T).astype(np.float32)
        return pd.Series(list(out))

    return planted.crossJoin(F.broadcast(rep_frame)).select(
        (F.col("vec_id") + F.col("rep") * F.lit(SHIFT)).alias("vec_id"),
        _rot(F.col("rep"), F.col("embedding")).alias("embedding"),
    )


def run_stress(spark, base_dir: str, reps: int = 10, emit=print) -> list[dict]:
    """Run each ANN op on the 1x and ``reps``x planted corpus; return one
    dict per op with timings/counts. Asserts IN-ENGINE that the near-dup
    result is exactly the planted twin set and that the searches
    self-retrieve their query at both scales."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators import similarity as S

    emb = load_testdata(spark, base_dir, ["embeddings"])["embeddings"]
    planted, dim = plant_twins(emb)
    n_base_vec = emb.count()
    corpusN = replicate_rotated(planted, reps, dim).localCheckpoint()
    nN = corpusN.count()
    assert nN == reps * 2 * n_base_vec, (nN, reps, n_base_vec)
    # the 1x leg is replica 0 of the SAME construction (rotated + twinned)
    corpus1 = corpusN.filter(F.col("vec_id") < SHIFT).localCheckpoint()
    assert corpus1.count() == 2 * n_base_vec
    # warm python workers so Arrow startup doesn't pollute the base leg
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    # self-retrieval query: a replica-0 corpus vector (base id 0 rotated)
    qrow = corpus1.filter(F.col("vec_id") == 0).first()
    qid, qvec = qrow["vec_id"], [float(x) for x in qrow["embedding"]]

    results: list[dict] = []
    emit(f"vectors (incl. twins): 1x={2 * n_base_vec:,} {reps}x={nN:,}")
    emit(f"| op | 1x | {reps}x | time ratio |")
    emit("|---|---|---|---|")

    def run(name: str, fn, check) -> None:
        ts = {}
        for tag, df in (("base", corpus1), ("scaled", corpusN)):
            best = cnt = None
            for _ in range(2):
                t0 = time.time()
                cnt = check(fn(df), tag)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
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
            }
        )
        emit(
            f"| {name} | {ts['base'][0]:.2f} s ({ts['base'][1]:,} rows) "
            f"| {ts['scaled'][0]:.2f} s ({ts['scaled'][1]:,} rows) | {r:.2f}x |"
        )

    def check_planted(out, tag):
        # count AND planted-pair conformance in the SAME timed pass;
        # delta AND replica are asserted separately so neither can mask
        # the other (a cross-replica alias + one missed pair would
        # otherwise cancel in a combined count)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("id_b") - F.col("id_a") != F.lit(TWIN_OFF)).cast("long")
            ).alias("bad_delta"),
            F.sum(
                (
                    F.floor(F.col("id_a") / F.lit(SHIFT))
                    != F.floor(F.col("id_b") / F.lit(SHIFT))
                ).cast("long")
            ).alias("bad_rep"),
        ).first()
        n, bad = row["n"], (row["bad_delta"] or 0) + (row["bad_rep"] or 0)
        assert bad == 0, (tag, row["bad_delta"], row["bad_rep"])
        want = n_base_vec * (reps if tag == "scaled" else 1)
        assert n == want, (tag, n, want)
        return n

    def check_selfhit(out, tag):
        rows = out.collect()
        assert rows and rows[0]["vec_id"] == qid, (tag, rows[:3])
        assert rows[0]["cos"] == 1.0, (tag, rows[0])
        return len(rows)

    run(
        "lsh_banded_near_dup(256p/16b, t=0.98)",
        lambda d: S.embedding_near_dup_pairs(
            d, threshold=THRESHOLD, n_planes=N_PLANES, bands=BANDS
        ),
        check_planted,
    )
    # the UNTUNED operator default: corpus-sized band width (one stats
    # job + lsh_band_width per call). Same planted-set exactness asserts —
    # this leg is the recorded proof that the log2(n) scale lever is the
    # default path, not a hand-tuned opt-in.
    run(
        "lsh_banded_near_dup(auto default, t=0.98)",
        lambda d: S.embedding_near_dup_pairs(d, threshold=THRESHOLD),
        check_planted,
    )
    run(
        "lsh_bucket_topk(k=10)",
        lambda d: S.lsh_bucket_topk(d, qvec, k=10),
        check_selfhit,
    )
    run(
        "ivf_topk(k=10, 64 lists, probe 8)",
        lambda d: S.ivf_topk(d, qvec, k=10, n_centroids=64, n_probe=8),
        check_selfhit,
    )
    return results


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # replica-scale runs hold multiple large checkpoints; default the
    # single-JVM heap to a size that fits them (still overridable via env)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    spark = get_session("stress-ann")
    run_stress(spark, base_dir, reps=reps)
    spark.stop()


if __name__ == "__main__":
    main()
