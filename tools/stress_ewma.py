"""Million-row single-key stress for the EWMA segmented scan.

Round 9 changed ewma's emit semantics (NaN-poisoned tails emit NULL,
matching the SQL recursive-CTE trajectory); the property test covers
small inputs, and this leg pins the same semantics AT SCALE — one key
holding >=1M rows so the series crosses hundreds of Arrow batch
boundaries and the carry dict (timeseries.py: O(live keys) state,
resume across batches) is genuinely exercised, with NULLs injected
mid-series so the poison ALSO has to survive a batch-boundary resume.

Invariants (asserted):
- value parity on a deterministic row sample (every ~9973rd seq plus
  the rows straddling each injected NULL) against a driver-side numpy
  evaluation of the same literal recurrence — exact float64 equality,
  since kernel and model perform the identical op sequence;
- poisoned-tail shape: the huge key emits NULL for EVERY row at/after
  its first injected NULL and non-NULL for every row before it;
- carry isolation: an interleaved small key (no NULLs) is unaffected
  by the huge key's poisoning;
- bounded memory: Arrow batch size is pinned to 10k rows for the run,
  so the 1M-row key MUST stream as >=100 batches through one
  mapInPandas pass — completing without OOM/task failure is the
  memory invariant.

``run_stress`` is importable (tests/test_stress_slow.py wraps it as a
``pytest -m slow`` gate at 200k rows).

Usage: python tools/stress_ewma.py [n_rows]
Appends a markdown row to stdout; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ALPHA = 0.35
SIDE_MOD = 1009  # id % SIDE_MOD == 7 -> the interleaved small key
SAMPLE_MOD = 9973


def _value_expr():
    """Deterministic pseudo-values in [0, 1): Knuth multiplicative hash of
    the row id — no Math.random (stable across runs and engines)."""
    return ((F.col("seq") * F.lit(2654435761)) % 1000).cast("double") / 1000.0


def _python_model(seqs, null_at: int):
    """The same literal recurrence in driver floats: y = a*x + (1-a)*y,
    None once poisoned. Returns {seq: value-or-None} for one key."""
    acc = None
    out = {}
    for s in seqs:
        x = None if s == null_at else ((s * 2654435761) % 1000) / 1000.0
        if x is None or (acc is not None and acc != acc) or acc == "poison":
            # model poisoning as a sticky marker
            acc = "poison"
            out[s] = None
            continue
        acc = x if acc is None else ALPHA * x + (1.0 - ALPHA) * acc
        out[s] = acc
    return out


def run_stress(spark, n_rows: int = 1_000_000, emit=print) -> dict:
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.timeseries import ewma

    null_at = int(n_rows * 0.9)  # poison late: ~90% of the series is live
    while null_at % SIDE_MOD == 7:
        # the NULL must land on the 'huge' key — a seq belonging to the
        # interleaved 'side' key would inject nothing and the poisoned-tail
        # assert below would fail confusingly (min of an empty filter)
        null_at += 1
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        src = spark.range(n_rows).select(
            F.when(F.col("id") % SIDE_MOD == 7, F.lit("side"))
            .otherwise(F.lit("huge"))
            .alias("k"),
            F.col("id").alias("seq"),
        )
        src = src.withColumn(
            "value",
            F.when(
                (F.col("k") == "huge") & (F.col("seq") == null_at), F.lit(None)
            ).otherwise(_value_expr()),
        )
        t0 = time.time()
        out = ewma(src, key="k", order_by="seq", value="value", alpha=ALPHA)
        out = out.localCheckpoint()  # materialize ONCE; probes below reuse it
        wall = time.time() - t0
        n_out = out.count()
        assert n_out == n_rows, (n_out, n_rows)

        # poisoned-tail shape on the huge key
        huge_null = out.filter(
            (F.col("k") == "huge") & F.col("ewma").isNull()
        ).agg(F.min("seq"), F.count(F.lit(1))).collect()[0]
        huge_total = out.filter(F.col("k") == "huge").count()
        huge_after = src.filter(
            (F.col("k") == "huge") & (F.col("seq") >= null_at)
        ).count()
        assert huge_null[0] == null_at, f"poison starts at {huge_null[0]} != {null_at}"
        assert huge_null[1] == huge_after, (
            f"poisoned-tail count {huge_null[1]} != rows-at/after-null {huge_after}"
        )
        side_nulls = out.filter(
            (F.col("k") == "side") & F.col("ewma").isNull()
        ).count()
        assert side_nulls == 0, f"side key leaked {side_nulls} poisoned rows"

        # sampled value parity vs the driver-side model
        sample = out.filter(
            (F.col("seq") % SAMPLE_MOD == 0)
            | F.col("seq").between(null_at - 2, null_at + 2)
        ).collect()
        huge_seqs = [i for i in range(n_rows) if i % SIDE_MOD != 7]
        side_seqs = [i for i in range(n_rows) if i % SIDE_MOD == 7]
        model = {
            "huge": _python_model(huge_seqs, null_at),
            "side": _python_model(side_seqs, -1),
        }
        checked = 0
        for r in sample:
            want = model[r["k"]][r["seq"]]
            got = r["ewma"]
            if want is None or got is None:
                assert want is None and got is None, (r["k"], r["seq"], got, want)
            else:
                assert got == want or math.isclose(got, want, rel_tol=1e-12), (
                    r["k"], r["seq"], got, want,
                )
            checked += 1
        assert checked >= n_rows // SAMPLE_MOD, checked

        res = {
            "op": "ewma segmented scan (huge-key NULL poison)",
            "n_rows": n_rows,
            "huge_rows": huge_total,
            "arrow_batches_min": huge_total // 10_000,
            "poison_tail_rows": huge_null[1],
            "parity_sample": checked,
            "wall_s": round(wall, 2),
        }
        emit(
            f"| ewma segmented scan | {n_rows:,} rows, one key holding "
            f"{huge_total:,} (>= {res['arrow_batches_min']} Arrow batches), "
            f"NULL injected at seq {null_at:,} | {res['wall_s']}s | "
            f"{checked}-row numpy parity OK, poisoned tail exactly "
            f"{huge_null[1]:,} rows, side key clean |"
        )
        return res
    finally:
        if old_batch is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)


def main() -> None:
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_session("stress-ewma")
    run_stress(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
