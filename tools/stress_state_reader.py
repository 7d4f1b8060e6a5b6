"""Scale stress for the offline state-store reader (streaming/state_reader.py).

The 100 TB claim made by ``read_state_store`` is that validating a
checkpoint's state is ONE DISTRIBUTED PASS over the state files — no
driver materialization, no stream replay, cost linear in state size. This
leg builds real checkpoints at two key cardinalities two orders of
magnitude apart and asserts the claim with measurements, not docstrings:

1. CORRECTNESS AT SCALE — a per-key (count, sum) streaming agg over
   ``n_keys`` keys x ``rows_per_key`` rows, delivered in TWO availableNow
   runs on one checkpoint. ``read_state_store`` must return EXACTLY
   n_keys rows, and the per-key state must equal the closed-form
   aggregate of the generated input for EVERY key (asserted in-engine via
   a full-width anti-join on the expected frame — zero mismatching keys —
   so correctness is checked for a million keys without collecting them).
2. DISTRIBUTION — the read's physical plan is a ``BatchScan StateTable``
   (no LocalRelation, no driver collect), and ``state_size_report`` keys
   sum to n_keys across exactly the stream's shuffle-partition count.
3. SCALING EXPONENT — wall time for the state read at n and n/100 keys;
   the measured exponent log(t_big/t_small)/log(100) must stay well below
   quadratic (assert < 1.3; a reader that re-opened the full snapshot
   chain per key, or funneled rows through the driver, blows this).

Usage: python tools/stress_state_reader.py [n_keys] [rows_per_key]
Defaults: 1_000_000 keys x 3 rows. Records results to stdout for
BENCH_NOTES.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.streaming.state_reader import (
    read_state_metadata,
    read_state_store,
    state_size_report,
)

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "_scratch", "stress_state_reader")
STATE_PARTITIONS = 8


def _build_checkpoint(spark: SparkSession, tag: str, n_keys: int, rows_per_key: int) -> str:
    """Two availableNow runs of a per-key count/sum agg; returns ckpt dir.
    Input is generated (spark.range), value = (row_index % 97) so the
    expected per-key sum has a closed form checkable in-engine."""
    d = os.path.join(SCRATCH, tag)
    shutil.rmtree(d, ignore_errors=True)
    inp, ckpt = os.path.join(d, "in"), os.path.join(d, "ckpt")

    def land(run: int) -> None:
        # rows_per_key rows per key per run; id -> (key, value)
        rows = spark.range(n_keys * rows_per_key).select(
            (F.col("id") % n_keys).alias("k"),
            ((F.col("id") + run) % 97).cast("double").alias("v"),
        )
        rows.coalesce(4).write.mode("append").parquet(inp)

    def run_once() -> None:
        stream = spark.readStream.schema("k LONG, v DOUBLE").parquet(inp)
        agg = stream.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("t")
        )
        (
            agg.writeStream.foreachBatch(
                lambda b, _e: b.write.format("noop").mode("overwrite").save()
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    land(0)
    run_once()
    land(1)
    run_once()
    return ckpt


def _expected(spark: SparkSession, n_keys: int, rows_per_key: int):
    """Closed-form expected state: replay the generator arithmetic as a
    batch frame (distributed — never collected)."""
    both = None
    for run in (0, 1):
        rows = spark.range(n_keys * rows_per_key).select(
            (F.col("id") % n_keys).alias("k"),
            ((F.col("id") + run) % 97).cast("double").alias("v"),
        )
        both = rows if both is None else both.unionAll(rows)
    return both.groupBy("k").agg(
        F.count(F.lit(1)).alias("exp_n"), F.sum("v").alias("exp_t")
    )


def _read_and_check(spark: SparkSession, ckpt: str, n_keys: int, rows_per_key: int) -> float:
    t0 = time.monotonic()
    st = read_state_store(spark, ckpt).select(
        F.col("k"), F.col("count").alias("n"), F.col("sum").alias("t")
    )
    n_state = st.count()
    elapsed = time.monotonic() - t0
    assert n_state == n_keys, (n_state, n_keys)

    plan = st._jdf.queryExecution().executedPlan().toString()
    assert "StateTable" in plan and "LocalRelation" not in plan, plan[:400]

    exp = _expected(spark, n_keys, rows_per_key)
    bad = (
        st.join(exp, "k", "full_outer")
        .filter(
            ~(F.col("n").eqNullSafe(F.col("exp_n")))
            | ~(F.col("t").eqNullSafe(F.col("exp_t")))
        )
        .count()
    )
    assert bad == 0, f"{bad} keys mismatch expected state"

    meta = read_state_metadata(spark, ckpt).collect()
    assert [(m["operatorName"], m["numPartitions"]) for m in meta] == [
        ("stateStoreSave", STATE_PARTITIONS)
    ], meta
    rep = state_size_report(spark, ckpt)
    rep_rows = rep.collect()  # <= STATE_PARTITIONS rows — metadata-class
    assert sum(r["n_keys"] for r in rep_rows) == n_keys
    assert len(rep_rows) == STATE_PARTITIONS
    return elapsed


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rows_per_key = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    small = max(n_keys // 100, 1000)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    spark = get_session("stress-state-reader")
    spark.sparkContext.setLogLevel("ERROR")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))
    try:
        results = {}
        for tag, n in (("small", small), ("big", n_keys)):
            ckpt = _build_checkpoint(spark, tag, n, rows_per_key)
            results[tag] = (n, _read_and_check(spark, ckpt, n, rows_per_key))
            print(f"{tag}: {n} keys -> state read+validate {results[tag][1]:.2f}s", flush=True)
        (n_s, t_s), (n_b, t_b) = results["small"], results["big"]
        exponent = math.log(max(t_b, 1e-9) / max(t_s, 1e-9)) / math.log(n_b / n_s)
        print(f"scaling exponent (keys {n_s} -> {n_b}): {exponent:.2f}")
        assert exponent < 1.3, f"state read scales super-linearly: {exponent:.2f}"
        print("OK: distributed, correct at every key, sub-1.3 exponent")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(SCRATCH, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
