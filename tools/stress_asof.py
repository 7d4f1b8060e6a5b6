"""Replica-scale stress smoke for the union-sort as-of join.

The asof_join docstring (operators/joins.py) claims the 100 TB shape —
ONE exchange on the key, one per-key sort, no pair materialization,
skew bounded by AQE — and this script is the measured leg behind it:
events replicated N times with a DELIBERATELY skewed key (every fifth
user remapped to key 1, so ~20% of all rows share one window
partition), then the full asof pipeline timed at 1x and Nx through the
noop sink.

Invariants (asserted, not just reported):
- left-preserving: output rows == click input rows at both scales
  (every click emits exactly one row, match or NULL);
- value parity: a deterministic ~500-click sample of the Nx output
  equals a brute-force oracle (inequality join + max_by over the same
  replicated data), INCLUDING no-prior-view NULL rows — so the
  union-sort + last(ignorenulls) carry is re-derived from first
  principles at scale, skewed key included;
- completion under skew IS the memory invariant: the window sort for
  key 1 must spill/sort ~20% of the corpus in one partition without
  OOM; failed-task counts are read from the status tracker and
  asserted zero.

``run_stress`` is importable (tests/test_stress_slow.py wraps it as a
``pytest -m slow`` gate at 10x).

Usage: python tools/stress_asof.py [base_sf_dir] [reps]
Appends a markdown row to stdout; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SKEW_KEY = 1  # every user_id % 5 == 0 row lands here (~20% of the corpus)
SAMPLE_TARGET = 500  # parity-oracle click sample size (deterministic modulus)


def replicate_events(ev, reps: int):
    """``reps`` replicas with distinct event_ids, per-replica second-level
    ts perturbation (replicas INTERLEAVE in time, so per-key window sorts
    genuinely grow reps-x — disjoint time ranges would be the easy case),
    and the skew remap applied after replication."""
    reps_df = ev.sparkSession.range(reps).select(F.col("id").alias("rep"))
    return ev.crossJoin(F.broadcast(reps_df)).select(
        (F.col("event_id") + F.col("rep") * F.lit(10**9)).alias("event_id"),
        F.when(F.col("user_id") % 5 == 0, F.lit(SKEW_KEY))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.timestamp_add("SECOND", (F.col("rep") % 59).cast("int"), F.col("ts")).alias(
            "ts"
        ),
        "event_type",
        "value",
    )


def _split(ev):
    """The asof_join_events shapes: clicks (left) and deduped views (right)."""
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_id"),
            F.expr("max_by(value, event_id)").alias("vval"),
        )
    )
    return clicks, views


def _run_leg(spark, ev, group: str):
    """Time the asof pipeline through the noop sink inside a job group;
    return (wall_sec, out_rows, click_rows, failed_tasks)."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.joins import asof_join

    clicks, views = _split(ev)
    out = asof_join(
        clicks, views, on="user_id", ts_col="ts", right_value_cols=["view_id", "vval"]
    )
    sc = spark.sparkContext
    sc.setJobGroup(group, f"asof stress leg {group}")
    try:
        t0 = time.time()
        n_out = out.count()
        wall = time.time() - t0
    finally:
        sc.setJobGroup(None, None)
    n_clicks = clicks.count()
    tracker = sc.statusTracker()
    failed = 0
    for jid in tracker.getJobIdsForGroup(group):
        jinfo = tracker.getJobInfo(jid)
        if jinfo is None:
            continue
        for sid in jinfo.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                failed += sinfo.numFailedTasks
    return wall, n_out, n_clicks, failed


def _assert_parity(spark, ev) -> int:
    """Brute-force oracle over a deterministic click sample: inequality
    join (views at-or-before the click, same key) + max_by(struct(ts,
    view_id)) — semantics identical to the union-sort carry because view
    rows are unique per (key, ts). Returns the sample size checked."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.joins import asof_join

    clicks, views = _split(ev)
    mod = max(1, clicks.count() // SAMPLE_TARGET)
    sample = clicks.filter(F.col("event_id") % mod == 0).localCheckpoint()
    n_sample = sample.count()
    assert n_sample > 0, "degenerate parity sample"

    got = (
        asof_join(
            clicks,
            views,
            on="user_id",
            ts_col="ts",
            right_value_cols=["view_id", "vval"],
        )
        .filter(F.col("event_id") % mod == 0)
        .select("event_id", "user_id", "view_id", F.round("vval", 6).alias("vval"))
    )
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        "view_id",
        "vval",
    )
    want = (
        sample.join(
            v,
            on=[sample["user_id"] == v["v_user"], v["v_ts"] <= sample["ts"]],
            how="left",
        )
        .groupBy(sample["event_id"], sample["user_id"])
        .agg(
            F.expr("max_by(view_id, struct(v_ts, view_id))").alias("view_id"),
            F.round(F.expr("max_by(vval, struct(v_ts, view_id))"), 6).alias("vval"),
        )
    )
    extra = got.exceptAll(want).count()
    missing = want.exceptAll(got).count()
    assert extra == 0 and missing == 0, (
        f"asof parity mismatch on {n_sample}-click sample: "
        f"{extra} extra, {missing} missing"
    )
    return n_sample


def run_stress(spark, base_dir: str, reps: int = 100, emit=print) -> dict:
    """Run the asof pipeline at 1x and ``reps``x with the skewed key;
    assert left-preservation, zero failed tasks, and brute-force value
    parity on the Nx leg. Returns the timing/shape dict."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata

    ev1 = replicate_events(
        load_testdata(spark, base_dir, ["events"])["events"], 1
    ).localCheckpoint()
    evN = replicate_events(
        load_testdata(spark, base_dir, ["events"])["events"], reps
    ).localCheckpoint()
    n1, nN = ev1.count(), evN.count()
    assert nN == reps * n1, (nN, reps, n1)
    skew_share = evN.filter(F.col("user_id") == SKEW_KEY).count() / nN

    w1, out1, clicks1, fail1 = _run_leg(spark, ev1, "asof-stress-1x")
    assert out1 == clicks1, f"1x not left-preserving: {out1} != {clicks1}"
    wN, outN, clicksN, failN = _run_leg(spark, evN, f"asof-stress-{reps}x")
    assert outN == clicksN, f"{reps}x not left-preserving: {outN} != {clicksN}"
    assert fail1 == 0 and failN == 0, f"failed tasks: 1x={fail1} {reps}x={failN}"
    n_sample = _assert_parity(spark, evN)

    res = {
        "op": "asof_join (union-sort)",
        "rows_1x": n1,
        "rows_Nx": nN,
        "reps": reps,
        "skew_share": round(skew_share, 3),
        "wall_1x_s": round(w1, 2),
        "wall_Nx_s": round(wN, 2),
        "wall_ratio": round(wN / max(w1, 1e-9), 1),
        "parity_sample": n_sample,
        "failed_tasks": fail1 + failN,
    }
    emit(
        f"| asof_join union-sort | {n1:,} -> {nN:,} rows ({reps}x, "
        f"{res['skew_share']:.0%} on one key) | {res['wall_1x_s']}s -> "
        f"{res['wall_Nx_s']}s ({res['wall_ratio']}x wall) | "
        f"{n_sample}-click brute-force parity OK, left-preserving, "
        f"{res['failed_tasks']} failed tasks |"
    )
    return res


def main() -> None:
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_session("stress-asof")
    run_stress(spark, base, reps)
    spark.stop()


if __name__ == "__main__":
    main()
