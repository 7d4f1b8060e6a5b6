"""Unit tests for window analytics (SURVEY.md section 2.9, W1-W5),
including frame edges shorter than the window."""

from __future__ import annotations

import math

from fiap_machine_learning_tech_challenge_2_etl_spark.operators import windows as W


def _series(spark):
    rows = [
        # code, d (order), v
        ("A", 1, 10.0),
        ("A", 2, 20.0),
        ("A", 3, 30.0),
        ("A", 4, 40.0),
        ("B", 1, 5.0),
        ("B", 2, 7.0),
    ]
    return spark.createDataFrame(rows, "code string, d int, v double")


def test_moving_average_short_frames(spark):
    out = W.moving_average(
        _series(spark), value="v", keys=["code"], order_by=["d"], n=3, output="ma"
    )
    got = {(r["code"], r["d"]): r["ma"] for r in out.collect()}
    assert got[("A", 1)] == 10.0  # frame shorter than n uses available rows
    assert got[("A", 2)] == 15.0
    assert got[("A", 3)] == 20.0
    assert got[("A", 4)] == 30.0  # (20+30+40)/3
    assert got[("B", 2)] == 6.0


def test_rolling_stats_bundle(spark):
    out = W.rolling_stats(
        _series(spark),
        value="v",
        keys=["code"],
        order_by=["d"],
        n=3,
        stats=("mean", "median", "std", "max", "min", "sum", "count"),
        suffix="",
    )
    r = {(x["code"], x["d"]): x for x in out.collect()}
    a3 = r[("A", 3)]
    assert a3["mean"] == 20.0
    assert a3["median"] == 20.0
    assert math.isclose(a3["std"], 10.0)
    assert a3["max"] == 30.0 and a3["min"] == 10.0
    assert a3["sum"] == 60.0 and a3["count"] == 3
    # single-row frame: sample stddev undefined -> null
    assert r[("A", 1)]["std"] is None
    # even frame -> interpolated exact median
    assert r[("A", 2)]["median"] == 15.0


def test_rolling_median_exact_vs_approx(spark):
    exact = W.rolling_stats(
        _series(spark), "v", ["code"], ["d"], n=3, stats=("median",), suffix="_m"
    )
    approx = W.rolling_stats(
        _series(spark), "v", ["code"], ["d"], n=3, stats=("median",), suffix="_m",
        exact_median=False,
    )
    e = {(r["code"], r["d"]): r["median_m"] for r in exact.collect()}
    a = {(r["code"], r["d"]): r["median_m"] for r in approx.collect()}
    # odd frames agree; even frames may differ (approx picks a sample point)
    assert e[("A", 3)] == a[("A", 3)] == 20.0


def test_group_total_and_min(spark):
    out = W.group_total(_series(spark), "v", keys=["code"], output="tot")
    got = {r["code"] for r in out.filter("code = 'A' and tot = 100.0").collect()}
    assert got == {"A"}
    out2 = W.group_min(_series(spark), "d", keys=["code"], output="mind")
    assert all(r["mind"] == 1 for r in out2.collect())


def test_top_k_per_group(spark):
    from pyspark.sql import functions as F

    out = W.top_k_per_group(
        _series(spark), keys=["code"], order_by=[F.col("v").desc()], k=2
    )
    vals = sorted((r["code"], r["v"]) for r in out.collect())
    assert vals == [("A", 30.0), ("A", 40.0), ("B", 5.0), ("B", 7.0)]


def test_window_result_invariant_under_input_shuffling(spark):
    df = _series(spark)
    a = W.rolling_stats(df, "v", ["code"], ["d"], n=3, suffix="_s")
    b = W.rolling_stats(df.repartition(5), "v", ["code"], ["d"], n=3, suffix="_s")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ewma_matches_recurrence_and_validates_alpha(spark):
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "uid long, t long, x double",
    )
    out = {
        (r["uid"], r["t"]): r["ewma"]
        for r in ewma(df, key="uid", order_by="t", value="x", alpha=0.5).collect()
    }
    # y1=10, y2=.5*20+.5*10=15, y3=.5*30+.5*15=22.5; singleton group y=x
    assert out == {(1, 1): 10.0, (1, 2): 15.0, (1, 3): 22.5, (2, 1): 5.0}

    with pytest.raises(ValueError):
        ewma(df, key="uid", order_by="t", value="x", alpha=0.0)


def test_attribution_first_last_touch_hand_case(spark, sf_dir):
    """Hand-built journey: view -> click -> purchase(10) -> purchase(20)
    with an orphan purchase for another user. First purchase attributes
    (first=view, last=click); the second's preceding frame now contains
    the first purchase but CASE nulls it out, so last stays 'click'; the
    orphan (no prior touch) is excluded."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from fiap_machine_learning_tech_challenge_2_etl_spark.queries_catalog import (
        SPARK_QUERIES,
    )

    d = tempfile.mkdtemp()
    try:
        rows = [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 11:00:00", 1, "click", 2.0),
            (3, "2024-01-01 12:00:00", 1, "purchase", 10.0),
            (4, "2024-01-01 13:00:00", 1, "purchase", 20.0),
            (5, "2024-01-02 09:00:00", 2, "purchase", 99.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        try:
            df.write.parquet(os.path.join(d, "events.parquet"))
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        got = {
            (r["first_touch"], r["last_touch"]): (
                r["n_purchases"],
                r["attributed_cents"],
            )
            for r in SPARK_QUERIES["attribution_first_last_touch"](
                spark, d
            ).collect()
        }
        assert got == {("view", "click"): (2, 3000)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_seasonal_decompose_identities(spark, sf_dir):
    """Decomposition invariants on the real fixture: trend equals the
    floor-div centered mean recomputed in Python, detrended = v - trend,
    and within every (type, dow) group the scaled residuals sum to 0
    exactly (sum(det*n - seasonal_sum) = n*sum(det) - n*sum(det))."""
    from collections import defaultdict

    from fiap_machine_learning_tech_challenge_2_etl_spark.queries_catalog import (
        SPARK_QUERIES,
    )

    rows = SPARK_QUERIES["seasonal_decompose_daily"](spark, sf_dir).collect()
    assert rows
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append(r)
    resid = defaultdict(int)
    for et, rs in series.items():
        rs.sort(key=lambda r: r["day"])
        for i, r in enumerate(rs):
            lo, hi = max(0, i - 3), min(len(rs), i + 4)
            win = [x["v_cents"] for x in rs[lo:hi]]
            assert r["n_win"] == len(win)
            assert r["trend_micro"] == sum(win) * 1_000_000 // len(win)
            assert (
                r["detrended_micro"] == r["v_cents"] * 1_000_000 - r["trend_micro"]
            )
            resid[(et, r["dow"])] += r["resid_scaled_micro"]
    assert all(v == 0 for v in resid.values())


def test_seasonal_trend_floor_div_matches_python_floor_for_negatives(spark):
    """The trend expression in seasonal_decompose_daily corrects Spark's
    truncate-toward-zero `div` to FLOOR semantics (round-4 ADVICE: the
    old form silently diverged from DuckDB's `//` whenever a windowed
    sum went negative). Pin the exact expression against Python's floor
    `//` across sign combinations so the parity is proven, not assumed
    from a non-negative fixture."""
    from pyspark.sql import functions as F

    cases = [(s, n) for s in (-13, -7, -1, 0, 1, 7, 13) for n in (1, 2, 3, 7)]
    df = spark.createDataFrame(cases, "_sw long, n_win long")
    out = df.withColumn(
        "trend_micro",
        F.expr(
            "(_sw * 1000000) div n_win - (CASE WHEN (_sw * 1000000) % n_win != 0"
            " AND _sw < 0 THEN 1 ELSE 0 END)"
        ).cast("long"),
    ).collect()
    for r in out:
        assert r["trend_micro"] == (r["_sw"] * 1_000_000) // r["n_win"], r


def test_rolling_exact_median_null_frames(spark):
    """collect_list drops NULLs, so an all-NULL leading frame is EMPTY —
    the exact median must be NULL there (like percentile_approx), not an
    INVALID_INDEX_OF_ZERO crash under ANSI mode (the r08 fix), and later
    frames must skip the NULLs."""
    df = spark.createDataFrame(
        [("k", 1, None), ("k", 2, 5.0), ("k", 3, 3.0), ("k", 4, None)],
        "k string, i long, v double",
    )
    got = sorted(
        (r["i"], r["median_v_7"])
        for r in W.rolling_stats(
            df, "v", ["k"], ["i"], n=7, stats=("median",)
        ).collect()
    )
    assert got == [(1, None), (2, 5.0), (3, 4.0), (4, 4.0)]


def test_window_ops_reject_reserved_columns(spark):
    """top_k_per_group / global_row_number / global_cumsum refuse inputs
    already carrying their internal temp columns (same contract as
    upsert_by_key's reserved-column guard)."""
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators import windows as W

    df = spark.createDataFrame([(1, 2, 3)], "k long, v long, __rn long")
    with pytest.raises(ValueError, match="__rn"):
        W.top_k_per_group(df, ["k"], ["v"], 1)
    df2 = spark.createDataFrame([(1, 2, 3)], "k long, v long, __pid long")
    with pytest.raises(ValueError, match="__pid"):
        W.global_row_number(df2, ["k", "v"])
    with pytest.raises(ValueError, match="__pid"):
        W.global_cumsum(df2, ["k"], "v")


def test_ewma_null_input_poisons_tail_as_null(spark):
    """A NULL value makes that row's EWMA NULL and poisons the rest of
    the key's tail as NULL — the exact trajectory the SQL recursive CTE
    produces (a*NULL + (1-a)*y = NULL), emitted as NULL, never NaN.
    Other keys and the pre-NULL prefix are unaffected."""
    import math

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, None), (1, 3, 30.0), (2, 1, 5.0), (2, 2, 7.0)],
        "uid long, t long, x double",
    )
    got = {
        (r["uid"], r["t"]): r["ewma"]
        for r in ewma(df, key="uid", order_by="t", value="x", alpha=0.5).collect()
    }
    assert got[(1, 1)] == 10.0
    assert got[(1, 2)] is None and got[(1, 3)] is None  # poisoned tail, as NULL
    assert not any(v is not None and math.isnan(v) for v in got.values())
    assert got[(2, 1)] == 5.0 and got[(2, 2)] == 6.0  # other key untouched
