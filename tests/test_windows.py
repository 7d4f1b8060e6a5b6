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
