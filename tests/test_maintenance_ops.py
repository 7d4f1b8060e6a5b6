"""Unit tests for the round-3 warehouse-maintenance/data-quality surface:
interval coalescing, SCD2 history, constraint reports, char entropy, and
small-file compaction — exercising the edge cases the sf-scale oracle
queries can't isolate (touching intervals, equal-timestamp ties, null
attributes, empty/degenerate text, partition-boundary spans)."""

from __future__ import annotations

import math
import os
import shutil
from glob import glob

from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.operators.history import scd2_history
from fiap_machine_learning_tech_challenge_2_etl_spark.operators.profiling import constraint_report
from fiap_machine_learning_tech_challenge_2_etl_spark.operators.text import add_char_entropy
from fiap_machine_learning_tech_challenge_2_etl_spark.operators.timeseries import (
    coalesce_intervals,
)
from fiap_machine_learning_tech_challenge_2_etl_spark.sources.sinks import compact_parquet_dir


# -------------------------------------------------------------- intervals

def test_coalesce_intervals_overlap_touch_gap(spark):
    rows = [
        ("u", 0, 10),    # |---------|
        ("u", 5, 12),    #      |-------|   overlaps -> merges
        ("u", 12, 15),   #              |--| touches at 12 -> merges
        ("u", 20, 25),   #                     gap -> new span
        ("v", 0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    got = {
        (r["k"], r["span_start"]): (r["span_end"], r["n_merged"])
        for r in coalesce_intervals(df, ["k"], "s", "e").collect()
    }
    assert got[("u", 0)] == (15, 3)
    assert got[("u", 20)] == (25, 1)
    assert got[("v", 0)] == (1, 1)


def test_coalesce_intervals_contained_and_duplicate(spark):
    rows = [("u", 0, 100), ("u", 10, 20), ("u", 10, 20), ("u", 99, 150)]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    out = coalesce_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["span_start"], r["span_end"], r["n_merged"]) == (0, 150, 4)


# ------------------------------------------------------------------ scd2

def test_scd2_run_length_and_validity_chain(spark):
    rows = [
        (1, "a", 10, 100),
        (1, "a", 20, 101),  # unchanged -> compressed away
        (1, "b", 30, 102),  # change
        (1, "b", 40, 103),  # unchanged
        (1, "a", 50, 104),  # back to a -> NEW version (not merged with v1)
        (2, "x", 10, 200),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, t int, seq int")
    out = scd2_history(df, ["k"], "t", ["attr"], tiebreak=["seq"]).collect()
    k1 = sorted([r for r in out if r["k"] == 1], key=lambda r: r["version"])
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in k1] == [
        ("a", 10, 30),
        ("b", 30, 50),
        ("a", 50, None),
    ]
    assert [r["is_current"] for r in k1] == [False, False, True]
    (k2,) = [r for r in out if r["k"] == 2]
    assert k2["version"] == 1 and k2["is_current"]


def test_scd2_null_attribute_transitions(spark):
    rows = [(1, None, 10), (1, None, 20), (1, "a", 30), (1, None, 40)]
    df = spark.createDataFrame(rows, "k int, attr string, t int")
    out = sorted(
        scd2_history(df, ["k"], "t", ["attr"]).collect(), key=lambda r: r["version"]
    )
    # null==null is NOT a change (eqNullSafe); null->a and a->null are
    assert [(r["attr"], r["valid_from"]) for r in out] == [
        (None, 10),
        ("a", 30),
        (None, 40),
    ]


def test_scd2_equal_timestamp_tiebreak(spark):
    rows = [(1, "a", 10, 1), (1, "b", 10, 2)]
    df = spark.createDataFrame(rows, "k int, attr string, t int, seq int")
    out = sorted(
        scd2_history(df, ["k"], "t", ["attr"], tiebreak=["seq"]).collect(),
        key=lambda r: r["version"],
    )
    assert [r["attr"] for r in out] == ["a", "b"]
    assert out[0]["valid_to"] == 10  # zero-length but ordered interval


# -------------------------------------------------------------- contract

def test_constraint_report_checks(spark):
    fact = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, None), (3, -5.0, "x"), (3, 999.0, "z")],
        "id int, v double, fk string",
    )
    dim = spark.createDataFrame([("x",), ("y",)], "d string")
    rep = {
        (r["check"], r["target"]): (r["value"], r["passed"])
        for r in constraint_report(
            fact,
            completeness={"fk": 0.9},
            unique=["id"],
            ranges={"v": (0.0, 100.0)},
            references={"fk": dim},
            min_rows=10,
        ).collect()
    }
    assert rep[("row_count", "*")] == (4.0, False)          # < min_rows
    assert rep[("completeness", "fk")] == (0.75, False)     # 3/4 < 0.9
    assert rep[("uniqueness", "id")][1] is False            # id=3 twice
    assert rep[("range", "v")] == (2.0, False)              # -5 and 999
    assert rep[("referential_integrity", "fk")] == (1.0, False)  # 'z' orphan


def test_constraint_report_unhinted_refs_same_result(spark):
    """broadcast_refs=False (the SF-proportional-reference lever) must not
    change any verdict — AQE picks the join strategy, semantics hold."""
    fact = spark.createDataFrame(
        [(1, "x"), (2, "z"), (3, None)], "id int, fk string"
    )
    dim = spark.createDataFrame([("x",), ("y",)], "d string")
    kw = dict(references={"fk": dim}, unique=["id"])
    hinted = sorted(map(tuple, constraint_report(fact, **kw).collect()))
    plain = sorted(
        map(tuple, constraint_report(fact, broadcast_refs=False, **kw).collect())
    )
    assert hinted == plain
    orph = {r[0]: r for r in plain}["referential_integrity"]
    assert (orph[1], orph[2], orph[3]) == ("fk", 1.0, False)  # 'z' orphan


def test_constraint_report_all_pass(spark):
    fact = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double")
    rep = constraint_report(
        fact, completeness={"v": 1.0}, unique=["id"], ranges={"v": (0.0, 5.0)}
    ).collect()
    assert all(r["passed"] for r in rep)


# --------------------------------------------------------------- entropy

def test_char_entropy_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in add_char_entropy(df).collect()}
    assert got[1]["char_entropy"] == 0.0  # single symbol => 0 bits, +0.0
    assert math.copysign(1.0, got[1]["char_entropy"]) == 1.0  # not -0.0
    assert got[2]["char_entropy"] == 1.0  # two equiprobable symbols
    assert got[3]["char_entropy"] == 2.0  # four equiprobable symbols
    assert got[4]["char_entropy"] == 0.0  # empty text guard
    # bigrams: "abab" -> ab,ba,ab => 2 distinct of 3
    assert (got[2]["n_distinct_bigrams"], got[2]["n_bigrams"]) == (2, 3)
    assert (got[4]["n_distinct_bigrams"], got[4]["n_bigrams"]) == (0, 0)


# ------------------------------------------------------------ compaction

def test_compact_parquet_dir_roundtrip(spark, tmp_path):
    d = str(tmp_path / "frag")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.repartition(37).write.parquet(d)
    assert len(glob(os.path.join(d, "part-*.parquet"))) == 37
    n_files = compact_parquet_dir(spark, d, target_rows_per_file=300)
    assert n_files == math.ceil(1000 / 300)
    assert len(glob(os.path.join(d, "part-*.parquet"))) == n_files
    rb = spark.read.parquet(d)
    assert rb.count() == 1000
    assert rb.agg(F.sum("v")).first()[0] == 999 * 1000  # content intact
    shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------- cross-corpus dedup

def test_cross_dedup_status_stages(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.dedup import cross_dedup_status

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different corpus content about spark plans"),
        ],
        "doc_id int, text string",
    )
    newb = spark.createDataFrame(
        [
            (10, base),                       # byte-identical -> exact_dup
            (11, "THE  quick brown FOX jumps over the lazy dog again and again"),
            # ^ same after normalization (case/whitespace) -> exact_dup
            (12, base + " with one extra tail"),  # near-dup of corpus doc 1
            (13, "unrelated brand new document nothing shared at all"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in cross_dedup_status(
            newb, corpus, num_perm=16, bands=8, threshold=0.3
        ).collect()
    }
    assert got[10] == "exact_dup"
    assert got[11] == "exact_dup"
    assert got[12] == "near_dup"
    assert got[13] == "kept"


def test_cross_dedup_never_drops_within_batch(spark):
    # two identical docs INSIDE the new batch: cross-dedup only compares
    # against the corpus, so both survive (intra-batch dedup is a separate,
    # explicit stage) — pins the no-self-join contract
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.dedup import cross_dedup_status

    corpus = spark.createDataFrame([(1, "corpus only text")], "doc_id int, text string")
    newb = spark.createDataFrame(
        [(10, "twin document body"), (11, "twin document body")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in cross_dedup_status(newb, corpus).collect()
    }
    assert got == {10: "kept", 11: "kept"}


# ------------------------------------------------------- snapshot diff/CDC

def test_snapshot_diff_classifies_all_changes(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.history import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)], "k int, s string, v double"
    )
    got = {r["k"]: (r["change"], r["v"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got[1] == ("delete", 10.0)   # old image for deletes
    assert got[3] == ("update", 99.0)   # new image for updates
    assert got[4] == ("insert", 40.0)
    assert 2 not in got                 # unchanged rows eliminated


def test_snapshot_diff_null_key_matches_null_safely(spark):
    """The key join is null-safe, so presence must come from literal
    markers: a NULL-key row present in BOTH snapshots is an update (or
    eliminated when unchanged), never a phantom insert+delete pair."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.history import snapshot_diff

    old = spark.createDataFrame([(None, 1), (1, 1)], "k long, v long")
    new = spark.createDataFrame([(None, 9), (1, 1)], "k long, v long")
    got = [(r["k"], r["v"], r["change"]) for r in snapshot_diff(old, new, ["k"]).collect()]
    assert got == [(None, 9, "update")]


def test_snapshot_diff_same_source_self_join(spark):
    # both snapshots filtered from ONE DataFrame — the ambiguous-self-join
    # trap this operator must survive
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.history import snapshot_diff

    base = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "k int, v double")
    old = base.filter(F.col("k") != 3)
    new = base.filter(F.col("k") != 1)
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "delete", 3: "insert"}


def test_apply_cdc_last_op_wins_and_deletes(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.history import apply_cdc

    log = spark.createDataFrame(
        [
            (1, 1, "U", 10.0),
            (1, 2, "D", None),    # tombstone is LAST for key 1 -> vanishes
            (2, 1, "D", None),
            (2, 2, "U", 22.0),   # resurrection after delete -> survives
            (3, 1, "U", 30.0),
        ],
        "k int, seq int, op string, v double",
    )
    got = {r["k"]: r["v"] for r in apply_cdc(log, ["k"], ["seq"]).collect()}
    assert got == {2: 22.0, 3: 30.0}


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(i, 1.0 if i < 90 else 1000.0) for i in range(100)], "id int, w double"
    )
    a = [r["id"] for r in weighted_sample_topk(df, "id", "w", 10).collect()]
    b = [r["id"] for r in weighted_sample_topk(df, "id", "w", 10).collect()]
    assert a == b  # deterministic, ordered identically
    # the 10 heavy items (w=1000) should dominate the top-10
    assert sum(1 for i in a if i >= 90) >= 8
    # zero/negative weights are excluded outright
    z = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], "id int, w double")
    assert [r["id"] for r in weighted_sample_topk(z, "id", "w", 5).collect()] == [3]


# ------------------------------------------------- robust stats / splits

def test_clip_outliers_iqr_fences_and_flag(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.cleaning import clip_outliers_iqr

    # sorted [-50,1,2,3,4,5,100]: q1=1.5, q3=4.5 (linear interp), IQR=3
    # -> fences [-3, 9]; 100 and -50 get clipped to the fences
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, -50.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    out = {
        r["i"]: (r["v_c"], r["was_clipped"])
        for r in clip_outliers_iqr(df, "v", k=1.5, output="v_c", flag="was_clipped").collect()
    }
    assert out[5] == (9.0, True)
    assert out[6] == (-3.0, True)
    assert out[2] == (3.0, False)
    # grouped fences stay per-group
    g = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 100.0), ("b", 100.0), ("b", 100.0)],
        "k string, v double",
    )
    got = clip_outliers_iqr(g, "v", keys=["k"], flag="f").filter("f").collect()
    # only a's 100 is an outlier (b's are all 100): in-place clip to a's
    # upper fence q3 + 1.5*IQR = 25.75 + 37.125 = 62.875
    assert [(r["k"], r["v"]) for r in got] == [("a", 62.875)]


def test_standard_scale_zero_variance_guard(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.cleaning import standard_scale

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "a double, b double"
    )
    out = standard_scale(df, ["a", "b"]).collect()
    zs = sorted(round(r["a_z"], 6) for r in out)
    assert zs == [-1.0, 0.0, 1.0]  # stddev_samp([1,2,3]) = 1
    assert all(r["b_z"] is None for r in out)  # constant column -> NULL, not inf


def test_temporal_split_embargo_gap_excluded(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import (
        temporal_split_embargo,
    )

    df = spark.sql(
        "SELECT timestamp_micros(CAST(x * 1000000 AS LONG)) AS ts "
        "FROM (SELECT explode(sequence(0, 99)) AS x)"
    )
    out = temporal_split_embargo(df, "ts", cutoff_fraction=0.5, embargo="10 seconds")
    got = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # cutoff = t49.5 -> train t0..t49 (50 rows); embargo drops t50..t59;
    # test t60..t99 (40 rows)
    assert got == {"train": 50, "test": 40}
    # zero embargo keeps everything
    full = temporal_split_embargo(df, "ts", cutoff_fraction=0.5)
    assert full.count() == 100


def test_numeric_histogram_constant_column(spark):
    """A constant column (width 0) must fold every row into bucket 0 —
    ANSI's plain division threw DIVIDE_BY_ZERO before r08, and a naive
    null-skipping least() would silently pick the LAST bucket."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.profiling import numeric_histogram

    const = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "v double")
    assert [tuple(r) for r in numeric_histogram(const, "v", nbins=4).collect()] == [
        (0, 5.0, 5.0, 3)
    ]
    ramp = spark.createDataFrame([(float(i),) for i in range(8)], "v double")
    got = sorted(tuple(r) for r in numeric_histogram(ramp, "v", nbins=4).collect())
    assert [(b, n) for b, _, _, n in got] == [(0, 2), (1, 2), (2, 2), (3, 2)]


def test_history_cleaning_timeseries_reject_reserved_columns(spark):
    """scd2_history / snapshot_diff / apply_cdc / dedup_keep_first /
    coalesce_intervals refuse inputs already carrying their internal temp
    columns — silently overwriting user data is the failure mode the
    shared util.reject_reserved guard exists to prevent."""
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.cleaning import dedup_keep_first
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.history import (
        apply_cdc,
        scd2_history,
        snapshot_diff,
    )
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.timeseries import (
        coalesce_intervals,
    )

    with pytest.raises(ValueError, match="__keep"):
        scd2_history(
            spark.createDataFrame([(1, 1, 2, True)], "k long, ts long, a long, __keep boolean"),
            ["k"], "ts", ["a"],
        )
    snap = spark.createDataFrame([(1, 2, True)], "k long, v long, __in_old boolean")
    with pytest.raises(ValueError, match="__in_old"):
        snapshot_diff(snap, snap, ["k"])
    with pytest.raises(ValueError, match="__rn"):
        apply_cdc(
            spark.createDataFrame([(1, 1, "I", 9)], "k long, ts long, op string, __rn long"),
            ["k"], ["ts"],
        )
    with pytest.raises(ValueError, match="__rn"):
        dedup_keep_first(
            spark.createDataFrame([(1, 1, 9)], "k long, ts long, __rn long"),
            ["k"], ["ts"],
        )
    with pytest.raises(ValueError, match="__span"):
        coalesce_intervals(
            spark.createDataFrame([(1, 1, 2, 9)], "k long, s long, e long, __span long"),
            ["k"], "s", "e",
        )
