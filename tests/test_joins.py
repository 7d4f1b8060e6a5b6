"""As-of join, salted aggregation, and time-window agg semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.operators import joins as J
from fiap_machine_learning_tech_challenge_2_etl_spark.operators import windows as W


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 100)],
        "event_id long, user string, ts long",
    ).withColumnRenamed("user", "user_id")
    right = spark.createDataFrame(
        [("u", 100, 11), ("u", 200, 12), ("v", 150, 13)],
        "user_id string, ts long, snap_id long",
    )
    out = {
        r["event_id"]: r["snap_id"]
        for r in J.asof_join(
            left, right, on="user_id", ts_col="ts", right_value_cols=["snap_id"]
        ).collect()
    }
    assert out[1] == 11  # ts tie: right row at same ts matches (<=)
    assert out[2] == 12  # latest prior, not first
    assert out[3] is None  # nothing at or before
    assert out[4] is None  # other key's snapshots never leak

    # invariant under input partitioning (single ordered window per key)
    out2 = {
        r["event_id"]: r["snap_id"]
        for r in J.asof_join(
            left.repartition(5),
            right.repartition(3),
            on="user_id",
            ts_col="ts",
            right_value_cols=["snap_id"],
        ).collect()
    }
    assert out == out2


def test_asof_join_carries_the_matched_row_as_a_unit(spark):
    """A value column that is NULL in the as-of right row must come through
    as NULL — per-column forward-fill would stitch columns from DIFFERENT
    right rows into one output row (the r08 franken-row fix). NULL join
    keys never match (SQL semantics), on either side."""
    left = spark.createDataFrame(
        [(1, 3), (2, 5), (None, 5)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 1, 5, 7), (1, 2, 9, None), (None, 1, 1, 1)],
        "k long, ts long, a long, b long",
    )
    got = {
        r["k"]: (r["a"], r["b"])
        for r in J.asof_join(
            left, right, on="k", ts_col="ts", right_value_cols=["a", "b"]
        ).collect()
    }
    assert got[1] == (9, None)  # the ts=2 row AS A UNIT, b not back-filled
    assert got[2] == (None, None)  # key with no right rows
    assert got[None] == (None, None)  # null key never matches


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata

    ev = load_testdata(spark, sf_dir, ["events"])["events"].withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    plain = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["s"])
        for r in J.salted_agg(
            ev,
            ["event_type"],
            [("count", "*", "n"), ("sum", "cents", "s")],
            salt_buckets=8,
            salt_source="event_id",
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain_join(spark):
    """salted_join must be INVISIBLE in the result: inner and left joins
    over a 90%-hot key equal the plain join row-for-row (including left
    rows with no dim match under how='left'), and the salt genuinely
    spreads — the hot key's left rows occupy more than one salt bucket."""
    left = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(-1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    # dim misses some cold keys -> exercises unmatched-left under 'left'
    right = spark.range(0, 1000, 2).select(
        F.when(F.col("id") % 10 < 9, F.lit(-1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 10).alias("attr"),
    ).distinct()
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, left.join(right, on="k", how=how).collect())
        )
        salted = sorted(
            map(tuple, J.salted_join(left, right, on="k", how=how, salt_buckets=8).collect())
        )
        assert plain == salted, how
    # spread: the hot key's rows land in >1 salt bucket
    n_salts = (
        left.withColumn(
            "__s", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(8))
        )
        .filter(F.col("k") == -1)
        .select("__s")
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_salted_join_works_stream_static(spark, tmp_path):
    """The docstring's headline use case, attested: AQE cannot re-plan
    inside a streaming query, so a skewed STREAM-STATIC join gets no
    runtime skew split — salted_join is the fix that works there. The
    salt expression is deterministic (F.hash over left columns, never
    monotonically_increasing_id), so it is legal in a streaming plan;
    output must equal the batch plain join of the same data."""
    import os

    rows = [(-1 if i % 10 < 9 else i, float(i)) for i in range(500)]
    batch = spark.createDataFrame(rows, "k long, v double")
    dim = spark.createDataFrame(
        [(-1, "hot"), (33, "cold")], "k long, tier string"
    )
    inp, outp, ckpt = (str(tmp_path / s) for s in ("in", "out", "ckpt"))
    batch.coalesce(2).write.parquet(inp)
    stream = spark.readStream.schema(batch.schema).parquet(inp)
    joined = J.salted_join(stream, dim, on="k", salt_buckets=8)
    (
        joined.writeStream.foreachBatch(
            lambda b, _e: b.write.mode("append").parquet(outp)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(map(tuple, spark.read.parquet(outp).collect()))
    want = sorted(map(tuple, batch.join(dim, on="k").collect()))
    assert got == want


def test_salted_join_validates_modes_and_reserved(spark):
    """right/full outer are refused (an unmatched right row would emit
    once per salt copy); reserved __salt column on either side raises."""
    import pytest

    l = spark.createDataFrame([(1, 2)], "k long, v long")
    r = spark.createDataFrame([(1, 3)], "k long, a long")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            J.salted_join(l, r, on="k", how=how)
    with pytest.raises(ValueError, match="__salt"):
        J.salted_join(l.withColumn("__salt", F.lit(0)), r, on="k")
    with pytest.raises(ValueError, match="__salt"):
        J.salted_join(l, r.withColumn("__salt", F.lit(0)), on="k")


def test_tumbling_and_session_aggs(spark):
    rows = [
        (1, "2024-01-01 00:01:00"),
        (2, "2024-01-01 00:05:00"),  # same session (4 min gap)
        (3, "2024-01-01 00:20:00"),  # new session (15 min gap)
        (4, "2024-01-01 01:10:00"),  # new hour bucket, new session
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_s string").select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), F.lit(7).alias("user_id")
    )
    tum = {
        r["window_start"].isoformat(): r["n"]
        for r in W.tumbling_agg(
            df, "ts", "1 hour", aggs=[F.count(F.lit(1)).alias("n")]
        ).collect()
    }
    assert tum == {"2024-01-01T00:00:00": 3, "2024-01-01T01:00:00": 1}
    sess = sorted(
        (r["session_start"].isoformat(), r["n"])
        for r in W.session_agg(
            df, "ts", "10 minutes", ["user_id"], aggs=[F.count(F.lit(1)).alias("n")]
        ).collect()
    )
    assert sess == [
        ("2024-01-01T00:01:00", 2),
        ("2024-01-01T00:20:00", 1),
        ("2024-01-01T01:10:00", 1),
    ]


def test_range_join_matches_theta_join(spark):
    left = spark.createDataFrame(
        [(i, p) for i, p in enumerate([0, 5, 9, 10, 17, 23, 99])],
        "lid long, point long",
    )
    right = spark.createDataFrame(
        [(100, 0, 10), (200, 8, 25), (300, 50, 60)],
        "rid long, s long, e long",
    )
    got = {
        (r["lid"], r["rid"])
        for r in J.range_join_bucketed(left, right, "point", "s", "e", 7).collect()
    }
    want = {
        (lr["lid"], rr["rid"])
        for lr in left.collect()
        for rr in right.collect()
        if rr["s"] <= lr["point"] < rr["e"]
    }
    assert got == want  # exact [start, end) semantics incl. boundaries


def test_bucketed_tables_join_without_exchange(spark, tmp_path, sf_dir):
    import shutil

    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.sinks import write_bucketed_table

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed_table(o, "t_orders_b", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        8,
        sort_by=["o_orderkey"],
    )
    joined = (
        spark.table("t_orders_b")
        .hint("merge")  # pin SMJ so broadcast doesn't mask the bucket test
        .join(spark.table("t_lineitem_b"), "o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().treeString()
    # co-located buckets: the sort-merge join runs with NO shuffle
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == li.count()
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata

    ev = load_testdata(spark, sf_dir, ["events"])["events"]
    rows = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(2, 0.15 * r["exact"])


def test_reserved_internal_columns_raise(spark):
    """range_join_bucketed and salted_agg refuse inputs already carrying
    their internal temp columns ('__b', '__salt') — withColumn would
    silently overwrite user data, mirroring upsert_by_key's
    __is_new/__rn guard."""
    import pytest

    df_b = spark.createDataFrame([(1, 2)], "point long, __b long")
    plain = spark.createDataFrame([(1, 0, 10)], "point long, s long, e long")
    with pytest.raises(ValueError, match="__b"):
        J.range_join_bucketed(df_b, plain, "point", "s", "e", 7)
    with pytest.raises(ValueError, match="__b"):
        J.range_join_bucketed(
            plain.select("point"), df_b.withColumnsRenamed({"point": "s"})
            .withColumn("e", F.col("s") + 1), "point", "s", "e", 7
        )
    df_s = spark.createDataFrame([(1, 2, 3)], "k long, v long, __salt long")
    with pytest.raises(ValueError, match="__salt"):
        J.salted_agg(df_s, ["k"], [("sum", "v", "sum_v")])


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """pandas merge_asof(tolerance=...) semantics: the latest at-or-before
    match counts ONLY if within tolerance; a staler one nulls the WHOLE
    struct (never column-by-column), and fresh matches are unaffected.
    tolerance=None must reproduce the unbounded behavior exactly."""
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 300)],
        "event_id long, user_id string, ts long",
    )
    right = spark.createDataFrame(
        [("u", 100, 11, 1), ("u", 200, 12, None), ("v", 150, 13, 3)],
        "user_id string, ts long, snap_id long, extra long",
    )

    def run(tol):
        return {
            r["event_id"]: (r["snap_id"], r["extra"])
            for r in J.asof_join(
                left,
                right,
                on="user_id",
                ts_col="ts",
                right_value_cols=["snap_id", "extra"],
                tolerance=tol,
            ).collect()
        }

    got = run(10)
    assert got[1] == (11, 1)  # exact-ts match: age 0 <= 10
    assert got[2] == (12, None)  # age 5 <= 10; legit-NULL column survives
    assert got[3] == (None, None)  # no prior row at all
    assert got[4] == (None, None)  # age 150 > 10: stale -> WHOLE struct null

    # a wide-enough tolerance and no tolerance agree
    assert run(10**9) == run(None)

    # partitioning invariance holds with the freshness gate too
    got2 = {
        r["event_id"]: (r["snap_id"], r["extra"])
        for r in J.asof_join(
            left.repartition(5),
            right.repartition(3),
            on="user_id",
            ts_col="ts",
            right_value_cols=["snap_id", "extra"],
            tolerance=10,
        ).collect()
    }
    assert got == got2


def test_asof_join_tolerance_interval_and_reserved_guard(spark):
    """Timestamp ts takes a SQL INTERVAL body; a '__rts' column on either
    input is rejected loudly (it is the carried-ts reserved name)."""
    import pytest

    left = spark.createDataFrame(
        [(1, "u", "2024-01-02 00:00:00"), (2, "u", "2024-01-10 00:00:00")],
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 12:00:00", 7)],
        "user_id string, ts string, snap_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: r["snap_id"]
        for r in J.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_value_cols=["snap_id"], tolerance="24 HOURS",
        ).collect()
    }
    assert got[1] == 7  # 12h old: fresh
    assert got[2] is None  # 8.5 days old: stale

    with pytest.raises(ValueError, match="__rts"):
        J.asof_join(
            left.withColumn("__rts", F.lit(1)),
            right,
            on="user_id",
            ts_col="ts",
            right_value_cols=["snap_id"],
            tolerance="24 HOURS",
        )


def test_asof_join_tolerance_rejects_negative(spark):
    import pytest

    left = spark.createDataFrame([(1, "u", 5)], "event_id long, user_id string, ts long")
    right = spark.createDataFrame([("u", 3, 9)], "user_id string, ts long, snap_id long")
    with pytest.raises(ValueError, match="tolerance"):
        J.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_value_cols=["snap_id"], tolerance=-1,
        )


def test_asof_join_tolerance_rejects_negative_interval_string(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, "u", "2024-01-02 00:00:00")], "event_id long, user_id string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 7)], "user_id string, ts string, snap_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="tolerance"):
        J.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_value_cols=["snap_id"], tolerance="-24 HOURS",
        )


def test_asof_join_validates_on_degenerate_empty_value_cols(spark):
    """The no-value-columns early return must STILL validate tolerance —
    an invalid tolerance on the degenerate call was silently accepted
    before (validation ran after the early return)."""
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.joins import asof_join

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts_s string"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError, match="tolerance must be >= 0"):
        asof_join(df, df, on="k", ts_col="ts", right_value_cols=[], tolerance=-5)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(
            df, df, on="k", ts_col="ts", right_value_cols=[], tolerance="24 parsecs"
        )
    # valid degenerate call still returns left unchanged
    out = asof_join(df, df, on="k", ts_col="ts", right_value_cols=[])
    assert out.columns == df.columns


def test_asof_join_rejects_malformed_interval_body(spark):
    """A malformed INTERVAL body fails eagerly at the call site naming
    'tolerance', not at analysis time with a generic parse error."""
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.joins import asof_join

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.0)], "k long, ts_s string, v double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    with pytest.raises(ValueError, match="tolerance must be a SQL INTERVAL"):
        asof_join(
            df, df, on="k", ts_col="ts", right_value_cols=["v"], tolerance="HOURS 24"
        )
    # well-formed multi-unit bodies pass validation
    out = asof_join(
        df, df, on="k", ts_col="ts", right_value_cols=["v"],
        tolerance="1 HOUR 30 MINUTES",
    )
    assert out.count() == 1


def test_asof_tolerance_fractional_seconds_accepted(spark):
    """Fractional interval magnitudes are legal SQL ('INTERVAL 0.5
    SECONDS' parses) and worked before eager validation existed; the
    validator must not narrow that. A carried row 0.3 s stale survives a
    0.5 s tolerance; one 0.7 s stale does not."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1_000_000), (2, 2_000_000)], "k long, us long"
    ).select("k", F.timestamp_micros(F.col("us")).alias("ts"))
    right = spark.createDataFrame(
        [(1, 700_000, 10.0), (2, 1_300_000, 20.0)], "k long, us long, v double"
    ).select("k", F.timestamp_micros(F.col("us")).alias("ts"), "v")
    out = {
        r["k"]: r["v"]
        for r in asof_join(
            left,
            right,
            on="k",
            ts_col="ts",
            right_value_cols=["v"],
            tolerance="0.5 SECONDS",
        ).collect()
    }
    assert out == {1: 10.0, 2: None}  # 0.3s stale kept, 0.7s stale dropped
