"""Join / aggregation / set-op extension surface (SURVEY.md section 2.13).

The reference contains no joins, groupBy, sorts, or set ops (absence verified
in SURVEY.md section 2.13); these are the extension operators over the
driver's star schema. Everything is declarative DataFrame algebra so Catalyst
picks physical strategies; the helpers encode the scale decisions:

* dimension tables are broadcast (no shuffle of the fact side);
* fact-fact joins shuffle on the join key and rely on AQE for skew;
* top-k is global sort + limit (Spark plans TakeOrderedAndProject — no full
  sort at scale) or per-group WindowGroupLimit (operators.windows.top_k_per_group).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.util import validate_interval_body


def join_dims(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str | Sequence[str]]],
    how: str = "inner",
    broadcast_dims: bool = True,
) -> DataFrame:
    """Star-schema join: fact against a chain of dimension tables.

    Each dim is (df, join_key(s)). With ``broadcast_dims`` every dimension is
    broadcast — at 100 TB the fact side never shuffles for dimension lookups
    (the standard star-join strategy; dims are orders of magnitude smaller).
    """
    out = fact
    for dim, on in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=on, how=how)
    return out


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of left with a match in right (no right columns)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of left without a match in right."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: Sequence[str] = (),
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """As-of (point-in-time) join: for every left row, attach the right row
    with the greatest ``ts_col`` <= the left row's (per ``on`` key); nulls
    when no prior right row exists. The training-data workhorse for aligning
    events to the latest snapshot/state at their timestamp.

    Spark lacks a native ASOF join; the scalable formulation is NOT a range
    join (quadratic blowup per key) but union-sort: tag both inputs, sort
    within key by (ts, tag) so right rows sort before coincident left rows,
    and carry right values forward with ``last(ignorenulls)`` over a
    running frame. ONE exchange on the key, one sort — O(n log n) per key,
    no pair materialization; skewed keys are bounded by AQE skew handling.
    Right rows must be unique per (key, ts) for determinism — pre-dedupe.

    The matched right row is carried as ONE struct, not per-column: a
    value column that is legitimately NULL in the as-of row must come
    through as NULL, not get back-filled from an older right row
    (per-column ``last(ignorenulls)`` would stitch columns from DIFFERENT
    right rows into one output row). NULL join keys and NULL timestamps
    never match (SQL semantics — a NULL ts can never satisfy
    ``right.ts <= left.ts``): right NULL-key and NULL-ts rows are
    dropped, left NULL-key/NULL-ts rows come through with NULL values.

    ``tolerance`` (optional) bounds match staleness, pandas
    ``merge_asof(tolerance=...)`` / kdb ``wj`` style: a SQL INTERVAL body
    (e.g. ``"24 HOURS"``) for timestamp ``ts_col``, or a plain number for
    numeric ``ts_col``. The carried struct
    then keeps the matched right row's timestamp, and a match older than
    ``left.ts - tolerance`` emits NULL values — the semantics of "latest
    snapshot, but only if fresh enough". Same plan shape (the freshness
    test is a post-carry map-side projection), so the scale posture is
    unchanged: one exchange, one sort.

    Output: all left columns + ``right_value_cols`` (null = no match).
    """
    from pyspark.sql import types as T

    negative = (isinstance(tolerance, (int, float)) and tolerance < 0) or (
        isinstance(tolerance, str) and tolerance.lstrip().startswith("-")
    )
    if negative:
        # pandas merge_asof contract: a negative bound can never admit a
        # carried row (carried ts <= left ts), so every output would be
        # silently NULL — fail loudly instead (covers "-24 HOURS" too)
        raise ValueError(f"tolerance must be >= 0, got {tolerance!r}")
    if isinstance(tolerance, str):
        validate_interval_body(tolerance, "tolerance")
    if tolerance is not None:
        # carry the matched right ts alongside the values so freshness is
        # testable after the carry; reserved name, rejected if colliding
        if "__rts" in set(left.columns) | set(right.columns):
            raise ValueError("column name '__rts' is reserved by asof tolerance")
    if not right_value_cols:
        # degenerate no-value call — validated above so an invalid
        # tolerance is never silently accepted on this path
        return left
    struct_fields = list(right_value_cols)
    r_struct_type = T.StructType(
        (
            [T.StructField("__rts", right.schema[ts_col].dataType)]
            if tolerance is not None  # `is not None`: tolerance=0 is valid
            else []
        )
        + [right.schema[c] for c in struct_fields]
    )
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_struct_cols = (
        [F.col(ts_col).alias("__rts")] if tolerance is not None else []
    ) + [F.col(c) for c in right_value_cols]
    r_tag = right.filter(F.col(on).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.struct(*r_struct_cols).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__is_left",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
        *([F.col("__ts")] if tolerance is not None else []),
    )
    if tolerance is not None:
        # freshness gate: a carried match older than left.ts - tolerance is
        # no match at all (the WHOLE struct nulls, never column-by-column)
        tol = (
            F.lit(tolerance)
            if isinstance(tolerance, (int, float))
            else F.expr(f"INTERVAL {tolerance}")
        )
        fresh = F.col("__r.__rts") >= F.col("__ts") - tol
        carried = carried.withColumn(
            "__r", F.when(fresh, F.col("__r")).otherwise(F.lit(None))
        )
    return carried.filter(F.col("__is_left") == 1).select(
        "__l.*",
        *[F.col(f"__r.{c}").alias(c) for c in right_value_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Interval (range) join: left rows whose numeric ``point_col`` falls in
    [start, end) of a right-side interval — WITHOUT the cross-product a
    naive theta join plans (BroadcastNestedLoopJoin evaluates every pair).

    Bucketing trick: each interval explodes into the fixed-width buckets it
    covers; each point maps to one bucket; the join becomes an EQUI join on
    bucket id plus an exact containment filter. Cost is
    O(intervals x interval_width/bucket_width + matches) with an ordinary
    shuffled/broadcast hash join — the standard scale formulation for
    point-in-interval. Pick ``bucket_width`` near the typical interval
    length so each interval covers O(1) buckets."""
    for side, df in (("left", left), ("right", right)):
        if "__b" in df.columns:
            # reserved: withColumn would silently overwrite user data and
            # drop() would then delete it from the output
            raise ValueError(
                f"{side} input must not contain the reserved bucket column '__b'"
            )
    # upper bucket is floor(end/width), NOT floor((end-1)/width): with
    # fractional bounds (end=10.5, width=10) the latter skips the final
    # bucket and silently drops points in [10, 10.5). The one extra bucket
    # a bucket-aligned integer end produces is removed by the exact
    # containment filter below.
    b_right = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.greatest(
                    F.floor(F.col(start_col) / bucket_width),
                    F.floor(F.col(end_col) / bucket_width),
                ),
            )
        ),
    )
    b_left = left.withColumn("__b", F.floor(F.col(point_col) / bucket_width))
    return (
        b_left.join(b_right, on="__b")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__b")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    exprs: Sequence[tuple[str, str, str]],
    salt_buckets: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for skewed low-cardinality keys.

    A ``groupBy(keys)`` over a handful of hot keys funnels whole key
    populations into single reducers; salting splits each key into
    ``salt_buckets`` sub-groups (phase 1, map-side partials spread across
    the cluster) and then re-aggregates the tiny partial table (phase 2).
    Works for algebraic aggregates: ``exprs`` is (fn, col, alias) with fn
    in {sum, count, min, max}. (Spark's AQE handles skewed JOINS natively;
    skewed aggregations still benefit from explicit salting.)

    ``salt_source``: column whose hash spreads rows (default: per-row
    deterministic spread via all grouping-invariant data — pass an id
    column for stability).
    """
    if "__salt" in df.columns:
        raise ValueError(
            "input must not contain the reserved column '__salt'"
        )
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    phase1_aggs = []
    for fn, col, alias in exprs:
        if fn == "count":
            phase1_aggs.append(F.count(col if col != "*" else F.lit(1)).alias(alias))
        else:
            phase1_aggs.append(getattr(F, fn)(F.col(col)).alias(alias))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase2 = [refold[fn](F.col(alias)).alias(alias) for fn, _, alias in exprs]
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Salted equi-join for a shuffle join whose LEFT side is skewed on
    the key: hot keys funnel whole populations into single reducer
    tasks, and the straggler IS the job's wall clock at 100 TB. Salting
    splits every left key into ``salt_buckets`` sub-keys and REPLICATES
    each right row across all buckets, so the join shuffles on
    ``(key, salt)`` and a hot key's rows land on ``salt_buckets``
    reducers instead of one.

    Semantics-preserving for ``inner`` and ``left`` joins: each left row
    carries exactly ONE salt and the right side holds every salt copy,
    so each (left, right) match pairs exactly once. ``right``/``full``
    outer are REFUSED — an unmatched right row would surface once per
    salt copy (validated, not documented away).

    When to reach for this instead of AQE's skew-join split
    (``spark.sql.adaptive.skewJoin``, on by default in get_session —
    pinned by test_aqe_skew_join_splits_hot_partition): AQE splits a
    skewed SHUFFLE PARTITION after seeing map output sizes, which fixes
    most batch skew for free; explicit salting is the tool when AQE
    cannot act — stream-static joins (no AQE inside streaming queries),
    a skewed key that also dominates a downstream same-key aggregate
    (the salt carries through), or engines/configs without runtime
    replan. Cost model, stated plainly: right side is materialized
    ``salt_buckets`` x into the exchange — size the bucket count so
    |right| x buckets stays exchange-friendly (it spreads across
    reducers, unlike a broadcast's per-executor full copy).

    ``salt_source``: left column whose hash assigns the salt (pick a
    high-cardinality column, e.g. an id). Default: a deterministic hash
    over ALL left columns — duplicate rows share a salt (slightly less
    spread), but results are reproducible across retries, which
    ``monotonically_increasing_id`` would not be. NEVER the join key:
    hash(key) gives every row of a hot key the SAME salt, i.e. no
    spread at all."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: an "
            "unmatched right row would be emitted once per salt copy under "
            "right/full outer"
        )
    for side, df in (("left", left), ("right", right)):
        if "__salt" in df.columns:
            raise ValueError(f"{side} input must not contain reserved column '__salt'")
    src = (
        F.hash(F.col(salt_source))
        if salt_source
        else F.hash(*[F.col(c) for c in left.columns])
    )
    l_salted = left.withColumn("__salt", F.pmod(src, F.lit(salt_buckets)))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l_salted.join(r_replicated, on=[on, "__salt"], how=how).drop("__salt")


def top_k(df: DataFrame, order_by: Sequence, k: int) -> DataFrame:
    """Global top-k: orderBy + limit. Spark plans TakeOrderedAndProject —
    each task keeps a k-row heap, the driver merges k*tasks rows; no global
    sort materializes even over billions of rows. ``order_by`` must be a
    total order (add a key tiebreak) to be deterministic."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return df.orderBy(*cols).limit(k)
