"""Window analytics (SURVEY.md section 2.9, W1-W6) — the reference's
analytical core.

Exchange-reuse layout (SURVEY.md section 4): the reference interleaves
windows keyed on different columns (etl/etl.py:70-83 ping-pongs between
``(codigo_acao)`` and ``(data_pregao, setor)``), forcing Catalyst to plan an
exchange per key change. Our ``rolling_stats`` computes ALL same-key rolling
aggregates in one projection over one Window spec (one exchange + one sort),
and callers should group same-key window stages adjacently so Catalyst's
ReuseExchange kicks in.

Scale notes: a window partitioned by a high-cardinality key (stock code,
user_id) scales linearly — each key's rows land in one task. Whole-partition
windows (group_total) on low-cardinality keys can skew; for pure aggregates
prefer groupBy + broadcast join back when the per-group row count is huge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec


from fiap_machine_learning_tech_challenge_2_etl_spark.util import reject_reserved as _reject_reserved


def _rolling_window(keys: Sequence[str], order_by: Sequence[str], n: int) -> WindowSpec:
    """Frame ``rowsBetween(-(n-1), 0)`` — trailing n rows including current
    (reference etl/transform_1.py:93; short partitions use available rows)."""
    return (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(-(n - 1), 0)
    )


def rolling_stats(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    n: int = 7,
    stats: Sequence[str] = ("mean", "median", "std", "max", "min"),
    suffix: str | None = None,
    exact_median: bool = True,
) -> DataFrame:
    """W1/W5 — trailing-n-row stats bundle per key.

    Reference computes mean/median/stddev/max/min over
    ``rowsBetween(-(window_days-1), 0)`` partitioned by stock code
    (etl/transform_1.py:93-99) and a 7-row moving average
    (etl/etl.py:70-76). All requested stats share ONE WindowSpec, so the
    plan has a single exchange+sort regardless of how many are computed.

    ``exact_median=True`` computes the exact interpolated median (the
    reference's ``percentile_approx(part, 0.5)`` at etl/transform_1.py:96 is
    approximate — fine at scale, wrong for oracle diffing; both variants are
    exposed). Spark's ``median`` aggregate rejects window frames, so the
    exact rolling median is a sorted frame snapshot (``array_sort`` over
    ``collect_list`` of the <=n frame rows) with midpoint interpolation —
    all built-in expressions, O(n log n) per row for the tiny frame, still
    whole-stage-codegen-friendly and fully distributed.
    """
    w = _rolling_window(keys, order_by, n)
    sfx = suffix if suffix is not None else f"_{value}_{n}"
    col = F.col(value)

    def exact_median_expr():
        # collect_list drops NULLs, so an all-NULL frame is EMPTY: the lo
        # index computes to 0, which element_at rejects even in ANSI's try_
        # variant — clamp to 1 and let try_element_at return NULL past the
        # end, so the median is NULL exactly where percentile_approx's is.
        arr = F.array_sort(F.collect_list(col).over(w))
        sz = F.size(arr)
        lo = F.try_element_at(
            arr, F.greatest(F.lit(1), ((sz + 1) / 2).cast("int"))
        )
        hi = F.try_element_at(
            arr, F.greatest(F.lit(1), (sz / 2 + 1).cast("int"))
        )
        return (lo + hi) / 2.0

    exprs = {
        "mean": lambda: F.avg(col).over(w),
        "median": (
            exact_median_expr
            if exact_median
            else lambda: F.expr(f"percentile_approx({value}, 0.5)").over(w)
        ),
        "std": lambda: F.stddev(col).over(w),
        "max": lambda: F.max(col).over(w),
        "min": lambda: F.min(col).over(w),
        "sum": lambda: F.sum(col).over(w),
        "count": lambda: F.count(col).over(w),
    }
    additions = {f"{s}{sfx}": exprs[s]() for s in stats}
    return df.withColumns(additions)


def moving_average(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    n: int = 7,
    output: str | None = None,
) -> DataFrame:
    """W1 — n-row trailing moving average (reference etl/etl.py:70-76)."""
    w = _rolling_window(keys, order_by, n)
    return df.withColumn(output or f"avg_{value}_{n}", F.avg(F.col(value)).over(w))


def group_total(
    df: DataFrame, value: str, keys: Sequence[str], output: str | None = None
) -> DataFrame:
    """W2 — whole-partition sum attached to every detail row
    (reference etl/etl.py:78-83: total per (data_pregao, setor)).

    Window with no frame/order = whole-partition aggregate; keeps detail
    rows, unlike groupBy. One exchange on ``keys``.
    """
    w = Window.partitionBy(*keys)
    return df.withColumn(output or f"total_{value}", F.sum(F.col(value)).over(w))


def group_min(
    df: DataFrame, value: str, keys: Sequence[str], output: str | None = None
) -> DataFrame:
    """W4 — per-key min attached to rows (reference etl/transform_1.py:87-90:
    ``initial_date`` = min(reference_date) over (code))."""
    w = Window.partitionBy(*keys)
    return df.withColumn(output or f"min_{value}", F.min(F.col(value)).over(w))


def rank_in_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    output: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """W3 — ranking within key groups (reference etl/transform_1.py:82-84).

    ``order_by`` must be deterministic (see cleaning.dedup_keep_first for the
    monotonically_increasing_id caveat).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(output, fn().over(w))


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
) -> DataFrame:
    """Fixed (tumbling) time-window aggregation via ``F.window`` — the
    batch twin of the Structured Streaming windowed agg (same expression
    works on a stream with a watermark; see streaming.incremental). One
    hash-agg shuffle on (window, keys); window assignment is a pure
    projection, so partial aggregation stays map-side."""
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("win"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence = (),
) -> DataFrame:
    """Session-window aggregation via ``F.session_window`` (merge rows per
    key whose gaps are < ``gap``) — batch twin of the streaming session
    window. Equivalent to the classic gaps-and-islands SQL (lag + running
    island id), which is what the DuckDB oracle runs."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("sess"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("sess.start"))
        .drop("sess")
    )


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence,
    k: int,
) -> DataFrame:
    """Top-k rows per group (extension; SURVEY.md section 2.13).

    row_number + filter: Spark plans this as a partial top-k per input
    partition before the shuffle when the filter bounds the rank
    (WindowGroupLimit in the physical plan) — scales to huge groups.
    ``order_by`` may contain column names or Column expressions
    (e.g. F.col("v").desc()).
    """
    _reject_reserved(df, "__rn")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "global_rn",
    num_parts: int | None = None,
) -> DataFrame:
    """Global 1-based row number over a TOTAL order — WITHOUT the
    single-task trap. ``row_number() OVER (ORDER BY ...)`` with no
    PARTITION BY pulls the whole dataset through ONE window task; this
    operator instead does the classic two-pass distributed rank:

    1. ``repartitionByRange`` on the full sort key (range exchange — the
       parallel total-order primitive; boundary placement may vary with
       sampling, but correctness never depends on where the cuts land);
    2. per-partition ``row_number`` (partitioned window, parallel);
    3. per-partition counts -> running offsets (a window over
       ``num_parts`` ROWS, metadata-sized) broadcast back and added.

    ``order_cols`` must be a TOTAL order (include a unique tiebreak) or
    ranks within ties are partition-placement-dependent.
    """
    _reject_reserved(df, "__pid", "__lrn", "__off")
    spark = df.sparkSession
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint (lazy) pins the range exchange: the RangePartitioner
    # samples boundaries with an RDD-id-derived seed, so if the ranked
    # branch and the offsets branch each re-ran the exchange (ReuseExchange
    # not firing — column pruning differentiating the subtrees, reuse
    # disabled), __pid could differ between branches and the broadcast
    # offsets would silently mismatch the local ranks. Materializing once
    # makes both branches read the SAME partitions by construction.
    base = (
        df.repartitionByRange(parts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("__pid").orderBy(*cols)
    d = base.withColumn("__lrn", F.row_number().over(w_local))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # offsets branch hangs off the checkpointed frame: the rank window
    # never runs on it (one Window in the whole plan) and the __pid window
    # is metadata-sized (num_parts rows)
    offs = (
        base.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )
    return (
        d.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def ntile_from_rank(rn_col: str, n_total_col: str, k: int):
    """Exact SQL NTILE(k) from a precomputed global rank: bucket sizes
    differ by at most one, larger buckets first — pure integer arithmetic,
    so it matches any engine's native ntile over the same total order.
    (Pair with global_row_number to get a DISTRIBUTED ntile.)"""
    rn, n = F.col(rn_col), F.col(n_total_col)
    r = n % k
    cut = r * (F.expr(f"{n_total_col} div {k}") + 1)
    return (
        F.when(rn <= cut, F.expr(f"({rn_col} - 1) div ({n_total_col} div {k} + 1) + 1"))
        .otherwise(
            r
            + F.expr(
                f"CASE WHEN {n_total_col} div {k} = 0 THEN 0 "
                f"ELSE ({rn_col} - 1 - ({n_total_col} % {k}) * ({n_total_col} div {k} + 1)) "
                f"div ({n_total_col} div {k}) END"
            )
            + 1
        )
        .cast("long")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: Sequence[str],
    val_col: str,
    out_col: str = "cum_sum",
    num_parts: int | None = None,
) -> DataFrame:
    """Running total over a global total order, distributed the same way
    as global_row_number: range exchange, per-partition running sum
    (partitioned window — parallel), then per-partition TOTALS become
    broadcast offsets added map-side. ``sum() OVER (ORDER BY ...)`` with
    no PARTITION BY would serialize the whole input through one task.

    ``val_col`` should be an exact type (BIGINT/decimal): the partial-sum
    regrouping changes float summation order, but integer sums are
    order-free. ``order_cols`` must be a total order (unique tiebreak)."""
    _reject_reserved(df, "__pid", "__lcs", "__off")
    spark = df.sparkSession
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) for c in order_cols]
    # lazy localCheckpoint pins __pid across both branches — see
    # global_row_number for why relying on ReuseExchange alone is unsafe
    base = (
        df.repartitionByRange(parts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = base.withColumn("__lcs", F.sum(val_col).over(w_local))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        base.groupBy("__pid")
        .agg(F.sum(val_col).alias("__t"))
        .withColumn("__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )
    return (
        d.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lcs")).cast("long"))
        .drop("__pid", "__lcs", "__off")
    )
