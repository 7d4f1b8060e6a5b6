"""Data profiling: per-column statistics and numeric histograms.

The reference's only profiling move is the all-null-column probe it runs
before projection (SURVEY.md §2.8 A1, reference etl/transform_1.py:53).
These operators generalize that into the corpus-QA profile a training-data
pipeline runs before/after every transform batch:

* ``profile_columns`` — one scan, ONE global aggregate: every per-column
  statistic (non-null count, distinct, min, max) is an aggregate
  expression in the same job, so the scan cost is paid once regardless of
  column count; the transpose to one-row-per-column happens on the
  already-tiny aggregate result via ``stack``. Never a per-column job, no
  driver loop over columns, no ``collect`` of row data.
* ``numeric_histogram`` — equi-width histogram: global min/max from a
  1-row aggregate, broadcast-joined back (a 1-row broadcast, not a
  driver round-trip), bucket index as a closed-form expression, then a
  hash aggregate over at most ``nbins`` groups. Two passes over the scan,
  both full-parallel, shuffle volume O(nbins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_nonnull, n_distinct, min_value,
    max_value) with min/max rendered as strings so heterogeneous column
    types stack into one result."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.count_distinct(F.col(c)).alias(f"__d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __d_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " as (column, n_nonnull, n_distinct, min_value, max_value)"
        )
    )


def numeric_histogram(df: DataFrame, column: str, nbins: int = 20) -> DataFrame:
    """Equi-width histogram of a numeric column: (bucket, lo, hi, n).
    The top boundary value folds into the last bucket (closed upper end)."""
    bounds = df.agg(
        F.min(F.col(column).cast("double")).alias("__lo"),
        F.max(F.col(column).cast("double")).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(nbins))
    # constant column => width 0: try_divide yields NULL (ANSI's plain /
    # throws DIVIDE_BY_ZERO) and every row folds to bucket 0 — coalesce
    # BEFORE least, which would silently skip the NULL and pick nbins-1
    bucket = F.least(
        F.coalesce(
            F.floor(
                F.try_divide(F.col(column).cast("double") - F.col("__lo"), width)
            ),
            F.lit(0),
        ),
        F.lit(nbins - 1),
    ).cast("int")
    return (
        df.filter(F.col(column).isNotNull())
        .join(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "__lo", "__hi")
        .groupBy("bucket", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.col("__lo") + F.col("bucket") * (F.col("__hi") - F.col("__lo")) / nbins, 6).alias("lo"),
            F.round(F.col("__lo") + (F.col("bucket") + 1) * (F.col("__hi") - F.col("__lo")) / nbins, 6).alias("hi"),
            "n",
        )
    )


def constraint_report(
    df: DataFrame,
    completeness: dict[str, float] | None = None,
    unique: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    references: dict[str, DataFrame] | None = None,
    min_rows: int | None = None,
    broadcast_refs: bool = True,
) -> DataFrame:
    """Deequ-style data-quality gate: evaluate declarative constraints in
    ONE aggregate pass and return a tall report
    ``(check, target, value, passed)``.

    Checks:
      * ``completeness={col: min_ratio}`` — non-null fraction >= threshold;
      * ``unique=[col]`` — distinct count == non-null count;
      * ``ranges={col: (lo, hi)}`` — every non-null value inside [lo, hi];
      * ``references={col: dim_df}`` — every non-null value exists in the
        (single-column) dimension frame — foreign-key containment;
      * ``min_rows=n`` — table has at least n rows.

    Scale posture: every scalar metric is an aggregate expression in the
    SAME ``df.agg`` — the fact scan is paid once no matter how many checks
    run (map-side partial aggregation, one 1-row result). Referential
    checks add one left-anti broadcast join per dimension — the common
    case is a curated small dim, so the fact side never shuffles; pass
    ``broadcast_refs=False`` when a reference is itself SF-proportional
    (e.g. customer as an FK target) and AQE will pick the strategy
    instead of forcing an executor-sized copy. No driver-side row data;
    the report itself is O(#checks) rows.
    """
    completeness = completeness or {}
    unique = unique or []
    ranges = ranges or {}
    references = references or {}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in completeness:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
    for c in unique:
        aggs += [
            F.count_distinct(F.col(c)).alias(f"__du_{c}"),
            F.count(F.col(c)).alias(f"__nu_{c}"),
        ]
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNotNull()
                    & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
                    1,
                ).otherwise(0)
            ).alias(f"__oob_{c}")
        )
    one = df.agg(*aggs)
    for c, dim in references.items():
        dcol = dim.columns[0]
        ref = F.broadcast(dim) if broadcast_refs else dim
        orphans = (
            df.select(F.col(c)).filter(F.col(c).isNotNull())
            .join(ref, F.col(c) == F.col(dcol), "left_anti")
            .agg(F.count(F.lit(1)).alias(f"__orph_{c}"))
        )
        one = one.join(F.broadcast(orphans))  # 1-row x 1-row

    rows = []
    rows.append(
        (
            F.lit("row_count"),
            F.lit("*"),
            F.col("__rows").cast("double"),
            F.col("__rows") >= F.lit(min_rows if min_rows is not None else 1),
        )
    )
    for c, thr in completeness.items():
        ratio = F.round(F.col(f"__nn_{c}") / F.col("__rows"), 6)
        rows.append((F.lit("completeness"), F.lit(c), ratio, ratio >= F.lit(thr)))
    for c in unique:
        rows.append(
            (
                F.lit("uniqueness"),
                F.lit(c),
                F.round(F.col(f"__du_{c}") / F.col(f"__nu_{c}"), 6),
                F.col(f"__du_{c}") == F.col(f"__nu_{c}"),
            )
        )
    for c in ranges:
        rows.append(
            (
                F.lit("range"),
                F.lit(c),
                F.col(f"__oob_{c}").cast("double"),
                F.col(f"__oob_{c}") == 0,
            )
        )
    for c in references:
        rows.append(
            (
                F.lit("referential_integrity"),
                F.lit(c),
                F.col(f"__orph_{c}").cast("double"),
                F.col(f"__orph_{c}") == 0,
            )
        )
    # assemble the tall report with ONE reference to the 1-row aggregate:
    # inline(array(struct...)) explodes every check from the same row. A
    # per-check select + unionAll would re-reference `one` — and DataFrame
    # plans have no subtree reuse, so the full fact scan + anti-joins
    # re-ran once PER CHECK (measured 15 source scans for a 10-check
    # report), breaking this function's own one-pass contract.
    entries = [
        F.struct(
            check.alias("check"),
            target.alias("target"),
            value.cast("double").alias("value"),
            passed.alias("passed"),
        )
        for check, target, value, passed in rows
    ]
    return one.select(F.inline(F.array(*entries)))


def psi_drift(
    base: DataFrame,
    cur: DataFrame,
    column: str,
    nbins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    snapshot of one numeric column — the standard drift monitor a feature/
    training-data pipeline runs between refreshes (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate).

    Bin edges are equi-width over the BASELINE's min/max (drift is
    measured against the reference binning, never re-fit on current —
    re-fitting would hide exactly the shift being measured); current rows
    outside the baseline range clamp into the edge bins. Each side's
    proportions are epsilon-floored before the log so an empty bin
    contributes a large-but-finite term. Returns one row per bucket
    (bucket, n_base, n_cur, psi_term) — SUM(psi_term) is the index, and
    the per-bucket terms show WHERE the mass moved.

    Scale posture: one 1-row bounds aggregate on the baseline
    (broadcast), closed-form bucket expression map-side on both scans,
    two hash aggregates of at most ``nbins`` groups, and an nbins-row
    join — no driver round-trip of row data at any size."""
    bounds = base.agg(
        F.min(F.col(column).cast("double")).alias("__lo"),
        F.max(F.col(column).cast("double")).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(nbins))

    def bucketize(df: DataFrame, n_name: str) -> DataFrame:
        bucket = F.greatest(
            F.lit(0),
            F.least(
                F.coalesce(
                    F.floor(
                        F.try_divide(
                            F.col(column).cast("double") - F.col("__lo"), width
                        )
                    ),
                    F.lit(0),
                ),
                F.lit(nbins - 1),
            ),
        ).cast("int")
        return (
            df.filter(F.col(column).isNotNull())
            .join(F.broadcast(bounds))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias(n_name))
        )

    b = bucketize(base, "n_base")
    c = bucketize(cur, "n_cur")
    joined = b.join(c, on="bucket", how="full").select(
        "bucket",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    # totals as a single-partition window over the nbins-row frame (NOT
    # the corpus) so `joined` appears ONCE in the plan — an agg+join-back
    # would recompute the whole corpus-aggregate subtree for the totals
    # branch (DataFrame plans have no CTE reuse; measured 8 source scans
    # instead of the two-pass minimum of 3)
    from pyspark.sql import Window

    w = Window.partitionBy()
    p_b = F.greatest(
        F.col("n_base") / F.sum("n_base").over(w).cast("double"), F.lit(eps)
    )
    p_c = F.greatest(
        F.col("n_cur") / F.sum("n_cur").over(w).cast("double"), F.lit(eps)
    )
    return joined.select(
        "bucket",
        "n_base",
        "n_cur",
        F.round((p_c - p_b) * F.log(p_c / p_b), 6).alias("psi_term"),
    )
