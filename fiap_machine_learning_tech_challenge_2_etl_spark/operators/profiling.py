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
    bucket = F.least(
        F.floor((F.col(column).cast("double") - F.col("__lo")) / width),
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
