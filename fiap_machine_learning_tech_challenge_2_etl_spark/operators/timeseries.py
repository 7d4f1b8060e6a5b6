"""Per-key time-series operators with genuinely recursive semantics.

EWMA (y_t = a*x_t + (1-a)*y_{t-1}) is the canonical operator Spark's
built-in window functions CANNOT express: the frame aggregates (sum/avg
over rowsBetween) are associative folds over the inputs, while EWMA is a
linear recurrence over its own output. This is exactly the case SURVEY.md
§7's rule reserves for ``applyInPandas``: Arrow-batched, grouped by key, a
vectorized pandas kernel per group — never a row-at-a-time Python UDF.

Scale posture: one shuffle on the grouping key; each group must fit in one
executor's memory (a per-user daily series is thousands of rows — fine).
For million-row single keys, switch to the segmented-scan formulation
(blockwise prefix products of (1-a) merged associatively) — same math,
two passes, no single-group materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.util import reject_reserved


def ewma(
    df: DataFrame,
    key: str,
    order_by: str,
    value: str,
    alpha: float,
    output: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per ``key``, ordered by
    ``order_by`` (y_0 = x_0; ``ewm(adjust=False)`` semantics).

    The recurrence is evaluated literally as ``a*x + (1-a)*y`` in float64 —
    NOT via pandas ``ewm``, whose running-weight formulation divides by the
    accumulated weight each step and therefore rounds differently in the
    last ulp (enough to flip a round(x, 6) at a boundary and break
    cross-engine value parity).

    NULL semantics match SQL's recursive-CTE formulation: a NULL (or NaN)
    input makes that row's EWMA NULL and poisons the rest of the key's
    tail — exactly the trajectory ``a*NULL + (1-a)*y`` produces in SQL.
    The kernel computes the identical trajectory in NaN arithmetic and
    converts NaN back to NULL on emit, so the two engines agree on the
    edge instead of diverging as NaN-vs-NULL.

    Execution shape: segmented scan, not per-group apply. The input is
    hash-partitioned on ``key`` and sorted within partitions on
    (key, order), then ONE ``mapInPandas`` call streams each partition's
    Arrow batches with a carry dict resuming groups that span batch
    boundaries. Compared to ``groupBy().applyInPandas`` (one Arrow
    exchange per GROUP — measured 3.5s at sf0.1 with ~1500 tiny groups)
    this pays per-BATCH overhead only and holds O(live keys) state, so a
    million small groups or one huge group both stream in bounded memory."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{in_fields}, {output} double"
    one_minus = 1.0 - alpha

    def fn(batches):
        import numpy as np

        carry: dict = {}
        for pdf in batches:
            vals = pdf[value].to_numpy(dtype="float64")
            keys = pdf[key].to_numpy()
            out = np.empty(len(vals))
            prev_key = object()
            acc = None
            for i in range(len(vals)):
                k = keys[i]
                if k != prev_key:
                    acc = carry.get(k)
                    prev_key = k
                acc = vals[i] if acc is None else alpha * vals[i] + one_minus * acc
                out[i] = acc
                carry[k] = acc
            # NaN (from a NULL/NaN input, propagated by the recurrence)
            # emits as NULL — the SQL recursive CTE's representation of
            # the same poisoned tail (astype Float64 maps NaN -> NA)
            yield pdf.assign(
                **{output: __import__("pandas").Series(out).astype("Float64")}
            )

    return (
        df.repartition(key)
        .sortWithinPartitions(key, order_by)
        .mapInPandas(fn, schema=schema)
    )


def coalesce_intervals(
    df: DataFrame,
    keys: list[str],
    start: str,
    end: str,
    out_start: str = "span_start",
    out_end: str = "span_end",
    out_count: str = "n_merged",
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal spans
    (interval union / "gaps and islands").

    A row opens a NEW span iff its start lies strictly after the running
    maximum end of all earlier rows in its key (ordered by start, then end
    for determinism); the span id is then the running count of such opens,
    and each span reduces to (min start, max end, row count). Touching
    intervals (next.start == prev.end) merge — the union of [a,b] and
    [b,c] is one contiguous [a,c].

    Scale posture: ONE hash exchange on ``keys`` feeds both window passes
    and the final aggregate (same partitioning expression throughout), so
    at any corpus size this is a single shuffle + two in-partition sorted
    scans. No per-group materialization: window state is one running max
    and one running sum.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(start, end)
    prev_max_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start) > prev_max_end), 1
    ).otherwise(0)
    span_id = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    reject_reserved(df, "__span")
    return (
        df.withColumn("__span", span_id)
        .groupBy(*keys, "__span")
        .agg(
            F.min(start).alias(out_start),
            F.max(end).alias(out_end),
            F.count(F.lit(1)).alias(out_count),
        )
        .drop("__span")
    )
