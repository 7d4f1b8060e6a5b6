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
    cross-engine value parity)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{in_fields}, {output} double"
    one_minus = 1.0 - alpha

    def fn(pdf):
        import numpy as np

        pdf = pdf.sort_values(order_by)
        vals = pdf[value].to_numpy(dtype="float64")
        out = np.empty(len(vals))
        acc = 0.0
        for i, v in enumerate(vals):
            acc = v if i == 0 else alpha * v + one_minus * acc
            out[i] = acc
        pdf[output] = out
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema=schema)
