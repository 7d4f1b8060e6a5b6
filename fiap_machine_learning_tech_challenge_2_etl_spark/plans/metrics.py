"""Zero-cost pipeline metrics via ``DataFrame.observe``.

The reference decides its all-null-column projection with an EAGER
``count().collect()`` before the real job (etl/transform_1.py:53) and logs
row counts with extra actions (etl/transform_1.py:104-105) — each one a full
extra scan at 100 TB. ``observe`` attaches named aggregates to the SAME
plan: metrics are computed as rows stream through the one job that was
already running, and read back after the action for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    key_cols: Sequence[str] = (),
    name: str = "pipeline_metrics",
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-key-column null-count metrics to the plan.

    Returns (df, observation); run any action on the returned df, then read
    ``observation.get`` — e.g. to alert on null-rate regressions or decide
    projections without the reference's extra eager scan.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs
