"""Slowly-changing-dimension history building (SCD Type 2).

The reference's upsert path (etl/etl.py:94-107, Glue UPDATE_IN_DATABASE)
keeps only the LATEST row per key — Type 1 semantics. Type 2 is the other
half every warehouse ETL needs: keep every historical value with a
[valid_from, valid_to) validity window, so any past point-in-time state is
reconstructable. Built declaratively from a change log:

1. order each key's rows by (change_ts, tiebreak);
2. keep only rows where any tracked attribute differs from the previous
   row's (run-length compression of the attribute tuple — consecutive
   duplicates carry no information);
3. ``valid_to`` = next surviving row's ``valid_from`` (lead), NULL for the
   current row; ``version`` = row_number over survivors.

Scale posture: one hash exchange on the business key feeds both window
passes (change detection and lead/version run over the same partitioning
and ordering, so Catalyst plans a single Exchange + one Sort). State per
window function is O(1); a key with millions of versions streams through
its sorted partition without materializing the group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    change_ts: str,
    attrs: Sequence[str],
    tiebreak: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    version: str = "version",
    is_current: str = "is_current",
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals per key.

    ``df`` rows are observations of ``attrs`` at ``change_ts``; the output
    has one row per run of identical attribute values, with
    half-open validity [valid_from, valid_to) and ``valid_to IS NULL``
    marking the current version. ``tiebreak`` columns make the ordering
    total when one key has several observations at the same timestamp.
    """
    if not attrs:
        raise ValueError("scd2_history needs at least one tracked attribute")
    order_cols = [change_ts, *tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order_cols)

    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(w) == 1

    survivors = df.withColumn("__keep", first | changed).filter(F.col("__keep"))
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        survivors.select(
            *keys,
            *attrs,
            F.col(change_ts).alias(valid_from),
            F.lead(F.col(change_ts)).over(w2).alias(valid_to),
            F.row_number().over(w2).alias(version),
        )
        .withColumn(is_current, F.col(valid_to).isNull())
    )
