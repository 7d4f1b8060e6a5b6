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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def top_k(df: DataFrame, order_by: Sequence, k: int) -> DataFrame:
    """Global top-k: orderBy + limit. Spark plans TakeOrderedAndProject —
    each task keeps a k-row heap, the driver merges k*tasks rows; no global
    sort materializes even over billions of rows. ``order_by`` must be a
    total order (add a key tiebreak) to be deterministic."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return df.orderBy(*cols).limit(k)
