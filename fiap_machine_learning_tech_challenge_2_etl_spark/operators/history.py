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

from fiap_machine_learning_tech_challenge_2_etl_spark.util import reject_reserved


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
    reject_reserved(df, "__keep")
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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    change_col: str = "change",
) -> DataFrame:
    """Diff two snapshots of the same table into a change feed:
    one row per key that was inserted, deleted, or updated (unchanged rows
    are dropped). Emits the NEW image for insert/update and the OLD image
    for delete — i.e. CDC extraction from full dumps, the standard move
    when an upstream can only hand over complete snapshots.

    Scale posture: one full outer join hashed on the business key (both
    sides shuffle once; at 100 TB both sides would be bucketed on the key
    and the join carries no exchange), change classification and image
    selection are pure projections. Unchanged-row elimination happens
    BEFORE anything downstream, so the feed is O(changes), not O(table).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    reject_reserved(old, "__in_old", "__in_new")
    reject_reserved(new, "__in_old", "__in_new")
    # string-qualified refs ("o.col"), not DataFrame indexing: old and new
    # usually derive from the SAME source (two filters of one table), and
    # attribute-id refs trip Spark's ambiguous-self-join detection
    # literal presence markers, NOT key.isNotNull(): the key join is
    # null-safe (a NULL business key matches its counterpart), so testing
    # the key value would misclassify a null-key row present on BOTH
    # sides as an insert
    o = old.select(*keys, *compare_cols, F.lit(True).alias("__in_old")).alias("o")
    n = new.select(*keys, *compare_cols, F.lit(True).alias("__in_new")).alias("n")
    oc = lambda c: F.col(f"o.{c}")  # noqa: E731
    nc = lambda c: F.col(f"n.{c}")  # noqa: E731
    j = o.join(n, [oc(k).eqNullSafe(nc(k)) for k in keys], "full_outer")

    old_exists = oc("__in_old").isNotNull()
    new_exists = nc("__in_new").isNotNull()
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~oc(c).eqNullSafe(nc(c))

    change = (
        F.when(~old_exists, F.lit("insert"))
        .when(~new_exists, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    img = lambda c: F.when(new_exists, nc(c)).otherwise(oc(c))  # noqa: E731
    return (
        j.withColumn(change_col, change)
        .filter(F.col(change_col).isNotNull())
        .select(
            *[img(k).alias(k) for k in keys],
            *[img(c).alias(c) for c in compare_cols],
            change_col,
        )
    )


def apply_cdc(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC operation log (inserts/updates/deletes per key) into
    final table state: the LAST operation per key wins; keys whose last
    operation is a delete vanish. The batch replay of a CDC feed —
    completes the reference's delete-less upsert (etl/etl.py:94-107) into
    full merge semantics.

    One window pass (hash exchange on key + in-partition sort) picks the
    survivor row, one filter applies the tombstone. ``order_by`` must make
    the per-key ordering total or the winner is nondeterministic."""
    from pyspark.sql import Window

    reject_reserved(df, "__rn")
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != F.lit(delete_op))
        .drop("__rn")
    )
