"""Cleaning operators (SURVEY.md sections 2.3-2.7).

Pure ``DataFrame -> DataFrame`` functions covering the reference's
projection / rename / null-fill / sanitize / cast / key-filter / dedup
surface. Every function is a thin declarative wrapper over built-in
column expressions, so Catalyst folds the whole chain into one projection
over the scan — nothing here adds a shuffle except the keyed dedup
(one exchange on its key, unavoidable by semantics).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.util import reject_reserved


# --------------------------------------------------------------------------
# Projection / rename (P1-P5)
# --------------------------------------------------------------------------


def select_columns(df: DataFrame, columns: Sequence[str], strict: bool = False) -> DataFrame:
    """P1 — manual column pruning (reference etl/etl.py:39-48).

    With ``strict=False`` missing columns are skipped, matching the
    reference's defensive ``if col in df.columns`` style
    (etl/transform_1.py:58-71).
    """
    if strict:
        return df.select(*columns)
    present = [c for c in columns if c in df.columns]
    return df.select(*present)


def drop_all_null_columns(
    df: DataFrame, essential: Sequence[str] = (), sample_fraction: float | None = None
) -> DataFrame:
    """P2/N5/A1 — drop columns whose every value is null
    (reference etl/transform_1.py:50-55).

    The reference runs an eager full-scan ``count().collect()`` to decide the
    projection; fine for metadata-sized results but the extra full pass hurts
    at 100 TB. ``sample_fraction`` bounds that pass: a column non-null in the
    sample is provably non-all-null; sampled-all-null columns are then
    re-checked exactly (only those columns are scanned, pruned read).
    """
    probe = df.sample(fraction=sample_fraction, seed=42) if sample_fraction else df
    counts = probe.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).collect()[0].asDict()
    candidates = [c for c in df.columns if counts[c] == 0 and c not in essential]
    if sample_fraction and candidates:
        recheck = df.agg(*[F.count(F.col(c)).alias(c) for c in candidates]).collect()[
            0
        ].asDict()
        candidates = [c for c in candidates if recheck[c] == 0]
    keep = [c for c in df.columns if c not in candidates]
    return df.select(*keep)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P3 — bulk rename (reference etl/transform_1.py:58-63, etl/etl.py:65-66)."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(dict(present))


def drop_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P5 — drop (reference etl/etl.py:86, etl/transform_1.py:84,110)."""
    return df.drop(*[c for c in columns if c in df.columns])


# --------------------------------------------------------------------------
# Null handling / sanitization (N1-N4)
# --------------------------------------------------------------------------


def fill_defaults(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """N1 — typed per-column default fill (reference etl/etl.py:50-58)."""
    present = {k: v for k, v in defaults.items() if k in df.columns}
    return df.fillna(present)


def cast_then_fill(
    df: DataFrame, columns: Sequence[str], to_type: str, default: object
) -> DataFrame:
    """N2 — cast to a type, then fill nulls with a default
    (reference etl/etl.py:59-62: string-cast then fillna "1970-01-01")."""
    out = df
    for c in columns:
        if c in df.columns:
            out = out.withColumn(c, F.col(c).cast(to_type))
    return out.fillna({c: default for c in columns if c in df.columns})


def normalize_decimal_comma(df: DataFrame, column: str, output: str | None = None) -> DataFrame:
    """N3 — decimal-comma string -> double
    (reference etl/transform_1.py:67: regexp_replace(',', '.') + cast)."""
    return df.withColumn(
        output or column,
        F.regexp_replace(F.col(column), ",", ".").cast("double"),
    )


def digits_to_long(df: DataFrame, column: str, output: str | None = None) -> DataFrame:
    """N4 — strip everything but digits and minus sign, cast to long
    (reference etl/transform_1.py:71: handles "12.345.678"-style thousands)."""
    return df.withColumn(
        output or column,
        F.regexp_replace(F.col(column), r"[^0-9-]", "").cast("long"),
    )


# --------------------------------------------------------------------------
# Casts / dates (C1-C5)
# --------------------------------------------------------------------------


def parse_date(
    df: DataFrame, column: str, output: str | None = None, fmt: str = "yyyy-MM-dd"
) -> DataFrame:
    """C4 — string -> date (reference etl/transform_1.py:74)."""
    return df.withColumn(output or column, F.to_date(F.col(column), fmt))


def format_date(
    df: DataFrame, column: str, output: str | None = None, fmt: str = "yyyy-MM-dd"
) -> DataFrame:
    """C5 — date/timestamp -> formatted string
    (reference etl/etl.py:85, etl/transform_1.py:89,109 — partition keys are
    stored as strings, promoted to temporal types only transiently)."""
    return df.withColumn(output or column, F.date_format(F.col(column), fmt))


# --------------------------------------------------------------------------
# Filters (F1-F2)
# --------------------------------------------------------------------------


def require_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """F1 — conjunctive null-rejection on key columns
    (reference etl/transform_1.py:79). Pushed to the scan by Catalyst."""
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond) if cond is not None else df


# --------------------------------------------------------------------------
# Deduplication (D1-D2)
# --------------------------------------------------------------------------


def distinct_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """D1 — full-row (or subset) distinct (reference etl/etl.py:49).

    One hash-aggregate shuffle with map-side partial aggregation — the
    scalable exact-dedup primitive.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """D2/W3 — keyed dedup keeping the first row per key by an explicit order.

    The reference orders by ``monotonically_increasing_id`` (etl/transform_1.py:82-84),
    which is nondeterministic across runs/partitionings; we require an
    explicit deterministic ``order_by`` (e.g. an ingest-sequence column) so
    results are oracle-testable (SURVEY.md section 7 "what's hard").

    Single exchange on ``keys``; at scale prefer this over
    ``groupBy(keys).agg(min_by(...))`` only when you need >1 surviving
    column ordering — min_by avoids the sort.
    """
    reject_reserved(df, "__rn")
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def clip_outliers_iqr(
    df: DataFrame,
    column: str,
    keys: Sequence[str] = (),
    k: float = 1.5,
    output: str | None = None,
    flag: str | None = None,
) -> DataFrame:
    """Tukey-fence winsorization: clip ``column`` into
    [q1 - k*IQR, q3 + k*IQR], computed EXACTLY (``percentile``, not an
    approximation) per ``keys`` group (or globally when no keys), so the
    result is engine-reproducible. ``flag`` optionally records which rows
    were clipped — the audit column a quality pipeline keeps.

    Scale posture: fences come from ONE aggregate over the fact
    (exact percentile needs a per-group sort internally but emits one row
    per group) and return via a join-back that AQE broadcasts when the
    group count is small — the clip itself is a map-side expression. For groups too hot for an exact per-group sort at
    extreme scale, swap ``percentile`` for ``percentile_approx`` — same
    plan, bounded-memory sketch."""
    out = output or column
    gcols = list(keys)
    fences = (
        df.groupBy(*gcols).agg(
            F.expr(f"percentile({column}, 0.25)").alias("__q1"),
            F.expr(f"percentile({column}, 0.75)").alias("__q3"),
        )
        .withColumn("__lo", F.col("__q1") - k * (F.col("__q3") - F.col("__q1")))
        .withColumn("__hi", F.col("__q3") + k * (F.col("__q3") - F.col("__q1")))
        .drop("__q1", "__q3")
    )
    # keyed fences are |groups|-proportional — no broadcast HINT (AQE
    # broadcasts small group counts); the global case is 1 row, hint safe
    joined = (
        df.join(fences, gcols, "left")
        if gcols
        else df.join(F.broadcast(fences))
    )
    clipped = F.least(F.greatest(F.col(column), F.col("__lo")), F.col("__hi"))
    # flag BEFORE clipping: with output == column the clip overwrites the
    # source, and a flag computed afterwards would compare the already
    # clipped value (never outside the fences)
    res = joined
    if flag:
        res = res.withColumn(
            flag,
            (F.col(column) < F.col("__lo")) | (F.col(column) > F.col("__hi")),
        )
    res = res.withColumn(out, clipped)
    return res.drop("__lo", "__hi")


def standard_scale(
    df: DataFrame,
    columns: Sequence[str],
    suffix: str = "_z",
) -> DataFrame:
    """Z-score standardization of numeric columns ((x - mean) / stddev_samp,
    NULL where stddev is 0 or undefined) — the feature-engineering
    normalizer. All means/stddevs ride ONE global aggregate, return via a
    1-row broadcast, and the scaling is a map-side expression: two scans
    total regardless of column count, no shuffle of the fact."""
    aggs = []
    for c in columns:
        aggs += [
            F.avg(F.col(c)).alias(f"__mu_{c}"),
            F.stddev_samp(F.col(c)).alias(f"__sd_{c}"),
        ]
    stats = df.agg(*aggs)
    res = df.join(F.broadcast(stats))
    for c in columns:
        res = res.withColumn(
            f"{c}{suffix}",
            F.when(
                F.col(f"__sd_{c}") > 0,
                (F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}"),
            ),
        )
    return res.drop(*[f"__mu_{c}" for c in columns], *[f"__sd_{c}" for c in columns])
