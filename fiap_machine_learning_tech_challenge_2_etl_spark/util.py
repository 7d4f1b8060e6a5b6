"""Parallelism + input-validation utilities shared by operators."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Spark SQL interval unit keywords (singular; plural accepted too).
_INTERVAL_UNITS = frozenset(
    {
        "year",
        "month",
        "week",
        "day",
        "hour",
        "minute",
        "second",
        "millisecond",
        "microsecond",
    }
)
# fractional magnitudes are legal SQL ("INTERVAL 0.5 SECONDS" parses);
# rejecting them here would narrow behavior callers had before validation
_INTERVAL_PAIR = re.compile(r"^\d+(\.\d+)?$")


def validate_interval_body(value: str, param: str) -> str:
    """Validate a SQL INTERVAL body (e.g. ``"24 HOURS"``,
    ``"1 HOUR 30 MINUTES"``) BEFORE it is interpolated into ``F.expr``.

    ``F.expr(f"INTERVAL {value}")`` is lazy — a malformed body only fails
    at analysis time with a generic parse error far from the call site
    (and naming no parameter). Fail eagerly here with the parameter name
    instead. Negative magnitudes are rejected by shape (callers that want
    a dedicated negative-value message check sign first). Returns the
    value unchanged so call sites can validate inline."""
    tokens = value.split()
    ok = len(tokens) >= 2 and len(tokens) % 2 == 0
    if ok:
        for mag, unit in zip(tokens[::2], tokens[1::2]):
            if not _INTERVAL_PAIR.match(mag):
                ok = False
                break
            if unit.lower().rstrip("s") not in _INTERVAL_UNITS:
                ok = False
                break
    if not ok:
        raise ValueError(
            f"{param} must be a SQL INTERVAL body like '24 HOURS' or "
            f"'1 HOUR 30 MINUTES', got {value!r}"
        )
    return value


def reject_reserved(df: DataFrame, *names: str) -> None:
    """Refuse inputs that already carry an operator's internal temp
    columns — ``withColumn`` would silently overwrite user data and the
    closing ``drop()``/``select`` would then delete or corrupt it (the
    contract established by ``sinks.upsert_by_key``'s __is_new/__rn
    guard). Raise loudly instead of producing a silently-wrong result."""
    hit = [n for n in names if n in df.columns]
    if hit:
        raise ValueError(f"input must not contain reserved column(s) {hit}")


def spread(df: DataFrame, by: str | None = None) -> DataFrame:
    """Ensure ``df`` carries at least the cluster's default parallelism
    before compute-heavy per-row work (hashing, shingle explodes, regex
    sweeps, vectorized UDF blocks).

    A small input — one tiny file, a single parquet row group — otherwise
    pins the whole downstream stage to ONE task no matter how many cores
    exist, because explode/withColumn never add partitions. The check uses
    ``inputFiles()`` (driver-side plan metadata: no job, no RDD conversion —
    ``df.rdd.getNumPartitions()`` costs ~1 s per call and can trigger AQE
    stage materialization), so on a real cluster, where inputs already span
    at least as many files as cores, this is a no-op and no blind shuffle is
    introduced. The explicit partition count also keeps AQE from coalescing
    the exchange back down to one task on small data.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # streaming / un-plannable inputs: leave untouched
        return df
    if n_files >= target:
        return df
    # Stacked ops that each call spread() (token stats -> quality ->
    # language id in one pipeline) would otherwise each add a full-width
    # round-robin exchange shipping the corpus again — the r16 plan audit
    # found corpus_clean_pipeline carrying THREE spread exchanges where
    # its docstring promised one shuffle total (guide §2.4: remove
    # shuffles outright). inputFiles() cannot see an upstream
    # repartition, so check the logical plan for one that already fans
    # this lineage out to >= target partitions; smaller fixture
    # repartitions (repartition(1)/(4) file-count shaping) don't count.
    try:
        tree = df._jdf.queryExecution().logical().treeString()
        for m in _REPARTITION_N.finditer(tree):
            if int(m.group(1) or m.group(2)) >= target:
                return df
    except Exception:  # Connect sessions etc.: fall through to repartition
        pass
    return df.repartition(target, by) if by is not None else df.repartition(target)


# "Repartition 32, true" (round robin) / "RepartitionByExpression [c], 32"
_REPARTITION_N = re.compile(
    r"Repartition (\d+), |RepartitionByExpression \[[^\]]*\], (\d+)"
)


# pandas-safe field types for local_relation_df: types whose Python ->
# pandas -> Arrow round trip is value-faithful (EXACT simpleString match —
# a prefix test would let "interval" ride in on "int"). Floating point is
# EXCLUDED by default: pandas cannot distinguish NaN from NULL in a float
# column, so a collected NaN would silently become NULL through the Arrow
# conversion (verified live in this container). Nested/binary/decimal
# types take the pickle path for the same "exact by construction" reason.
_LOCAL_REL_SAFE_TYPES = frozenset(
    {
        "tinyint",
        "smallint",
        "int",
        "bigint",
        "string",
        "boolean",
        "date",
        "timestamp",
        "timestamp_ntz",
    }
)


def local_relation_df(spark, rows, schema, nan_safe_floats: bool = False) -> DataFrame:
    """Build a small literal DataFrame as a JVM ``LocalRelation`` when the
    types allow it, else fall back to ``spark.createDataFrame(rows, ...)``.

    ``spark.createDataFrame(list_of_rows)`` plans as a ``LogicalRDD`` over
    a pickled ``ParallelCollectionRDD``: every ACTION that evaluates the
    frame round-trips a Python worker to unpickle the rows (measured
    ~0.3-0.5 s per action warm, ~2 s cold on this box) — pure guide-§4
    boundary tax for data the driver already holds. The pandas path plans
    as a ``LocalRelation``: rows are converted driver-side via Arrow once,
    tasks never touch Python. Used for the <=128-row literal frames on the
    merge/report hot paths; the declared ``schema`` (a StructType or DDL
    string accepted by createDataFrame) pins the result schema either way,
    so callers see identical frames — only the physical plan differs.

    ``nan_safe_floats=True`` lets float/double columns take the
    LocalRelation path too — callers assert their float values are never
    NaN (e.g. wall-clock timestamps), which is the one value the pandas
    conversion cannot carry faithfully.
    """
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        names = schema.fieldNames()
        simple = [f.dataType.simpleString() for f in schema.fields]
    else:
        parsed = T_struct_from_ddl(schema)
        names = parsed.fieldNames()
        simple = [f.dataType.simpleString() for f in parsed.fields]
    safe = _LOCAL_REL_SAFE_TYPES
    if nan_safe_floats:
        safe = safe | {"float", "double"}
    if all(s in safe for s in simple):
        try:
            import pandas as pd

            pdf = pd.DataFrame.from_records(list(rows), columns=names)
            return spark.createDataFrame(pdf, schema)
        except Exception:
            pass  # fall through to the exact pickle path
    return spark.createDataFrame(list(rows), schema)


def T_struct_from_ddl(ddl: str):
    """Parse a DDL schema string to StructType (shared by
    local_relation_df; kept tiny to avoid importing pyspark.sql.types at
    module import for the common StructType-argument case)."""
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)
