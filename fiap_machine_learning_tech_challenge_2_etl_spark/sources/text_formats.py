"""Tolerant CSV / JSON-lines sources and sinks.

The reference is parquet-only (SURVEY.md section 2.1) but its schema
posture is "declared yet tolerant": hand-written catalog schemas with
defensive in-flight guards (etl/transform_1.py:58-71) and string-typed
numerics cleaned later (etl/extract.py:47,49). These readers extend that
posture to the two text formats raw landing zones actually contain:
explicit schema (never inference — a schema-inference pass over millions
of landing files is a full extra scan at 100 TB), PERMISSIVE mode, and a
``_corrupt_record`` column so malformed rows are quarantined as data
instead of killing the job. Pair with ``quarantine_corrupt`` to split the
good rows from the reject stream (audit sink), mirroring the reference's
never-fail cleaning stages (fillna/regex sanitize) at the ingest boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with explicit schema + permissive corrupt-row capture.

    Malformed rows land with data columns null and the raw line in
    ``_corrupt_record`` — the 100 TB-safe failure mode (quarantine, don't
    abort; no driver-side retry loops over bad files).
    """
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """JSON-lines scan with explicit schema + permissive corrupt-row capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
) -> DataFrame:
    """XML scan (Spark 4 native ``xml`` source, the merged spark-xml) with
    explicit schema + permissive corrupt-row capture — same posture as the
    CSV/JSONL readers: never infer (inference is a full extra scan over
    the landing zone), never abort on a malformed element."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows"
) -> None:
    """XML sink — legacy-system interchange exports, not the analytic
    store (one <row> element per record under a <rows> root per file)."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).save(path)


def quarantine_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a permissive read into (clean rows sans corrupt col, reject rows).

    Spark forbids plans that read ONLY ``_corrupt_record`` off a raw
    text scan (the scan can't know a row is corrupt without parsing the
    other columns), so the split caches the parsed scan — one pass over
    the files feeds both branches. The cache is the per-batch micro-batch
    or landing-zone slice, not the whole 100 TB table: quarantine runs at
    the ingest boundary where inputs are batch-sized; unpersist after the
    two branches are written.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, rejects


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink (gzip) — interchange exports, not the analytic store."""
    df.write.mode("overwrite").option("header", header).option(
        "compression", "gzip"
    ).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (gzip) — the LLM-corpus interchange format."""
    df.write.mode("overwrite").option("compression", "gzip").json(path)
