"""Catalog / DDL layer (SURVEY.md section 2.11, G1-G7).

The reference manages a Glue Data Catalog with boto3: idempotent database and
external-table creation (etl/extract.py:67-102), paginated partition listing
(etl/extract.py:105-113), partition discovery by storage listing + regex
(etl/extract.py:116-125), incremental partition inference from one URI
(etl/extract.py:128-132), set-difference registration (etl/extract.py:182-183),
and batched creation with exponential-backoff retry (etl/extract.py:135-159).

Here the same operations are Spark SQL DDL on the session catalog — portable
to a Hive metastore (enableHiveSupport) or Spark's built-in catalog without
code changes. The retry/backoff shape is kept for remote metastores, where
throttling is the same failure mode the reference guards against.
"""

from __future__ import annotations

import re
import time
from collections.abc import Mapping, Sequence

from pyspark.sql import Row, SparkSession
from pyspark.sql import types as T


def _q(ident: str) -> str:
    return "`" + ident.replace("`", "``") + "`"


def _qv(value: str) -> str:
    """Quote a partition VALUE for DDL. Values can arrive from external
    file URIs (infer_partition_from_uri -> register_incremental), so a
    single quote must not break out of — or inject into — the statement."""
    return "'" + str(value).replace("'", "''") + "'"


def ensure_database(spark: SparkSession, database: str, location: str | None = None) -> None:
    """G1 — idempotent database creation (reference etl/extract.py:67-74
    swallows AlreadyExistsException; IF NOT EXISTS is the DDL equivalent)."""
    loc = f" LOCATION {_qv(location)}" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_q(database)}{loc}")


def ensure_external_table(
    spark: SparkSession,
    database: str,
    table: str,
    schema: T.StructType,
    partition_by: Sequence[str],
    location: str,
    fmt: str = "parquet",
) -> None:
    """G2 — idempotent external partitioned table (reference
    etl/extract.py:77-102 builds a StorageDescriptor + SerDe by hand; Spark
    DDL carries the same information declaratively).

    Partition columns must come from ``schema`` and are moved to the
    PARTITIONED BY clause (directory-encoded, not stored in files) —
    matching the reference's split of `columns` vs `partition keys`.
    PARTITIONED BY follows the ``partition_by`` ORDER (it sets the
    directory nesting — day/hour and hour/day are different layouts), not
    the schema's field order, and a partition key missing from ``schema``
    raises instead of silently creating a table unpartitioned on it.
    """
    fields = {f.name: f for f in schema.fields}
    missing = [k for k in partition_by if k not in fields]
    if missing:
        raise ValueError(f"partition columns {missing} not in schema")
    part_set = set(partition_by)
    data_cols = ", ".join(
        f"{_q(f.name)} {f.dataType.simpleString()}"
        for f in schema.fields
        if f.name not in part_set
    )
    part_cols = ", ".join(
        f"{_q(k)} {fields[k].dataType.simpleString()}" for k in partition_by
    )
    partitioned = f" PARTITIONED BY ({part_cols})" if part_cols else ""
    spark.sql(
        f"CREATE EXTERNAL TABLE IF NOT EXISTS {_q(database)}.{_q(table)} "
        f"({data_cols}) USING {fmt}{partitioned} LOCATION {_qv(location)}"
    )


def list_partitions(
    spark: SparkSession, database: str, table: str
) -> list[dict[str, str]]:
    """G3 — registered partitions as key->value dicts (reference
    etl/extract.py:105-113 paginates get_partitions; SHOW PARTITIONS returns
    the same set in one call)."""
    rows: list[Row] = spark.sql(
        f"SHOW PARTITIONS {_q(database)}.{_q(table)}"
    ).collect()
    out = []
    for r in rows:
        spec = {}
        for kv in r["partition"].split("/"):
            k, _, v = kv.partition("=")
            spec[k] = v
        out.append(spec)
    return out


def repair_table(spark: SparkSession, database: str, table: str) -> None:
    """G4 — discover partitions from storage layout (reference
    etl/extract.py:116-125 lists S3 keys against a regex; MSCK REPAIR walks
    the table location and registers every date=... style directory)."""
    spark.sql(f"MSCK REPAIR TABLE {_q(database)}.{_q(table)}")


# partition-spec inference from a single landed-file URI (G5) — the same
# regexes the reference applies to event URIs (etl/extract.py:60,128-132;
# etl/load.py:75,114-118), generalized to any key=value path segments.
_PART_SEG_RE = re.compile(r"([^/=]+)=([^/]+)/")


def infer_partition_from_uri(uri: str, keys: Sequence[str]) -> dict[str, str] | None:
    """G5 — parse partition values out of one file URI; None if any key is
    missing (caller falls back to full discovery, as the reference does)."""
    found = dict(_PART_SEG_RE.findall(uri if uri.endswith("/") else uri + "/"))
    if all(k in found for k in keys):
        return {k: found[k] for k in keys}
    return None


def add_partitions(
    spark: SparkSession,
    database: str,
    table: str,
    partitions: Sequence[Mapping[str, str]],
    batch_size: int = 100,
    max_retries: int = 5,
) -> int:
    """G6/G7 — register only missing partitions, batched with retry.

    Reference semantics: wanted minus existing, sorted (etl/extract.py:182-183),
    batches of 100, <=5 retries with exponential backoff capped at 32s
    (etl/extract.py:135-159). One ALTER TABLE ADD IF NOT EXISTS statement
    registers a whole batch. Returns the number of newly-registered specs.
    """
    existing = {tuple(sorted(p.items())) for p in list_partitions(spark, database, table)}
    wanted = [
        dict(t)
        for t in sorted(
            {tuple(sorted(p.items())) for p in partitions} - existing
        )
    ]
    if not wanted:
        return 0
    for i in range(0, len(wanted), batch_size):
        batch = wanted[i : i + batch_size]
        specs = " ".join(
            "PARTITION ("
            + ", ".join(f"{_q(k)}={_qv(v)}" for k, v in sorted(p.items()))
            + ")"
            for p in batch
        )
        stmt = f"ALTER TABLE {_q(database)}.{_q(table)} ADD IF NOT EXISTS {specs}"
        for attempt in range(max_retries):
            try:
                spark.sql(stmt)
                break
            except Exception:  # noqa: BLE001 — throttling-style transient errors
                if attempt == max_retries - 1:
                    raise
                time.sleep(min(2**attempt, 32))
    return len(wanted)


def register_incremental(
    spark: SparkSession,
    database: str,
    table: str,
    uri: str,
    keys: Sequence[str],
) -> int:
    """EP2 extract flow for one landed file: infer the partition from the
    URI, register just it; fall back to a full repair when the URI doesn't
    encode the partition (reference etl/extract.py:166-201)."""
    spec = infer_partition_from_uri(uri, keys)
    if spec is None:
        repair_table(spark, database, table)
        return -1
    return add_partitions(spark, database, table, [spec])
