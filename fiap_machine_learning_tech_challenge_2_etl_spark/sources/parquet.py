"""Parquet scan operators (SURVEY.md section 2.1, S1-S4).

The reference reads parquet three ways: a recursive directory scan
(etl/transform.py:20-28), a single-file incremental scan (etl/etl.py:25-33),
and a catalog-table scan (etl/transform_1.py:43-46). All three collapse to
``spark.read.parquet`` / ``spark.table`` here — Catalyst handles partition
discovery, column pruning, and predicate pushdown on the scan.

Scale notes (100 TB): pass explicit ``schema`` to skip footer-sampling schema
inference over millions of files; partition-directory layouts get pruned by
Catalyst when filters hit the partition columns; ``read_parquet_files`` is the
incremental path — reading only the newly-landed files is the single biggest
lever at scale (the reference does the same via its Lambda-supplied URI).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

try:  # the listing probe's failure seam — py4j ships with pyspark
    from py4j.protocol import Py4JError as _Py4JError
except ImportError:  # pragma: no cover — py4j is a pyspark hard dep
    _Py4JError = OSError

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fiap_machine_learning_tech_challenge_2_etl_spark.util import local_relation_df
from fiap_machine_learning_tech_challenge_2_etl_spark.schemas import NS_TIMESTAMP_COLUMNS, SCHEMAS


def read_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S1 — recursive directory scan over (possibly Hive-partitioned) parquet.

    Mirrors reference etl/transform.py:20-28 (connection_options recurse=True,
    which reads nested NON-Hive layouts like ``.../2024/01/*.parquet`` too).
    Spark needs opposite settings for the two layouts — partition discovery
    recurses ``key=value`` dirs but silently skips plain nested dirs (an
    explicit schema turns that into a 0-row read, schemaless into an
    inference error), while ``recursiveFileLookup=true`` reads plain nested
    dirs but DISABLES partition inference — so ``recursive=True`` probes ONE
    shallow directory listing and picks the right mode. The probe is a
    single FileSystem RPC on the root, scheme-agnostic (s3a/hdfs/file)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if recursive and _probe_layout(spark, path) == "plain":
        reader = reader.option("recursiveFileLookup", "true")
    return reader.parquet(path)


def _probe_layout(spark, path: str) -> str:
    """One shallow listing of ``path`` -> ``"plain"`` (subdirectories, none
    Hive-style — needs ``recursiveFileLookup``), ``"hive"`` (all
    subdirectories are ``key=value`` — needs partition discovery), or
    ``"flat"`` (no subdirectories — either mode works; use the default).
    Hidden entries (``_temporary``, ``.``-prefixed) are ignored, matching
    Spark's own file-listing rules.

    A MIXED root (both kinds of subdirectory) RAISES: partition discovery
    would silently skip the plain dirs' rows (the exact silent-0-row read
    this probe exists to prevent) and ``recursiveFileLookup`` would read
    the Hive dirs' files without their partition columns — no single
    reader mode is correct, so fail loudly and make the caller split the
    root. Probe failures are narrowed to py4j/OS errors from the listing
    RPC itself (missing path, permission, remote FS quirk) and fall back
    to ``"flat"``: the default reader then errors loudly on a genuinely
    unreadable root rather than changing semantics."""
    try:
        jvm = spark._jvm
    except AttributeError:
        # Spark Connect sessions expose no _jvm (PySparkAttributeError is
        # an AttributeError subclass). Without a driver-side FileSystem RPC
        # the probe can't run; fall back to the default reader mode, which
        # still reads flat and Hive layouts correctly and errors loudly on
        # an unreadable root.
        return "flat"
    try:
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        subdirs = [
            s.getPath().getName()
            for s in fs.listStatus(jpath)
            if s.isDirectory()
        ]
    except (_Py4JError, OSError):  # unreadable/missing/remote root
        return "flat"
    subdirs = [n for n in subdirs if not n.startswith(("_", "."))]
    if not subdirs:
        return "flat"
    hive = [n for n in subdirs if "=" in n]
    plain = [n for n in subdirs if "=" not in n]
    if hive and plain:
        raise ValueError(
            f"mixed partition layout under {path!r}: Hive-style dirs "
            f"{sorted(hive)[:3]}... alongside plain dirs {sorted(plain)[:3]}..."
            " — no reader mode covers both (partition discovery silently"
            " skips the plain dirs; recursiveFileLookup drops the partition"
            " columns). Read the two sub-layouts separately."
        )
    return "plain" if plain else "hive"


def read_parquet_files(
    spark: SparkSession,
    paths: Sequence[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """S2 — explicit file-list scan (incremental unit of processing).

    Mirrors reference etl/etl.py:25-33 (single newly-landed file passed from
    the event trigger, lambda/handler_last_date.py:26-35).
    """
    if not paths:
        raise ValueError("read_parquet_files requires at least one path")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*paths)


def read_table(spark: SparkSession, table: str, database: str | None = None) -> DataFrame:
    """S3 — catalog table scan, resolving partitions via the metastore.

    Mirrors reference etl/transform_1.py:43-46 (from_catalog). Partition
    pruning on catalog partition columns is a Catalyst built-in.
    """
    qualified = f"{database}.{table}" if database else table
    return spark.table(qualified)


def load_testdata(
    spark: SparkSession, sf_dir: str, names: Sequence[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's synthetic tables from an sf directory.

    Uses the schema registry (no inference) — at 100 TB you never want
    schema-merge over the footer of every file.
    """
    names = names or list(SCHEMAS)
    # The engine's date semantics are UTC-pinned (reference etl/transform_1.py:41);
    # enforce even on externally-created sessions (e.g. the driver's).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        ns_cols = tuple(
            c for c in NS_TIMESTAMP_COLUMNS.get(name, ()) if _is_nanos(path, c)
        )
        if ns_cols:
            # nanosecond parquet timestamps: Spark can only surface them as
            # raw longs; normalized to micros TimestampType below.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = SCHEMAS[name]
        if set(NS_TIMESTAMP_COLUMNS.get(name, ())) - set(ns_cols):
            # micro/milli parquet timestamps read natively as TimestampType —
            # swap out the registry's raw-long fields for those columns.
            schema = T.StructType(
                [
                    T.StructField(f.name, T.TimestampType(), f.nullable)
                    if f.name in NS_TIMESTAMP_COLUMNS.get(name, ())
                    and f.name not in ns_cols
                    else f
                    for f in schema.fields
                ]
            )
        df = spark.read.schema(schema).parquet(path)
        for col in ns_cols:
            # integer nanos -> micros (DIV keeps long arithmetic; truncation
            # matches DuckDB's TIMESTAMP_NS -> TIMESTAMP cast)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        out[name] = df
    return out


def _is_nanos(path: str, col: str) -> bool:
    """True when ``col`` in the parquet footer is TIMESTAMP(NANOS). The
    testdata generator has shipped both ns and us timestamps across rounds,
    so the loader probes ONE footer instead of assuming — misreading us as
    ns shifts every event to 1970. Local-file probe via pyarrow; on any
    failure assume nanos (the legacy-long read path, which at worst errors
    loudly rather than silently corrupting)."""
    try:
        import pyarrow.parquet as pq

        field = pq.read_schema(path).field(col)
        return getattr(field.type, "unit", None) == "ns"
    except Exception:  # noqa: BLE001 — unreadable footer/remote path
        return True


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Recursive COMMITTED-data-file listing through the Hadoop FileSystem
    API — the same scheme-agnostic RPC surface ``_probe_layout`` and the
    sink existence probes use, so the listing works on any Spark-supported
    filesystem (file/hdfs/s3a/abfs), not just the driver's local mount.
    Files under hidden directories (a stale ``_temporary/`` or
    ``.staging/`` tree from a failed write) and hidden files are pruned —
    uncommitted data must not leak into a metadata report. Spark Connect
    sessions (no ``_jvm``) fall back to a local ``os.walk`` with the same
    pruning rules."""
    try:
        jvm = spark._jvm
    except AttributeError:
        jvm = None
    if jvm is not None:
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        try:
            root_uri = fs.getFileStatus(jpath).getPath().toUri()
            it = fs.listFiles(jpath, True)
        except _Py4JError:  # missing root: caller raises "no data files"
            return []
        root = root_uri.getPath().rstrip("/")
        files = []
        while it.hasNext():
            p = it.next().getPath()
            if not p.getName().endswith(".parquet"):
                continue
            uri = p.toUri()
            rel = uri.getPath()[len(root):].lstrip("/")
            if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
                continue
            scheme = uri.getScheme()
            # plain path for local files (what pyarrow opens directly);
            # full URI for remote schemes (pyarrow resolves via fsspec)
            files.append(uri.getPath() if scheme in (None, "file") else p.toString())
        return sorted(files)
    files = []
    for walk_root, dirs, names in os.walk(path):
        dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
        files.extend(
            os.path.join(walk_root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    return sorted(files)


def footer_stats_report(
    spark: SparkSession, path: str, column: str
) -> DataFrame:
    """Per-file parquet FOOTER statistics for ``column`` — the
    data-skipping report: one row per data file with (n_rows, min, max)
    aggregated across its row groups, read from footers only (no data
    pages touched). This is how a lakehouse answers "which files would
    predicate X prune" and "did the clustering layout actually tighten
    per-file ranges" without scanning a byte of data.

    Scale posture: the driver holds only the FILE LISTING (metadata-class,
    the same bound as the catalog partition ops); the footer reads run
    executor-side via mapInPandas over the path list, so stats collection
    over a million files is one distributed metadata pass (~8 KB per
    footer), not a table scan. Files whose writer recorded no stats for
    the column surface as NULL min/max rather than being dropped — at
    10 PB a stats-less file is exactly the one you need to know about,
    because every predicate must read it.

    The numeric min/max are returned as strings(!) deliberately: footer
    stats are typed per file and a report spanning mixed-schema layouts
    must not cast its way into lying; callers cast knowing their column
    type (the registry query does, under its oracle)."""
    files = _list_data_files(spark, path)
    if not files:
        raise ValueError(f"no parquet data files under {path}")
    # LocalRelation (util.local_relation_df): the path list is re-planned
    # per action and the pickled-RDD form would round-trip a Python worker
    # each time (guide §4 boundary tax)
    paths = local_relation_df(spark, [(p,) for p in sorted(files)], "path string")

    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("min_value", T.StringType()),
            T.StructField("max_value", T.StringType()),
        ]
    )

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                mins, maxs = [], []
                n_rows = md.num_rows
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema != column:
                            continue
                        st = col.statistics
                        if st is not None and st.has_min_max:
                            mins.append(st.min)
                            maxs.append(st.max)
                rows.append(
                    (
                        p,
                        n_rows,
                        str(min(mins)) if mins else None,
                        str(max(maxs)) if maxs else None,
                    )
                )
            yield pd.DataFrame(rows, columns=["path", "n_rows", "min_value", "max_value"])

    return paths.mapInPandas(read_footers, schema=out_schema)
