"""Custom Python Data Source WRITER: a manifest-committed directory sink.

The writer half of the Spark 4 Python DataSource API
(``pyspark.sql.datasource.DataSourceWriter``), demonstrating the
exactly-once commit protocol every serious sink implements (the same
two-phase shape as Hadoop's FileOutputCommitter and table formats'
snapshot commit):

1. Each TASK stages its partition to a uniquely-named data file
   (``part-<partition>-<uuid>.jsonl``) and returns the file name in its
   ``WriterCommitMessage`` — executor-side, no coordination.
2. The DRIVER's ``commit(messages)`` writes a ``_MANIFEST`` listing
   exactly the staged files of SUCCESSFUL tasks, atomically (temp file +
   ``os.replace``). Readers resolve the directory THROUGH the manifest,
   so a half-written job is invisible: no manifest, no data.
3. ``abort(messages)`` deletes whatever was staged — a failed job leaves
   no manifest and no garbage the next attempt could double-read.

Speculative/retried tasks fall out of the same protocol: each attempt
stages under a fresh uuid, but only the attempts whose commit messages
reach ``commit()`` enter the manifest — orphaned attempt files are inert
(and swept by the next overwrite).

Why this is first-class at 100 TB: object stores have no atomic
multi-file rename, so "the job either happened or it didn't" must be
manufactured exactly this way — stage under unique names, publish one
small atomic pointer. JSONL keeps the demo dependency-free; the protocol
is the point, not the format.

Deployment assumption, stated plainly: tasks ``open()`` paths under the
sink directory, so driver and executors must SHARE that filesystem —
true in local mode and on any cluster with a shared mount (NFS, Fuse
over an object store). A cloud deployment swaps the two ``open()`` call
sites for an object-store client PUT and the ``os.replace`` for a
conditional PUT of the manifest key; the commit/abort/message protocol —
the part Spark drives — is unchanged.

Usage::

    spark.dataSource.register(ManifestSinkDataSource)
    df.write.format("manifestsink").option("path", d).mode("append").save()
    rows = read_manifest_sink(spark, d)   # reads ONLY manifest-listed files
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST"


class _StagedFile(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class ManifestSinkWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("manifestsink requires .option('path', ...)")
        self.path = path
        self.fields = schema.fieldNames()
        self.overwrite = overwrite

    # -- executor side ------------------------------------------------
    def write(self, iterator) -> _StagedFile:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                json.dump(dict(zip(self.fields, row)), f)
                f.write("\n")
                n += 1
        return _StagedFile(name, n)

    # -- driver side --------------------------------------------------
    def commit(self, messages) -> None:
        files = sorted(
            (m.filename, m.n_rows) for m in messages if m is not None
        )
        names = [f for f, _ in files]
        n_rows = sum(n for _, n in files)
        target = os.path.join(self.path, MANIFEST)
        # mode semantics live HERE, in what the manifest lists: append
        # merges the previous manifest's files (both writes stay visible
        # and vacuum-safe), overwrite publishes only this job's files
        # (the old ones become unreferenced -> reclaimed by vacuum)
        if not self.overwrite and os.path.exists(target):
            with open(target) as f:
                prev = json.load(f)
            names = sorted(set(prev["files"]) | set(names))
            n_rows += prev["n_rows"]
        manifest = {"files": names, "n_rows": n_rows, "fields": self.fields}
        tmp = os.path.join(self.path, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # the ONE atomic operation: publish the pointer
        os.replace(tmp, target)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass


class ManifestStreamSinkWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`ManifestSinkWriter`: one manifest PER
    MICRO-BATCH (``_MANIFEST-<batchId>``), published atomically after the
    batch's tasks all staged. Exactly-once falls out of idempotent
    publication: if the driver dies between staging and commit, the
    restarted batch re-runs with fresh uuids and ``os.replace`` makes the
    LAST publication win — readers see each batch's rows exactly once
    because they resolve only manifest-listed files, never the directory
    listing. This is the protocol ``foreachBatch`` + dynamic-overwrite
    implements with parquet partitions elsewhere in this repo
    (streaming/incremental.py), expressed through the connector API a
    custom sink author would actually use."""

    def __init__(self, options, schema: StructType):
        inner = dict(options)
        self._delegate = ManifestSinkWriter(inner, schema, overwrite=False)
        self.path = self._delegate.path

    def write(self, iterator) -> _StagedFile:
        return self._delegate.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        files = sorted((m.filename, m.n_rows) for m in messages if m is not None)
        manifest = {
            "files": [f for f, _ in files],
            "n_rows": sum(n for _, n in files),
            "fields": self._delegate.fields,
            "batch_id": batchId,
        }
        tmp = os.path.join(self.path, f".{MANIFEST}-{batchId}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, f"{MANIFEST}-{batchId}"))

    def abort(self, messages, batchId: int) -> None:
        self._delegate.abort(messages)


class ManifestSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifestsink"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return ManifestSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return ManifestStreamSinkWriter(self.options, schema)


def vacuum_manifest_sink(path: str) -> list[str]:
    """Sweep data files no manifest references — the residue of aborted
    jobs, failed speculative attempts, and batch retries that staged
    under a fresh uuid before republishing. Safe BY CONSTRUCTION: a file
    becomes visible only by appearing in a manifest, and manifests are
    only ever published after their files are fully staged, so deleting
    an unreferenced file can never remove live data (the same invariant
    table formats rely on for their VACUUM). Returns the removed file
    names; driver-side listing only — the directory's file count is the
    same metadata-class bound as the catalog ops."""
    referenced: set[str] = set()
    for m in os.listdir(path):
        if m == MANIFEST or (m.startswith(MANIFEST + "-") and not m.endswith(".tmp")):
            with open(os.path.join(path, m)) as f:
                referenced.update(json.load(f)["files"])
    removed = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".jsonl") and name not in referenced:
            os.remove(os.path.join(path, name))
            removed.append(name)
    return removed


def read_manifest_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read a manifest-committed directory: ONLY the files the manifests
    list (staged-but-uncommitted and orphaned-attempt files are
    invisible — that is the protocol's whole guarantee). A batch write
    leaves one ``_MANIFEST``; a streaming write leaves one
    ``_MANIFEST-<batchId>`` per micro-batch — all are resolved, and each
    file is read once even if a retried batch republished its manifest
    (``os.replace`` keeps exactly one pointer per batch). Returns a
    DataFrame via Spark's JSON reader over the explicit file list, so the
    read is distributed and schema-checked like any other source."""
    manifests = sorted(
        f for f in os.listdir(path)
        if f == MANIFEST or (f.startswith(MANIFEST + "-") and not f.endswith(".tmp"))
    )
    files: list[str] = []
    for m in manifests:
        with open(os.path.join(path, m)) as f:
            files.extend(os.path.join(path, name) for name in json.load(f)["files"])
    if not files:
        raise ValueError(f"no committed manifest files under {path}")
    return spark.read.json(files)
