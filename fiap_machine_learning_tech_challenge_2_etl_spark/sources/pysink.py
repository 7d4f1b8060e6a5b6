"""Custom Python Data Source WRITER: a manifest-committed directory sink
with a VERSIONED commit log (snapshot isolation + time travel).

The writer half of the Spark 4 Python DataSource API
(``pyspark.sql.datasource.DataSourceWriter``), demonstrating the
exactly-once commit protocol every serious sink implements (the same
two-phase shape as Hadoop's FileOutputCommitter and table formats'
snapshot commit):

1. Each TASK stages its partition to a uniquely-named data file
   (``part-<partition>-<uuid>.jsonl``) and returns the file name in its
   ``WriterCommitMessage`` — executor-side, no coordination. A task that
   fails MID-write removes its own in-progress file before re-raising,
   so task-level failure leaves no staging garbage even though no commit
   message is ever produced for it.
2. The DRIVER's ``commit(messages)`` publishes ONE immutable manifest
   ``_MANIFEST.v<n>`` listing exactly the staged files of SUCCESSFUL
   tasks. The version number is CLAIMED atomically (``os.link`` of a
   fully-written temp file onto the versioned name — fails with
   ``FileExistsError`` if another job got there first, in which case the
   next number is tried). No commit ever reads or rewrites another
   commit's manifest, so concurrent append jobs cannot lose each other's
   updates: the log linearizes them. ``mode("append")`` publishes a
   delta commit; ``mode("overwrite")`` publishes a BASE commit that
   readers resolve from, superseding (but not deleting) older versions.
3. ``abort(messages)`` deletes whatever was staged — a failed job leaves
   no manifest and no garbage the next attempt could double-read.

Readers resolve the directory THROUGH the log: collect versions ``<= k``
(``version=k`` time travel; default latest), start at the newest BASE
commit in range, union the deltas after it. A half-written job is
invisible — no manifest, no data — and an in-flight concurrent job is
invisible at ANY pinned version because its version didn't exist when k
was claimed. Old versions stay readable until explicitly expired
(``expire_manifest_versions``), after which ``vacuum_manifest_sink``
reclaims data files no surviving manifest references — exactly the
retention/VACUUM split table formats use.

Speculative/retried tasks fall out of the same protocol: each attempt
stages under a fresh uuid, but only the attempts whose commit messages
reach ``commit()`` enter the manifest — orphaned attempt files are inert
(and swept by vacuum).

Why this is first-class at 100 TB: object stores have no atomic
multi-file rename, so "the job either happened or it didn't" must be
manufactured exactly this way — stage under unique names, publish one
small immutable pointer per commit. JSONL keeps the demo dependency-free;
the protocol is the point, not the format.

Deployment assumption, stated plainly: tasks ``open()`` paths under the
sink directory, so driver and executors must SHARE that filesystem —
true in local mode and on any cluster with a shared mount (NFS, Fuse
over an object store). A cloud deployment swaps the two ``open()`` call
sites for an object-store client PUT and the ``os.link`` claim for a
conditional PUT (If-None-Match) of the manifest key; the
commit/abort/message protocol — the part Spark drives — is unchanged.

Usage::

    spark.dataSource.register(ManifestSinkDataSource)
    df.write.format("manifestsink").option("path", d).mode("append").save()
    rows = read_manifest_sink(spark, d)             # latest snapshot
    old  = read_manifest_sink(spark, d, version=2)  # time travel
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
_V_PREFIX = MANIFEST + ".v"  # batch commit log: _MANIFEST.v00000001
_B_PREFIX = MANIFEST + "-"  # streaming per-batch: _MANIFEST-<batchId>


class _StagedFile(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


def _publish_exclusive(path: str, name: str, manifest: dict) -> None:
    """Atomically publish an IMMUTABLE manifest: write the full content
    to a temp file, then ``os.link`` it onto the target name — which
    fails with FileExistsError if the name is taken, making the claim
    exclusive AND complete-on-arrival (readers can never observe a
    partial manifest). Raises FileExistsError for the caller to retry
    with the next version number."""
    tmp = os.path.join(path, f".{name}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, os.path.join(path, name))
    finally:
        os.remove(tmp)


def _publish_last_wins(path: str, name: str, manifest: dict) -> None:
    """Atomically publish a manifest where the LAST publication wins
    (``os.replace``) — the idempotent variant a retried streaming batch
    needs: re-running batch k republishes ``_MANIFEST-k`` and readers
    still see exactly one pointer for that batch."""
    tmp = os.path.join(path, f".{name}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, name))


def _list_commits(path: str) -> list[tuple[int, str, dict]]:
    """The directory's commit log, ordered by version: ``(version, kind,
    manifest)`` where kind is 'batch' or 'stream'. A directory written by
    BOTH the batch log and a stream (two independent version spaces with
    no global order) is rejected — one writer family per directory."""
    batch: list[tuple[int, str]] = []
    stream: list[tuple[int, str]] = []
    for f in os.listdir(path):
        if f.endswith(".tmp"):
            continue
        if f.startswith(_V_PREFIX):
            batch.append((int(f[len(_V_PREFIX):]), f))
        elif f.startswith(_B_PREFIX):
            stream.append((int(f[len(_B_PREFIX):]), f))
    if batch and stream:
        raise ValueError(
            f"{path} holds both a batch commit log and streaming per-batch "
            "manifests; their version spaces have no global order — use one "
            "writer family per directory"
        )
    kind = "batch" if batch else "stream"
    out = []
    for v, name in sorted(batch or stream):
        with open(os.path.join(path, name)) as f:
            out.append((v, kind, json.load(f)))
    return out


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
        staged = os.path.join(self.path, name)
        n = 0
        try:
            with open(staged, "w") as f:
                for row in iterator:
                    json.dump(dict(zip(self.fields, row)), f)
                    f.write("\n")
                    n += 1
        except BaseException:
            # a task that dies mid-write never returns a commit message,
            # so abort() can't see its file — clean up our own staging
            # before re-raising (job-level abort sweeps the rest)
            try:
                os.remove(staged)
            except FileNotFoundError:
                pass
            raise
        return _StagedFile(name, n)

    # -- driver side --------------------------------------------------
    def commit(self, messages) -> None:
        files = sorted(
            (m.filename, m.n_rows) for m in messages if m is not None
        )
        manifest = {
            "files": [f for f, _ in files],
            "n_rows": sum(n for _, n in files),
            "fields": self.fields,
            # mode semantics live HERE, in how readers resolve the log:
            # an append commit is a delta; an overwrite commit is a BASE
            # readers start from (older versions stay time-travelable
            # until expired, then vacuum reclaims their files)
            "mode": "overwrite" if self.overwrite else "append",
        }
        os.makedirs(self.path, exist_ok=True)
        # claim the next log position: no read-modify-write of any other
        # commit's manifest, so concurrent jobs serialize instead of
        # last-publish-wins clobbering each other's file lists
        v = 1 + max((c[0] for c in _list_commits(self.path)), default=0)
        while True:
            try:
                _publish_exclusive(self.path, f"{_V_PREFIX}{v:08d}", manifest)
                return
            except FileExistsError:
                v += 1

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
    batch's tasks all staged. Exactly-once falls out of IDEMPOTENT
    publication keyed on batchId: if the driver dies between staging and
    commit, the restarted batch re-runs with fresh uuids and
    ``os.replace`` keeps exactly one pointer for that batch — readers see
    each batch's rows exactly once because they resolve only
    manifest-listed files, never the directory listing. (This is why the
    stream path does NOT use the exclusive-claim log: a retried batch
    must REPLACE its own manifest, not claim a new version and
    double-count.) The batchId doubles as the commit version, so
    ``read_manifest_sink(..., version=k)`` is "the first k+1 batches" —
    snapshot-isolated time travel over the stream's history."""

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
            "mode": "append",
        }
        _publish_last_wins(self.path, f"{_B_PREFIX}{batchId}", manifest)

    def abort(self, messages, batchId: int) -> None:
        self._delegate.abort(messages)


class ManifestSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifestsink"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return ManifestSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        if overwrite:
            # outputMode('complete') would republish the FULL result every
            # batch; per-batch delta manifests would then double-count every
            # row present in more than one batch. Refuse loudly rather than
            # corrupt — append/update modes are the supported contract.
            raise ValueError(
                "manifestsink streaming supports append/update output modes "
                "only: complete mode republishes cumulative results each "
                "batch, which per-batch delta manifests would double-count"
            )
        return ManifestStreamSinkWriter(self.options, schema)


def resolve_manifest_files(path: str, version: int | None = None) -> list[str]:
    """Resolve the directory's commit log to the data-file list visible
    at ``version`` (inclusive; default latest): take commits with
    version <= k, start at the newest BASE (overwrite) commit in range,
    union the delta commits after it. Duplicates are impossible — every
    commit lists only its own uniquely-named staged files."""
    commits = _list_commits(path)
    if version is not None:
        commits = [c for c in commits if c[0] <= version]
    files: list[str] = []
    for v, _kind, man in commits:
        if man.get("mode") == "overwrite":
            files = []
        files.extend(man["files"])
    return [os.path.join(path, name) for name in files]


def read_manifest_sink(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a manifest-committed directory THROUGH its commit log: only
    the files the resolved manifests list (staged-but-uncommitted and
    orphaned-attempt files are invisible — that is the protocol's whole
    guarantee). ``version=k`` time-travels to the snapshot as of commit
    k — for a streamed directory, the first k+1 micro-batches; for a
    batch log, everything up to the k-th job — and a concurrent IN-FLIGHT
    job is invisible at any pinned version (its commit, if it lands,
    gets a version number > k). Returns a DataFrame via Spark's JSON
    reader over the explicit file list, so the read is distributed and
    schema-checked like any other source."""
    files = resolve_manifest_files(path, version)
    if not files:
        raise ValueError(
            f"no committed manifest files under {path}"
            + (f" at version <= {version}" if version is not None else "")
        )
    return spark.read.json(files)


def expire_manifest_versions(path: str, min_version: int) -> list[str]:
    """Retention boundary for time travel: drop commit manifests with
    version < ``min_version`` from the log (their data files become
    unreferenced unless a surviving manifest also lists them — run
    :func:`vacuum_manifest_sink` afterwards to reclaim). Refuses to
    expire past the newest BASE commit at or below ``min_version``'s
    snapshot — expiring a base a surviving delta still builds on would
    corrupt every later snapshot, so the floor is validated, not
    trusted. Consequence, stated plainly: a STREAM directory (per-batch
    delta manifests, no base commits ever) can never be expired — there
    retention would DELETE rows from the current snapshot, not clean up
    superseded history, which is a different, deliberately-destructive
    operation (a TTL sweep) this function refuses to impersonate.
    Returns the removed manifest names."""
    commits = _list_commits(path)
    keep = [c for c in commits if c[0] >= min_version]
    if not keep:
        raise ValueError(
            f"expiring everything below {min_version} would leave an empty "
            f"log under {path}"
        )
    # every surviving delta must resolve from a surviving base (or be
    # base-less deltas from version 1 — only valid if NOTHING is dropped
    # before them)
    dropped = [c for c in commits if c[0] < min_version]
    first_keep = keep[0]
    if dropped and first_keep[2].get("mode") != "overwrite":
        raise ValueError(
            f"cannot expire below version {min_version}: commit "
            f"{first_keep[0]} is a delta that builds on expired history — "
            "choose a BASE (overwrite) commit as the retention floor"
        )
    removed = []
    for v, kind, _man in dropped:
        name = (
            f"{_V_PREFIX}{v:08d}" if kind == "batch" else f"{_B_PREFIX}{v}"
        )
        os.remove(os.path.join(path, name))
        removed.append(name)
    return removed


def vacuum_manifest_sink(path: str) -> list[str]:
    """Sweep data files no SURVIVING manifest references — the residue of
    aborted jobs, failed speculative attempts, batch retries that staged
    under a fresh uuid before republishing, and generations dropped by
    :func:`expire_manifest_versions`. Safe BY CONSTRUCTION: a file
    becomes visible only by appearing in a manifest, and manifests are
    only ever published after their files are fully staged, so deleting
    an unreferenced file can never remove live data (the same invariant
    table formats rely on for their VACUUM). Time-traveled snapshots
    remain intact until their manifests are expired — vacuum consults
    EVERY manifest still in the log, not just the latest snapshot.
    Returns the removed file names; driver-side listing only — the
    directory's file count is the same metadata-class bound as the
    catalog ops."""
    referenced: set[str] = set()
    for _v, _kind, man in _list_commits(path):
        referenced.update(man["files"])
    removed = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".jsonl") and name not in referenced:
            os.remove(os.path.join(path, name))
            removed.append(name)
    return removed
