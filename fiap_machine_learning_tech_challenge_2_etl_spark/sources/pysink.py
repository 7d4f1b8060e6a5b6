"""Custom Python Data Source WRITER: a manifest-committed directory sink
with a VERSIONED commit log (snapshot isolation + time travel), periodic
CHECKPOINT rollups (O(1)-ish resolve at any depth), stream-log
COMPACTION (makes streamed history expirable), and a retention-gated
VACUUM.

The writer half of the Spark 4 Python DataSource API
(``pyspark.sql.datasource.DataSourceWriter``), demonstrating the
exactly-once commit protocol every serious sink implements (the same
two-phase shape as Hadoop's FileOutputCommitter and table formats'
snapshot commit):

1. Each TASK stages its partition to a uniquely-named data file
   (``part-<partition>-<uuid>.jsonl`` or ``.parquet`` with
   ``option("format", "parquet")``) and returns the file name in its
   ``WriterCommitMessage`` — executor-side, no coordination. A task that
   fails MID-write removes its own in-progress file before re-raising,
   so task-level failure leaves no staging garbage even though no commit
   message is ever produced for it.
2. The DRIVER's ``commit(messages)`` publishes ONE immutable manifest
   ``_MANIFEST.v<n>`` listing exactly the staged files of SUCCESSFUL
   tasks. The version number is CLAIMED atomically (``os.link`` of a
   fully-written temp file onto the versioned name — fails with
   ``FileExistsError`` if another job got there first, in which case the
   next number is tried). The claim reads FILENAMES only — no manifest
   is ever opened on the commit path, so commit cost stays flat as the
   log deepens. No commit ever reads or rewrites another commit's
   manifest, so concurrent append jobs cannot lose each other's updates:
   the log linearizes them. ``mode("append")`` publishes a delta commit;
   ``mode("overwrite")`` publishes a BASE commit that readers resolve
   from, superseding (but not deleting) older versions.
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

CHECKPOINTS (the Delta ``_last_checkpoint`` idea): every
``checkpointInterval`` commits (default 16) the committing job also
publishes ``_CHECKPOINT.v<n>`` — the fully-RESOLVED file list (and
schema metadata) as of commit n. Resolution then opens one checkpoint
plus only the commits after it, so a 2000-commit log resolves by
reading ~interval small JSON files instead of 2000. Checkpoints are
pure caches: resolution with and without them is byte-identical, they
are published with the same exclusive claim (a lost race means another
job wrote the identical rollup), and they expire alongside the commits
they summarize.

SCHEMA is pinned, not inferred: every commit records the writer's full
Spark schema (``schema_json``); readers build the read schema from the
RESOLVED commits' manifests. ADDITIVE evolution is legal (a commit may
add columns; older files project them as NULL — the union schema in
first-appearance order), while real drift — the same field recorded
with two types, or mixed staged formats — fails the read loudly
instead of silently schema-merging.

Streaming (``ManifestStreamSinkWriter``) publishes one manifest PER
MICRO-BATCH (``_MANIFEST-<batchId>``, last-publication-wins so a
retried batch replaces itself). A stream log is all deltas — there is
no base to expire down to — so raw streamed history can never be
expired. ``compact_stream_manifests(path, upto_batch)`` fixes that:
it rewrites the manifests for batches <= upto_batch into ONE BASE
manifest at ``_MANIFEST-<upto_batch>`` (metadata only — no data file is
touched), after which expire + vacuum are legal on the stream directory
too. Compaction refuses to touch the NEWEST batch: Spark may replay the
last committed batch after a restart, and that replay must land on a
delta it owns, never on a base it would clobber.

One writer FAMILY per directory: the batch commit log and the stream's
per-batch manifests are two independent version spaces with no global
order, so each commit path checks the directory's existing family FIRST
and refuses to publish into the other's log (the check is name-level —
nothing is opened — and runs before anything becomes visible).
Directories written by the pre-log sink generation (a single bare
``_MANIFEST`` file) stay readable: the bare manifest is treated as
version 0 of the batch family.

Speculative/retried tasks fall out of the same protocol: each attempt
stages under a fresh uuid, but only the attempts whose commit messages
reach ``commit()`` enter the manifest — orphaned attempt files are inert
(and swept by vacuum). ``vacuum_manifest_sink`` only reclaims
unreferenced files OLDER than a grace period (default 10 minutes):
a concurrently-running job's staged-but-not-yet-committed files look
exactly like orphans, and deleting them would let its commit publish a
manifest pointing at nothing — the same reason real table formats gate
VACUUM behind a retention threshold. Pass ``grace_seconds=0`` only when
you know no writer is in flight.

Why this is first-class at 100 TB: object stores have no atomic
multi-file rename, so "the job either happened or it didn't" must be
manufactured exactly this way — stage under unique names, publish one
small immutable pointer per commit, roll pointers up so resolve never
reads O(history). JSONL keeps the demo dependency-free;
``format=parquet`` stages columnar files through the SAME log (pyarrow
executor-side), which is what the protocol would carry at scale — the
protocol is format-agnostic by construction.

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
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST"
_V_PREFIX = MANIFEST + ".v"  # batch commit log: _MANIFEST.v00000001
_B_PREFIX = MANIFEST + "-"  # streaming per-batch: _MANIFEST-<batchId>
_CKPT_PREFIX = "_CHECKPOINT.v"  # resolved-state rollup: _CHECKPOINT.v00000016
_HINT = "_LAST_CHECKPOINT"  # Delta-style pointer: latest version + checkpoint
DEFAULT_CHECKPOINT_INTERVAL = 16
VACUUM_GRACE_SECONDS = 600.0


class _StagedFile(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int, stats: dict | None = None):
        self.filename = filename
        self.n_rows = n_rows
        # per-column [min, max] over this file's non-null values —
        # the manifest-level data-skipping stats (None when not tracked)
        self.stats = stats


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


def _read_hint(path: str) -> dict | None:
    """The ``_LAST_CHECKPOINT`` pointer (Delta's idea, literally): a tiny
    last-wins file recording the log's kind, the latest known version,
    and the newest checkpoint version. PURELY an accelerator — it lets
    commit skip the directory listing (probe from version+1) and resolve
    jump straight to its checkpoint; a stale or missing hint only costs
    a fallback to the name scan, never correctness (the exclusive claim
    and the dense version space stay authoritative)."""
    try:
        with open(os.path.join(path, _HINT)) as f:
            return json.load(f)
    except (FileNotFoundError, NotADirectoryError, json.JSONDecodeError):
        return None


def _write_hint(path: str, kind: str, version: int, checkpoint: int | None) -> None:
    try:
        _publish_last_wins(
            path, _HINT, {"kind": kind, "version": version, "checkpoint": checkpoint}
        )
    except OSError:
        # best-effort by contract: the commit this hint describes already
        # published; a missing/stale hint costs the next reader a name
        # scan, never correctness
        pass


def _scan_names(path: str) -> tuple[str | None, list, list]:
    """NAME-LEVEL view of the directory's log — nothing is opened, so
    this is safe (and cheap) on every commit. Returns ``(kind, commits,
    checkpoints)`` where kind is 'batch' / 'stream' / None (empty),
    commits is ``[(version, filename)]`` sorted, checkpoints likewise.
    A single bare ``_MANIFEST`` (the pre-log sink generation) is folded
    in as version 0 of the batch family. A directory holding BOTH
    families is rejected — their version spaces have no global order."""
    batch: list[tuple[int, str]] = []
    stream: list[tuple[int, str]] = []
    ckpts: list[tuple[int, str]] = []
    if os.path.isdir(path):
        for f in os.listdir(path):
            if f.endswith(".tmp"):
                continue
            if f.startswith(_V_PREFIX):
                batch.append((int(f[len(_V_PREFIX):]), f))
            elif f.startswith(_B_PREFIX):
                stream.append((int(f[len(_B_PREFIX):]), f))
            elif f == MANIFEST:
                # legacy single-manifest directory: readable as the
                # batch log's version 0 (it predates versioning, so it
                # is by definition the oldest commit)
                batch.append((0, f))
            elif f.startswith(_CKPT_PREFIX):
                ckpts.append((int(f[len(_CKPT_PREFIX):]), f))
    if (batch or ckpts) and stream:
        raise ValueError(
            f"{path} holds both a batch commit log and streaming per-batch "
            "manifests; their version spaces have no global order — use one "
            "writer family per directory"
        )
    kind = "batch" if (batch or ckpts) else ("stream" if stream else None)
    return kind, sorted(batch or stream), sorted(ckpts)


def _load(path: str, name: str) -> dict:
    with open(os.path.join(path, name)) as f:
        return json.load(f)


def _meta_of(man: dict) -> dict:
    """The schema/format identity a commit contributes to a resolved
    snapshot (legacy manifests lack schema_json/format — reads fall back
    to inference for those, still name-checked)."""
    return {
        "fields": man.get("fields"),
        "schema_json": man.get("schema_json"),
        "format": man.get("format", "jsonl"),
    }


def _list_commits(path: str) -> list[tuple[int, str, dict]]:
    """The FULL commit log, ordered by version: ``(version, kind,
    manifest)``. Opens every manifest — used only by maintenance ops
    (expire/vacuum/compaction audits); the commit and resolve hot paths
    go through :func:`_scan_names` / checkpoints instead."""
    kind, commits, _ck = _scan_names(path)
    return [(v, kind, _load(path, name)) for v, name in commits]


def _resolve_state(path: str, version: int | None = None) -> dict:
    """Resolve the log to ``{"files": [...], "metas": [...]}`` visible
    at ``version`` (inclusive; default latest): start from the newest
    usable CHECKPOINT (if any), replay only the commits after it; a BASE
    (overwrite) commit resets the running state. ``metas`` carries the
    distinct schema/format identities of the commits that contributed
    files — exactly what the reader needs to pin its schema.

    Fast path (no directory listing): when the ``_LAST_CHECKPOINT`` hint
    names a checkpoint at or below the requested version, load it and
    PROBE forward by constructed name — batch versions are DENSE above
    any surviving checkpoint (the exclusive claim allocates them
    consecutively, and expire only ever removes a prefix, taking its
    checkpoints with it), so the first missing name is the end of the
    log. A stale/missing hint or a pin below the hinted checkpoint falls
    back to the full name scan."""
    hint = _read_hint(path)
    if (
        hint
        and hint.get("kind") == "batch"
        and hint.get("checkpoint") is not None
        and (version is None or version >= int(hint["checkpoint"]))
    ):
        c = int(hint["checkpoint"])
        try:
            ck = _load(path, f"{_CKPT_PREFIX}{c:08d}")
        except FileNotFoundError:
            ck = None  # checkpoint expired under a stale hint — slow path
        if ck is not None:
            files = list(ck["files"])
            metas = list(ck.get("metas", []))
            fstats = dict(ck.get("file_stats", {}))
            v = c + 1
            while version is None or v <= version:
                try:
                    man = _load(path, f"{_V_PREFIX}{v:08d}")
                except FileNotFoundError:
                    break
                if man.get("mode", "append") == "overwrite":
                    files, metas, fstats = [], [], {}
                files.extend(man["files"])
                fstats.update(man.get("file_stats", {}))
                if man["files"]:
                    m = _meta_of(man)
                    if m not in metas:
                        metas.append(m)
                v += 1
            return {"kind": "batch", "files": files, "metas": metas,
                    "file_stats": fstats}
    kind, commits, ckpts = _scan_names(path)
    files: list[str] = []
    metas: list[dict] = []
    fstats: dict[str, dict] = {}
    start_after = -1
    if kind == "batch":
        usable = [c for c in ckpts if version is None or c[0] <= version]
        if usable:
            cv, cname = usable[-1]
            ck = _load(path, cname)
            files = list(ck["files"])
            metas = list(ck.get("metas", []))
            fstats = dict(ck.get("file_stats", {}))
            start_after = cv
    for v, name in commits:
        if v <= start_after:
            continue
        if version is not None and v > version:
            break
        man = _load(path, name)
        if man.get("mode", "append") == "overwrite":
            files, metas, fstats = [], [], {}
        files.extend(man["files"])
        fstats.update(man.get("file_stats", {}))
        if man["files"]:
            m = _meta_of(man)
            if m not in metas:
                metas.append(m)
    return {"kind": kind, "files": files, "metas": metas, "file_stats": fstats}


class ManifestSinkWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        opts = {str(k).lower(): v for k, v in dict(options).items()}
        path = opts.get("path")
        if not path:
            raise ValueError("manifestsink requires .option('path', ...)")
        self.path = path
        self.schema = schema
        self.fields = schema.fieldNames()
        self.overwrite = overwrite
        self.format = str(opts.get("format", "jsonl")).lower()
        if self.format not in ("jsonl", "parquet"):
            raise ValueError(
                f"manifestsink format must be 'jsonl' or 'parquet', got "
                f"{self.format!r}"
            )
        self.checkpoint_interval = int(
            opts.get("checkpointinterval", DEFAULT_CHECKPOINT_INTERVAL)
        )
        # manifest-level data-skipping stats: per-file [min, max] of the
        # named columns, computed DURING staging (one compare per row per
        # column — zero cost unless opted in) and published in the commit
        # manifest, so readers can prune whole files from metadata alone
        self.stats_columns = [
            c.strip()
            for c in str(opts.get("statscolumns", "")).split(",")
            if c.strip()
        ]
        unknown = [c for c in self.stats_columns if c not in self.fields]
        if unknown:
            raise ValueError(
                f"statsColumns {unknown} not in the write schema {self.fields}"
            )

    # -- executor side ------------------------------------------------
    def write(self, iterator) -> _StagedFile:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.{self.format}"
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, name)
        stats: dict[str, list] = {}
        if self.stats_columns:
            idx = [self.fields.index(c) for c in self.stats_columns]
            inner = iterator

            def observing():
                for row in inner:
                    for c, i in zip(self.stats_columns, idx):
                        v = row[i]
                        if v is None:
                            continue
                        s = stats.get(c)
                        if s is None:
                            stats[c] = [v, v]
                        else:
                            if v < s[0]:
                                s[0] = v
                            if v > s[1]:
                                s[1] = v
                    yield row

            iterator = observing()
        try:
            if self.format == "parquet":
                n = self._stage_parquet(staged, iterator)
            else:
                n = self._stage_jsonl(staged, iterator)
        except BaseException:
            # a task that dies mid-write never returns a commit message,
            # so abort() can't see its file — clean up our own staging
            # before re-raising (job-level abort sweeps the rest)
            try:
                os.remove(staged)
            except FileNotFoundError:
                pass
            raise
        return _StagedFile(name, n, stats or None)

    def _stage_jsonl(self, staged: str, iterator) -> int:
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                json.dump(dict(zip(self.fields, row)), f)
                f.write("\n")
                n += 1
        return n

    def _stage_parquet(self, staged: str, iterator) -> int:
        """Columnar staging through the same commit protocol: the task
        buffers Arrow-record-batch-sized chunks (never the whole
        partition) and streams them into one parquet file, so memory is
        O(chunk) regardless of partition size. The Arrow schema is
        derived from the WRITER's Spark schema — the staged footer
        carries real types, which is what lets readers pin the schema
        instead of inferring it."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        aschema = to_arrow_schema(self.schema)
        n = 0
        buf: list[dict] = []
        with pq.ParquetWriter(staged, aschema) as w:
            for row in iterator:
                buf.append(dict(zip(self.fields, row)))
                n += 1
                if len(buf) >= 32768:
                    w.write_table(pa.Table.from_pylist(buf, schema=aschema))
                    buf = []
            if buf or n == 0:
                w.write_table(pa.Table.from_pylist(buf, schema=aschema))
        return n

    # -- driver side --------------------------------------------------
    def commit(self, messages) -> None:
        files = sorted(
            (m.filename, m.n_rows) for m in messages if m is not None
        )
        manifest = {
            "files": [f for f, _ in files],
            "n_rows": sum(n for _, n in files),
            "fields": self.fields,
            "schema_json": self.schema.json(),
            "format": self.format,
            # mode semantics live HERE, in how readers resolve the log:
            # an append commit is a delta; an overwrite commit is a BASE
            # readers start from (older versions stay time-travelable
            # until expired, then vacuum reclaims their files)
            "mode": "overwrite" if self.overwrite else "append",
        }
        file_stats = {
            m.filename: m.stats
            for m in messages
            if m is not None and getattr(m, "stats", None)
        }
        if file_stats:
            manifest["file_stats"] = file_stats
        os.makedirs(self.path, exist_ok=True)
        # family check FIRST, before anything is published: a batch
        # commit into a stream-written directory would create two
        # unordered version spaces — refuse while the job is still
        # invisible (Spark then calls abort(), sweeping the staging).
        # The hint answers both questions (family + latest version) in
        # one tiny read; only a hint-less directory pays the name scan.
        hint = _read_hint(self.path)
        if hint is not None:
            if hint.get("kind") == "stream":
                raise ValueError(
                    f"{self.path} already holds a STREAM log "
                    f"(_MANIFEST-<batchId> manifests); refusing to publish a "
                    "batch commit into it — one writer family per directory"
                )
            v = int(hint.get("version", 0)) + 1
            ckpt_v = hint.get("checkpoint")
        else:
            kind, commits, ckpts = _scan_names(self.path)
            if kind == "stream":
                raise ValueError(
                    f"{self.path} already holds a STREAM log "
                    f"(_MANIFEST-<batchId> manifests); refusing to publish a "
                    "batch commit into it — one writer family per directory"
                )
            v = 1 + max((c[0] for c in commits), default=0)
            ckpt_v = ckpts[-1][0] if ckpts else None
        # claim the next log position by EXCLUSIVE publication (no
        # manifest is opened, no read-modify-write of any other commit's
        # manifest): concurrent jobs serialize on the os.link claim
        # instead of last-publish-wins clobbering each other's file
        # lists; a stale hint just means a few extra probes
        while True:
            try:
                _publish_exclusive(self.path, f"{_V_PREFIX}{v:08d}", manifest)
                break
            except FileExistsError:
                v += 1
        ckpt_v = self._maybe_checkpoint(v, ckpt_v)
        _write_hint(self.path, "batch", v, ckpt_v)

    def _maybe_checkpoint(self, v: int, prev_ckpt: int | None) -> int | None:
        """Every ``checkpointInterval`` commits, roll the RESOLVED state
        up into ``_CHECKPOINT.v<n>`` so later resolves replay only the
        tail. Best-effort and race-safe: the content is a pure function
        of the log prefix <= v, so losing the exclusive claim means
        another job already published the identical rollup; a crash
        before publishing costs nothing but speed. Returns the newest
        checkpoint version for the hint."""
        if self.checkpoint_interval <= 0 or v % self.checkpoint_interval:
            return prev_ckpt
        try:
            state = _resolve_state(self.path, version=v)
            ck = {
                "version": v,
                "files": state["files"],
                "metas": state["metas"],
                "file_stats": state["file_stats"],
            }
            _publish_exclusive(self.path, f"{_CKPT_PREFIX}{v:08d}", ck)
        except FileExistsError:
            pass  # a concurrent job already published the identical rollup
        except Exception:
            # STRICTLY best-effort: the commit itself already published.
            # Raising here would make the job report failure for data
            # that is durably live (e.g. a concurrent expire unlinking a
            # manifest mid-rollup). A missing checkpoint costs the next
            # resolve speed, never correctness.
            return prev_ckpt
        return v

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
        # family check FIRST (nothing published yet): a stream manifest
        # next to a batch commit log would wedge the directory for every
        # future reader and writer. Hint answers it in one read; a
        # hint-less directory pays the name scan.
        hint = _read_hint(self.path)
        kind = hint.get("kind") if hint is not None else _scan_names(self.path)[0]
        if kind == "batch":
            raise ValueError(
                f"{self.path} already holds a BATCH commit log "
                f"(_MANIFEST.v* manifests); refusing to publish a stream "
                "batch manifest into it — one writer family per directory"
            )
        files = sorted((m.filename, m.n_rows) for m in messages if m is not None)
        manifest = {
            "files": [f for f, _ in files],
            "n_rows": sum(n for _, n in files),
            "fields": self._delegate.fields,
            "schema_json": self._delegate.schema.json(),
            "format": self._delegate.format,
            "batch_id": batchId,
            "mode": "append",
        }
        file_stats = {
            m.filename: m.stats
            for m in messages
            if m is not None and getattr(m, "stats", None)
        }
        if file_stats:
            manifest["file_stats"] = file_stats
        os.makedirs(self.path, exist_ok=True)
        _publish_last_wins(self.path, f"{_B_PREFIX}{batchId}", manifest)
        _write_hint(self.path, "stream", batchId, None)

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


class _CommittedFilesPartition(InputPartition):
    def __init__(self, path: str, filename: str, fmt: str):
        self.path, self.filename, self.fmt = path, filename, fmt


class ManifestLogStreamReader(DataSourceStreamReader):
    """The manifest log as a STREAMING SOURCE (Delta's streaming-table
    idea re-expressed for this log): the offset IS the commit version,
    each micro-batch reads exactly the data files the commits in
    ``(start, end]`` published, so a query tails the table incrementally
    with exactly-once falling out of Spark's offset log. Works on both
    writer families — a batch commit log (``_MANIFEST.v*``, offsets from
    0) and a streamed directory (``_MANIFEST-<batchId>``, offsets from
    -1 so batch 0 is consumed).

    Append-only contract, stated plainly: an OVERWRITE commit inside the
    consumed range RAISES by default — a base rewrites history, and a
    reader that already consumed part of that history would double-read
    (a fresh reader would silently skip the superseded rows it never
    saw). That is Delta's streaming behavior without ignoreChanges.
    ``option("skipBases", "true")`` opts into skipping such commits
    (consume deltas only); ``option("startingVersion", v)`` starts a
    fresh reader above compacted/rewritten history. Consequence for
    maintenance: run ``compact_stream_manifests`` / overwrites only
    BELOW every active reader's committed offset, exactly like vacuum's
    grace contract."""

    def __init__(self, options, schema: StructType):
        opts = {str(k).lower(): v for k, v in dict(options).items()}
        path = opts.get("path")
        if not path:
            raise ValueError("manifestlog requires .option('path', ...)")
        self.path = path
        self.fields = schema.fieldNames()
        self.types = [f.dataType.simpleString() for f in schema.fields]
        self.skip_bases = str(opts.get("skipbases", "false")).lower() == "true"
        self.starting_version = (
            int(opts["startingversion"]) if "startingversion" in opts else None
        )

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            return {"v": self.starting_version - 1}
        kind, _commits, _ck = _scan_names(self.path)
        if kind is None:
            raise ValueError(
                f"no manifest log under {self.path}: the log must exist "
                "before a stream can tail it (the schema is read from it)"
            )
        # batch versions start at 1, stream batchIds at 0 — the initial
        # offset is one below the first consumable version
        return {"v": 0 if kind == "batch" else -1}

    def latestOffset(self) -> dict:
        _kind, commits, _ck = _scan_names(self.path)
        return {"v": commits[-1][0]} if commits else self.initialOffset()

    def partitions(self, start: dict, end: dict):
        s, e = start["v"], end["v"]
        _kind, commits, _ck = _scan_names(self.path)
        parts: list[_CommittedFilesPartition] = []
        for v, name in commits:
            if not s < v <= e:
                continue
            man = _load(self.path, name)
            if man.get("mode", "append") == "overwrite":
                if self.skip_bases:
                    continue
                raise ValueError(
                    f"commit {v} in {self.path} is a BASE (overwrite) inside "
                    "the streamed range: it rewrites history this reader may "
                    "have partially consumed. Compact/overwrite only below "
                    "active readers' offsets, start fresh readers above it "
                    "(startingVersion), or opt into skipBases=true"
                )
            fmt = man.get("format", "jsonl")
            parts.extend(
                _CommittedFilesPartition(self.path, f, fmt) for f in man["files"]
            )
        if not parts:
            # explicit zero-row batch; an empty partition list is
            # Spark-version dependent (same contract as SynthDocsStreamReader)
            parts = [_CommittedFilesPartition(self.path, "", "empty")]
        return parts

    def read(self, partition: _CommittedFilesPartition):
        if partition.fmt == "empty":
            return
        full = os.path.join(partition.path, partition.filename)
        if partition.fmt == "parquet":
            import pyarrow.parquet as pq

            table = pq.read_table(full, columns=self.fields)
            for row in table.to_pylist():
                yield tuple(row[f] for f in self.fields)
            return
        casts = []
        for t in self.types:
            if t in ("bigint", "int", "smallint", "tinyint"):
                casts.append(lambda x: None if x is None else int(x))
            elif t in ("double", "float"):
                casts.append(lambda x: None if x is None else float(x))
            else:
                casts.append(lambda x: x)
        with open(full) as f:
            for line in f:
                rec = json.loads(line)
                yield tuple(c(rec.get(k)) for k, c in zip(self.fields, casts))

    def commit(self, end: dict) -> None:
        pass  # retention is expire/vacuum's job; the offset log is truth


class ManifestLogDataSource(DataSource):
    """Read-side twin of :class:`ManifestSinkDataSource`: registers the
    ``manifestlog`` STREAMING source over a manifest-committed directory.
    The schema comes from what the log's commits RECORDED (same
    pinned-schema rules as :func:`read_manifest_sink` — never inference),
    so ``spark.readStream.format("manifestlog").option("path", d)`` is
    fully self-describing."""

    @classmethod
    def name(cls) -> str:
        return "manifestlog"

    def schema(self) -> StructType:
        opts = {str(k).lower(): v for k, v in dict(self.options).items()}
        path = opts.get("path")
        if not path:
            raise ValueError("manifestlog requires .option('path', ...)")
        state = _resolve_state(path)
        if not state["metas"]:
            raise ValueError(f"no committed manifest files under {path}")
        _fmt, schema = _pin_read_schema(state["metas"])
        if schema is None:
            raise ValueError(
                f"the log under {path} predates recorded schemas (legacy "
                "commits only) — batch-read it via read_manifest_sink and "
                "rewrite, or pass an explicit .schema(...)"
            )
        return schema

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return ManifestLogStreamReader(self.options, schema)


def resolve_manifest_files(path: str, version: int | None = None) -> list[str]:
    """Resolve the directory's commit log to the data-file list visible
    at ``version`` (inclusive; default latest): take commits with
    version <= k, start at the newest BASE (overwrite) commit in range,
    union the delta commits after it — replaying from the newest usable
    checkpoint rather than the log's origin. Duplicates are impossible —
    every commit lists only its own uniquely-named staged files."""
    state = _resolve_state(path, version)
    return [os.path.join(path, name) for name in state["files"]]


def _pin_read_schema(metas: list[dict]) -> tuple[str, StructType | None]:
    """Derive ``(format, schema)`` for a resolved snapshot from the
    schemas its commits RECORDED at write time. ADDITIVE evolution is
    legal — the table-format contract: a commit may add new columns, and
    older files project them as NULL, so the snapshot schema is the
    commits' field UNION in first-appearance order (every field read
    nullable — pre-evolution files genuinely lack the new columns). What
    stays a LOUD failure is real drift: the same field name recorded
    with two different types can't be projected, only mis-coerced — so
    it raises instead of silently type-drifting. Legacy commits without
    a recorded schema fall back to inference (schema None), with
    field-set equality still required (inference can't distinguish
    evolution from drift)."""
    from pyspark.sql.types import StructField

    formats = sorted({m.get("format", "jsonl") for m in metas})
    if len(formats) > 1:
        raise ValueError(
            f"resolved snapshot mixes staged formats {formats}; commits with "
            "different formats cannot be read as one DataFrame — expire or "
            "overwrite past the older format first"
        )
    schemas = [m["schema_json"] for m in metas if m.get("schema_json")]
    if not schemas:
        field_sets = sorted(
            {tuple(sorted(m["fields"])) for m in metas if m.get("fields")}
        )
        if len(field_sets) > 1:
            raise ValueError(
                "schema drift across resolved commits without recorded "
                f"schemas: the snapshot mixes field sets {field_sets}; "
                "refusing to infer-merge legacy commits"
            )
        return formats[0] if formats else "jsonl", None
    if len(schemas) < len(metas):
        raise ValueError(
            "resolved snapshot mixes schema-recording commits with legacy "
            "no-schema commits; overwrite past the legacy generation first"
        )
    merged: dict[str, StructField] = {}
    seen_json = set()
    for s in schemas:  # commit order: evolution appends, never reorders
        if s in seen_json:
            continue
        seen_json.add(s)
        for f in StructType.fromJson(json.loads(s)).fields:
            have = merged.get(f.name)
            if have is None:
                merged[f.name] = StructField(f.name, f.dataType, nullable=True)
            elif have.dataType != f.dataType:
                raise ValueError(
                    f"schema drift across resolved commits: field {f.name!r} "
                    f"recorded as {have.dataType.simpleString()} and "
                    f"{f.dataType.simpleString()} — additive evolution is "
                    "legal, a type change is not; overwrite with a single "
                    "schema or pin a version before the drift"
                )
    return formats[0], StructType(list(merged.values()))


def prune_manifest_files(
    path: str, predicates: dict, version: int | None = None
) -> tuple[list[str], int]:
    """MANIFEST-LEVEL data skipping (the Iceberg/Delta min-max idea):
    given ``predicates = {col: (lo, hi)}`` (either bound may be None),
    return ``(kept_files, n_total)`` where a file is dropped ONLY when
    its commit-recorded [min, max] PROVES no row can satisfy the range —
    a pure metadata decision, no file opened. Files without recorded
    stats for a predicate column are always kept, so the result is a
    SUPERSET of the matching rows' files (same contract as parquet
    row-group skipping): callers still apply the real filter; pruning
    only removes scan work, never rows. Stats are recorded by the writer
    when ``option("statsColumns", "a,b")`` is set — one min/max compare
    per row per column during staging."""
    state = _resolve_state(path, version)
    fstats = state.get("file_stats", {})
    kept = []
    for name in state["files"]:
        st = fstats.get(name)
        drop = False
        if st:
            for col, (lo, hi) in predicates.items():
                mm = st.get(col)
                if mm is None:
                    continue
                if (hi is not None and mm[0] > hi) or (
                    lo is not None and mm[1] < lo
                ):
                    drop = True
                    break
        if not drop:
            kept.append(os.path.join(path, name))
    return kept, len(state["files"])


def read_manifest_sink(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prune: dict | None = None,
) -> DataFrame:
    """Read a manifest-committed directory THROUGH its commit log: only
    the files the resolved manifests list (staged-but-uncommitted and
    orphaned-attempt files are invisible — that is the protocol's whole
    guarantee). ``version=k`` time-travels to the snapshot as of commit
    k — for a streamed directory, the first k+1 micro-batches; for a
    batch log, everything up to the k-th job — and a concurrent IN-FLIGHT
    job is invisible at any pinned version (its commit, if it lands,
    gets a version number > k). The read schema is PINNED to what the
    resolved commits recorded at write time (never inferred when a
    recorded schema exists), and the read is distributed — Spark's JSON
    or parquet reader over the explicit file list. ``prune={col: (lo,
    hi)}`` additionally drops files whose commit-recorded min/max PROVE
    they hold no matching row (see :func:`prune_manifest_files`) — a
    superset guarantee, so pair it with the real ``.filter``."""
    state = _resolve_state(path, version)
    files = [os.path.join(path, name) for name in state["files"]]
    if not files:
        raise ValueError(
            f"no committed manifest files under {path}"
            + (f" at version <= {version}" if version is not None else "")
        )
    fmt, schema = _pin_read_schema(state["metas"])
    if prune:
        files, _total = prune_manifest_files(path, prune, version)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if not files:  # everything provably pruned: an empty, schema-true frame
        return spark.createDataFrame([], schema=schema)
    if fmt == "parquet":
        return reader.parquet(*files)
    return reader.json(files)


def optimize_manifest_sink(
    spark: SparkSession, path: str, target_files: int = 4
) -> None:
    """OPTIMIZE for the batch commit log: small-file compaction of the
    DATA through the log itself — read the current snapshot, rewrite it
    as ``target_files`` staged files, publish ONE overwrite commit. The
    rewrite is just another commit, so readers never observe a partial
    state, pre-optimize versions stay time-travelable until expired, and
    expire + vacuum then reclaim the superseded small files — the
    OPTIMIZE / retention / VACUUM triad table formats ship. Stream
    directories have the metadata-level counterpart
    (:func:`compact_stream_manifests`) instead: their family guard
    correctly refuses a batch overwrite, and their small-file story is
    per-batch manifests, not per-task files. Caveat shared with every
    table format: the overwrite commit is a history rewrite, so run it
    below active streaming readers' offsets (the ``manifestlog`` source
    raises on it by default)."""
    state = _resolve_state(path)
    if state["kind"] != "batch":
        raise ValueError(
            f"optimize_manifest_sink expects a batch commit log; {path} "
            "holds a stream log — use compact_stream_manifests there"
        )
    fmts = {m.get("format", "jsonl") for m in state["metas"]}
    fmt = fmts.pop() if len(fmts) == 1 else "parquet"
    (
        read_manifest_sink(spark, path)
        .repartition(target_files)
        .write.format("manifestsink")
        .option("path", path)
        .option("format", fmt)
        .mode("overwrite")
        .save()
    )


def manifest_history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY for the manifest log (Delta's operation-audit
    idea): one row per surviving commit — version, writer family, mode
    (append delta / overwrite base), rows and files it published, its
    recorded field list, and whether it is a stream compaction. Driver
    reads only the small manifest JSONs (metadata-class, same bound as
    the catalog ops) and hands Spark the rows, so the report is
    queryable like any DataFrame. Expired versions don't appear — the
    history is exactly what time travel can still reach."""
    rows = []
    for v, kind, man in _list_commits(path):
        rows.append(
            (
                v,
                kind,
                man.get("mode", "append"),
                man.get("n_rows"),
                len(man.get("files", [])),
                ",".join(man.get("fields") or []),
                man.get("format", "jsonl"),
                "compacted_through" in man,
            )
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "version long, kind string, mode string, n_rows long, "
            "n_files int, fields_csv string, format string, is_compaction boolean"
        ),
    )


def compact_stream_manifests(path: str, upto_batch: int) -> str:
    """Rewrite a STREAM directory's per-batch manifests for batches
    ``<= upto_batch`` into ONE BASE manifest at ``_MANIFEST-<upto_batch>``
    — metadata only, no data file is read or moved. A raw stream log is
    all deltas, so it can never be expired (there is no base to floor
    on); after compaction the log's head is a base, making
    :func:`expire_manifest_versions` + :func:`vacuum_manifest_sink`
    legal on streamed history too — the missing half of stream
    retention.

    Refuses to compact the NEWEST batch: after a restart Spark may
    replay the last committed micro-batch, and that replay republishes
    ``_MANIFEST-<batchId>`` last-wins — landing on a delta it owns is
    idempotent, landing on a compacted base would clobber every older
    batch. Compacting strictly below the newest batch is safe because
    the engine never replays batches before the last committed one.

    Crash-safe and idempotent: the base is published FIRST (resolution
    is already correct with the covered deltas still present — the base
    resets them), then the covered deltas are unlinked; a re-run folds
    the existing base into an identical one. Returns the published
    manifest name."""
    kind, commits, _ck = _scan_names(path)
    if kind != "stream":
        raise ValueError(
            f"compact_stream_manifests expects a stream-written directory; "
            f"{path} holds {'a batch commit log' if kind == 'batch' else 'no log'}"
        )
    newest = commits[-1][0]
    if upto_batch >= newest:
        raise ValueError(
            f"can only compact strictly below the newest batch ({newest}): "
            "Spark may replay the last committed batch after a restart, and "
            "the replay's last-wins republish would clobber a base there"
        )
    covered = [(v, name) for v, name in commits if v <= upto_batch]
    if not covered:
        raise ValueError(f"no stream manifests at or below batch {upto_batch}")
    files: list[str] = []
    metas: list[dict] = []
    n_rows = 0
    for v, name in covered:
        man = _load(path, name)
        if man.get("mode", "append") == "overwrite":
            files, metas, n_rows = [], [], 0  # an earlier compaction's base
        files.extend(man["files"])
        n_rows += man["n_rows"]
        if man["files"]:
            m = _meta_of(man)
            if m not in metas:
                metas.append(m)
    # the compacted base must present ONE coherent schema — reuse the
    # reader's drift rules so compaction can't paper over a drifted log
    fmt, schema = _pin_read_schema(metas)
    fields = sorted({f for m in metas for f in (m.get("fields") or [])})
    manifest = {
        "files": files,
        "n_rows": n_rows,
        "fields": fields,
        "format": fmt,
        "mode": "overwrite",
        "batch_id": upto_batch,
        "compacted_through": upto_batch,
    }
    if schema is not None:
        manifest["schema_json"] = schema.json()
        manifest["fields"] = schema.fieldNames()
    published = f"{_B_PREFIX}{upto_batch}"
    _publish_last_wins(path, published, manifest)
    for _v, name in covered:
        if name != published:
            os.remove(os.path.join(path, name))
    return published


def expire_manifest_versions(path: str, min_version: int) -> list[str]:
    """Retention boundary for time travel: drop commit manifests with
    version < ``min_version`` from the log (their data files become
    unreferenced unless a surviving manifest also lists them — run
    :func:`vacuum_manifest_sink` afterwards to reclaim). Refuses to
    expire past the newest BASE commit at or below ``min_version``'s
    snapshot — expiring a base a surviving delta still builds on would
    corrupt every later snapshot, so the floor is validated, not
    trusted. Consequence, stated plainly: a RAW stream directory
    (per-batch delta manifests, no base commits ever) can never be
    expired — there retention would DELETE rows from the current
    snapshot, not clean up superseded history, which is a different,
    deliberately-destructive operation (a TTL sweep) this function
    refuses to impersonate. Run :func:`compact_stream_manifests` first
    to give streamed history a base. Checkpoints summarizing only
    expired prefixes are dropped alongside their commits. Returns the
    removed manifest/checkpoint names."""
    kind, commits, ckpts = _scan_names(path)
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
    first_keep_man = _load(path, keep[0][1])
    if dropped and first_keep_man.get("mode", "append") != "overwrite":
        raise ValueError(
            f"cannot expire below version {min_version}: commit "
            f"{keep[0][0]} is a delta that builds on expired history — "
            "choose a BASE (overwrite) commit as the retention floor"
        )
    removed = []
    for _v, name in dropped:
        os.remove(os.path.join(path, name))
        removed.append(name)
    surviving_ckpts = []
    for v, name in ckpts:
        if v < min_version:
            os.remove(os.path.join(path, name))
            removed.append(name)
        else:
            surviving_ckpts.append(v)
    # repair the hint if its checkpoint was just expired (stale hints are
    # only a perf matter — the resolve fallback is correct — but cheap to fix)
    hint = _read_hint(path)
    if hint and hint.get("checkpoint") is not None and int(hint["checkpoint"]) < min_version:
        _write_hint(
            path,
            hint.get("kind", "batch"),
            int(hint.get("version", keep[-1][0])),
            surviving_ckpts[-1] if surviving_ckpts else None,
        )
    return removed


def vacuum_manifest_sink(
    path: str, grace_seconds: float = VACUUM_GRACE_SECONDS
) -> list[str]:
    """Sweep data files no SURVIVING manifest references — the residue of
    aborted jobs, failed speculative attempts, batch retries that staged
    under a fresh uuid before republishing, and generations dropped by
    :func:`expire_manifest_versions`. A file becomes visible only by
    appearing in a manifest, and manifests are only ever published after
    their files are fully staged — but a CONCURRENT job's
    staged-not-yet-committed files are indistinguishable from orphans,
    so only files older than ``grace_seconds`` (default 10 minutes) are
    reclaimed: any in-flight job's staging is younger than that, exactly
    the retention gate real table formats put in front of VACUUM. Pass
    ``grace_seconds=0`` only when no writer is in flight. Time-traveled
    snapshots remain intact until their manifests are expired — vacuum
    consults EVERY manifest still in the log (and every checkpoint,
    defensively), not just the latest snapshot. Returns the removed file
    names; driver-side listing only — the directory's file count is the
    same metadata-class bound as the catalog ops."""
    kind, commits, ckpts = _scan_names(path)
    referenced: set[str] = set()
    for _v, name in commits:
        referenced.update(_load(path, name)["files"])
    for _v, name in ckpts:
        referenced.update(_load(path, name)["files"])
    cutoff = time.time() - grace_seconds
    removed = []
    for name in sorted(os.listdir(path)):
        if not name.endswith((".jsonl", ".parquet")) or name in referenced:
            continue
        full = os.path.join(path, name)
        if os.path.getmtime(full) > cutoff:
            continue  # could be a concurrent job's staging — too young
        os.remove(full)
        removed.append(name)
    return removed
