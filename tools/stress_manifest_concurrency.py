"""TRUE multi-process concurrency stress for the manifest commit log
(sources/pysink.py).

The log's safety story is "concurrent appends cannot lose each other's
updates: the exclusive os.link claim linearizes them". The unit tests
reproduce the interleaving at the protocol level (two writer objects in
one process); this stress drives N REAL processes committing
concurrently — the actual race, with the kernel as the arbiter — and
asserts the full invariant set afterwards:

- versions are DENSE 1..N*C with no duplicates (every claim was truly
  exclusive; no writer skipped or reused a number),
- resolution lists EXACTLY the N*C staged files — no lost update, no
  double-count — byte-identical through the fast path (hint + dense
  probe) and the slow path (full name scan),
- every CHECKPOINT that any racing writer published equals the
  slow-scan resolution at its version (checkpoint content is a pure
  function of the log prefix, so losing the publication race must mean
  the identical rollup already exists),
- the _LAST_CHECKPOINT hint names a real committed version (staleness
  allowed — it is an accelerator — but it can never point past the
  log),
- vacuum(grace=0) reclaims nothing (every staged file is referenced).

Prints a markdown row (ms/commit under contention vs the single-writer
figure); paste into BENCH_NOTES.md.

Usage: python tools/stress_manifest_concurrency.py [n_procs] [commits_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(args: tuple) -> float:
    """One writer process: stage + commit `n` times in a shared directory.
    Returns its wall time. (Module-level so mp can pickle it on spawn.)"""
    d, wid, n = args
    from pyspark.sql.types import LongType, StructField, StructType

    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.pysink import (
        ManifestSinkWriter,
        _StagedFile,
    )

    schema = StructType([StructField("id", LongType())])
    t0 = time.time()
    for i in range(n):
        name = f"part-{wid:05d}-{i:08d}.jsonl"
        with open(os.path.join(d, name), "w") as f:
            f.write(f'{{"id": {wid * 1000000 + i}}}\n')
        ManifestSinkWriter({"path": d}, schema, overwrite=False).commit(
            [_StagedFile(name, 1)]
        )
    return time.time() - t0


def run_concurrency(d: str, n_procs: int, commits_per_proc: int) -> dict:
    """Importable core (pytest gate wraps it at a smaller size)."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.pysink import (
        _CKPT_PREFIX,
        _HINT,
        _V_PREFIX,
        _read_hint,
        resolve_manifest_files,
        vacuum_manifest_sink,
    )

    os.makedirs(d, exist_ok=True)
    total = n_procs * commits_per_proc
    t0 = time.time()
    with mp.get_context("spawn").Pool(n_procs) as pool:
        walls = pool.map(
            _worker, [(d, w, commits_per_proc) for w in range(n_procs)]
        )
    wall = time.time() - t0

    # 1. dense, duplicate-free version space
    versions = sorted(
        int(f[len(_V_PREFIX):]) for f in os.listdir(d) if f.startswith(_V_PREFIX)
    )
    assert versions == list(range(1, total + 1)), (
        f"version space not dense: {len(versions)} commits, "
        f"head={versions[:5]} tail={versions[-5:]}"
    )

    # 2. no lost update: resolution lists exactly the staged files,
    # fast path == slow path
    fast = resolve_manifest_files(d)
    hint_path = os.path.join(d, _HINT)
    os.rename(hint_path, hint_path + ".bak")
    slow = resolve_manifest_files(d)
    os.rename(hint_path + ".bak", hint_path)
    assert sorted(fast) == sorted(slow), "fast/slow resolution diverged"
    assert len(fast) == total and len(set(fast)) == total
    staged = {f for f in os.listdir(d) if f.endswith(".jsonl")}
    assert staged == {os.path.basename(p) for p in fast}

    # 3. every published checkpoint equals the slow-scan resolution at
    # its version (pure-function property under racing writers)
    ckpts = sorted(
        (int(f[len(_CKPT_PREFIX):]), f)
        for f in os.listdir(d)
        if f.startswith(_CKPT_PREFIX)
    )
    assert ckpts, "no checkpoints published under contention"
    os.rename(hint_path, hint_path + ".bak")  # force slow path
    for v, name in ckpts:
        with open(os.path.join(d, name)) as f:
            ck = json.load(f)
        want = resolve_manifest_files(d, version=v)
        assert [os.path.join(d, x) for x in ck["files"]] == want, (
            f"checkpoint {v} diverges from slow-scan resolution"
        )
    os.rename(hint_path + ".bak", hint_path)

    # 4. hint names a real version (stale-low allowed, never past the log)
    hint = _read_hint(d)
    assert hint["kind"] == "batch" and 1 <= int(hint["version"]) <= total

    # 5. nothing to vacuum: every staged file is referenced
    assert vacuum_manifest_sink(d, grace_seconds=0) == []

    return {
        "n_procs": n_procs,
        "total": total,
        "wall": wall,
        "ms_per_commit": 1000 * wall / total,
        "n_ckpts": len(ckpts),
        "max_worker_wall": max(walls),
    }


def main() -> None:
    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    d = os.path.join(_REPO, "_scratch", "stress_manifest_concurrency")
    shutil.rmtree(d, ignore_errors=True)
    r = run_concurrency(d, n_procs, per)
    print(
        "| manifest_log concurrency %d procs x %d commits | %.2f s wall "
        "(%.2f ms/commit under contention) | versions dense, zero lost "
        "updates, %d checkpoints all pure, fast==slow resolve |"
        % (r["n_procs"], r["total"] // r["n_procs"], r["wall"],
           r["ms_per_commit"], r["n_ckpts"])
    )


if __name__ == "__main__":
    main()
