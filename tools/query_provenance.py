"""Per-query change provenance vs attestation rounds.

Answers, mechanically, the question every round's judge checks by hand:
"is each registry query's green CORRECTNESS row still valid, i.e. has
its code changed since the round that attested it?" — and, for stale
rows outside the current window, documents the unchanged-ness guarantee
("green at r05 + untouched since") without replaying history.

Per query it computes the last commit touching:
- the query function block itself (``git log -L start,end:file`` —
  function-level history, so churn elsewhere in queries_catalog.py does
  NOT dirty unrelated queries), which includes the ``@_register(...)``
  decorator and therefore the oracle SQL string; and
- every package callable the function imports IN ITS BODY (the repo
  convention keeps operator imports function-local), ALSO at function
  granularity — so a module-level refactor elsewhere in dedup.py does
  not dirty a query whose one imported operator is untouched. Imported
  names that aren't introspectable functions/classes fall back to file
  granularity.

Scope notes: universal glue (load_testdata/_t/_register, session.py) is
deliberately excluded — every attestation round exercises it under all
50 window queries, so it can never be silently stale; including it
would flag all 188 queries on any loader touch and drown the signal.
Depth is 1: a change to a module-private helper called by an imported
operator is not traced (the helper's callers almost always change in
the same commit; the per-round judge diff remains the backstop).

A query is CHANGED-SINCE-ATTESTATION iff any of those commits is NOT an
ancestor of its latest-green round's boundary commit (the ``round N:
verdict`` commit — only driver artifacts land between the end-of-round
snapshot the driver attested and that boundary).

Usage:
    python tools/query_provenance.py            # full markdown table
    python tools/query_provenance.py --check    # exit 1 if any changed
        query is missing from the ledger's changed_lead (i.e. would not
        get a fresh attestation row next round)
    python tools/query_provenance.py --changed  # print just the changed
        set, comma-separated (feed to attestation_ledger.py --changed)
"""

from __future__ import annotations

import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "fiap_machine_learning_tech_challenge_2_etl_spark"
IMPORT_RE = re.compile(
    rf"from {PKG}((?:\.\w+)+) import \(?([\w,\s]+?)\)?$", re.MULTILINE
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def boundary_commit(rnd: int) -> str | None:
    out = _git("log", "--format=%H", "--grep", f"^round {rnd}: verdict", "-1")
    return out or None


def is_ancestor(commit: str, boundary: str) -> bool:
    if commit == DIRTY_SENTINEL:
        return False
    r = subprocess.run(
        ["git", "merge-base", "--is-ancestor", commit, boundary],
        cwd=REPO,
        capture_output=True,
    )
    return r.returncode == 0


def _dirty_files() -> set[str]:
    out = _git("status", "--porcelain")
    return {line[3:].strip() for line in out.splitlines() if line.strip()}


DIRTY = None  # populated in main()
DIRTY_SENTINEL = "DIRTY-WORKTREE"


def fn_last_commit(fn) -> tuple[str, str]:
    """(commit, 'file:start-end') of the last change to the function block
    (decorators included, so the oracle SQL literal counts). A file with
    uncommitted modifications returns a sentinel commit that is never an
    ancestor of any boundary — live line numbers don't align with HEAD
    content, so ``-L`` would trace the wrong range (or fall off the end of
    the HEAD version); conservatively everything in a dirty file counts as
    changed until committed."""
    file = os.path.relpath(inspect.getsourcefile(fn), REPO)
    if DIRTY and file in DIRTY:
        return DIRTY_SENTINEL, file
    lines, start = inspect.getsourcelines(fn)
    start = max(start, 1)  # modules report start=0; -L is 1-based
    end = max(start + len(lines) - 1, start)
    commit = _git("log", "-1", "--format=%H", f"-L{start},{end}:{file}", "--no-patch")
    # -L output includes the commit hash on the first line even with
    # --no-patch on some git versions emitting diffs; take the first token
    commit = commit.splitlines()[0].strip()
    return commit, f"{file}:{start}-{end}"


def body_deps(fn) -> list[tuple[str, object | None]]:
    """(label, callable-or-None) per imported package name in the body;
    callable present -> function-level tracking, None -> file-level."""
    import importlib

    src = inspect.getsource(fn)
    deps: list[tuple[str, object | None]] = []
    seen: set[str] = set()
    for m in IMPORT_RE.finditer(src):
        mod_path = PKG + m.group(1)
        names = [n.strip() for n in m.group(2).split(",") if n.strip()]
        rel = os.path.join(*mod_path.split(".")) + ".py"
        for name in names:
            name = name.split(" as ")[0].strip()
            label = f"{mod_path}.{name}"
            if label in seen:
                continue
            seen.add(label)
            obj = None
            try:
                obj = getattr(importlib.import_module(mod_path), name)
                inspect.getsourcelines(obj)  # introspectable?
            except Exception:
                try:
                    # `from pkg.sub import module` — submodules aren't
                    # attributes until imported; import directly and track
                    # the module file as a whole
                    obj = importlib.import_module(f"{mod_path}.{name}")
                    inspect.getsourcelines(obj)
                except Exception:
                    obj = None
            deps.append((label if obj is not None else rel, obj))
    return deps


def file_last_commit(rel: str) -> str:
    if DIRTY and rel in DIRTY:
        return DIRTY_SENTINEL
    return _git("log", "-1", "--format=%H", "--", rel)


def main(argv: list[str]) -> int:
    from fiap_machine_learning_tech_challenge_2_etl_spark import queries_catalog

    check = "--check" in argv
    changed_only = "--changed" in argv
    global DIRTY
    DIRTY = _dirty_files()

    with open(os.path.join(REPO, "ATTESTATION_LEDGER.json")) as f:
        ledger = json.load(f)
    greens = {q: v["latest_green"] for q, v in ledger["queries"].items()}
    boundaries = {
        r: boundary_commit(r) for r in sorted({g for g in greens.values() if g})
    }

    dep_cache: dict[str, str] = {}
    short = lambda c: c[:7] if c else "-"
    changed: list[str] = []
    rows: list[str] = []
    for name, fn in queries_catalog.SPARK_QUERIES.items():
        fn_commit, loc = fn_last_commit(fn)
        dep_commits = []
        for label, obj in body_deps(fn):
            if label not in dep_cache:
                dep_cache[label] = (
                    fn_last_commit(obj)[0] if obj is not None else file_last_commit(label)
                )
            dep_commits.append((label, dep_cache[label]))
        g = greens.get(name)
        bnd = boundaries.get(g) if g else None
        stale_srcs = []
        if bnd:
            if not is_ancestor(fn_commit, bnd):
                stale_srcs.append(f"fn@{short(fn_commit)}")
            for label, c in dep_commits:
                if not is_ancestor(c, bnd):
                    stale_srcs.append(f"{label.rsplit('.', 1)[-1]}@{short(c)}")
        status = "CHANGED: " + ",".join(stale_srcs) if stale_srcs else "attested"
        if stale_srcs or g is None:
            changed.append(name)
        rows.append(
            f"| {name} | r{g or '--'} | {short(fn_commit)} | "
            f"{','.join(short(c) for _, c in dep_commits) or '-'} | {status} |"
        )

    if changed_only:
        print(",".join(changed))
        return 0
    if check:
        lead = set(ledger.get("changed_lead") or [])
        missing = [q for q in changed if q not in lead]
        if missing:
            print(
                f"STALE: {len(missing)} queries changed since their attestation "
                f"round but absent from changed_lead: {missing}"
            )
            return 1
        print(f"provenance clean: {len(changed)} changed, all in changed_lead")
        return 0
    print("| query | green | fn last commit | body-dep last commits | status |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(r)
    print(f"\n{len(changed)} changed-since-attestation: {changed}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
