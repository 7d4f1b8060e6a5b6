"""Per-query change provenance vs attestation rounds.

Answers, mechanically, the question every round's judge checks by hand:
"is each registry query's green CORRECTNESS row still valid, i.e. has
its code changed since the round that attested it?" — and, for stale
rows outside the current window, documents the unchanged-ness guarantee
("green at r05 + untouched since") without replaying history.

Method: CONTENT hashing, not line-range tracing. For each query, the
tool extracts (via ``ast``) the source text of
- the query function block itself, decorators included — so the
  ``@_register(...)`` oracle SQL literal counts — and
- every package callable the function imports IN ITS BODY (the repo
  convention keeps operator imports function-local); imported
  submodules or non-extractable names fall back to whole-file text,
from BOTH the current worktree and the file as it existed at the
query's latest-green round boundary commit (the ``round N: verdict``
commit — only driver artifacts land between the end-of-round snapshot
the driver attested and that commit). The query is
CHANGED-SINCE-ATTESTATION iff any extracted text differs. Comparing
content (rather than ``git log -L`` line ranges) means an insertion
ADJACENT to an untouched function does not false-flag it, and a dirty
worktree is handled naturally — the current side reads files, not
history.

Scope notes: universal glue (load_testdata/_t/_register, session.py) is
deliberately excluded — every attestation round exercises it under all
50 window queries, so it can never be silently stale; including it
would flag all ~190 queries on any loader touch and drown the signal.
Depth is 1: a change to a module-private helper called by an imported
operator is not traced (the helper's callers almost always change in
the same commit; the per-round judge diff remains the backstop).

Usage:
    python tools/query_provenance.py            # full markdown table
    python tools/query_provenance.py --check    # exit 1 if any changed
        query is missing from the ledger's changed_lead (i.e. would not
        get a fresh attestation row next round)
    python tools/query_provenance.py --changed  # print just the changed
        set, comma-separated (feed to attestation_ledger.py --changed)
"""

from __future__ import annotations

import ast
import inspect
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "fiap_machine_learning_tech_challenge_2_etl_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def boundary_commit(rnd: int) -> str | None:
    out = _git("log", "--format=%H", "--grep", f"^round {rnd}: verdict", "-1")
    return out or None


def file_at(commit: str, rel: str) -> str | None:
    """File content at a commit, or None if it didn't exist there."""
    r = subprocess.run(
        ["git", "show", f"{commit}:{rel}"], cwd=REPO, capture_output=True, text=True
    )
    return r.stdout if r.returncode == 0 else None


def extract_block(text: str | None, fn_name: str) -> str | None:
    """Source text of top-level ``def fn_name`` (decorators included), or
    None if absent/unparseable. Registry queries and operators are all
    top-level defs, so no qualname walk is needed."""
    if text is None:
        return None
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return None
    lines = text.splitlines()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and (
            node.name == fn_name
        ):
            start = min([d.lineno for d in node.decorator_list] + [node.lineno])
            return "\n".join(lines[start - 1 : node.end_lineno])
    return None


def _body_imports(fn) -> list[tuple[str, str]]:
    """(module_path, name) pairs for every ``from <pkg>... import ...``
    in the function body, parsed with ``ast`` — a regex over the source
    silently dropped names after the first line of multi-line
    parenthesized imports, leaving those operators untracked by the
    staleness gate."""
    import textwrap

    src = textwrap.dedent(inspect.getsource(fn))
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return []
    out: list[tuple[str, str]] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module == PKG or node.module.startswith(PKG + ".")
        ):
            for alias in node.names:
                out.append((node.module, alias.name))
    return out


def body_deps(fn) -> list[tuple[str, str, str | None]]:
    """(label, rel_file, fn_name-or-None) per package import in the body;
    fn_name None -> whole-file tracking (submodule import or
    non-extractable name)."""
    import importlib

    deps: list[tuple[str, str, str | None]] = []
    seen: set[str] = set()
    for mod_path, name in _body_imports(fn):
        label = f"{mod_path}.{name}"
        if label in seen:
            continue
        seen.add(label)
        try:
            obj = getattr(importlib.import_module(mod_path), name)
        except AttributeError:
            obj = None
        if inspect.isfunction(obj):
            rel = os.path.relpath(inspect.getsourcefile(obj), REPO)
            deps.append((label, rel, obj.__name__))
        elif inspect.isclass(obj):
            # CLASS deps track the WHOLE FILE, not the class block:
            # extract_block only matches top-level defs (a class name
            # hashed to None on both sides, i.e. silently untracked —
            # the r12 blind spot where SynthDocsStreamReader changed but
            # the query importing SynthDocsDataSource stayed "attested"),
            # and classes routinely delegate to module siblings the block
            # wouldn't cover. Whole-file is conservatively noisy, never
            # silently stale.
            rel = os.path.relpath(inspect.getsourcefile(obj), REPO)
            deps.append((label, rel, None))
        else:
            # submodule import (or constant): track the module file text
            try:
                sub = importlib.import_module(f"{mod_path}.{name}")
                rel = os.path.relpath(inspect.getsourcefile(sub), REPO)
            except Exception:
                rel = os.path.join(*mod_path.split(".")) + ".py"
            deps.append((label, rel, None))
    return deps


def main(argv: list[str]) -> int:
    from fiap_machine_learning_tech_challenge_2_etl_spark import queries_catalog

    check = "--check" in argv
    changed_only = "--changed" in argv

    with open(os.path.join(REPO, "ATTESTATION_LEDGER.json")) as f:
        ledger = json.load(f)
    greens = {q: v["latest_green"] for q, v in ledger["queries"].items()}
    boundaries = {
        r: boundary_commit(r) for r in sorted({g for g in greens.values() if g})
    }

    cur_text: dict[str, str | None] = {}
    old_text: dict[tuple[str, str], str | None] = {}

    def current(rel: str) -> str | None:
        if rel not in cur_text:
            p = os.path.join(REPO, rel)
            cur_text[rel] = open(p).read() if os.path.exists(p) else None
        return cur_text[rel]

    def at_boundary(commit: str, rel: str) -> str | None:
        key = (commit, rel)
        if key not in old_text:
            old_text[key] = file_at(commit, rel)
        return old_text[key]

    def block_changed(commit: str, rel: str, fn_name: str | None) -> bool:
        """True iff the tracked text (function block, or whole file when
        fn_name is None) differs between the boundary commit and now.
        Absent-at-boundary counts as changed (the code is newer than the
        attestation)."""
        now = current(rel)
        then = at_boundary(commit, rel)
        if fn_name is None:
            return now != then
        return extract_block(now, fn_name) != extract_block(then, fn_name)

    changed: list[str] = []
    rows: list[str] = []
    for name, fn in queries_catalog.SPARK_QUERIES.items():
        fn_rel = os.path.relpath(inspect.getsourcefile(fn), REPO)
        deps = body_deps(fn)
        g = greens.get(name)
        bnd = boundaries.get(g) if g else None
        stale_srcs = []
        if bnd:
            if block_changed(bnd, fn_rel, fn.__name__):
                stale_srcs.append("fn")
            for label, rel, dep_fn in deps:
                if block_changed(bnd, rel, dep_fn):
                    stale_srcs.append(label.rsplit(".", 1)[-1])
        status = "CHANGED: " + ",".join(stale_srcs) if stale_srcs else "attested"
        if stale_srcs or g is None:
            changed.append(name)
        dep_names = ",".join(lbl.rsplit(".", 1)[-1] for lbl, _, _ in deps) or "-"
        rows.append(f"| {name} | r{g or '--'} | {dep_names} | {status} |")

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
    print("| query | green | body deps | status |")
    print("|---|---|---|---|")
    for r in rows:
        print(r)
    print(f"\n{len(changed)} changed-since-attestation: {changed}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
