"""Unit tests for tools/attestation_ledger.py — the machine-readable
attestation ledger that generates ``__spark_entry__._PRIORITY``. Pure
Python (no Spark session): the window-rotation policy is driver-facing
bookkeeping and must be deterministic and auditable."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from attestation_ledger import WINDOW, is_green, load_ledger, proposed_window


def test_is_green_semantics():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    assert is_green(ok)
    assert not is_green({**ok, "err": "boom"})
    assert not is_green({**ok, "rows_match": False})
    assert not is_green({**ok, "hash_match": False})
    assert not is_green({**ok, "schema_match": False})
    # rows-only records (hash/schema absent) still count as green
    assert is_green({"rows_match": True, "err": None})


def test_proposed_window_orders_stalest_first():
    registry = [f"q{i}" for i in range(60)]
    ledger = {q: {"latest_green": 2} for q in registry}
    for q in registry[:5]:
        ledger[q] = {"latest_green": 3}  # freshest
    ledger["q10"] = {"latest_green": None}  # never attested
    ledger["q20"] = {"latest_green": 1}  # stalest green
    win = proposed_window(ledger, registry)
    assert len(win) == WINDOW
    assert win[0] == "q10"  # never-attested leads
    assert win[1] == "q20"  # then stalest green
    # the 5 freshest rows are the ones squeezed out (60 - 50 = 10 cut,
    # cut from the r3 set first, then the newest-position r2 rows)
    assert not set(registry[:5]) & set(win)


def test_proposed_window_changed_outranks_freshness():
    registry = [f"q{i}" for i in range(60)]
    ledger = {q: {"latest_green": 2} for q in registry}
    ledger["q59"] = {"latest_green": 5}  # freshest, but changed
    win = proposed_window(ledger, registry, changed=["q59"])
    assert win[0] == "q59"
    # never-attested still outranks changed
    ledger["q58"] = {"latest_green": None}
    win = proposed_window(ledger, registry, changed=["q59"])
    assert win[:2] == ["q58", "q59"]


def test_proposed_window_rejects_unknown_changed():
    registry = ["a", "b"]
    ledger = {q: {"latest_green": 1} for q in registry}
    try:
        proposed_window(ledger, registry, changed=["nope"])
    except SystemExit as e:
        assert "nope" in str(e)
    else:
        raise AssertionError("expected SystemExit for unknown --changed name")


def test_committed_ledger_matches_correctness_files():
    """The committed ATTESTATION_LEDGER.json must be reproducible from
    the CORRECTNESS_r*.json files it claims to summarize.

    Round-boundary tolerant: the driver drops CORRECTNESS_r{N}.json AFTER
    the builder's last commit of round N, so a newer file than the
    ledger's recorded ``max_round`` is expected at every round start —
    the comparison is bounded to the rounds the ledger actually saw."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(repo, "ATTESTATION_LEDGER.json")
    if not os.path.exists(path):
        return
    committed = json.load(open(path))
    fresh = load_ledger(max_round=committed.get("max_round"))
    for q, rec in committed["queries"].items():
        if rec["latest_seen"] is None:
            # a registry query added this round: legitimately in no
            # CORRECTNESS file yet (it leads the window as never-attested).
            # The inverse must hold too — a ledger claiming never-seen for
            # a query the CORRECTNESS history DOES contain is stale/edited.
            assert rec["latest_green"] is None, q
            assert q not in fresh, f"{q} marked never-seen but attested"
            continue
        assert q in fresh, f"{q} in ledger but in no CORRECTNESS file"
        assert rec["latest_green"] == fresh[q]["latest_green"], q


def test_load_ledger_max_round_bounds_files():
    """load_ledger(max_round=N) must ignore CORRECTNESS files > N; with
    no bound it must see the newest round."""
    unbounded = load_ledger()
    newest = max(v["latest_seen"] for v in unbounded.values())
    assert newest >= 2
    bounded = load_ledger(max_round=newest - 1)
    assert all(v["latest_seen"] <= newest - 1 for v in bounded.values())
    assert any(v["latest_seen"] == newest for v in unbounded.values())


@pytest.mark.slow
def test_query_provenance_check_clean():
    """Every query whose function block or body-imported operator changed
    after its latest-green round must be in the committed ledger's
    changed_lead (i.e. gets a fresh attestation row next round). Slow:
    one function-level `git log -L` per registry query."""
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "query_provenance.py"), "--check"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_attestation_freshness_never_decays():
    """Steady-state freshness invariant: with N registry rows and a
    50-row per-round window, every row re-attests within ceil(N/50)
    rounds (+1 slack for rounds whose window is partly consumed by
    never-attested or changed-operator leads), so the oldest latest-green
    round must never trail the ledger's max_round by more. The bound is
    DERIVED from the live registry size so growing the registry tightens
    or loosens it honestly instead of silently invalidating a hardcoded
    4. A violation means window rotation regressed (e.g. a cohort was
    skipped) and stale attestations are silently accumulating."""
    import math

    repo = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(repo, "ATTESTATION_LEDGER.json")
    if not os.path.exists(path):
        pytest.skip("no committed ledger")
    committed = json.load(open(path))
    max_round = committed["max_round"]
    greens = [
        rec["latest_green"]
        for rec in committed["queries"].values()
        if rec["latest_green"] is not None
    ]
    assert greens, "ledger has no green rows at all"
    oldest = min(greens)
    bound = math.ceil(len(committed["queries"]) / 50) + 1
    assert oldest >= max_round - bound, (
        f"oldest green attestation is r{oldest}, more than {bound} rounds "
        f"behind ledger max_round r{max_round} — window rotation has stalled"
    )
