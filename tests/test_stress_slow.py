"""Replica-scale stress gates (``pytest -m slow``).

The ad-hoc smokes in tools/stress_*.py carry the repo's empirical scale
story (BENCH_NOTES.md); these wrappers run the same code at the 10x
replica scale with the structural invariants ASSERTED, so a regression
in the scale story fails a gate instead of only drifting a doc table:

- graph ops: result rows scale EXACTLY x-reps over disjoint congruent
  replicas (any deviation = cross-replica label/frontier leakage) and
  connected_components converges in the SAME round count on both legs
  (rounds are a function of structure, not size);
- dedup pair ops: ZERO cross-replica pairs (banding/blocking never
  proposes a candidate across disjoint vocabularies);
- quadratic embedding kernels: the sqrt-scaled n_blocks guidance holds
  per-task memory flat — completing the 10x leg on a bounded heap IS
  the invariant (an OOM or task blowup fails the run);
- streaming ops: exactly-once across micro-batches/redelivery,
  streaming-state == batch-aggregation equality at 10x the state keys,
  and the materialized rollup's late-data refresh rewriting ONLY the
  touched day partitions (untouched files byte-identical across waves);
- ANN ops: banded-LSH near-dup recovers EXACTLY the planted twin-pair
  set (count == reps x base, zero non-planted pairs across replicas
  rotated into mutual near-orthogonality) and IVF/LSH top-k searches
  self-retrieve their query vector at both scales.

Timings are recorded but never asserted: this VM's wall-clock swings
10-30% with ambient load, so time-ratio regressions are adjudicated by
min-of-3 manual re-measure (see BENCH_NOTES.md), not a CI gate.

Base fixture defaults to sf0.01 for gate runtime; set
SPARK_GRAFT_STRESS_SF_DIR=/root/testdata/sf0.1 to reproduce the
BENCH_NOTES evidence scale.
"""

from __future__ import annotations

import os

import pytest

from tools import (
    stress_ann,
    stress_asof,
    stress_dedup,
    stress_ewma,
    stress_graph,
    stress_quadratic,
    stress_streaming,
)

STRESS_DIR = os.environ.get(
    "SPARK_GRAFT_STRESS_SF_DIR", "/root/testdata/sf0.01"
)


def _quiet(*_args, **_kw):  # suppress the scripts' markdown tables under pytest
    pass


@pytest.mark.slow
def test_graph_ops_replica_invariants_10x(spark):
    rows = stress_graph.run_stress(spark, STRESS_DIR, reps=10, emit=_quiet)
    # run_stress already asserts exact x10 row scaling + equal CC rounds;
    # re-check the shape here so a silent no-op refactor can't pass.
    assert {r["op"] for r in rows} == {
        "connected_components",
        "pagerank_fixed(3)",
        "bfs_hops(3)",
        "shortest_paths_weighted(3)",
        "label_propagation(2)",
    }
    for r in rows:
        assert r["rows_scaled"] == 10 * r["rows_base"], r


@pytest.mark.slow
def test_dedup_pair_ops_zero_cross_replica_10x(spark):
    rows = stress_dedup.run_stress(spark, STRESS_DIR, reps=10, emit=_quiet)
    pair_rows = [r for r in rows if r["cross_replica_pairs"] is not None]
    assert len(pair_rows) == 4, rows  # minhash, simhash, ngram, containment
    for r in pair_rows:
        assert r["cross_replica_pairs"] == 0, r
    # overlap_span_dedup ran its exact reps-x row/kept-mass invariants
    # inside run_stress; re-check it reported
    assert any(r["op"] == "overlap_span_dedup" for r in rows), rows


@pytest.mark.slow
def test_quadratic_kernels_sqrt_blocking_10x(spark):
    rows = stress_quadratic.run_stress(spark, STRESS_DIR, reps=10, emit=_quiet)
    assert {r["kernel"] for r in rows} == {
        "all_pairs_cosine_topk",
        "exact_near_dup_pairs",
        "hard_negative_topk",
        "knn_neighbors",
    }
    for r in rows:  # completed both legs; exponent recorded for the notes
        assert r["t_scaled"] > 0, r


@pytest.mark.slow
def test_ann_ops_planted_structure_10x(spark):
    rows = stress_ann.run_stress(spark, STRESS_DIR, reps=10, emit=_quiet)
    # run_stress already asserts the near-dup result == the planted twin
    # set (exact count, zero non-planted pairs) and query self-retrieval
    # at both scales; re-check the shape so a no-op refactor can't pass.
    assert {r["op"] for r in rows} == {
        "lsh_banded_near_dup(256p/16b, t=0.98)",
        "lsh_banded_near_dup(auto default, t=0.98)",
        "lsh_bucket_topk(k=10)",
        "ivf_topk(k=10, 64 lists, probe 8)",
    }
    for near in (r for r in rows if r["op"].startswith("lsh_banded")):
        assert near["rows_scaled"] == 10 * near["rows_base"], near


@pytest.mark.slow
def test_streaming_ops_replica_invariants_10x(spark):
    rows = stress_streaming.run_stress(spark, STRESS_DIR, reps=10, emit=_quiet)
    # run_stress already asserts exact x10 output scaling, batch-equality
    # for the windowed agg, and exactly-once under redelivery/two-wave
    # ingest; re-check the shape so a silent no-op refactor can't pass.
    assert {r["op"] for r in rows} == {
        "incremental_ingest(2 waves, mfpt=8)",
        "touched_partition_merge(semi-join regime)",
        "stream_dedup(x2 delivery)",
        "windowed_counts(5m, complete)",
        "materialized_rollup(2-wave late data)",
        "versioned_upsert(batching-independence)",
        "stream_outer_interval_join(3 drains)",
        "python_stream_source(ckpt resume)",
        "dedup_windowed_chain(2 drains)",
    }
    for r in rows:
        assert r["rows_scaled"] == 10 * r["rows_base"], r


@pytest.mark.slow
def test_asof_join_skewed_replica_invariants_10x(spark):
    """Union-sort asof at 10x replicas with ~20% of rows remapped onto ONE
    key: run_stress asserts left-preservation at both scales, zero failed
    tasks, and brute-force value parity (inequality join + max_by oracle)
    on a deterministic click sample of the scaled leg."""
    res = stress_asof.run_stress(spark, STRESS_DIR, reps=10, emit=_quiet)
    assert res["rows_Nx"] == 10 * res["rows_1x"], res
    assert res["failed_tasks"] == 0 and res["parity_sample"] > 0, res
    assert 0.15 <= res["skew_share"] <= 0.30, res


@pytest.mark.slow
def test_ewma_huge_key_null_poison_200k(spark):
    """EWMA segmented scan with one ~200k-row key streamed as >=19 Arrow
    batches (batch size pinned to 10k): run_stress asserts sampled float64
    parity vs a driver-side model, the NULL injected at 90% of the series
    poisoning EXACTLY the tail (surviving carry-dict resume across batch
    boundaries), and the interleaved clean key staying unpoisoned."""
    res = stress_ewma.run_stress(spark, n_rows=200_000, emit=_quiet)
    assert res["arrow_batches_min"] >= 19, res
    assert res["parity_sample"] >= 20, res


def test_bookmarked_files_reads_compacted_source_log(tmp_path):
    """Fast (non-slow) unit pin for the bookmark reader behind the ingest
    gate's exactly-once assert: a ``N.compact`` log version is a FULL
    snapshot of versions <= N, so the reader must take the latest compact
    plus only the plain versions after it — naive concatenation would
    double-count the compacted entries and fake a reprocessing failure."""
    src = tmp_path / "ckpt" / "sources" / "0"
    src.mkdir(parents=True)

    def entry(path, batch):
        return '{"path":"file:///in/%s","timestamp":1,"batchId":%d}' % (path, batch)

    # batches 0..2 as plain versions, then a compact at 3 that snapshots
    # everything so far plus its own batch, then a plain version 4
    (src / "0").write_text("v1\n" + entry("a.parquet", 0) + "\n")
    (src / "1").write_text("v1\n" + entry("b.parquet", 1) + "\n")
    (src / "2").write_text("v1\n" + entry("c.parquet", 2) + "\n")
    (src / "3.compact").write_text(
        "v1\n"
        + "\n".join(
            [
                entry("a.parquet", 0),
                entry("b.parquet", 1),
                entry("c.parquet", 2),
                entry("d.parquet", 3),
            ]
        )
        + "\n"
    )
    (src / "4").write_text("v1\n" + entry("e.parquet", 4) + "\n")

    got = stress_streaming._bookmarked_files(str(tmp_path / "ckpt"))
    assert sorted(got) == [
        "file:///in/a.parquet",
        "file:///in/b.parquet",
        "file:///in/c.parquet",
        "file:///in/d.parquet",
        "file:///in/e.parquet",
    ]
    # a GENUINE reprocessing (same file logged in a later batch) must
    # surface as a duplicate in the returned list — that is the signal
    # the ingest gate asserts on
    (src / "5").write_text("v1\n" + entry("a.parquet", 5) + "\n")
    got = stress_streaming._bookmarked_files(str(tmp_path / "ckpt"))
    assert len(got) == 6 and len(set(got)) == 5
