"""Replica-scale stress smoke for the Structured Streaming operators.

Replicates the sf events table N times as DISJOINT copies (event_id and
user_id shifted per replica, event_type tagged with the replica id so
every aggregation group and dedup key carries its replica), then drives
the streaming surface the registry's roundtrip queries attest at bench
scale — at Nx the volume, Nx the state keys, and (for the ingest op)
many real micro-batches. What a 1000-executor cluster needs from these
operators is exactly what is ASSERTED here:

- ``ingest`` — exactly-once file-arrival ingest across MANY micro-batches
  (``run_incremental_pipeline``): one staged file per replica,
  ``maxFilesPerTrigger=8``, TWO availableNow runs over the same
  checkpoint (second wave of files lands between them). Exactly-once is
  asserted DIRECTLY on the bookmark — the checkpoint's file-source log
  must record every landed file exactly once across both runs (the
  output count/sum check alone would be blind to redundant reprocessing,
  since the dynamic-overwrite sink is idempotent) — plus output rows and
  value sums must equal the batch computation over all files EXACTLY.
- ``dedup`` — stateful streaming dedup (``stream_dedup_events``) with
  every row delivered TWICE in one drain: state holds Nx the keys and
  must emit each key exactly once (output == reps x base rows).
- ``window`` — watermarked tumbling-window aggregation
  (``windowed_event_counts``) with Nx the groups, complete-mode
  emission; the final emitted table must equal the batch aggregation of
  the same input row-for-row (asserted in-engine via a full-width join).
- ``rollup`` — incrementally-maintained daily rollup
  (``materialized_rollup``) driven through TWO waves on one checkpoint:
  wave 1 lands every row and builds all day partitions; wave 2 lands
  LATE data for only the two earliest days. Asserted after each wave:
  the materialized table equals the batch aggregation of everything
  landed so far (cent-exact in-engine join), and after wave 2 every
  untouched day partition's files are byte-identical (size + mtime
  snapshot) — the refresh recomputed ONLY the touched partitions, which
  is the whole 100 TB claim of recompute-touched-partitions.
- ``upsert`` — versioned keyed merge (``upsert_by_key`` with
  ``order_col``, the CDC sink's engine): the SAME delivered row set
  (3 versions of every key) lands through TWO different batch splits —
  in-order full batches vs an adversarial split with partial-key batches
  (exercising the contested/uncontested slice split) and a LATE
  redelivery of an old version after newer versions are stored. Asserted:
  the two final tables are value-identical row-for-row AND equal the
  batch highest-version-per-key computation — merge results are a pure
  function of the delivered row set, independent of batching, which is
  the operator's whole exactly-once-under-redelivery contract.

Replica isolation + exact-scaling: every op's scaled output row count
must be EXACTLY reps x its base output row count — any state collision
or cross-replica leakage breaks the equality.

``run_stress`` is importable (tests/test_stress_slow.py wraps it as a
``pytest -m slow`` gate at 10x).

- ``merge`` — touched-partition merge in the SEMI-JOIN pruning regime
  (``run_incremental_pipeline`` with partition cardinality far past the
  literal-filter cap of 100): two waves over one checkpoint, EVERY
  output partition touched by both, per-partition counts + cents
  asserted equal to the batch computation full-width.

- ``outer_join`` — LEFT-OUTER stream-stream interval join at Nx the
  keys: three drains (initial + sentinel advance + evict) flush the
  NULL-padded unmatched rows, and the final output must equal the batch
  LEFT JOIN of the same feed row-count-exact.
- ``pysource`` — Python streaming DataSource at Nx the rows: two
  availableNow runs on one checkpoint generate every row exactly once
  across the resume, and the streamed corpus must bit_xor-checksum-equal
  the batch reader at the same size.

Usage: python tools/stress_streaming.py [--ops ingest,dedup,window,rollup,upsert,merge,outer_join,pysource,dedup_chain] [base_sf_dir] [reps]
Prints a markdown table; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SHIFT = 10**9  # replica r occupies event_id/user_id range [r*SHIFT, ...)
LATE_OFF = 10**15  # late-wave rows get fresh ids clear of every replica range

KNOWN_OPS = frozenset(
    {
        "ingest",
        "dedup",
        "window",
        "rollup",
        "upsert",
        "merge",
        "outer_join",
        "pysource",
        "dedup_chain",
    }
)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scratch(name: str) -> str:
    d = os.path.join(_REPO, "_scratch", f"stress_streaming_{name}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


def _bookmarked_files(ckpt: str) -> list[str]:
    """Every file path the stream's bookmark records as processed, one
    entry per (file, micro-batch) — read straight from the checkpoint's
    file-source log (``sources/0``). A version log ``N.compact`` is a
    full snapshot of versions <= N, so read the latest compact plus the
    plain versions after it; duplicates in the RETURNED list therefore
    mean the source genuinely re-processed a file."""
    src = os.path.join(ckpt, "sources", "0")
    versions: dict[int, str] = {}
    for name in os.listdir(src):
        m = re.fullmatch(r"(\d+)(\.compact)?", name)
        if m and os.path.isfile(os.path.join(src, name)):
            v = int(m.group(1))
            # prefer the .compact variant if both exist at one version
            if m.group(2) or v not in versions:
                versions[v] = name
    compacts = [v for v, n in versions.items() if n.endswith(".compact")]
    start = max(compacts, default=-1)
    paths: list[str] = []
    for v in sorted(versions):
        if v < start:
            continue
        with open(os.path.join(src, versions[v])) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    if "path" in rec:
                        paths.append(rec["path"])
    return paths


def _partition_snapshot(rollup_dir: str, exclude_days: list[str]) -> dict:
    """(relpath -> (size, mtime_ns)) for every data file under a ``day=``
    partition dir EXCEPT the excluded days. Equality of two snapshots
    means those partitions' files were not rewritten between them —
    dynamic partition overwrite must leave untouched days physically
    alone, not just value-equal."""
    ex = {f"day={d}" for d in exclude_days}
    snap: dict = {}
    for root, _dirs, files in os.walk(rollup_dir):
        part = os.path.basename(root)
        if not part.startswith("day=") or part in ex:
            continue
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            snap[os.path.relpath(p, rollup_dir)] = (st.st_size, st.st_mtime_ns)
    return snap


def _landed_files(inp: str) -> list[str]:
    """Basenames of the parquet part files staged under the input dir."""
    out: list[str] = []
    for root, _dirs, files in os.walk(inp):
        out.extend(f for f in files if f.endswith(".parquet"))
    return out


def _replicate(events, reps: int):
    """reps disjoint copies: ids shifted, event_type tagged per replica so
    group keys / dedup keys / output partitions all scale by reps."""
    rep_frame = events.sparkSession.range(reps).select(F.col("id").alias("rep"))
    return (
        events.crossJoin(F.broadcast(rep_frame))
        .select(
            (F.col("event_id") + F.col("rep") * SHIFT).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * SHIFT).alias("user_id"),
            F.concat_ws("#", "event_type", "rep").alias("event_type"),
            "value",
            "rep",
        )
    )


def run_stress(
    spark, base_dir: str, reps: int = 10, emit=print, ops: set[str] | None = None
) -> list[dict]:
    """Run each streaming op on a 1-replica and a ``reps``-replica event
    feed; return one dict per op with timings and row counts. Exact
    reps-x output scaling and batch equivalence are ASSERTED."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
    from fiap_machine_learning_tech_challenge_2_etl_spark.streaming.incremental import (
        materialized_rollup,
        run_incremental_pipeline,
        stream_dedup_events,
        windowed_event_counts,
    )

    # user_id % 5 keeps the base feed bench-sized so the scaled leg's cost
    # is dominated by the replica factor, not the base constant
    base_events = (
        load_testdata(spark, base_dir, ["events"])["events"]
        .filter(F.col("user_id") % 5 == 0)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .localCheckpoint()
    )
    n_base = base_events.count()

    results: list[dict] = []
    emit(f"| op | 1 replica ({n_base} events) | {reps} replicas | time ratio |")
    emit("|---|---|---|---|")

    def run(name, fn):
        ts = {}
        for tag, r in (("base", 1), ("scaled", reps)):
            feed = _replicate(base_events, r).localCheckpoint()
            t0 = time.time()
            cnt = fn(feed, r, tag)
            ts[tag] = (time.time() - t0, cnt)
        ratio = ts["scaled"][0] / ts["base"][0]
        row = {
            "op": name,
            "reps": reps,
            "t_base": ts["base"][0],
            "rows_base": ts["base"][1],
            "t_scaled": ts["scaled"][0],
            "rows_scaled": ts["scaled"][1],
            "ratio": ratio,
        }
        # disjoint congruent replicas: any state collision / leakage or
        # dropped-redelivered row breaks the exact reps-x equality
        assert ts["scaled"][1] == reps * ts["base"][1], row
        results.append(row)
        emit(
            "| %s | %.2f s (%d rows) | %.2f s (%d rows) | %.2fx |"
            % (
                name,
                ts["base"][0],
                ts["base"][1],
                ts["scaled"][0],
                ts["scaled"][1],
                ratio,
            )
        )

    def wants(name):
        return ops is None or name in ops

    if wants("ingest"):

        def ingest(feed, r, tag):
            d = _scratch(f"ingest_{tag}")
            inp, outp, ckpt = (os.path.join(d, s) for s in ("in", "out", "ckpt"))
            # one landed file per replica (the reference's unit of arrival);
            # partition_by=rep keeps micro-batch and output-partition
            # granularity aligned, the operator's documented contract
            wave2 = max(1, r - 2)  # r=1: single wave; r>=3: 2-file second wave
            feed.filter(F.col("rep") < wave2).repartition("rep").write.partitionBy(
                "rep"
            ).mode("append").parquet(inp)
            schema = feed.schema
            kwargs = dict(
                schema=schema,
                transform=lambda df: df.filter(F.col("event_id") % 2 == 0),
                output_dir=outp,
                checkpoint_dir=ckpt,
                partition_by=["rep"],
                max_files_per_trigger=8,
            )
            run_incremental_pipeline(spark, inp, **kwargs)
            first = _bookmarked_files(ckpt)
            landed1 = _landed_files(inp)
            # second wave lands on the SAME checkpoint: the bookmark must
            # process ONLY the new files. The count/cents check below is
            # blind to redundant reprocessing (the dynamic-overwrite sink
            # is idempotent), so exactly-once is asserted DIRECTLY on the
            # bookmark: the checkpoint's file-source log must carry every
            # landed file exactly once across both runs' micro-batches.
            feed.filter(F.col("rep") >= wave2).repartition("rep").write.partitionBy(
                "rep"
            ).mode("append").parquet(inp)
            run_incremental_pipeline(spark, inp, **kwargs)
            both = _bookmarked_files(ckpt)
            landed2 = _landed_files(inp)
            assert len(first) == len(set(first)) == len(landed1), (
                tag, "run-1 bookmark != wave-1 files", len(first), len(landed1),
            )
            assert len(both) == len(set(both)) == len(landed2), (
                tag, "bookmark re-processed or skipped a file",
                len(both), len(set(both)), len(landed2),
            )
            assert set(first) <= set(both), (tag, "run-2 bookmark lost run-1 entries")
            back = spark.read.parquet(outp)
            expect = feed.filter(F.col("event_id") % 2 == 0).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            ).first()
            got = back.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            ).first()
            assert (got["n"], got["cents"]) == (expect["n"], expect["cents"]), (
                tag,
                got,
                expect,
            )
            return got["n"]

        run("incremental_ingest(2 waves, mfpt=8)", ingest)

    if wants("merge"):

        def merge(feed, r, tag):
            """Touched-partition merge in the SEMI-JOIN pruning regime: the
            output is partitioned on a derived key with cardinality far past
            _MAX_LITERAL_PARTITION_FILTER (100), every partition is touched
            by BOTH waves (wave 1 = even event ids, wave 2 = odd), so each
            drain's sink must prune via the broadcast semi-join and keep
            the prior wave's rows in every one of the hundreds of merged
            partitions — per-partition counts and value cents are asserted
            equal to the batch computation, full-width."""
            d = _scratch(f"merge_{tag}")
            inp, outp, ckpt = (os.path.join(d, s) for s in ("in", "out", "ckpt"))
            nparts = 120 * min(r, 16)  # >100 at every leg; 1,920 at 16+ reps
            pfeed = feed.withColumn(
                "pkey", F.pmod(F.col("user_id"), F.lit(nparts))
            ).drop("rep")
            schema = pfeed.schema
            kwargs = dict(
                schema=schema,
                transform=lambda df: df,
                output_dir=outp,
                checkpoint_dir=ckpt,
                partition_by=["pkey"],
            )
            pfeed.filter(F.col("event_id") % 2 == 0).coalesce(4).write.mode(
                "append"
            ).parquet(inp)
            run_incremental_pipeline(spark, inp, **kwargs)
            n1 = spark.read.parquet(outp).count()
            pfeed.filter(F.col("event_id") % 2 == 1).coalesce(4).write.mode(
                "append"
            ).parquet(inp)
            run_incremental_pipeline(spark, inp, **kwargs)
            back = spark.read.parquet(outp)
            agg = lambda df: df.groupBy("pkey").agg(  # noqa: E731
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            )
            got, expect = agg(back), agg(pfeed)
            assert got.exceptAll(expect).unionAll(expect.exceptAll(got)).count() == 0, (
                tag, "per-partition merge mismatch vs batch",
            )
            total = back.count()
            assert n1 > 0 and total > n1, (tag, n1, total)
            return total

        run("touched_partition_merge(semi-join regime)", merge)

    if wants("dedup"):

        def dedup(feed, r, tag):
            d = _scratch(f"dedup_{tag}")
            inp, outp, ckpt = (os.path.join(d, s) for s in ("in", "out", "ckpt"))
            # at-least-once redelivery: every row lands twice, one drain —
            # state must hold r x the base keys and emit each exactly once
            feed.drop("rep").write.mode("append").parquet(inp)
            feed.drop("rep").write.mode("append").parquet(inp)
            schema = feed.drop("rep").schema
            stream = spark.readStream.schema(schema).parquet(inp)
            deduped = stream_dedup_events(stream, keys=["event_id"], ts_col="ts")

            def sink(batch_df, epoch_id):
                batch_df.write.mode("append").parquet(outp)

            (
                deduped.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
            return spark.read.schema(schema).parquet(outp).count()

        run("stream_dedup(x2 delivery)", dedup)

    if wants("window"):

        def window(feed, r, tag):
            d = _scratch(f"window_{tag}")
            inp, outp, ckpt = (os.path.join(d, s) for s in ("in", "out", "ckpt"))
            feed.drop("rep").write.mode("append").parquet(inp)
            schema = feed.drop("rep").schema
            stream = spark.readStream.schema(schema).parquet(inp)
            agg = windowed_event_counts(stream, window="5 minutes")

            def sink(batch_df, epoch_id):
                batch_df.write.mode("overwrite").parquet(outp)

            (
                agg.writeStream.foreachBatch(sink)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
            def cents(df):
                # double sums are accumulation-order-dependent between the
                # state store and the batch agg — compare at cent precision
                return df.select(
                    "window_start",
                    "window_end",
                    "event_type",
                    "n_events",
                    F.round(F.col("sum_value") * 100).cast("long").alias("sum_cents"),
                )

            back = cents(spark.read.parquet(outp))
            batch = cents(windowed_event_counts(feed.drop("rep"), window="5 minutes"))
            # in-engine equality: streaming state must reproduce the batch
            # aggregation exactly — same groups, same counts, same sums
            n_back = back.count()
            n_batch = batch.count()
            n_joined = back.join(
                batch,
                ["window_start", "window_end", "event_type", "n_events", "sum_cents"],
            ).count()
            assert n_back == n_batch == n_joined, (tag, n_back, n_batch, n_joined)
            return n_back

        run("windowed_counts(5m, complete)", window)

    if wants("rollup"):
        day_rows = (
            base_events.select(F.to_date("ts").alias("d"))
            .distinct()
            .orderBy("d")
            .collect()
        )
        n_days = len(day_rows)
        late_days = [str(day_rows[i]["d"]) for i in range(min(2, n_days))]

        def rollup(feed, r, tag):
            d = _scratch(f"rollup_{tag}")
            inp, outp, ckpt = (os.path.join(d, s) for s in ("in", "roll", "ckpt"))
            ev = feed.drop("rep")
            schema = ev.schema
            kwargs = dict(
                schema=schema,
                rollup_dir=outp,
                checkpoint_dir=ckpt,
                ts_col="ts",
                key_col="event_type",
                value_col="value",
                # tight bound on purpose: wave 1 touches EVERY day, so the
                # enforced days-per-batch cap passes exactly at the corpus
                # day count — one more day would raise
                max_days_per_batch=n_days,
            )

            def cents(df):
                # double sums are accumulation-order-dependent between the
                # stored rollup and the batch re-agg — compare cent-exact
                return df.select(
                    "day",
                    "event_type",
                    "n_events",
                    F.round(F.col("sum_value") * 100).cast("long").alias("sum_cents"),
                )

            def assert_equals_batch(stage):
                back = cents(spark.read.parquet(outp))
                base = spark.read.schema(schema).parquet(inp)
                exp = cents(
                    base.withColumn("day", F.to_date("ts"))
                    .groupBy("day", "event_type")
                    .agg(
                        F.count(F.lit(1)).alias("n_events"),
                        F.sum("value").alias("sum_value"),
                    )
                )
                n_back, n_exp = back.count(), exp.count()
                n_join = back.join(
                    exp, ["day", "event_type", "n_events", "sum_cents"]
                ).count()
                assert n_back == n_exp == n_join, (tag, stage, n_back, n_exp, n_join)
                return n_back

            # wave 1: every row lands; one availableNow run materializes
            # all day partitions and must equal the batch aggregation
            ev.write.mode("append").parquet(inp)
            materialized_rollup(spark, inp, **kwargs)
            assert_equals_batch("wave1")
            untouched = _partition_snapshot(outp, exclude_days=late_days)
            assert untouched, (tag, "no untouched day partitions to protect")
            # wave 2 on the SAME checkpoint: late rows for ONLY the two
            # earliest days. The refresh must fold them into exactly those
            # partitions and leave every other partition's files alone.
            (
                ev.filter(F.to_date("ts").isin(late_days))
                .withColumn("event_id", F.col("event_id") + F.lit(LATE_OFF))
                .write.mode("append")
                .parquet(inp)
            )
            materialized_rollup(spark, inp, **kwargs)
            n = assert_equals_batch("wave2")
            after = _partition_snapshot(outp, exclude_days=late_days)
            assert untouched == after, (
                tag,
                "untouched day partitions were rewritten",
                {k for k in untouched.keys() ^ after.keys()}
                | {k for k in untouched if after.get(k) != untouched[k]},
            )
            return n

        run("materialized_rollup(2-wave late data)", rollup)

    if wants("upsert"):
        from fiap_machine_learning_tech_challenge_2_etl_spark.sources.sinks import upsert_by_key

        def upsert(feed, r, tag):
            d = _scratch(f"upsert_{tag}")
            tbl_a, tbl_b = os.path.join(d, "a"), os.path.join(d, "b")
            # day derives from the key's immutable ts => stable across
            # versions (the sink's documented precondition); the "d"
            # prefix keeps partition-value type inference at string
            keyed = feed.drop("rep").withColumn(
                "day", F.concat(F.lit("d"), F.date_format("ts", "yyyyMMdd"))
            )

            def ver(v, pred=None):
                src = keyed if pred is None else keyed.filter(pred)
                return src.withColumn("ver", F.lit(v).cast("long")).withColumn(
                    "value", F.col("value") + F.lit(float(v))
                )

            even = F.col("event_id") % 2 == 0
            # split A: in-order full batches. split B: adversarial —
            # b2 carries only the even keys (odd keys' stored rows ride
            # the uncontested anti-join slice of their touched
            # partitions), b3 redelivers OLD ver2 for even keys (must
            # not regress the stored ver3) alongside ver2+ver3 for odd
            # keys in ONE batch (in-batch version pick). Both splits
            # deliver exactly {ver1, ver2, ver3} x every key.
            split_a = [ver(1), ver(2), ver(3)]
            split_b = [ver(1), ver(3, even), ver(2).unionByName(ver(3, ~even))]
            for path, batches in ((tbl_a, split_a), (tbl_b, split_b)):
                for b in batches:
                    upsert_by_key(
                        spark,
                        b,
                        path,
                        keys=["event_id"],
                        partition_by=["day"],
                        order_col="ver",
                    )

            def cents(df):
                return df.select(
                    "event_id",
                    "ver",
                    "user_id",
                    "event_type",
                    "day",
                    F.round(F.col("value") * 100).cast("long").alias("cents"),
                )

            got_a = cents(spark.read.parquet(tbl_a))
            got_b = cents(spark.read.parquet(tbl_b))
            expect = cents(ver(3))
            cols = got_a.columns
            n_a, n_b, n_exp = got_a.count(), got_b.count(), expect.count()
            n_ab = got_a.join(got_b, cols).count()
            n_ae = got_a.join(expect, cols).count()
            # batching-independence: split A == split B == batch
            # highest-version-per-key, full row width, cent-exact
            assert n_a == n_b == n_exp == n_ab == n_ae, (
                tag, n_a, n_b, n_exp, n_ab, n_ae,
            )
            return n_a

        run("versioned_upsert(batching-independence)", upsert)

    if wants("outer_join"):

        def outer_join(feed, r, tag):
            """LEFT-OUTER stream-stream interval join at r-x the keys:
            exactly-once NULL emission at watermark eviction, asserted
            row-for-row against the batch LEFT JOIN of the same feed.
            Three drains per leg — initial + two sentinel generations
            (advance watermark, then evict) — the operator's documented
            flush protocol."""
            from fiap_machine_learning_tech_challenge_2_etl_spark.streaming.incremental import (
                drain_interval_join_with_sentinel_flush,
                stream_stream_interval_join,
            )

            spark = feed.sparkSession
            d = _scratch(f"outerjoin_{tag}")
            lin, rin, outp, ckpt = (
                os.path.join(d, s) for s in ("l", "r", "out", "ckpt")
            )
            cols = ["event_id", "ts", "user_id", "event_type"]
            clicks = feed.filter(F.col("event_type").startswith("click")).select(cols)
            views = feed.filter(F.col("event_type").startswith("view")).select(cols)
            clicks.coalesce(4).write.parquet(lin)
            views.coalesce(4).write.parquet(rin)
            max_ts = feed.agg(F.max("ts")).collect()[0][0]  # one scalar
            schema = spark.read.parquet(lin).schema

            def build_join(left, right):
                return stream_stream_interval_join(
                    left,
                    right,
                    key="user_id",
                    max_delay="6 hours",
                    watermark="12 hours",
                    how="left_outer",
                ).select("event_id", "event_id_r", "user_id")

            drain_interval_join_with_sentinel_flush(
                spark, lin, rin, outp, ckpt, schema, max_ts, build_join,
                sentinel_ids=(9_000_000_001, 9_000_000_002),
            )
            # sentinels carry user_id -1; eqNullSafe keeps NULL-user rows
            out = spark.read.parquet(outp).filter(~F.col("user_id").eqNullSafe(-1))
            n = out.count()
            # batch twin: same interval condition, LEFT join, same feed
            rv = views.select(
                F.col("event_id").alias("v_id"),
                F.col("ts").alias("v_ts"),
                F.col("user_id").alias("v_user"),
            )
            b = clicks.join(
                rv,
                (F.col("user_id") == F.col("v_user"))
                & (F.col("v_ts") <= F.col("ts"))
                & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 6 HOURS")),
                "left_outer",
            ).count()
            assert n == b, (tag, n, b)
            return n

        run("stream_outer_interval_join(3 drains)", outer_join)

    if wants("dedup_chain"):

        def dedup_chain(feed, r, tag):
            """CHAINED stateful ops (dedup -> windowed agg, one query) at
            r-x the group keys: every file redelivered twice, one
            checkpoint, sentinel flush. Output must equal the batch
            rollup of the UNDUPLICATED feed cent-exactly — a duplicate
            that leaks past the dedup state inflates some window's count;
            a row lost at the stateful handoff deflates one."""
            from fiap_machine_learning_tech_challenge_2_etl_spark.streaming.incremental import (
                dedup_then_windowed_counts,
            )

            spark = feed.sparkSession
            d = _scratch(f"dedupchain_{tag}")
            inp, outp, ckpt = (os.path.join(d, s) for s in ("in", "out", "ckpt"))
            cols = ["event_id", "ts", "event_type", "value"]
            src = feed.select(cols)
            # at-least-once redelivery: the same rows land twice
            src.coalesce(4).write.mode("append").parquet(inp)
            src.coalesce(4).write.mode("append").parquet(inp)
            schema = spark.read.parquet(inp).schema

            def run_once():
                stream = spark.readStream.schema(schema).parquet(inp)
                agg = dedup_then_windowed_counts(
                    stream, window="1 hour", watermark="10 minutes"
                )
                (
                    agg.writeStream.foreachBatch(
                        lambda b, _e: b.write.mode("append").parquet(outp)
                    )
                    .outputMode("append")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                    .awaitTermination()
                )

            run_once()
            # sentinel 2 days past corpus end flushes the append-mode tail
            sentinel = src.agg(
                (F.max("ts") + F.expr("INTERVAL 2 DAYS")).alias("ts")
            ).select(
                F.lit(-1).cast("long").alias("event_id"),
                "ts",
                F.lit("zz#sentinel").alias("event_type"),
                F.lit(0.0).alias("value"),
            )
            sentinel.coalesce(1).write.mode("append").parquet(inp)
            run_once()
            out = spark.read.parquet(outp)
            # batch twin of the chain over the UNDUPLICATED feed
            twin = (
                src.groupBy(
                    F.window("ts", "1 hour").getField("start").alias("window_start"),
                    "event_type",
                )
                .agg(
                    F.count("*").alias("n_events"),
                    F.sum("value").alias("sum_value"),
                )
            )
            key = [
                "window_start",
                "event_type",
                "n_events",
                F.round(F.col("sum_value") * 100).cast("long").alias("sum_cents"),
            ]
            got, want = out.select(*key), twin.select(*key)
            n_got, n_want = got.count(), want.count()
            n_match = got.join(want, got.columns).count()
            assert n_got == n_want == n_match, (tag, n_got, n_want, n_match)
            return n_got

        run("dedup_windowed_chain(2 drains)", dedup_chain)

    if wants("pysource"):

        def pysource(feed, r, tag):
            """Python streaming DataSource at r-x the rows: two
            availableNow runs on one checkpoint (half target, then full)
            must generate every row EXACTLY once across the resume, and
            the streamed corpus must checksum-equal the batch reader at
            the same size (one content contract, two engines paths)."""
            from fiap_machine_learning_tech_challenge_2_etl_spark.sources.pydatasource import (
                SynthDocsDataSource,
            )

            spark = feed.sparkSession
            spark.dataSource.register(SynthDocsDataSource)
            d = _scratch(f"pysource_{tag}")
            outp, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
            target = 20_000 * r

            for t in (target // 2, target):
                s = (
                    spark.readStream.format("synthdocs")
                    .option("target_rows", t)
                    .option("n_partitions", 8)
                    .load()
                )
                (
                    s.writeStream.foreachBatch(
                        lambda b, _e: b.write.mode("append").parquet(outp)
                    )
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                    .awaitTermination()
                )
            back = spark.read.parquet(outp)
            n = back.count()
            assert n == back.select("doc_id").distinct().count() == target, (
                tag, n, target,
            )
            batch = (
                spark.read.format("synthdocs")
                .option("n_partitions", 8)
                .option("rows_per_partition", target // 8)
                .load()
            )
            cs = lambda df: df.agg(  # noqa: E731  — bit_xor: order-insensitive, overflow-free
                F.expr("bit_xor(xxhash64(doc_id, text, n_tokens, bucket))")
            ).collect()[0][0]
            assert cs(back) == cs(batch), tag
            return n

        run("python_stream_source(ckpt resume)", pysource)

    return results


def main() -> None:
    argv = list(sys.argv[1:])
    ops = None
    if "--ops" in argv:
        i = argv.index("--ops")
        ops = set(argv[i + 1].split(","))
        del argv[i : i + 2]
        # mirror stress_graph: a typo'd op name must fail loudly, not
        # silently produce an empty evidence table
        unknown = ops - KNOWN_OPS
        if unknown:
            raise SystemExit(
                f"unknown --ops {sorted(unknown)}; known: {sorted(KNOWN_OPS)}"
            )
    base_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    reps = int(argv[1]) if len(argv) > 1 else 10
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    spark = get_session("stress-streaming")
    run_stress(spark, base_dir, reps=reps, ops=ops)
    spark.stop()


if __name__ == "__main__":
    main()
