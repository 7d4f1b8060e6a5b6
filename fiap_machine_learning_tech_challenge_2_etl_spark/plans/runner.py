"""Pipeline runner CLI (SURVEY.md section 2.12, O2-O6).

The reference's control plane is AWS: Lambda job launchers with passthrough
args (lambda/handler.py:13-49), a Step Function sequencing
Extract -> Transform -> Load as separate Glue clusters (infra/glue.tf:99-156),
and getResolvedOptions arg parsing with defaults (etl/transform_1.py:12-28).
Here the control plane is one process: argparse (O5), sequential stage calls
in one SparkSession (O3 — no S3 handoff between stages, one Catalyst plan),
and the streaming runner as the event-trigger replacement (O1).

Usage:
    python -m fiap_machine_learning_tech_challenge_2_etl_spark.plans.runner batch \
        --sf-dir /root/testdata/sf0.001 --out /tmp/refined
    python -m fiap_machine_learning_tech_challenge_2_etl_spark.plans.runner incremental \
        --input-dir /data/raw --out /tmp/refined --checkpoint /tmp/ck
"""

from __future__ import annotations

import argparse

from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session


def main(argv: list[str] | None = None, spark=None) -> None:
    """CLI entry. ``spark``: inject an existing session (tests / the
    runner round-trip query) — the runner then neither creates nor stops
    it, mirroring how a real orchestrator owns the session lifecycle
    around job submissions."""
    p = argparse.ArgumentParser(prog="fiap-machine-learning-tech-challenge-2-etl-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("batch", help="run the flagship batch pipeline (EP2 flattened)")
    b.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    b.add_argument("--out", required=True)
    b.add_argument("--mode", default="overwrite", choices=["overwrite", "append"])
    b.add_argument("--window-days", type=int, default=7)

    i = sub.add_parser("incremental", help="drain new files via Structured Streaming (EP1)")
    i.add_argument("--input-dir", required=True)
    i.add_argument("--out", required=True)
    i.add_argument("--checkpoint", required=True)
    i.add_argument("--max-files-per-trigger", type=int, default=None)

    args = p.parse_args(argv)
    owns_session = spark is None
    if owns_session:
        spark = get_session("pipeline-runner")
    try:
        if args.cmd == "batch":
            from fiap_machine_learning_tech_challenge_2_etl_spark.plans.pipeline import run_batch_pipeline

            run_batch_pipeline(
                spark,
                args.sf_dir,
                args.out,
                mode=args.mode,
                window_days=args.window_days,
            )
        elif args.cmd == "incremental":
            from fiap_machine_learning_tech_challenge_2_etl_spark.schemas import EVENTS
            from fiap_machine_learning_tech_challenge_2_etl_spark.streaming.incremental import (
                run_incremental_pipeline,
            )
            from fiap_machine_learning_tech_challenge_2_etl_spark.plans.pipeline import transform_v2  # noqa: F401

            # events-shaped incremental: clean + derive event_date, write by day
            from glob import glob

            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import _is_nanos

            # streaming schemas are fixed at start, so probe ONE landed file's
            # footer for the timestamp unit (same contract as load_testdata:
            # ns arrives as raw longs to normalize, us reads natively).
            sample = sorted(glob(f"{args.input_dir}/**/*.parquet", recursive=True))
            ns = _is_nanos(sample[0], "ts") if sample else True
            schema = EVENTS
            if not ns:
                schema = T.StructType(
                    [
                        T.StructField("ts", T.TimestampType(), f.nullable)
                        if f.name == "ts"
                        else f
                        for f in EVENTS.fields
                    ]
                )

            def transform(df):
                ts = (
                    F.timestamp_micros(F.expr("ts div 1000")) if ns else F.col("ts")
                )
                return df.withColumn("event_date", F.to_date(ts))

            if ns:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            run_incremental_pipeline(
                spark,
                input_dir=args.input_dir,
                schema=schema,
                transform=transform,
                output_dir=args.out,
                checkpoint_dir=args.checkpoint,
                partition_by=["event_date"],
                max_files_per_trigger=args.max_files_per_trigger,
            )
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main()
