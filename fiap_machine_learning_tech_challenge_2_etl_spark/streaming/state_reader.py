"""Offline streaming-state observability: the Spark 4 state data source.

``spark.read.format("statestore")`` and ``format("state-metadata")`` read a
Structured Streaming CHECKPOINT as ordinary DataFrames — the stateful
operator's key/value state and the checkpoint's operator topology — without
starting (or stopping) the stream that owns it.

Why this is first-class at 100 TB: a long-lived production stream's state
store IS a database (per-key aggregates, dedup sets, join buffers measured
in terabytes across executors), and these readers are the only sanctioned
way to (a) VALIDATE state against a batch recomputation after an incident,
(b) size state hotspots per key/partition before they OOM an executor, and
(c) bootstrap debugging of a wrong-answer stream without replaying the
source. The read is a plain distributed scan of the checkpoint's
delta/snapshot files — one task per state partition, no driver
materialization, so it scales with the state itself.

The reference's closest surface is its Glue-bookmark introspection
(reference lambda/handler_last_date.py:23-42 reads the bookmark table to
decide what landed); this module generalizes that to the full operator
state, not just the high-watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator topology of a streaming checkpoint: one row per stateful
    operator instance (operatorId, operatorName, stateStoreName,
    numPartitions, min/maxBatchId). Metadata-only — reads the checkpoint's
    offset/commit logs, never the state files themselves — so it is O(1)
    in state size and safe to run against a LIVE stream's checkpoint."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state_store(
    spark: SparkSession,
    checkpoint: str,
    *,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
    join_side: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Distributed read of one stateful operator's key/value state at a
    committed batch (default: the LAST committed batch — the state a
    restart would resume from).

    ``batch_id``/``operator_id``/``store_name`` address one store when the
    checkpoint holds several (multi-operator queries; stream-stream joins
    keep four stores per side — pass ``join_side='left'|'right'`` and let
    Spark union them instead of naming each). With ``flatten=True`` the
    reader's nested ``key``/``value`` structs are splatted to top-level
    columns (plus ``partition_id``), which is what every validation join
    wants; field-name collisions between the two structs raise rather than
    silently shadow. Raw mode (``flatten=False``) returns the reader's
    native schema.

    Scale posture: the scan parallelism is the operator's state-partition
    count (``spark.sql.shuffle.partitions`` at first stream start), each
    task reading only its partition's snapshot+delta chain — the same data
    layout the stream itself commits, so reading N TB of state costs one
    pass over N TB, distributed."""
    if join_side is not None and store_name is not None:
        raise ValueError("pass either store_name or join_side, not both")
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if join_side is not None:
        if join_side not in ("left", "right"):
            raise ValueError(f"join_side must be 'left' or 'right', got {join_side!r}")
        reader = reader.option("joinSide", join_side)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    key_fields = [f.name for f in df.schema["key"].dataType.fields]
    value_fields = [f.name for f in df.schema["value"].dataType.fields]
    clash = set(key_fields) & set(value_fields)
    if clash:
        raise ValueError(
            f"key/value field name collision {sorted(clash)}; use flatten=False"
        )
    return df.select(
        *[F.col(f"key.{f}").alias(f) for f in key_fields],
        *[F.col(f"value.{f}").alias(f) for f in value_fields],
        F.col("partition_id"),
    )


def state_size_report(spark: SparkSession, checkpoint: str, operator_id: int = 0) -> DataFrame:
    """Per-partition state-key counts for one operator — the skew report
    that answers "which state partition is about to OOM an executor"
    before it does. Pure aggregation over the distributed state read; at
    scale this is the streaming twin of the batch join_key_skew_report."""
    state = read_state_store(
        spark, checkpoint, operator_id=operator_id, flatten=False
    )
    return state.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_keys")
    )
