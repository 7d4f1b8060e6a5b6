"""Custom Python Data Source (Spark 4 DataSource API): synthetic corpus.

The reference reads only landed parquet (SURVEY.md §2.1); a training-data
engine also needs GENERATORS — load/perf corpora, schema fixtures, fuzzing
inputs — without writing files first. The Spark 4 ``pyspark.sql.datasource``
API makes that a first-class source: the planner asks the source for
partitions, each executor materializes only its partition, so a synthetic
100 TB corpus is just ``n_partitions`` × ``rows_per_partition`` with NO
driver materialization and NO storage round-trip.

Determinism contract: row content is a pure function of (doc_id), and
doc_ids are a pure function of the partition index — same options, same
data, on any cluster shape (the same invariance contract as
``operators.sampling``).

Usage::

    spark.dataSource.register(SynthDocsDataSource)
    df = (spark.read.format("synthdocs")
          .option("n_partitions", 8).option("rows_per_partition", 1000)
          .load())

The source is DUAL-MODE: ``spark.readStream.format("synthdocs")`` drives
the same generator through the Python streaming DataSource API
(``SynthDocsStreamReader`` — offset log, partition-planned executor-side
reads, checkpoint restart), so the custom-connector surface is attested
end to end in both execution modes with one row-content contract.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_WORDS = (
    "data spark engine corpus token model train shuffle partition scale "
    "query plan join window batch stream vector index hash text"
).split()

SCHEMA = "doc_id bigint, text string, n_tokens int, bucket int"


def _doc_text(doc_id: int) -> str:
    """Deterministic pseudo-text: md5(doc_id) drives word choice/length."""
    h = hashlib.md5(str(doc_id).encode()).digest()
    n = 8 + h[0] % 25
    return " ".join(_WORDS[h[i % 16] % len(_WORDS)] for i in range(n))


class _Partition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index, self.start, self.end = index, start, end


class SynthDocsReader(DataSourceReader):
    """Batch reader with TWO wire formats, chosen by ``.option("arrow",
    "true")``: the default yields row TUPLES (one Python object per cell,
    pickled row-at-a-time to the JVM), the Arrow path yields
    ``pyarrow.RecordBatch`` chunks (columnar, zero-copy into Spark's
    vectorized reader). Same rows either way — the roundtrip test pins
    bit-equality — but the Arrow path is the one a connector author
    ships: the per-row Python->JVM conversion is the dominant cost of a
    Python source at scale (measured delta recorded in BENCH_NOTES.md
    round 12)."""

    def __init__(self, options):
        self.n_partitions = int(options.get("n_partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 100))
        self.arrow = str(options.get("arrow", "false")).lower() == "true"
        self.arrow_batch_rows = int(options.get("arrow_batch_rows", 4096))

    def partitions(self):
        r = self.rows_per_partition
        return [_Partition(i, i * r, (i + 1) * r) for i in range(self.n_partitions)]

    def read(self, partition):
        if self.arrow:
            yield from _arrow_batches(
                partition.start, partition.end, self.arrow_batch_rows
            )
            return
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text.split()), doc_id % 16)


def _arrow_batches(start: int, end: int, batch_rows: int):
    """Generate the synthdocs rows as pyarrow RecordBatches: the columnar
    build amortizes Python-object overhead across the batch, and Spark's
    Arrow ingestion skips per-row pickling entirely. Types mirror SCHEMA
    exactly (int64/string/int32/int32) — a mismatch would fail loudly in
    Spark's schema check rather than coerce silently."""
    import pyarrow as pa

    for lo in range(start, end, batch_rows):
        hi = min(lo + batch_rows, end)
        ids = list(range(lo, hi))
        texts = [_doc_text(i) for i in ids]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(texts, type=pa.string()),
                pa.array([len(t.split()) for t in texts], type=pa.int32()),
                pa.array([i % 16 for i in ids], type=pa.int32()),
            ],
            names=["doc_id", "text", "n_tokens", "bucket"],
        )


class SynthDocsStreamReader(DataSourceStreamReader):
    """Streaming half of the source (Spark 4 Python streaming DataSource):
    a micro-batch generator whose offset IS the row index.

    Offset model: the external "source" is the monotone row counter; its
    current high-water mark comes from the ``target_rows`` option (a real
    connector would ask the upstream system — Kafka end offsets, a ledger
    table's max id).  ``latestOffset`` reports that target; Spark hands
    ``partitions(start, end)`` the committed/available offset pair, the
    range splits into ``n_partitions`` slices, and each EXECUTOR
    materializes only its slice — the planner never sees a row.  Restart
    semantics fall out of the offset log: a second run on the same
    checkpoint with a larger target resumes at the committed row and
    generates ONLY the continuation (exactly-once attested by the
    ``python_stream_source_roundtrip`` oracle).  Row content is the same
    pure ``_doc_text(doc_id)`` the batch reader uses, so batch and stream
    reads of the same id range are value-identical (pinned by
    test_synthdocs_stream_matches_batch)."""

    def __init__(self, options):
        self.target_rows = int(options.get("target_rows", 800))
        self.n_partitions = int(options.get("n_partitions", 4))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": self.target_rows}

    def partitions(self, start: dict, end: dict):
        s, e = start["row"], end["row"]
        if e <= s:
            # e == s: no new rows. e < s: the checkpoint was restarted with
            # target_rows BELOW the committed offset — an explicit operator
            # ROLLBACK of the source's high-water mark. Either way emit one
            # empty partition (an explicit zero-row batch; an empty
            # partition LIST is Spark-version dependent). Raising here
            # instead would WEDGE the checkpoint: Spark logs the planned
            # offset before calling partitions(), and recovery replays the
            # logged batch with the same (start, end) — the raise repeats
            # forever even after target_rows is restored (verified
            # empirically). Documented consequence of a rollback: Spark
            # commits the smaller offset, so a later catch-up re-emits the
            # rolled-back window — duplicates in append sinks, absorbed by
            # idempotent/keyed sinks. Exactly what Kafka's
            # failOnDataLoss=false path does for backwards offsets, chosen
            # here because the alternative (fail) is unrecoverable in the
            # Python API (latestOffset cannot see the committed offset to
            # refuse the rollback before it is logged).
            return [_Partition(0, s, s)]
        step = max((e - s + self.n_partitions - 1) // self.n_partitions, 1)
        return [_Partition(i, i, min(i + step, e)) for i in range(s, e, step)]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text.split()), doc_id % 16)

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge — the offset log is truth


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str | StructType:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SynthDocsReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SynthDocsStreamReader(self.options)
