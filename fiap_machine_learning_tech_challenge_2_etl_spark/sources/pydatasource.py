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
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
    def __init__(self, options):
        self.n_partitions = int(options.get("n_partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 100))

    def partitions(self):
        r = self.rows_per_partition
        return [_Partition(i, i * r, (i + 1) * r) for i in range(self.n_partitions)]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text.split()), doc_id % 16)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str | StructType:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SynthDocsReader(self.options)
