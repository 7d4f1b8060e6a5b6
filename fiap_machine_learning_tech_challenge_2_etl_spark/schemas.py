"""Single-source-of-truth schema registry.

The reference hand-writes catalog schemas in two places and lets them drift
(refined catalog still types theoricalQty as string, reference etl/load.py:51,
while the transform casts it to long, etl/transform_1.py:71). Here every
dataset schema lives once, as an explicit StructType.

Two families:
  * testdata tables (TESTDATA.md / FIXTURES.md section 1) — the driver's
    synthetic star schema + events/documents/embeddings.
  * B3 raw schemas — the reference's two raw-input generations
    (V1 "English": etl/extract.py:42-51; V2 "Portuguese": etl/etl.py:39-48),
    used by the cleaning operators and reference-shaped fixtures.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver testdata tables
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

# events.ts is written as parquet INT64 TIMESTAMP(NANOS, false); Spark has no
# nanosecond timestamp type, so it is read as raw nanos (LongType, requires
# spark.sql.legacy.parquet.nanosAsLong=true) and normalized to a microsecond
# TimestampType at load (sources.parquet.load_testdata) — truncation matches
# DuckDB's TIMESTAMP_NS -> TIMESTAMP cast for oracle parity.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string
    ]
)

# columns stored as nanosecond timestamps, normalized at load
NS_TIMESTAMP_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference raw schemas (FIXTURES.md section 2)
# --------------------------------------------------------------------------

# V1 "English" raw table — numerics arrive as dirty strings and are sanitized
# downstream (reference etl/extract.py:42-51 declares; etl/transform_1.py:67,71
# sanitizes).
B3_RAW_V1 = T.StructType(
    [
        T.StructField("segment", T.IntegerType()),
        T.StructField("cod", T.StringType()),
        T.StructField("asset", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("part", T.StringType()),  # decimal-comma, e.g. "1,234"
        T.StructField("partAcum", T.IntegerType()),
        T.StructField("theoricalQty", T.StringType()),  # "12.345.678"
        T.StructField("date", T.StringType()),  # yyyy-MM-dd partition key
        T.StructField("ingest_seq", T.LongType()),  # deterministic dedup order
    ]
)

# V2 "Portuguese" raw table (reference etl/etl.py:39-48 selects these columns).
B3_RAW_V2 = T.StructType(
    [
        T.StructField("setor", T.StringType()),
        T.StructField("codigo", T.StringType()),
        T.StructField("acao", T.StringType()),
        T.StructField("tipo", T.StringType()),
        T.StructField("porcentagem_participacao", T.DoubleType()),
        T.StructField("porcentagem_participacao_acumulada", T.DoubleType()),
        T.StructField("quantidade_teorica", T.LongType()),
        T.StructField("data_pregao", T.StringType()),  # yyyy-MM-dd
    ]
)
