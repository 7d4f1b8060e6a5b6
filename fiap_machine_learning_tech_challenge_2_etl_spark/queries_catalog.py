"""Named query catalog: the driver-facing correctness surface.

Each entry pairs a Spark DataFrame query (``(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL string DuckDB runs on the same parquet — the
oracle-differential test strategy (SURVEY.md section 5). Conventions that
make cross-engine value-hashing stable:

* every computed column is aliased identically on both sides;
* floating-point aggregates over DETERMINISTIC orders (rolling frames)
  are rounded to 6 decimals; aggregates whose summation order is
  engine-dependent are either summed as integer cents
  (``CAST(round(x*100) AS BIGINT)`` — exact in both engines) or rounded
  to few decimals;
* dates/timestamps surfaced as formatted strings where formatting
  matters; DuckDB's ``sum(BIGINT)`` (which returns HUGEINT) is cast back
  to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.operators import cleaning as C
from fiap_machine_learning_tech_challenge_2_etl_spark.operators import windows as W
from fiap_machine_learning_tech_challenge_2_etl_spark.plans.pipeline import (
    flagship_events_pipeline,
)
from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_testdata(spark, sf_dir, [name])[name]


# NOTE on oracle SQL below: events.ts is nanosecond-precision in parquet;
# Spark reads it truncated to micros (see sources.parquet.load_testdata), so
# every oracle ORDER BY on ts wraps it in CAST(ts AS TIMESTAMP) (DuckDB
# TIMESTAMP_NS -> TIMESTAMP, same truncation) to keep tiebreaks identical.


# ==========================================================================
# Reference surface (SURVEY.md section 2)
# ==========================================================================


@_register(
    "flagship_pipeline",
    sql="""
WITH e AS (
  SELECT *, CAST(ts AS DATE) AS event_date,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), d AS (
  SELECT * FROM e WHERE rn = 1
), w AS (
  SELECT user_id, event_date, event_type, value,
    avg(value)    OVER win AS mean_raw,
    median(value) OVER win AS med_raw,
    stddev(value) OVER win AS std_raw,
    max(value)    OVER win AS max_value_7d,
    min(value)    OVER win AS min_value_7d,
    min(event_date) OVER (PARTITION BY user_id) AS initial_d,
    sum(value)    OVER (PARTITION BY event_date, event_type) AS tot_raw
  FROM d
  WINDOW win AS (PARTITION BY user_id ORDER BY event_date, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT user_id, strftime(event_date, '%Y-%m-%d') AS event_date, event_type, value,
  round(mean_raw, 6) AS mean_value_7d,
  round(med_raw, 6)  AS median_value_7d,
  round(std_raw, 6)  AS std_value_7d,
  max_value_7d, min_value_7d,
  strftime(initial_d, '%Y-%m-%d') AS initial_date,
  round(tot_raw, 6)  AS total_value_type_day
FROM w
""",
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1/EP3 — the full reference clean->window pipeline over events."""
    return flagship_events_pipeline(spark, sf_dir)


@_register(
    "select_filter_project",
    sql="""
SELECT event_id, user_id, event_type,
       CAST(value AS DOUBLE) AS value_d,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date
FROM events
WHERE event_type IS NOT NULL AND value > 50.0
""",
)
def q_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/F1/C1/C5 — projection + predicate (pushed to the parquet scan)."""
    e = _t(spark, sf_dir, "events")
    out = C.require_keys(e, ["event_type"]).filter(F.col("value") > 50.0)
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value_d"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("event_date"),
    )


@_register(
    "distinct_rows",
    sql="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — full-row distinct (reference etl/etl.py:49) on a projection."""
    o = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority")
    return C.distinct_rows(o)


@_register(
    "fill_defaults",
    sql="""
SELECT event_id,
  coalesce(nullif(event_type, 'error'), 'UNKNOWN') AS event_type_filled,
  coalesce(CASE WHEN value < 10.0 THEN NULL ELSE value END, 0.0) AS value_filled
FROM events
""",
)
def q_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1/N2 — typed default fill (reference etl/etl.py:50-62); nulls are
    injected deterministically on both sides to exercise the fill."""
    e = _t(spark, sf_dir, "events")
    dirty = e.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("event_type_filled"),
        F.when(F.col("value") < 10.0, None).otherwise(F.col("value")).alias(
            "value_filled"
        ),
    )
    return C.fill_defaults(dirty, {"event_type_filled": "UNKNOWN", "value_filled": 0.0})


@_register(
    "sanitize_numeric",
    sql="""
SELECT l_orderkey, l_linenumber,
  CAST(replace(replace(CAST(l_extendedprice AS VARCHAR), '.', ','), ',', '.') AS DOUBLE)
    AS price_normalized,
  CAST(regexp_replace(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '.000',
                      '[^0-9-]', '', 'g') AS BIGINT) AS qty_digits
FROM lineitem
""",
)
def q_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3/N4 — decimal-comma normalization + digit extraction
    (reference etl/transform_1.py:67,71). Dirty strings are manufactured
    from clean numerics identically on both sides."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace(F.col("l_extendedprice").cast("string"), r"\.", ",").alias(
            "price_dirty"
        ),
        F.concat(
            F.col("l_quantity").cast("long").cast("string"), F.lit(".000")
        ).alias("qty_dirty"),
    )
    out = C.normalize_decimal_comma(li, "price_dirty", output="price_normalized")
    out = C.digits_to_long(out, "qty_dirty", output="qty_digits")
    return out.select("l_orderkey", "l_linenumber", "price_normalized", "qty_digits")


@_register(
    "dedup_keep_first",
    sql="""
SELECT event_id, user_id, strftime(event_date, '%Y-%m-%d') AS event_date, value
FROM (
  SELECT event_id, user_id, CAST(ts AS DATE) AS event_date, value,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
) WHERE rn = 1
""",
)
def q_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/W3/F2 — keyed dedup keeping first by a deterministic order
    (fixes the reference's monotonically_increasing_id order,
    etl/transform_1.py:82-84)."""
    e = _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = C.dedup_keep_first(e, keys=["user_id", "event_date"], order_by=["ts", "event_id"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
        "value",
    )


@_register(
    "moving_average",
    sql="""
SELECT event_id, user_id, value,
  round(avg(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS avg_value_7
FROM events
""",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — 7-row trailing moving average (reference etl/etl.py:70-76)."""
    e = _t(spark, sf_dir, "events")
    out = W.moving_average(
        e, value="value", keys=["user_id"], order_by=["ts", "event_id"], n=7
    )
    return out.select(
        "event_id", "user_id", "value", F.round("avg_value_7", 6).alias("avg_value_7")
    )


@_register(
    "group_total",
    sql="""
SELECT event_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, event_type,
  round(sum(value) OVER (PARTITION BY CAST(ts AS DATE), event_type), 6)
    AS total_value_type_day
FROM events
""",
)
def q_group_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — whole-partition total attached to detail rows
    (reference etl/etl.py:78-83)."""
    e = _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = W.group_total(
        e, value="value", keys=["event_date", "event_type"], output="total_value_type_day"
    )
    return out.select(
        "event_id",
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
        "event_type",
        F.round("total_value_type_day", 6).alias("total_value_type_day"),
    )


@_register(
    "rolling_stats",
    sql="""
SELECT event_id, user_id, value,
  round(avg(value)    OVER win, 6) AS mean_value_7,
  round(median(value) OVER win, 6) AS median_value_7,
  round(stddev(value) OVER win, 6) AS std_value_7,
  max(value) OVER win AS max_value_7,
  min(value) OVER win AS min_value_7
FROM events
WINDOW win AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — trailing-7 stat bundle {mean, exact median, stddev, max, min}
    (reference etl/transform_1.py:93-99; exact median replaces
    percentile_approx for oracle parity — both variants exposed in the
    operator)."""
    e = _t(spark, sf_dir, "events")
    out = W.rolling_stats(
        e,
        value="value",
        keys=["user_id"],
        order_by=["ts", "event_id"],
        n=7,
        suffix="_value_7",
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.round("mean_value_7", 6).alias("mean_value_7"),
        F.round("median_value_7", 6).alias("median_value_7"),
        F.round("std_value_7", 6).alias("std_value_7"),
        "max_value_7",
        "min_value_7",
    )


@_register(
    "group_min_date",
    sql="""
SELECT event_id, user_id,
  strftime(min(CAST(ts AS DATE)) OVER (PARTITION BY user_id), '%Y-%m-%d')
    AS initial_date
FROM events
""",
)
def q_group_min_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — per-key min date attached to rows (reference etl/transform_1.py:87-90)."""
    e = _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = W.group_min(e, "event_date", keys=["user_id"], output="initial_d")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("initial_d", "yyyy-MM-dd").alias("initial_date"),
    )


@_register(
    "rank_in_group",
    sql="""
SELECT event_id, user_id, rn FROM (
  SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
) WHERE rn <= 3
""",
)
def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/F2 — rank in group + rank filter; also the top-k-per-group plan
    shape (WindowGroupLimit pushes the k-bound below the shuffle)."""
    e = _t(spark, sf_dir, "events")
    out = W.rank_in_group(e, keys=["user_id"], order_by=["ts", "event_id"], output="rn")
    return out.filter(F.col("rn") <= 3).select("event_id", "user_id", "rn")


@_register(
    "all_null_column_drop",
    sql="""
SELECT event_id, user_id, event_type, value FROM events
""",
)
def q_null_col_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/N5/A1 — all-null column drop (reference etl/transform_1.py:50-55):
    a ghost all-null column is injected and must be dropped; populated
    columns survive."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    ghost = e.withColumn("ghost", F.lit(None).cast("string"))
    return C.drop_all_null_columns(ghost, essential=("event_id",))
