"""Pipeline plans (SURVEY.md section 3, EP1-EP3 re-expressed).

The reference runs three Glue jobs chained by a Step Function, handing data
off via S3 between separate clusters (infra/glue.tf:99-156). Here the stages
are pure ``DataFrame -> DataFrame`` functions composed in ONE SparkSession —
no process boundary, one Catalyst plan end-to-end, so the optimizer sees the
whole chain (projection pruning through the windows down to the scan).

Two reference transform generations are re-expressed faithfully:
  * transform_v1 — the catalog-driven "English" transform
    (etl/transform_1.py:43-115): dynamic projection, regex sanitize,
    keyed dedup, initial-date, rolling stats bundle.
  * transform_v2 — the incremental "Portuguese" transform
    (etl/etl.py:36-107): select, distinct, typed fills, moving average,
    per-(day, sector) totals.

``flagship_events_pipeline`` maps the same semantics onto the driver's
``events`` table (FIXTURES.md role mapping: user_id ~ stock code,
ts ~ reference_date, value ~ part, event_type ~ setor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.operators import cleaning as C
from fiap_machine_learning_tech_challenge_2_etl_spark.operators import windows as W
from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata
from fiap_machine_learning_tech_challenge_2_etl_spark.sources.sinks import write_partitioned_parquet


def transform_v1(df: DataFrame, window_days: int = 7, exact_median: bool = True) -> DataFrame:
    """V1 transform (reference etl/transform_1.py:43-115) over a B3_RAW_V1 frame.

    Chain: drop all-null cols -> rename -> sanitize numerics -> parse date ->
    require keys -> keyed dedup (deterministic via ingest_seq; the reference's
    monotonically_increasing_id order at :83 is nondeterministic) ->
    initial_date -> rolling {mean,median,std,max,min} over window_days ->
    restore string date.

    All three window stages key on ``code`` and are laid out adjacently so
    the plan reuses one exchange (SURVEY.md section 4).
    """
    out = C.drop_all_null_columns(df, essential=("cod", "date"))
    out = C.rename_columns(
        out, {"cod": "code", "asset": "ticker", "date": "reference_date"}
    )
    if "part" in out.columns:
        out = C.normalize_decimal_comma(out, "part")
    if "theoricalQty" in out.columns:
        out = C.digits_to_long(out, "theoricalQty")
    out = C.parse_date(out, "reference_date", output="reference_date_date")
    out = C.require_keys(out, ["code", "reference_date_date"])
    # one exchange for dedup + all code-keyed windows (see
    # flagship_events_pipeline for the partitioning-subset rationale)
    out = out.repartition("code")
    out = C.dedup_keep_first(
        out, keys=["code", "reference_date_date"], order_by=["ingest_seq"]
    )
    # --- code-keyed window stages, grouped for exchange reuse ---
    out = W.rolling_stats(
        out,
        value="part",
        keys=["code"],
        order_by=["reference_date_date"],
        n=window_days,
        suffix=f"_part_{window_days}_days",
        exact_median=exact_median,
    )
    out = W.group_min(out, "reference_date_date", keys=["code"], output="initial_date_d")
    out = out.withColumn("initial_date", F.date_format("initial_date_d", "yyyy-MM-dd"))
    out = out.withColumn(
        "reference_date", F.date_format("reference_date_date", "yyyy-MM-dd")
    )
    return C.drop_columns(out, ["reference_date_date", "initial_date_d"])


def transform_v2(df: DataFrame, n: int = 7) -> DataFrame:
    """V2 transform (reference etl/etl.py:36-88) over a B3_RAW_V2 frame.

    Chain: select 8 cols -> full-row distinct -> typed fills -> string-cast
    date + default -> renames -> transient timestamp -> 7-row moving average
    per code -> per-(day, sector) total -> drop transient column.
    """
    out = C.select_columns(
        df,
        [
            "setor",
            "codigo",
            "acao",
            "tipo",
            "porcentagem_participacao",
            "porcentagem_participacao_acumulada",
            "quantidade_teorica",
            "data_pregao",
        ],
    )
    out = C.distinct_rows(out)
    out = C.fill_defaults(
        out,
        {
            "setor": "UNKNOWN",
            "codigo": "UNKNOWN",
            "acao": "UNKNOWN",
            "tipo": "UNKNOWN",
            "porcentagem_participacao": 0.0,
            "porcentagem_participacao_acumulada": 0.0,
            "quantidade_teorica": 0,
        },
    )
    out = C.cast_then_fill(out, ["data_pregao"], "string", "1970-01-01")
    out = C.rename_columns(out, {"codigo": "codigo_acao", "acao": "nome_acao"})
    out = out.withColumn("data_pregao_ts", F.col("data_pregao").cast("timestamp"))
    out = W.moving_average(
        out,
        value="quantidade_teorica",
        keys=["codigo_acao"],
        order_by=["data_pregao_ts"],
        n=n,
        output="media_movel_7d_qtde_teorica",
    )
    out = W.group_total(
        out,
        value="quantidade_teorica",
        keys=["data_pregao", "setor"],
        output="total_qtde_teorica_setor_dia",
    )
    return C.drop_columns(out, ["data_pregao_ts"])


def flagship_events_pipeline(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """The flagship query: the full reference clean->window surface mapped
    onto the driver's ``events`` table.

    user_id ~ stock code, date(ts) ~ reference_date, value ~ part,
    event_type ~ setor (FIXTURES.md section 1 role mapping). Combines V1's
    rolling-stats bundle + initial-date with V2's group-total, with
    deterministic keyed dedup.
    """
    events = load_testdata(spark, sf_dir, ["events"])["events"]
    out = events.withColumn("event_date", F.to_date("ts"))
    out = C.require_keys(out, ["user_id", "event_date"])
    # ONE exchange for dedup + both user-keyed windows: hash-partitioning on
    # user_id satisfies the dedup window's ClusteredDistribution(user_id,
    # event_date) AND the rolling/min windows' (user_id), so the plan sorts
    # twice but shuffles once. Trade-off: the two-exchange form lets Spark
    # run a partial WindowGroupLimit before the first shuffle — prefer that
    # only when the duplicate ratio is extreme (shuffle savings > one
    # whole re-shuffle of the deduped stream).
    out = out.repartition("user_id")
    # one row per (user, day): keep the earliest event deterministically
    out = C.dedup_keep_first(
        out, keys=["user_id", "event_date"], order_by=["ts", "event_id"]
    )
    # --- user-keyed windows grouped for exchange reuse ---
    out = W.rolling_stats(
        out,
        value="value",
        keys=["user_id"],
        order_by=["event_date", "event_id"],
        n=window_days,
        suffix=f"_value_{window_days}d",
    )
    out = W.group_min(out, "event_date", keys=["user_id"], output="initial_date_d")
    # --- (day, type)-keyed window ---
    out = W.group_total(
        out, value="value", keys=["event_date", "event_type"], output="total_value_type_day"
    )
    out = out.withColumn("initial_date", F.date_format("initial_date_d", "yyyy-MM-dd"))
    return out.select(
        "user_id",
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
        "event_type",
        "value",
        F.round(f"mean_value_{window_days}d", 6).alias("mean_value_7d"),
        F.round(f"median_value_{window_days}d", 6).alias("median_value_7d"),
        F.round(f"std_value_{window_days}d", 6).alias("std_value_7d"),
        F.col(f"max_value_{window_days}d").alias("max_value_7d"),
        F.col(f"min_value_{window_days}d").alias("min_value_7d"),
        "initial_date",
        F.round("total_value_type_day", 6).alias("total_value_type_day"),
    )


def run_batch_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    mode: str = "overwrite",
    window_days: int = 7,
) -> None:
    """EP2 flattened: transform + partitioned load in one session
    (replaces the reference's three-cluster Step Function,
    infra/glue.tf:99-156). Extract/load catalog registration lives in
    sources.catalog."""
    refined = flagship_events_pipeline(spark, sf_dir, window_days=window_days)
    write_partitioned_parquet(
        refined, out_path, partition_by=["event_date"], mode=mode
    )
