"""Unit tests for cleaning operators (SURVEY.md section 2.3-2.7) over
reference-shaped dirty fixtures (FIXTURES.md section 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from fiap_machine_learning_tech_challenge_2_etl_spark.operators import cleaning as C
from fiap_machine_learning_tech_challenge_2_etl_spark.schemas import B3_RAW_V1


@pytest.fixture(scope="module")
def b3_v1(spark):
    rows = [
        # (segment, cod, asset, type, part, partAcum, theoricalQty, date, ingest_seq)
        (1, "PETR4", "PETROBRAS", "PN", "1,234", 10, "12.345.678", "2024-01-02", 1),
        (1, "PETR4", "PETROBRAS", "PN", "9,999", 11, "99", "2024-01-02", 2),  # dup key
        (2, "VALE3", "VALE", "ON", "2,5", 20, "-1.234", "2024-01-02", 3),
        (None, None, "GHOST", "ON", None, None, None, "2024-01-03", 4),  # null key
        (3, "ITUB4", "ITAU", "PN", "0,75", 30, "1,000,000", "2024-01-03", 5),
    ]
    return spark.createDataFrame(rows, schema=B3_RAW_V1)


@pytest.fixture(scope="module")
def b3_with_ghost(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "PETR4", "PETROBRAS", "PN", "1,234", 10, "12.345.678", "2024-01-02", 1),
        (2, "VALE3", "VALE", "ON", "2,5", 20, "-1.234", "2024-01-02", 2),
    ]
    df = spark.createDataFrame(rows, schema=B3_RAW_V1)
    return df.withColumn("ghost", F.lit(None).cast("string"))


def test_normalize_decimal_comma(spark, b3_v1):
    out = {r["cod"]: r["part"] for r in C.normalize_decimal_comma(b3_v1, "part").collect()}
    assert out["VALE3"] == 2.5
    assert out["ITUB4"] == 0.75
    assert out[None] is None


def test_digits_to_long_handles_separators_and_negatives(spark, b3_v1):
    out = {
        r["ingest_seq"]: r["theoricalQty"]
        for r in C.digits_to_long(b3_v1, "theoricalQty").collect()
    }
    assert out[1] == 12345678  # "12.345.678" thousands-dot
    assert out[3] == -1234  # "-1.234" keeps the minus (reference etl/transform_1.py:71)
    assert out[5] == 1000000  # comma thousands
    assert out[4] is None


def test_drop_all_null_columns(spark, b3_with_ghost):
    out = C.drop_all_null_columns(b3_with_ghost, essential=("cod", "date"))
    assert "ghost" not in out.columns
    assert set(B3_RAW_V1.fieldNames()) <= set(out.columns)


def test_drop_all_null_columns_sampled(spark, b3_with_ghost):
    out = C.drop_all_null_columns(
        b3_with_ghost, essential=("cod",), sample_fraction=0.5
    )
    assert "ghost" not in out.columns


def test_require_keys(spark, b3_v1):
    out = C.require_keys(b3_v1, ["cod", "date"])
    assert out.count() == 4
    assert all(r["cod"] is not None for r in out.collect())


def test_dedup_keep_first_deterministic(spark, b3_v1):
    out = C.dedup_keep_first(b3_v1, keys=["cod", "date"], order_by=["ingest_seq"])
    rows = {r["cod"]: r for r in out.collect()}
    assert rows["PETR4"]["ingest_seq"] == 1  # first by ingest order survives
    assert out.count() == 5 - 1


def test_dedup_invariant_under_shuffle(spark, b3_v1):
    """Property: keyed dedup result must not depend on input partitioning
    (the reference's monotonically_increasing_id order violates this)."""
    a = C.dedup_keep_first(b3_v1, ["cod", "date"], ["ingest_seq"])
    b = C.dedup_keep_first(
        b3_v1.repartition(7).sortWithinPartitions("part"), ["cod", "date"], ["ingest_seq"]
    )
    assert sorted(map(tuple, a.collect()), key=str) == sorted(
        map(tuple, b.collect()), key=str
    )


def test_fill_defaults_and_cast_then_fill(spark):
    from fiap_machine_learning_tech_challenge_2_etl_spark.schemas import B3_RAW_V2

    rows = [
        Row(
            setor=None,
            codigo="PETR4",
            acao=None,
            tipo="PN",
            porcentagem_participacao=None,
            porcentagem_participacao_acumulada=1.0,
            quantidade_teorica=None,
            data_pregao=None,
        )
    ]
    df = spark.createDataFrame(rows, schema=B3_RAW_V2)
    out = C.fill_defaults(
        df,
        {"setor": "UNKNOWN", "acao": "UNKNOWN", "porcentagem_participacao": 0.0,
         "quantidade_teorica": 0},
    )
    out = C.cast_then_fill(out, ["data_pregao"], "string", "1970-01-01")
    r = out.collect()[0]
    assert r["setor"] == "UNKNOWN"
    assert r["porcentagem_participacao"] == 0.0
    assert r["quantidade_teorica"] == 0
    assert r["data_pregao"] == "1970-01-01"


def test_rename_and_select_tolerant(spark, b3_v1):
    out = C.rename_columns(b3_v1, {"cod": "code", "missing": "x"})
    assert "code" in out.columns and "x" not in out.columns
    out2 = C.select_columns(b3_v1, ["cod", "not_there"])
    assert out2.columns == ["cod"]
    with pytest.raises(Exception):
        C.select_columns(b3_v1, ["not_there"], strict=True).collect()
