"""Property tests (SURVEY.md section 5.4): regex sanitizers on generated
dirty numerics. Each example runs one Spark job over a batch of values, so
example counts are kept small."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fiap_machine_learning_tech_challenge_2_etl_spark.operators import cleaning as C


def _brazilian_int(x: int) -> str:
    """12345678 -> '12.345.678' (thousands dots, as in B3 theoricalQty)."""
    sign = "-" if x < 0 else ""
    return sign + f"{abs(x):,}".replace(",", ".")


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**14), max_value=10**14), min_size=1, max_size=50
    )
)
def test_digits_to_long_parses_any_thousands_grouping(spark, xs):
    df = spark.createDataFrame(
        [(i, _brazilian_int(x)) for i, x in enumerate(xs)], "i long, dirty string"
    )
    out = {r["i"]: r["dirty"] for r in C.digits_to_long(df, "dirty").collect()}
    for i, x in enumerate(xs):
        assert out[i] == x


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=50
    )
)
def test_normalize_decimal_comma_matches_python_float(spark, ns):
    # n/1000 rendered with a decimal COMMA ('123,456'), as in B3 'part'
    df = spark.createDataFrame(
        [(i, f"{n // 1000},{abs(n) % 1000:03d}" if n >= 0 or n % 1000 == 0
          else f"-{abs(n) // 1000},{abs(n) % 1000:03d}")
         for i, n in enumerate(ns)],
        "i long, dirty string",
    )
    parsed = {r["i"]: r["dirty"] for r in C.normalize_decimal_comma(df, "dirty").collect()}
    for i, n in enumerate(ns):
        sign = "-" if n < 0 else ""
        assert parsed[i] == float(f"{sign}{abs(n) // 1000}.{abs(n) % 1000:03d}")
