"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps one
entry per implemented operator (SURVEY.md section 2) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL. Computed columns are aliased identically on
both sides; floating-point aggregates are rounded to 6 decimals on both
sides so value hashes are stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fiap_machine_learning_tech_challenge_2_etl_spark.plans.pipeline import (
    flagship_events_pipeline,
)
from fiap_machine_learning_tech_challenge_2_etl_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_events_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return queries_catalog.SPARK_QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same aliases as queries()."""
    return queries_catalog.ORACLE_SQL
