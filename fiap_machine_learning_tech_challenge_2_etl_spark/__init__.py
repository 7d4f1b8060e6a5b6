"""PySpark-native analytics engine with the query/data-processing capabilities
of the reference ETL pipeline (GuilhermeDellatin/fiap-machine-learning-tech-challenge-2-etl).

This is a from-scratch Spark-first design, NOT a port: the reference's operator
semantics (SURVEY.md section 2) are re-expressed as composable DataFrame stages,
a Spark SQL catalog layer, and Structured Streaming incrementality — plus an
extension surface (joins, grouped aggregation, set ops, LLM-data-pipeline
operators: dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Layout:
    session        SparkSession factory (UTC, AQE, dynamic partition overwrite)
    schemas        single-source-of-truth StructType registry
    sources/       parquet dir/file/catalog readers, partitioned sinks
    functions/     scalar expression helpers (sanitizers, json, text stats)
    operators/     DataFrame -> DataFrame stages (cleaning, windows, dedup,
                   joins, similarity, text, multimodal)
    plans/         pipeline compositions (flagship extract->transform->load)
    streaming/     Structured Streaming incremental runner
"""

from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
