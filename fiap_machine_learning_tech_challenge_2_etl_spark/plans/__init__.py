"""Pipeline compositions: the reference's extract -> transform -> load stages
as pure-function DataFrame chains in one SparkSession."""

from fiap_machine_learning_tech_challenge_2_etl_spark.plans.pipeline import (
    transform_v1,
    transform_v2,
    flagship_events_pipeline,
    run_batch_pipeline,
)

__all__ = [
    "transform_v1",
    "transform_v2",
    "flagship_events_pipeline",
    "run_batch_pipeline",
]
