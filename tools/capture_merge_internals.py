"""Capture the merge's INTERNAL plans (staged-rewrite frame) plus its
job count — the evidence files for the r16 point-merge restructure.

    python tools/capture_merge_internals.py <outfile>

Builds a small range-clustered manifest table, runs one point-mode merge
(with an insert key), and writes: the staged rewrite frame's
explain("formatted") captured by intercepting _publish_replace_with_retry,
and the Spark job count observed during merge_into_manifest_sink.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources import pysink
    from pyspark.sql import functions as F

    spark = get_session("merge-internals")
    spark.dataSource.register(pysink.ManifestSinkDataSource)
    d = os.path.join(tempfile.mkdtemp(prefix="merge-internals-"), "t")
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("lang"),
        (F.col("id") * 3).alias("n_chars"),
    )
    docs.repartitionByRange(4, "doc_id").write.format("manifestsink").option(
        "path", d
    ).option("statsColumns", "doc_id").option("format", "parquet").mode(
        "append"
    ).save()

    updates = docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 140)
    ).withColumn("n_chars", (F.col("n_chars") + 10).cast("long")).unionByName(
        spark.createDataFrame(
            [(9000000001, "zz", 1)], "doc_id long, lang string, n_chars long"
        )
    )

    plans: list[str] = []
    orig = pysink._publish_replace_with_retry

    def capture(df, *a, **k):
        plans.append(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        return orig(df, *a, **k)

    pysink._publish_replace_with_retry = capture
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    res = pysink.merge_into_manifest_sink(spark, d, updates, ["doc_id"])
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    pysink._publish_replace_with_retry = orig

    with open(out_path, "w") as fh:
        fh.write(f"== merge result: { {k: v for k, v in res.items() if k != 'rewritten_files'} } ==\n")
        fh.write(
            f"== Spark jobs observed during merge_into_manifest_sink: "
            f"{jobs_after - jobs_before} ==\n\n"
        )
        fh.write("== staged rewrite frame (kept rows + surviving updates):\n")
        fh.write(plans[0] if plans else "NO PLAN CAPTURED")
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
