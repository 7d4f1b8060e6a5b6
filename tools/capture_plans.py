"""Capture .explain("formatted") for registry queries into plan files.

    python tools/capture_plans.py <outdir> <suffix> q1 q2 ...

Writes <outdir>/<query>_<suffix>.txt for each query. The returned frame
is EXPLAINED, not executed — queries whose body runs side jobs (fixture
writes, streaming lifecycles, merges) still run those to build the
frame, so this is driven on the small sf to keep captures fast.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    spark = get_session("plan-capture")
    import __spark_entry__ as ent

    qs = ent.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"CAPTURE FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({suffix}, sf={sf_dir}) ==\n{plan}\n")
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
