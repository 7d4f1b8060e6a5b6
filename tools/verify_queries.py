"""Local stand-in for the driver's oracle-differential check.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()`` through
DuckDB on the same parquet, then compares row count, column-name set, and an
order-insensitive multiset of canonicalized row values. Usage:

    python tools/verify_queries.py [sf_dir] [query ...]
    python tools/verify_queries.py --vanilla [sf_dir] [query ...]
        # TRULY VANILLA SparkSession (no engine confs at all) — proves an
        # attestation does not depend on session configuration the engine
        # sets, exactly the driver's execution environment
    python tools/verify_queries.py --window [sf_dir]
        # run exactly the 50-query _PRIORITY attestation window
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, int):
        return repr(v)
    return repr(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    argv = list(sys.argv[1:])
    vanilla = "--vanilla" in argv
    window = "--window" in argv
    argv = [a for a in argv if a not in ("--vanilla", "--window")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as ent

    if window:
        only |= set(ent._PRIORITY)
    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

        spark = get_session("verify-queries")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"NOOR  {name}: {len(srows)} rows (rows-only check), {time.time()-t0:.1f}s")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sm, dm = row_multiset(scols, srows), row_multiset(dcols, drows)
            if sm != dm:
                diff_s = list((sm - dm).items())[:3]
                diff_d = list((dm - sm).items())[:3]
                problems.append(f"values: spark-only={diff_s} duck-only={diff_d}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows, {time.time()-t0:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
