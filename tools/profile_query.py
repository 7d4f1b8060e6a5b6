"""Per-JOB profile of one registry query (guide §1: measure first).

Runs a single ``queries()`` entry in a dedicated session with the Spark
event log enabled, then parses the log and prints every job's wall time,
description, and stage/task counts — the evidence for job-count-bound
queries (streaming/manifest roundtrips), where the cost is HOW MANY jobs
run, not bytes.

    python tools/profile_query.py <query> [sf_dir]

The event log dir is a fresh tmpdir per run; nothing is cached or
persisted across invocations.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="spark-evlog-")

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from fiap_machine_learning_tech_challenge_2_etl_spark.session import get_session

    extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    spark = get_session("profile", extra_conf=extra)
    import __spark_entry__ as ent

    qs = ent.queries()
    fn = qs[name]
    # warm: JVM + python workers, as bench.py does
    ent.entry(spark).write.mode("overwrite").format("noop").save()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 writes a rolling dir eventlog_v2_<appId>/events_* ; older
    # layouts write a single file <appId>[.inprogress]
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        path += ".inprogress"
    v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):
        parts = sorted(
            f for f in os.listdir(v2) if f.startswith("events_")
        )
        path = [os.path.join(v2, f) for f in parts]
    else:
        path = [path]
    starts: dict[int, dict] = {}
    jobs: list[dict] = []
    first_start = None
    def lines():
        for p in path:
            with open(p) as fh:
                yield from fh

    for line in lines():
        if True:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description", "")
                if not desc:
                    infos = ev.get("Stage Infos") or []
                    names = {
                        f"{i.get('Stage Name', '').split(chr(10))[0]}"
                        f"[{i.get('Number of Tasks')}t]"
                        for i in infos
                    }
                    desc = " | ".join(sorted(names))
                starts[jid] = {
                    "t": ev["Submission Time"],
                    "desc": desc[:140],
                    "stages": len(ev.get("Stage IDs", [])),
                }
                if first_start is None or ev["Submission Time"] < first_start:
                    first_start = ev["Submission Time"]
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                s = starts.get(jid)
                if s:
                    jobs.append(
                        {
                            "job": jid,
                            "ms": ev["Completion Time"] - s["t"],
                            "start_rel": s["t"],
                            "stages": s["stages"],
                            "desc": s["desc"],
                        }
                    )
    # drop warmup jobs: everything before the LAST gap is hard to pick,
    # so instead report all jobs after the warmup noop writes — the query
    # run is the trailing contiguous block; identify it by the wall-clock
    # ratio instead: print everything, the reader slices.
    jobs.sort(key=lambda j: j["start_rel"])
    t_base = jobs[0]["start_rel"] if jobs else 0
    print(f"query={name} wall={wall:.2f}s jobs={len(jobs)} (incl. warmup)")
    tot = 0
    for j in jobs:
        rel = (j["start_rel"] - t_base) / 1000.0
        tot += j["ms"]
        print(
            f"  t+{rel:8.2f}s job={j['job']:3d} {j['ms']:6d}ms "
            f"stages={j['stages']} {j['desc']}"
        )
    print(f"sum_job_ms={tot} wall_query_s={wall:.2f} evlog={path}")


if __name__ == "__main__":
    main()
