#!/usr/bin/env python
"""Per-query profiler for the bench headline (guide §1: measure first).

Runs the chosen queries exactly like bench.py (noop sink, warm JVM)
with the Spark event log enabled and a per-query job description, then
parses the event log to attribute jobs/stages/tasks to queries:

    python profile_bench.py q159_leiden_distributed q82_pagerank
    python profile_bench.py --headline          # the whole bench set

Output per query (stdout table + /tmp/profile_bench.json):
  wall        best-of-reps wall seconds (bench methodology)
  build       seconds spent INSIDE the query function (internal
              actions: collects, localCheckpoints, index round-trips)
  jobs        Spark jobs launched by the timed rep
  stages      stages run (incl. skipped=reused exchanges)
  tasks       tasks run
  task_sec    summed executor task time (cpu+fetch) for the rep
  shuf_mb     shuffle read MB for the rep
  py_nodes    BatchEvalPython/ArrowEvalPython/MapInPandas in the plan

This is tooling, not engine code: nothing in the query path changes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    import __spark_entry__ as entrymod
    from graphragpart1datapipeline_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="graphrag-spark-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            # plain single-file JSON so the parser below can read it
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    if "--headline" in sys.argv:
        from bench import HEADLINE

        names = list(HEADLINE)
    elif "--secondary" in sys.argv:
        from bench import SECONDARY

        names = list(SECONDARY)
    else:
        names = args
    assert names, "give query names or --headline/--secondary"

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm-up (bench parity)
    run(queries["q01_pricing_summary"](spark, sf_dir))

    def _ident(batches):
        yield from batches

    run(
        spark.range(spark.sparkContext.defaultParallelism * 4)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_ident, schema="id long")
    )
    for name in names:  # full warm pass like bench
        spark.sparkContext.setJobDescription(f"warm::{name}")
        run(queries[name](spark, sf_dir))

    reps = int(os.environ.get("PROFILE_REPS", "2"))
    walls: dict[str, list[float]] = {}
    builds: dict[str, list[float]] = {}
    plans: dict[str, str] = {}
    for name in names:
        walls[name] = []
        builds[name] = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"rep{r}::{name}")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            run(df)
            t2 = time.perf_counter()
            walls[name].append(t2 - t0)
            builds[name].append(t1 - t0)
            if name not in plans:
                try:
                    plans[name] = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:
                    plans[name] = df._jdf.queryExecution().toString()
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log --------------------------------------
    ev_path = os.path.join(EVDIR, app_id)
    if not os.path.exists(ev_path):
        # Spark 4 rolling layout: eventlog_v2_<appid>/events_1_... files
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.startswith("events_")
        )
        merged = os.path.join(EVDIR, "merged.jsonl")
        with open(merged, "w") as out_f:
            for p in parts:
                with open(p) as in_f:
                    out_f.write(in_f.read())
        ev_path = merged
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    stage_info: dict[int, dict] = {}
    with open(ev_path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties", {}) or {}
                desc = props.get("spark.job.description", "")
                jid = ev["Job ID"]
                sids = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
                jobs[jid] = {"desc": desc, "stages": sids}
                for s in sids:
                    stage_to_job[s] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "tasks": si.get("Number of Tasks", 0),
                    "submitted": si.get("Submission Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                jid = stage_to_job.get(sid)
                if jid is None:
                    continue
                j = jobs[jid]
                j["task_ms"] = j.get("task_ms", 0) + (
                    m.get("Executor Run Time", 0) or 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                j["shuf_rd"] = (
                    j.get("shuf_rd", 0)
                    + (srm.get("Local Bytes Read", 0) or 0)
                    + (srm.get("Remote Bytes Read", 0) or 0)
                )
                j["n_tasks"] = j.get("n_tasks", 0) + 1

    per_q: dict[str, dict] = {}
    for jid, j in jobs.items():
        desc = j["desc"]
        if "::" not in desc:
            continue
        tag, name = desc.split("::", 1)
        if tag != "rep0":
            continue
        d = per_q.setdefault(
            name,
            {"jobs": 0, "stages": 0, "tasks": 0, "task_sec": 0.0, "shuf_mb": 0.0},
        )
        d["jobs"] += 1
        d["stages"] += len([s for s in j["stages"] if s in stage_info])
        d["tasks"] += j.get("n_tasks", 0)
        d["task_sec"] += j.get("task_ms", 0) / 1000.0
        d["shuf_mb"] += j.get("shuf_rd", 0) / 1e6

    out = {}
    hdr = (
        f"{'query':44s} {'wall':>7s} {'build':>7s} {'jobs':>5s} "
        f"{'stages':>6s} {'tasks':>6s} {'tsksec':>7s} {'shufMB':>7s} {'py':>3s}"
    )
    print(hdr)
    for name in names:
        d = per_q.get(name, {})
        plan = plans.get(name, "")
        pynodes = sum(
            plan.count(k)
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow")
        )
        row = {
            "wall": round(min(walls[name]), 3),
            "wall_all": [round(w, 3) for w in walls[name]],
            "build": round(min(builds[name]), 3),
            "jobs": d.get("jobs", 0),
            "stages": d.get("stages", 0),
            "tasks": d.get("tasks", 0),
            "task_sec": round(d.get("task_sec", 0.0), 2),
            "shuf_mb": round(d.get("shuf_mb", 0.0), 2),
            "py_nodes": pynodes,
        }
        out[name] = row
        print(
            f"{name:44s} {row['wall']:7.3f} {row['build']:7.3f} "
            f"{row['jobs']:5d} {row['stages']:6d} {row['tasks']:6d} "
            f"{row['task_sec']:7.2f} {row['shuf_mb']:7.2f} {pynodes:3d}"
        )
    with open("/tmp/profile_bench.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("\nwrote /tmp/profile_bench.json")


if __name__ == "__main__":
    main()
