#!/usr/bin/env python
"""Profile one registered query: run it under the bench-harness session
with the Spark event log enabled, then parse the log into a per-job
timeline (duration, stage count, task time, callsite) so the time sinks
inside multi-job queries (DML commits, streaming drains) are visible
without the UI. Usage:

    python scripts/profile_query.py <query_name> [sf_dir] [--repeat N]

Prints each Spark job's wall duration and callsite, plus the gaps
between jobs (driver-side time: planning, log replay, py4j, commits).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    repeat = 1
    for a in sys.argv[1:]:
        if a.startswith("--repeat"):
            repeat = int(a.split("=", 1)[1]) if "=" in a else 2

    evdir = tempfile.mkdtemp(prefix="spark_evlog_")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from marketdb_spark.queries import REGISTRY
    from marketdb_spark.session import get_session

    spark = get_session(
        app_name=f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # warm-up: shared JIT paths (mirrors bench.py)
    warm = "/root/testdata/sf0.001"
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        REGISTRY[name].fn(spark, warm).count()
    except Exception as e:
        print(f"# warm-up at sf0.001 failed (continuing): {e}", file=sys.stderr)

    for i in range(repeat):
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        print(f"== run {i}: {dt:.3f}s ({n} rows)")
        marker = spark.sparkContext.parallelize([1], 1)
        spark.sparkContext.setJobDescription(f"__END_RUN_{i}__")
        marker.count()
        spark.sparkContext.setJobDescription(None)

    sc_app = spark.sparkContext.applicationId
    spark.stop()

    logf = None
    for f in os.listdir(evdir):
        if sc_app in f:
            logf = os.path.join(evdir, f)
    assert logf, f"no event log for {sc_app} in {evdir}"
    if os.path.isdir(logf):
        # Spark 4 rolling layout: eventlog_v2_<app>/events_*_<app>
        logs = sorted(
            os.path.join(logf, f)
            for f in os.listdir(logf)
            if f.startswith("events_")
        )
    else:
        logs = [logf]

    def _lines():
        for lf in logs:
            with open(lf) as fh:
                yield from fh

    jobs = {}
    order = []
    for line in _lines():
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description")
                or props.get("callSite.short", ""),
                "stages": len(ev.get("Stage IDs", [])),
            }
            order.append(jid)
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]

    print(f"\n== per-job timeline ({len(order)} jobs) ==")
    prev_end = None
    run_no = 0
    for jid in order:
        j = jobs[jid]
        dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j.get("end", j["start"])
        desc = (j["desc"] or "")[:100]
        if desc.startswith("__END_RUN_"):
            print(f"---- end of run {run_no} ----")
            run_no += 1
            continue
        mark = " <<<" if dur > 0.3 or gap > 0.3 else ""
        print(
            f"job {jid:4d}  gap {gap:6.3f}s  dur {dur:6.3f}s  "
            f"stages {j['stages']}  {desc}{mark}"
        )


if __name__ == "__main__":
    main()
