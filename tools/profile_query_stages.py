#!/usr/bin/env python
"""Per-stage profile of one driver query via the Spark event log.

Runs a single `__spark_entry__.queries()` entry with the event log
enabled, then prints every stage's wall window, task-time distribution,
and name — ground truth on where a query's seconds go (scheduler gaps,
stragglers, duplicated subtrees) instead of guessing from `.explain`.

Run on a QUIET host (uptime load < ~2); one query per process so the
stage timeline is not interleaved with other work.

Usage: python tools/profile_query_stages.py <query> [sf_dir] [cpus]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    evdir = f"/tmp/spark-events-{qname}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile-{qname}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    q = E.queries()[qname]
    # warmup pass (JIT/C2), then the measured pass
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.time()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.stop()

    stages = {}  # (stageId, attempt) -> info
    tasks = {}
    logs = []
    for root, _dirs, fns in os.walk(evdir):
        logs += [os.path.join(root, f) for f in fns
                 if "events" in f or f.startswith("local-")]
    for path in logs:
        for line in open(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                k = (si["Stage ID"], si["Stage Attempt ID"])
                stages[k] = {
                    "name": si["Stage Name"],
                    "sub": si.get("Submission Time", 0),
                    "done": si.get("Completion Time", 0),
                    "ntasks": si["Number of Tasks"],
                }
            elif e == "SparkListenerTaskEnd":
                k = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev["Task Info"]
                tasks.setdefault(k, []).append(
                    ti["Finish Time"] - ti["Launch Time"])

    rows = sorted(stages.items(), key=lambda kv: kv[1]["sub"])
    if not rows:
        print("no stages captured"); return
    t_base = rows[0][1]["sub"]
    print(f"measured pass wall: {wall:.2f}s   stages: {len(rows)}")
    print(f"{'stage':>6} {'start':>7} {'end':>7} {'span':>6} {'tasks':>5} "
          f"{'task-sum':>8} {'med':>6} {'max':>6}  name")
    tot_task = 0.0
    for (sid, att), s in rows:
        ts = sorted(tasks.get((sid, att), [0]))
        tsum = sum(ts) / 1000
        tot_task += tsum
        med = ts[len(ts) // 2] / 1000
        print(f"{sid:>6} {(s['sub']-t_base)/1000:>7.2f} "
              f"{(s['done']-t_base)/1000:>7.2f} "
              f"{(s['done']-s['sub'])/1000:>6.2f} {s['ntasks']:>5} "
              f"{tsum:>8.2f} {med:>6.2f} {max(ts)/1000:>6.2f}  "
              f"{s['name'][:60]}")
    print(f"total task-seconds: {tot_task:.1f}  "
          f"(cores x wall = {int(cpus) * wall:.0f})")


if __name__ == "__main__":
    main()
