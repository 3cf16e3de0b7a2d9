#!/usr/bin/env python
"""N-vs-4N scaling-efficiency evidence (BASELINE.json north_rule).

Runs the SAME north-rule feature job on the SAME input at several
parallelism levels (one subprocess per level — a fresh JVM each, so no
level inherits another's JIT state), after a warmup pass inside each
process. For each (N, 4N) window it reports throughput at both levels and
efficiency = (T_N / T_4N) / 4.

The sandbox VM is a single shared machine, not a cluster: a pure-Python
multiprocessing probe (no Spark, embarrassingly parallel) measures the
machine's own scaling ceiling per window — job efficiency should be read
against that ceiling (a real 4N-executor cluster scales scan bandwidth and
cores with nodes; the sandbox does not).

Usage:  python BENCH/run_scaling.py [scale] [levels...]   (default: scale 2 8 32)
Writes: BENCH/scaling.json; update the table in BENCH/BASELINE.md from it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import sys, time, json
sys.path.insert(0, {repo!r})
from dagli_spark import get_spark
from dagli_spark.fixtures import materialize, SCALES
from dagli_spark.northrule import run
spark = get_spark("scaling", master="local[{cores}]")
spark.sparkContext.setLogLevel("ERROR")
paths = materialize(spark, {scale!r})
run(spark, materialize(spark, "smoke")).write.format("noop").mode("overwrite").save()
# steady state, not JIT warmup, is the measured quantity: the JVM tiers
# the generated window/sort/join code up to C2 over the first executions
# (sf0.1/32 warmup curve: 38 s -> 21 s -> 5.2 s -> 5.3 s), and the warmup
# tail differs BY PARALLELISM LEVEL (at local[8] every core runs 4x more
# tasks per pass, so C2 warms in fewer passes than at local[32]) — a
# fixed best-of-2 therefore biases the N-vs-4N efficiency ratio itself.
# A FIXED 4 passes per level, best counts: an improvement-threshold early
# stop samples different points of the C2 warmup curve at different core
# counts (at 2 cores a pass runs 16x more tasks/core than at 32, so the
# curve flattens in fewer passes) and that asymmetry leaks into the
# N-vs-4N ratio. All pass times are recorded: on this shared host an
# external tenant can double a single pass (measured 11-97 s for identical
# code+input within minutes), so a level whose passes never stabilize is
# visibly noisy.
best = None
passes = []
for i in range({npasses}):
    t0 = time.time()
    run(spark, paths).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    passes.append(round(dt, 2))
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cores": {cores}, "sec": round(best, 3),
                  "passes": passes,
                  "queries": SCALES[{scale!r}][3],
                  "fv_per_sec": round(SCALES[{scale!r}][3] / best, 1)}}))
"""

_CEILING = """
import json, time
from multiprocessing import Pool

def work(seed):
    # pure-python compute kernel, no shared state, no I/O
    acc = seed
    for i in range(4_000_000):
        acc = (acc * 1103515245 + 12345) & 0x7FFFFFFF
    return acc

if __name__ == "__main__":
    import sys
    res = {}
    for cores in [int(c) for c in sys.argv[1:]]:
        tasks = list(range(cores * 4))
        with Pool(cores) as p:
            t0 = time.time()
            p.map(work, tasks)
            dt = time.time() - t0
        res[cores] = len(tasks) / dt
    print(json.dumps(res))
"""

# Second ceiling: the JOB'S OWN decode+stat kernel under plain
# multiprocessing (no Spark, no shuffle, no scheduler) — the per-stage
# event-log breakdown (tools/profile_query_stages.py) shows ~90% of the
# scaling job's task time is this Python kernel, and its task-seconds
# inflate ~1.7x from 8 to 32 concurrent workers (memory bandwidth, not
# CPU: the ALU-bound probe above scales ~0.9 in the same window). This
# probe measures what the machine allows for exactly this work: each
# worker featurizes a fixture-identical encoded-image batch built once
# per process (generation excluded from timing).
_KERNEL_CEILING = """
import json, time, warnings
from multiprocessing import Pool
warnings.filterwarnings("ignore")
import sys
sys.path.insert(0, {repo!r})

_BATCH = None

def _init():
    global _BATCH
    import numpy as np, pandas as pd
    from dagli_spark.fixtures import _gen_image_rows
    _BATCH = pd.Series(_gen_image_rows(42, np.arange(400))["bytes"])

def work(_i):
    from dagli_spark.features.image_features import _features_batch
    return len(_features_batch(_BATCH))

if __name__ == "__main__":
    res = {{}}
    for cores in [int(c) for c in sys.argv[1:]]:
        with Pool(cores, initializer=_init) as p:
            p.map(work, range(cores))  # warm (import + first-touch)
            t0 = time.time()
            p.map(work, range(cores * 4))
            dt = time.time() - t0
        res[cores] = cores * 4 / dt
    print(json.dumps(res))
"""


def run_level(cores: int, scale: str) -> dict:
    # SAME fixed pass count at every level (asymmetry would bias the
    # N-vs-4N ratio — see the runner comment). Default 4; the scale4x
    # tier at 32 cores was measured still descending at pass 4 (C2 tiers
    # the biggest tier's generated code over more executions), so
    # SCALING_PASSES=6 is the documented setting for 4x sessions.
    npasses = int(os.environ.get("SCALING_PASSES", "4"))
    code = _RUNNER.format(repo=REPO, cores=cores, scale=scale,
                          npasses=npasses)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=2400,
    )
    if out.returncode != 0:
        # surface the child's actual error — check=True would discard the
        # captured stderr and leave a multi-hour run undiagnosable
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(
            f"scaling level local[{cores}] failed (exit {out.returncode}); "
            "stderr tail above")
    return json.loads(out.stdout.strip().splitlines()[-1])


def machine_ceiling(levels: list[int], code: str = _CEILING) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code, *[str(c) for c in levels]],
        capture_output=True, text=True, timeout=1200, check=True,
    )
    return {int(k): v for k, v in json.loads(out.stdout.strip()).items()}


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "scale"
    levels = [int(c) for c in sys.argv[2:]] or [2, 8, 32]
    ceil = machine_ceiling(levels)
    kceil = machine_ceiling(levels, _KERNEL_CEILING.format(repo=REPO))
    runs = {c: run_level(c, scale) for c in levels}
    windows = []
    for n in levels:
        if n * 4 in runs:
            eff = round((runs[n]["sec"] / runs[n * 4]["sec"]) / 4.0, 3)
            ceff = round(ceil[n * 4] / ceil[n] / 4.0, 3)
            kceff = round(kceil[n * 4] / kceil[n] / 4.0, 3)
            windows.append({
                "N": n, "4N": n * 4, "job_efficiency": eff,
                "machine_ceiling": ceff,
                "job_over_ceiling": round(eff / ceff, 3) if ceff else None,
                "kernel_ceiling": kceff,
                "job_over_kernel_ceiling":
                    round(eff / kceff, 3) if kceff else None,
            })
    result = {
        "scale": scale,
        "levels": {str(c): runs[c] for c in levels},
        "machine_ceiling_tasks_per_sec": {str(c): round(v, 2)
                                          for c, v in ceil.items()},
        "kernel_ceiling_tasks_per_sec": {str(c): round(v, 2)
                                         for c, v in kceil.items()},
        "windows": windows,
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
