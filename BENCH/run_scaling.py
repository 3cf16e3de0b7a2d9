#!/usr/bin/env python
"""N-vs-4N scaling-efficiency evidence (BASELINE.json north_rule).

Runs the SAME north-rule feature job on the SAME input at local[8] and
local[32] (one subprocess per level — a fresh JVM each, so neither level
inherits the other's JIT state), after a warmup pass inside each process.
Reports throughput at both levels and efficiency = (T_N / T_4N) / 4.

Usage:  python BENCH/run_scaling.py [scale]   (default: scale tier)
Writes: BENCH/scaling.json and updates the table in BENCH/BASELINE.md.
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
best = None
for i in range(2):
    t0 = time.time()
    run(spark, paths).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cores": {cores}, "sec": round(best, 3),
                  "queries": SCALES[{scale!r}][3],
                  "fv_per_sec": round(SCALES[{scale!r}][3] / best, 1)}}))
"""


def run_level(cores: int, scale: str) -> dict:
    code = _RUNNER.format(repo=REPO, cores=cores, scale=scale)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "scale"
    n = run_level(8, scale)
    n4 = run_level(32, scale)
    eff = round((n["sec"] / n4["sec"]) / 4.0, 3)
    result = {"scale": scale, "N": n, "4N": n4, "scaling_efficiency": eff}
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
