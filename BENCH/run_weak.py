#!/usr/bin/env python
"""Weak-scaling evidence: 8 cores @ 1x input vs 32 cores @ 4x input.

Strong scaling (run_scaling.py) holds the input fixed and quadruples the
cores — on this single shared VM the 8->32 window is bounded ~0.75-0.78
by the fixed driver slice plus per-core DRAM-bandwidth degradation (see
the decomposition in BENCH/BASELINE.md). A real cluster does not scale
that way: going from N to 4N EXECUTOR NODES brings 4x the DRAM buses and
4x the scan bandwidth with it, which is exactly the weak-scaling regime —
per-core work constant, total work proportional to cores.

This runner measures that regime for the WHOLE job (not just the kernel
probe): the north-rule pipeline at local[8] on the `scale` fixture
(1,200,000 query rows) vs local[32] on `scale4x` (4,800,000 rows).
Per-core work is identical by construction (SCALES in fixtures.py), so

    weak efficiency = T_8@1x / T_32@4x        (1.0 = perfect)

Protocol is run_scaling.py's: fresh JVM per level, warmup smoke pass,
SCALING_PASSES fixed passes (default 6 — the 4x tier at 32 cores is
still C2-tiering at pass 4), best-of, all passes recorded so tenant
noise is visible as spread. Run only on a quiet host (steal ~ 0,
load < 1) and archive the output per CLAUDE.md bench discipline.

Usage:  python BENCH/run_weak.py            (writes BENCH/scaling_weak.json)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import REPO, _KERNEL_CEILING, machine_ceiling, run_level


def main() -> None:
    os.environ.setdefault("SCALING_PASSES", "6")
    # kernel ceiling is already weak-scaled (constant per-worker batch)
    kceil = machine_ceiling([8, 32], _KERNEL_CEILING.format(repo=REPO))
    lo = run_level(8, "scale")
    hi = run_level(32, "scale4x")
    result = {
        "kind": "weak_scaling",
        "levels": {
            "8@scale": {"cores": 8, "scale": "scale",
                        "best": lo["sec"], "passes": lo["passes"],
                        "queries": lo["queries"]},
            "32@scale4x": {"cores": 32, "scale": "scale4x",
                           "best": hi["sec"], "passes": hi["passes"],
                           "queries": hi["queries"]},
        },
        "efficiency_8_to_32": round(lo["sec"] / hi["sec"], 3),
        "fv_per_sec_8": lo["fv_per_sec"],
        "fv_per_sec_32": hi["fv_per_sec"],
        "kernel_ceiling_tasks_per_sec": {str(c): round(v, 2)
                                         for c, v in kceil.items()},
        "kernel_weak_efficiency_8_to_32":
            round(kceil[32] / (4 * kceil[8]), 3),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "scaling_weak.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
