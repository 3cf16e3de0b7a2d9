"""Spark-free probe of the decode-feature kernel's parallel scaling.

Measures ``_features_batch`` throughput at N worker PROCESSES (the Spark
local[N] stand-in: same numpy kernels, no JVM/Arrow overhead) for a given
chunk policy, so chunk-size changes can be evaluated directly against the
machine's memory-bandwidth ceiling — the measured 32-worker limit of the
whole benchmark (BENCH/BASELINE.md).

Usage:
    python BENCH/kernel_probe.py [tier] [chunks ...] [--levels 1,8,32]
e.g.
    python BENCH/kernel_probe.py bench 1024 adaptive --levels=1,8,32

Discipline (CLAUDE.md): quiet host (load < ~2), no concurrent tests or
bench runs; each level runs a warmup pass and reports best-of-2.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_blobs(tier: str, limit: int) -> list[bytes]:
    import pyarrow.dataset as ds

    from dagli_spark.fixtures import fixture_root

    root = os.path.join(fixture_root(tier), "images")
    if not os.path.exists(root):
        raise SystemExit(
            f"fixture tier {tier!r} not materialized ({root}); run "
            f"bench.py or materialize() first")
    t = ds.dataset(root).to_table(columns=["bytes"])
    blobs = t.column("bytes").to_pylist()
    while len(blobs) < limit:
        blobs = blobs + blobs
    return blobs[:limit]


_G: dict = {}


def _init(tier: str, per_worker: int):
    """Worker initializer: load this worker's blob set ONCE (imports,
    page-cache, numpy warm) so the timed map measures pure kernel work —
    not interpreter spawn, module import, or blob pickling. One BLAS
    thread per worker, pinned HERE (before numpy loads in this spawned
    interpreter) — parallelism is the pool's job; inheriting it from a
    caller's Spark-session env would be an invisible dependency."""
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    import pandas as pd  # noqa: F401

    _G["blobs"] = _load_blobs(tier, per_worker)
    _G["series"] = __import__("pandas").Series(_G["blobs"])


def _run(chunk):
    from dagli_spark.features import image_features as imf

    if chunk != "adaptive":
        imf._STACK_CHUNK = int(chunk)
        imf._CHUNK_BUDGET_BYTES = 1 << 62  # disable the adaptive cap
    out = imf._features_batch(_G["series"])
    return len(out)


def run_level(tier: str, per_worker: int, n_procs: int, chunk) -> float:
    ctx = mp.get_context("spawn")
    with ctx.Pool(n_procs, initializer=_init,
                  initargs=(tier, per_worker)) as pool:
        pool.map(_run, [chunk] * n_procs)  # warmup: imports + first pass
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            pool.map(_run, [chunk] * n_procs)
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
    return best


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "bench"
    args = sys.argv[2:]
    levels = [1, 8, 32]
    chunks: list = []
    it = iter(args)
    for a in it:
        if a.startswith("--levels"):
            # accept both --levels=1,8,32 and --levels 1,8,32
            spec = a.split("=", 1)[1] if "=" in a else next(it, "")
            levels = [int(x) for x in spec.split(",") if x]
        else:
            chunks.append(a)
    chunks = chunks or ["adaptive"]
    per_worker = 5_000  # EVERY worker decodes this many (weak scaling:
    # per-core work constant, like a cluster holding per-task size fixed)
    out = {"tier": tier, "per_worker_images": per_worker, "levels": {}}
    for chunk in chunks:
        for n in levels:
            wall = run_level(tier, per_worker, n, chunk)
            ips = per_worker * n / wall
            out["levels"][f"chunk={chunk},p={n}"] = {
                "wall_sec": round(wall, 3), "images_per_sec": round(ips, 1)}
            print(f"chunk={chunk:>9} p={n:>2}: {wall:7.3f} s  "
                  f"{ips:9.1f} img/s", flush=True)
    for chunk in chunks:
        k1, k8, k32 = (f"chunk={chunk},p={n}" for n in (1, 8, 32))
        lv = out["levels"]
        if k8 in lv and k32 in lv:
            eff = (lv[k32]["images_per_sec"] / lv[k8]["images_per_sec"]) / 4
            print(f"chunk={chunk}: 8->32 raw efficiency {eff:.3f}")
            out["levels"][f"chunk={chunk},eff_8_32"] = round(eff, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
