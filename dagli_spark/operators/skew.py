"""Explicit skew handling: salted two-level aggregation and hot-key
detection. AQE splits skewed JOINs automatically but NOT skewed
groupBy/window keys (SURVEY.md §4.3) — for those, salting is the engine's
job. The as-of join's hot-entity path is
dagli_spark.operators.asof.asof_join(time_buckets=...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, Column], *,
    salt_buckets: int = 16, salt_on: Column | None = None,
) -> DataFrame:
    """Two-level aggregation for skewed group keys.

    Level 1 groups by (keys..., salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; level 2 merges the per-salt partials. Only
    algebraic aggregates are supported (sum/count/min/max — anything with
    a merge that equals re-applying the same aggregate).

    The salt is a deterministic hash of a row-distinguishing column
    (default: every column), keeping the §1.4 partition-invariance
    contract — never F.rand().
    """
    salt_src = salt_on if salt_on is not None else F.xxhash64(*df.columns)
    salted = df.withColumn("__salt", F.pmod(salt_src, F.lit(salt_buckets)))

    partial = salted.groupBy(*keys, "__salt").agg(
        *[a.alias(f"__p_{name}") for name, a in aggs.items()]
    )
    merged = {}
    for name, a in aggs.items():
        expr = a._jc.toString().lower() if hasattr(a, "_jc") else ""
        fn = expr.split("(")[0]
        col = F.col(f"__p_{name}")
        if "distinct" in expr:
            raise ValueError(
                f"{name}: distinct aggregates are not salt-mergeable (a "
                "value in two salt buckets would be counted twice); "
                "dedupe first, then count")
        if fn.startswith(("count", "sum")):
            merged[name] = F.sum(col)
        elif fn.startswith("min"):
            merged[name] = F.min(col)
        elif fn.startswith("max"):
            merged[name] = F.max(col)
        elif fn.startswith(("avg", "mean")):
            raise ValueError(
                "avg is not directly mergeable: aggregate sum and count "
                "separately and divide after salted_agg"
            )
        else:
            # refusing beats silently merging a non-algebraic aggregate
            # (stddev, collect_list, ...) with sum — and covers Connect
            # sessions where the expression string is unavailable
            raise ValueError(
                f"{name}: cannot verify '{fn or a}' is algebraic/"
                "salt-mergeable; supported: count/sum/min/max")
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, m in merged.items()]
    )


def hot_keys(df: DataFrame, keys: list[str], *, top: int = 10,
             min_share: float = 0.01) -> DataFrame:
    """Diagnostic: keys owning more than ``min_share`` of all rows —
    candidates for salting / time-bucketed as-of."""
    total = df.count()
    return (
        df.groupBy(*keys).count()
        .withColumn("share", F.col("count") / F.lit(float(total)))
        .where(F.col("share") >= min_share)
        .orderBy(F.col("count").desc())
        .limit(top)
    )


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Round-robin-widen a byte-small scan that feeds a CPU-heavy map pass.

    Spark sizes file-scan splits by BYTES (spark.sql.files.maxPartitionBytes),
    so a few-MB compacted file becomes ONE split; a per-row kernel costing
    ~1 ms/row then serializes minutes of CPU while every other core idles.
    Opt-in, NOT wired into the built-in text/dedup operators: A/B on the
    sf0.1 documents corpus (1 split, 5k docs, 32 cores) showed the built-in
    Catalyst kernels are too cheap to amortize the extra full-text shuffle —
    exact_dedup regressed 1.5->2.4 s and minhash/simhash were flat once the
    word_ngrams let-binding fix (functions/text.py bound_once) removed the
    real hotspot. Use it for genuinely expensive user kernels (Python/Arrow
    featurizers, media decode) over narrow scans, where per-row cost
    dominates the one-time shuffle of the input bytes. A no-op when the
    plan is already at least as wide as the cluster — the 100-TB case,
    where a corpus scan has ~10^5 splits and the shuffle would be pure loss.

    Output is row-identical (operators downstream are partition-invariant
    by the determinism contract — tests/test_parallelism_grid.py).
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
