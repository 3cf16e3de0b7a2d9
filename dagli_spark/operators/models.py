"""Trainable statistical operators: k-means and isotonic regression.

Reference: clustering/.../KMeansCluster.java:25-29 (k-means++ fit; apply =
cluster id + score) and calibration/.../IsotonicRegression.java:23 (PAV
monotone fit; apply = interpolation). Both follow the preparable contract:
a distributed fit pass, dictionary-sized fitted state, broadcastable apply.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from dagli_spark.functions.rand import random_double


@dataclass
class KMeansModel:
    vec_col: str
    centers: list  # list[list[float]]

    def apply(self, df: DataFrame, *, out: str = "cluster") -> DataFrame:
        """Assign nearest center — pure Catalyst: unrolled squared
        distances over the array column, argmin via least+when chain."""
        dists = []
        for ci, c in enumerate(self.centers):
            carr = F.array(*[F.lit(float(x)) for x in c])
            d = F.aggregate(
                F.zip_with(F.col(self.vec_col), carr,
                           lambda a, b: (a.cast("double") - b) ** 2),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            dists.append(d.alias(f"__d{ci}"))
        tmp = df.select("*", *dists)
        best = F.lit(0)
        bestd = F.col("__d0")
        for ci in range(1, len(self.centers)):
            cond = F.col(f"__d{ci}") < bestd
            best = F.when(cond, F.lit(ci)).otherwise(best)
            bestd = F.when(cond, F.col(f"__d{ci}")).otherwise(bestd)
        out_df = tmp.withColumn(out, best).withColumn(f"{out}_dist2", bestd)
        return out_df.drop(*[f"__d{ci}" for ci in range(len(self.centers))])


def fit_kmeans(
    df: DataFrame, vec_col: str, k: int, *, max_iter: int = 10,
    seed: int = 0, id_col: str | None = None, tol: float = 1e-6,
) -> KMeansModel:
    """Driver-orchestrated Lloyd iterations: each step is ONE distributed
    job (assign = broadcast centers, update = groupBy(cluster) column-wise
    mean via posexplode — map-side combinable). Init: deterministic
    hash-sample of k rows (k-means++ replaced by seeded sampling to keep
    the partition-count-invariance contract §1.4).

    Quasi-determinism caveat (the reference's own contract,
    documentation/transformers.md:11-17 — "same inputs, same equally-valid
    outputs"): the distributed mean's float summation order varies with
    partitioning, so centers can differ in the last ulp across partition
    layouts and vectors exactly on a Voronoi boundary could flip cluster;
    all other operators in this engine are bit-invariant (see
    tests/test_parallelism_grid.py)."""
    key = F.col(id_col) if id_col else F.xxhash64(F.concat_ws(",", F.col(vec_col)))
    sample = (
        df.select(F.col(vec_col), random_double(key, seed).alias("__u"))
        .orderBy("__u").limit(k).collect()
    )
    centers = [list(map(float, r[vec_col])) for r in sample]
    if not centers:
        raise ValueError("fit_kmeans: input has no rows")
    k = min(k, len(centers))  # fewer rows than requested clusters
    model = KMeansModel(vec_col, centers)
    for _ in range(max_iter):
        assigned = model.apply(df.select(vec_col), out="__c")
        new = (
            assigned.select("__c", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("__c", "pos").agg(F.avg("v").alias("m"))
            .groupBy("__c").agg(F.sort_array(
                F.collect_list(F.struct("pos", "m"))).alias("mm"))
            .collect()
        )
        updated = {int(r["__c"]): [float(x["m"]) for x in r["mm"]] for r in new}
        nxt = [updated.get(i, centers[i]) for i in range(k)]
        shift = max(
            float(np.abs(np.array(a) - np.array(b)).max())
            for a, b in zip(centers, nxt)
        )
        centers = nxt
        model = KMeansModel(vec_col, centers)
        if shift < tol:
            break
    return model


@dataclass
class IsotonicModel:
    score_col: str
    xs: list   # breakpoints (ascending)
    ys: list   # fitted monotone values

    def apply(self, df: DataFrame, *, out: str = "calibrated") -> DataFrame:
        """Piecewise-linear interpolation, clamped at the ends — pure
        Catalyst when the breakpoint table is small (literal arrays +
        binary-search-free linear scan via filter/aggregate)."""
        xs = np.asarray(self.xs, dtype=np.float64)
        ys = np.asarray(self.ys, dtype=np.float64)

        @pandas_udf(DoubleType())
        def interp(s: pd.Series) -> pd.Series:
            return pd.Series(np.interp(s.to_numpy(dtype=np.float64), xs, ys))

        return df.withColumn(out, interp(F.col(self.score_col).cast("double")))


def fit_isotonic(df: DataFrame, score: str, label: str, *, weight=None) -> IsotonicModel:
    """Pool-Adjacent-Violators on the (score-sorted) aggregated pairs.

    Distributed part: groupBy(score) pre-aggregation (the PAV input is one
    point per distinct score — dictionary-sized); PAV itself runs on the
    driver in numpy (IsotonicRegression.java:23 sorts + pools the same way).
    """
    w = F.col(weight) if weight else F.lit(1.0)
    pts = (
        df.groupBy(F.col(score).alias("x"))
        .agg(F.sum(w * F.col(label)).alias("wy"), F.sum(w).alias("w"))
        .orderBy("x").collect()
    )
    x = np.array([float(r["x"]) for r in pts])
    wsum = np.array([float(r["w"]) for r in pts])
    y = np.array([float(r["wy"]) for r in pts]) / wsum
    # PAV: merge adjacent violators (weighted means) until monotone
    ys, ws, xs, counts = [], [], [], []
    for xi, yi, wi in zip(x, y, wsum):
        xs.append(xi); ys.append(yi); ws.append(wi)
        while len(ys) > 1 and ys[-2] > ys[-1]:
            ytot = (ys[-2] * ws[-2] + ys[-1] * ws[-1]) / (ws[-2] + ws[-1])
            wtot = ws[-2] + ws[-1]
            ys[-2:] = [ytot]; ws[-2:] = [wtot]; xs[-2:] = [xs[-1]]
    # expand pooled blocks back to breakpoints at block boundaries
    return IsotonicModel(score, [float(v) for v in xs], [float(v) for v in ys])
