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


def _sq_dists(X: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """n x k squared L2 distances, chunked so the (chunk, k, dim) diff
    tensor stays ~32 MB regardless of centroid count. Explicit-diff form
    (not |x|^2 - 2xC + |c|^2) for numerical faithfulness to the unrolled
    per-element subtraction the round-1 Catalyst path computed."""
    n, k, d = X.shape[0], C.shape[0], C.shape[1]
    out = np.empty((n, k), dtype=np.float64)
    step = max(1, (1 << 22) // max(1, k * d))
    for i in range(0, n, step):
        diff = X[i:i + step, None, :] - C[None, :, :]
        out[i:i + step] = np.einsum("nkd,nkd->nk", diff, diff)
    return out


def _stack_vectors(v: "pd.Series", dim: int):
    """(mask, X): boolean keep-mask for non-null length-``dim`` vectors and
    their float64 stack (empty (0, dim) when none survive). Null / ragged
    rows are masked out instead of crashing np.stack."""
    vals = v.to_numpy()
    mask = np.array([x is not None and len(x) == dim for x in vals],
                    dtype=bool)
    if not mask.any():
        return mask, np.empty((0, dim), dtype=np.float64)
    return mask, np.stack(vals[mask]).astype(np.float64)


@dataclass
class KMeansModel:
    vec_col: str
    centers: list  # list[list[float]]

    def matrix_broadcast(self, spark):
        """The centroid matrix broadcast, created once per model per
        SparkContext and shared by apply() and IVF probe routing (a 2^16 x
        64 float64 matrix is ~32 MB of executor memory — don't ship two)."""
        cache = getattr(self, "_bc", None)
        sc = spark.sparkContext
        if cache is None or cache[0] is not sc:
            bc = sc.broadcast(np.asarray(self.centers, dtype=np.float64))
            self._bc = cache = (sc, bc)
        return cache[1]

    def apply(self, df: DataFrame, *, out: str = "cluster") -> DataFrame:
        """Assign nearest center (ties -> lower index) via ONE Arrow-batched
        pandas UDF over a broadcast centroid matrix. The round-1 design
        inlined every centroid as a literal Catalyst expression + a
        per-center when-chain — plan size O(k*dim), which chokes Catalyst
        at real IVF scale (k >= 2^14); the broadcast-matrix UDF keeps the
        plan O(1) and the numpy distance kernel is vectorized across the
        batch. Null / wrong-dimension vectors get null cluster + distance
        (one-result-per-row contract, never a stage failure)."""
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                       StructType)

        dim = len(self.centers[0])
        bc = self.matrix_broadcast(df.sparkSession)
        schema = StructType([StructField("c", IntegerType()),
                             StructField("d", DoubleType())])

        @pandas_udf(schema)
        def _assign(v: pd.Series) -> pd.DataFrame:
            cm = bc.value
            mask, X = _stack_vectors(v, dim)
            c = np.full(len(v), None, dtype=object)
            d = np.full(len(v), None, dtype=object)
            if len(X):
                D = _sq_dists(X, cm)
                best = np.argmin(D, axis=1)  # first index wins ties
                c[mask] = best.astype("int32")
                d[mask] = D[np.arange(len(best)), best]
            return pd.DataFrame({"c": pd.Series(c), "d": pd.Series(d)})

        tmp = df.withColumn("__km", _assign(F.col(self.vec_col)))
        return (tmp.withColumn(out, F.col("__km.c"))
                .withColumn(f"{out}_dist2", F.col("__km.d"))
                .drop("__km"))


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


def fit_isotonic(df: DataFrame, score: str, label: str, *, weight=None,
                 max_bins: int = 65536) -> IsotonicModel:
    """Pool-Adjacent-Violators on the (score-sorted) aggregated pairs.

    Distributed part: groupBy(score) pre-aggregation (the PAV input is one
    point per distinct score — dictionary-sized for discrete scores); PAV
    itself runs on the driver in numpy (IsotonicRegression.java:23 sorts +
    pools the same way).

    Continuous-score guard: if the approximate distinct count exceeds
    ~``max_bins`` the scores are first quantized into <= max_bins
    fixed-width bins (breakpoint = the bin's weighted-mean score). Without
    this a continuous score column would collect one driver row per
    distinct value — the whole table at 100x. PAV on the quantized points
    is the standard large-scale isotonic approximation (and exact when
    every bin holds one distinct score)."""
    from dagli_spark.operators.fit import continuous_bin_expr

    w = F.col(weight) if weight else F.lit(1.0)
    b = continuous_bin_expr(df, score, max_bins)
    if b is not None:
        pts = (
            df.groupBy(b.alias("bin"))
            .agg((F.sum(w * F.col(score)) / F.sum(w)).alias("x"),
                 F.sum(w * F.col(label)).alias("wy"), F.sum(w).alias("w"))
            .orderBy("bin").select("x", "wy", "w").collect()
        )
    else:
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
