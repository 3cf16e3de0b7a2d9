"""Sparse-vector index selection / densification (SURVEY.md §2.5 vector
rows): DensifiedVector, TopVectorElementsByValue, TopVectorElementsByPMI /
ByMutualInformation. Sparse vectors are ``map<bigint,double>`` columns.

All fits are explode -> groupBy aggregates (map-side combinable) producing
dictionary-sized keep-sets / remaps that broadcast back into the apply.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _explode(df: DataFrame, vec_col: str, extra: list[str] = ()) -> DataFrame:
    return df.select(*extra, F.explode(F.col(vec_col)).alias("idx", "val"))


@dataclass
class DensifyModel:
    """Observed sparse indices -> contiguous [0, n) remap
    (common/.../vector/DensifiedVector.java:23-34; the reference uses a
    hash-remap with a tiny collision risk — ours is exact)."""
    vec_col: str
    remap: DataFrame  # idx -> new_idx
    size: int

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        out = out or f"{self.vec_col}_dense"
        rid, payload = "__dv_rid", "__dv_row"
        # Single linear plan (the mapped_iterable_apply shape, fit.py:97):
        # the source row rides through the explode packed in one struct and
        # regroups by a row id with exactly ONE consumer. The previous
        # join-back design evaluated the monotonically_increasing_id
        # assignment on two plan branches; over a non-deterministic-order
        # upstream (shuffle output, task retry) the branches can disagree
        # and a row would silently receive another row's densified vector.
        src = df.select(
            F.monotonically_increasing_id().alias(rid),
            F.struct(*df.columns).alias(payload),
            F.col(self.vec_col),
        )
        ex = src.select(
            rid, payload,
            F.explode_outer(F.col(self.vec_col)).alias("idx", "val"),
        )
        j = ex.join(F.broadcast(self.remap), "idx", "left")
        # unknown indices (not in the fitted remap) and the null
        # placeholder row of empty/null maps drop out of the entry list;
        # such rows regroup to an empty map — same semantics as before
        entries = F.collect_list(
            F.when(F.col("new_idx").isNotNull(),
                   F.struct(F.col("new_idx").alias("key"),
                            F.col("val").alias("value"))))
        packed = j.groupBy(rid).agg(
            F.first(payload).alias(payload),
            F.map_from_entries(F.sort_array(entries)).alias(out),
        )
        return packed.select(F.col(f"{payload}.*"), F.col(out))


def fit_densify(df: DataFrame, vec_col: str) -> DensifyModel:
    from dagli_spark.operators.twophase import global_row_number

    idx = _explode(df, vec_col).select("idx").distinct()
    # two-phase global rank: a web-scale observed-index set never
    # serializes through a single-partition sort (operators/twophase.py)
    remap = global_row_number(idx, [F.col("idx").asc()], "new_idx")
    return DensifyModel(vec_col, remap, remap.count())


def averaged_dense_vector(df: DataFrame, vec_col: str) -> list[float]:
    """Column-wise mean of a dense ``array`` column over all rows
    (AveragedDenseVector, common/.../vector/AveragedDenseVector.java:21).

    Shape: posexplode -> groupBy(pos).avg — map-side partial aggregation
    reduces each partition to `dim` partials before the shuffle, so the
    exchange carries partitions x dim doubles regardless of row count
    (the driver-side result is dim-sized, like every Dagli fitted state)."""
    ex = df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
    rows = (
        ex.groupBy("pos").agg(F.avg(F.col("v").cast("double")).alias("m"))
        .orderBy("pos").collect()
    )
    return [r["m"] for r in rows]


@dataclass
class KeepSetModel:
    """Filter a sparse vector to a fitted keep-set of indices
    (TopVectorElementsByValue.java:20 etc.: apply = LazyFilteredVector).

    Membership strategy scales with the keep-set (auto-picked from one
    dictionary-sized aggregate; override with ``strategy=``):

    - ``literal`` (K <= 256): in-lambda ``array_contains`` over a literal
      array — O(K) per map entry but join-free; cheapest at small K.
    - ``mask`` (dense indices): literal boolean mask + ``try_element_at``
      — O(1) per map entry; the literal ships once per task in the plan,
      never per row (a broadcast-joined mask COLUMN would be copied into
      every output row by the join). Picked when max_idx is within
      max(64K, 2^20), capped at 2^22: mask memory is O(max_idx+1), NOT
      O(K) — the floor admits up to a 2^20-slot literal for sparse keep
      sets, a deliberate constant bound (~1 MiB of booleans per task)
      traded for the join path's shuffle.
    - ``join`` (huge/sparse keep-sets): explode -> broadcast hash
      semi-mark -> regroup by row id (the DensifyModel single-linear-plan
      shape) — O(1) per entry, shuffle bounded by nnz, keep-set never
      collected to the driver. Kept-entry order is normalized to key
      order (map_filter preserves source order; no engine op compares
      maps structurally)."""
    vec_col: str
    keep: DataFrame  # idx

    _SMALL_K = 256
    _MASK_FLOOR = 1 << 20  # dense path allowed up to max(64K, 1M) slots
    # absolute mask ceiling: the boolean literal ships in the serialized
    # plan (once per task, never per row) — past a few million slots the
    # driver-side collect + plan size dominate and the join path (keep-set
    # never collected) is strictly better; also keeps bound within int32
    # for the try_element_at position cast
    _MASK_CAP = 1 << 22

    def apply(self, df: DataFrame, *, out: str | None = None,
              strategy: str | None = None) -> DataFrame:
        if strategy not in (None, "literal", "mask", "join"):
            raise ValueError(
                f"unknown keep-set strategy {strategy!r}: "
                "expected 'literal', 'mask' or 'join'")
        out = out or f"{self.vec_col}_top"
        if strategy in (None, "mask"):
            stats = self.keep.agg(
                F.count(F.lit(1)).alias("k"),
                F.min("idx").alias("mn"), F.max("idx").alias("mx")).first()
            k = int(stats["k"])
            mn = int(stats["mn"]) if stats["mn"] is not None else 0
            mx = int(stats["mx"]) if stats["mx"] is not None else -1
        if strategy is None:
            if k <= self._SMALL_K:
                strategy = "literal"
            elif (mn >= 0 and mx + 1 <= min(
                    self._MASK_CAP, max(64 * k, self._MASK_FLOOR))):
                strategy = "mask"
            else:
                strategy = "join"

        if strategy == "literal":
            keep_arr = F.array(*[F.lit(int(r["idx"]))
                                 for r in self.keep.collect()])
            return df.withColumn(
                out,
                F.map_filter(F.col(self.vec_col),
                             lambda kk, v: F.array_contains(keep_arr, kk)),
            )

        if strategy == "mask":
            bound = mx + 1
            if bound > (1 << 31) - 1:
                # the try_element_at position is cast to int; a wider bound
                # would silently wrap — an explicit 'mask' override at that
                # scale is a mistake, not a preference
                raise ValueError(
                    f"keep-set max index {mx} exceeds the mask strategy's "
                    "int32 position range; use strategy='join'")
            mask = [False] * bound
            for r in self.keep.collect():
                if 0 <= int(r["idx"]) < bound:
                    mask[int(r["idx"])] = True
            mask_lit = F.lit(mask)

            def member(kk, v):
                return F.coalesce(
                    F.when((kk >= 0) & (kk < F.lit(bound)),
                           F.try_element_at(mask_lit,
                                            (kk + 1).cast("int"))),
                    F.lit(False))

            return df.withColumn(
                out, F.map_filter(F.col(self.vec_col), member))

        # strategy == "join"
        rid, payload = "__ks_rid", "__ks_row"
        src = df.select(
            F.monotonically_increasing_id().alias(rid),
            F.struct(*df.columns).alias(payload),
            F.col(self.vec_col),
        )
        ex = src.select(
            rid, payload,
            F.explode_outer(F.col(self.vec_col)).alias("idx", "val"),
        )
        # distinct: map_from_entries raises DUPLICATED_MAP_KEY on a repeated
        # idx, while the literal/mask paths tolerate duplicate keep rows —
        # all three strategies must share duplicate semantics
        marked = self.keep.select("idx").distinct() \
            .select("idx", F.lit(True).alias("__keep"))
        j = ex.join(F.broadcast(marked), "idx", "left")
        entries = F.collect_list(
            F.when(F.col("__keep"),
                   F.struct(F.col("idx").alias("key"),
                            F.col("val").alias("value"))))
        packed = j.groupBy(rid).agg(
            F.first(payload).alias(payload),
            F.map_from_entries(F.sort_array(entries)).alias("__ks_out"),
        )
        # null-in -> null-out, like map_filter (regroup alone would
        # resurrect null maps as empty ones); out replaces any existing
        # column IN PLACE, matching withColumn's column order on the
        # literal/mask paths (new names still append last)
        out_expr = F.when(
            F.col(f"{payload}.{self.vec_col}").isNotNull(),
            F.col("__ks_out")).alias(out)
        cols = [out_expr if c == out else F.col(f"{payload}.{c}").alias(c)
                for c in df.columns]
        if out not in df.columns:
            cols.append(out_expr)
        return packed.select(*cols)


def fit_top_by_value(df: DataFrame, vec_col: str, k: int) -> KeepSetModel:
    """Top-K indices by summed value (TopVectorElementsByValue.java:20)."""
    agg = _explode(df, vec_col).groupBy("idx").agg(F.sum("val").alias("s"))
    keep = agg.orderBy(F.col("s").desc(), F.col("idx").asc()).limit(k).select("idx")
    return KeepSetModel(vec_col, keep)


def _cooccurrence(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """per-index: n_with_label, n_total; global n_rows, n_label."""
    ex = _explode(df, vec_col, [label_col]).where(F.col("val") != 0)
    return ex.groupBy("idx").agg(
        F.count(F.lit(1)).alias("n_x"),
        F.sum(F.col(label_col).cast("double")).alias("n_xy"),
    )


def fit_top_by_pmi(
    df: DataFrame, vec_col: str, label_col: str, k: int, *, smoothing: float = 1.0,
) -> KeepSetModel:
    """Top-K indices by pointwise mutual information with a binary label
    (TopVectorElementsByPMI.java:34): pmi = log(p(x,y) / (p(x) p(y)))."""
    tot = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(label_col).cast("double")).alias("ny")).first()
    n, ny = float(tot["n"]), float(tot["ny"])
    co = _cooccurrence(df, vec_col, label_col)
    pmi = co.withColumn(
        "pmi",
        F.log(((F.col("n_xy") + smoothing) / n)
              / (((F.col("n_x") + smoothing) / n) * (ny / n))),
    )
    keep = pmi.orderBy(F.col("pmi").desc(), F.col("idx").asc()).limit(k).select("idx")
    return KeepSetModel(vec_col, keep)


def fit_top_by_mi(
    df: DataFrame, vec_col: str, label_col: str, k: int, *, smoothing: float = 0.5,
) -> KeepSetModel:
    """Top-K indices by mutual information with a binary label
    (TopVectorElementsByMutualInformation.java:22-32): full 2x2 MI per idx."""
    tot = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(label_col).cast("double")).alias("ny")).first()
    n, ny = float(tot["n"]), float(tot["ny"])
    co = _cooccurrence(df, vec_col, label_col)

    def term(nxy, nx_, ny_):
        p_xy = (nxy + smoothing) / (n + 4 * smoothing)
        p_x = (nx_ + 2 * smoothing) / (n + 4 * smoothing)
        p_y = (ny_ + 2 * smoothing) / (n + 4 * smoothing)
        return p_xy * F.log(p_xy / (p_x * p_y))

    nx = F.col("n_x")
    nxy = F.col("n_xy")
    mi = co.withColumn(
        "mi",
        term(nxy, nx, F.lit(ny))
        + term(nx - nxy, nx, F.lit(n - ny))
        + term(F.lit(ny) - nxy, F.lit(n) - nx, F.lit(ny))
        + term(F.lit(n - ny) - (nx - nxy), F.lit(n) - nx, F.lit(n - ny)),
    )
    keep = mi.orderBy(F.col("mi").desc(), F.col("idx").asc()).limit(k).select("idx")
    return KeepSetModel(vec_col, keep)
