"""Dagli-style *preparable* transformers: fit pass -> fitted state -> apply.

In the reference a PreparableTransformer's Preparer consumes all rows and
emits a PreparedTransformer
(/root/reference/core/src/main/java/com/linkedin/dagli/transformer/PreparableTransformer.java:31,
documentation/dag.md:83). On Spark the fit pass is an aggregation job whose
(small) fitted state is either broadcast back into the plan as a join/map or
collected into literals — the exact analogue of Dagli's TransformerView
fanning fitted state out as a constant input
(core/.../view/TransformerView.java:22).

Every fitted model here is a plain picklable object with
``state_table(spark)`` (its state as a DataFrame, for checkpointing) and
``apply(df)`` (attach the derived column, broadcast-joining the state).
Scale stance: fit = one shuffle on the value column (map-side partial
aggregation via groupBy), state is dictionary-sized, apply = broadcast hash
join — no second shuffle of the fact table.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- Index

@dataclass
class IndexModel:
    """Fitted dictionary: value -> dense id, ids ordered by
    (count desc, value asc) — deterministic (reference quasi-determinism,
    documentation/transformers.md:11-17).

    Reference: Index / AbstractIndex / UnknownItemPolicy
    (common/.../object/Index.java:9-23, AbstractIndex.java, UnknownItemPolicy.java:52).
    """
    col: str
    mapping: DataFrame  # columns: value, id
    unknown_id: int

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        out = out or f"{self.col}_index"
        m = F.broadcast(self.mapping.withColumnRenamed("value", self.col)
                        .withColumnRenamed("id", out))
        joined = df.join(m, on=self.col, how="left")
        return joined.withColumn(out, F.coalesce(F.col(out), F.lit(self.unknown_id)))


def fit_index(
    df: DataFrame, col: str, *, min_freq: int = 1, max_unique: int | None = None,
    unknown_policy: str = "new", unknown_id: int | None = None,
) -> IndexModel:
    """unknown_policy (UnknownItemPolicy.java:52): 'new' -> unseen (and
    over-cap) values get a fresh id == n_kept; 'most_frequent' -> id 0;
    'least_frequent' -> last kept id; or pass an explicit unknown_id."""
    from dagli_spark.operators.twophase import global_row_number

    counts = df.groupBy(F.col(col).alias("value")).count()
    if min_freq > 1:
        counts = counts.where(F.col("count") >= min_freq)
    # two-phase global rank: no single-partition exchange even for a
    # web-scale vocabulary (see operators/twophase.py)
    ranked = global_row_number(
        counts, [F.col("count").desc(), F.col("value").asc()], "id")
    if max_unique is not None:
        ranked = ranked.where(F.col("id") < max_unique)
    if unknown_id is None:
        n_kept = ranked.count()
        unknown_id = {
            "new": n_kept,
            "most_frequent": 0,
            "least_frequent": max(0, n_kept - 1),
        }[unknown_policy]
    return IndexModel(col, ranked.select("value", "id"), unknown_id)


def mapped_iterable_apply(
    df: DataFrame, arr_col: str, apply_fn, *, out: str | None = None,
    element_col: str = "__elem", id_out: str = "__elem_out",
) -> DataFrame:
    """Lift a row-level transformation over a per-row array column —
    MappedIterable with a TRAINABLE inner op (core/.../transformer/
    MappedIterable.java:22-36; the prepared-inner case is just
    ``F.transform``, see dagli_spark.functions.core.mapped_iterable).

    Shape: posexplode -> ``apply_fn(exploded_df)`` must attach ``id_out``
    per element (typically a broadcast-dictionary join) -> regroup ordered
    by position. Row alignment is preserved for every row including empty /
    null arrays (Dagli's one-result-per-example contract,
    documentation/dag.md:12-13)."""
    out = out or f"{arr_col}_mapped"
    rid, payload = "__mi_rid", "__mi_row"
    # Single linear plan: the source row rides through the explode packed in
    # one struct and is regrouped by a row id that has exactly ONE consumer.
    # (A join-back design would evaluate the id-assignment twice; if the
    # upstream's row order is not deterministic — shuffle output, task retry
    # — the two evaluations disagree and rows silently receive another
    # row's array.)
    src = df.select(
        F.monotonically_increasing_id().alias(rid),
        F.struct(*df.columns).alias(payload),
        F.col(arr_col),
    )
    ex = src.select(
        rid, payload,
        F.posexplode_outer(F.col(arr_col)).alias("__pos", element_col),
    )
    applied = apply_fn(ex)
    # null-position placeholder rows (empty/null arrays) regroup to []
    mapped = F.array_sort(F.collect_list(F.struct(
        F.col("__pos").alias("pos"), F.col(id_out).alias("v"))))
    packed = applied.groupBy(rid).agg(
        F.first(payload).alias(payload),
        F.transform(
            F.filter(mapped, lambda s: s["pos"].isNotNull()),
            lambda s: s["v"],
        ).alias(out),
    )
    return packed.select(F.col(f"{payload}.*"), F.col(out))


@dataclass
class IndicesModel:
    """Indices (common/.../object/Indices.java:12-29): the Index dictionary
    fitted over every ELEMENT of an array column; apply maps each row's
    array to an id array (order preserved, unknowns -> unknown_id)."""
    col: str
    mapping: DataFrame  # value, id
    unknown_id: int

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        out = out or f"{self.col}_indices"

        def per_element(ex: DataFrame) -> DataFrame:
            m = F.broadcast(self.mapping.withColumnRenamed("value", "__elem")
                            .withColumnRenamed("id", "__elem_out"))
            j = ex.join(m, on="__elem", how="left")
            return j.withColumn(
                "__elem_out",
                F.when(F.col("__elem").isNotNull(),
                       F.coalesce(F.col("__elem_out"),
                                  F.lit(self.unknown_id))),
            )

        return mapped_iterable_apply(df, self.col, per_element, out=out)


def fit_indices(
    df: DataFrame, arr_col: str, *, min_freq: int = 1,
    max_unique: int | None = None, unknown_policy: str = "new",
    unknown_id: int | None = None,
) -> IndicesModel:
    """Fit the Index dictionary over exploded array elements (element counts
    aggregate map-side; the dictionary is broadcast back in apply)."""
    elems = df.select(F.explode(F.col(arr_col)).alias(arr_col)) \
        .where(F.col(arr_col).isNotNull())  # null elements stay null in apply
    inner = fit_index(elems, arr_col, min_freq=min_freq,
                      max_unique=max_unique, unknown_policy=unknown_policy,
                      unknown_id=unknown_id)
    return IndicesModel(arr_col, inner.mapping, inner.unknown_id)


# ---------------------------------------------------------------- Multiplicity / Multiset

def multiplicity(df: DataFrame, col: str, *, out: str | None = None) -> DataFrame:
    """Per-row count of this row's value across the dataset
    (common/.../object/Multiplicity.java:15-38). groupBy + broadcast join —
    one shuffle of the (small) distinct values, not of the fact table."""
    out = out or f"{col}_multiplicity"
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias(out))
    return df.join(F.broadcast(counts), on=col, how="left")


@dataclass
class MultiplicityModel:
    """Fitted value->count; unseen values map to 0
    (MultiplicityTest.java: prepared.apply("d") == 0)."""
    col: str
    counts: DataFrame

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        out = out or f"{self.col}_multiplicity"
        m = F.broadcast(self.counts.withColumnRenamed("value", self.col)
                        .withColumnRenamed("count", out))
        j = df.join(m, on=self.col, how="left")
        return j.withColumn(out, F.coalesce(F.col(out), F.lit(0)))


def fit_multiplicity(df: DataFrame, col: str) -> MultiplicityModel:
    counts = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("count"))
    return MultiplicityModel(col, counts)


def multiset(df: DataFrame, col: str) -> DataFrame:
    """Global value -> count map (common/.../map/Multiset.java:14-24)."""
    return df.groupBy(F.col(col).alias("value")).agg(F.count(F.lit(1)).alias("count"))


@dataclass
class NormalizedModel:
    """The reference's canonical example preparable
    (examples/assorted/.../NormalizedDouble.java): scale/shift to [0, 1]
    against the fitted min/max; out-of-range clips; min == max -> 0.0;
    fitted on zero rows -> (min, max) = (0, 1); infinite fitted bounds
    propagate NaN through float arithmetic — all per the reference's own
    Tester cases (NormalizedDoubleTest.java)."""
    col: str
    mn: float
    mx: float

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        out = out or f"{self.col}_norm"
        if self.mn == self.mx:
            return df.withColumn(out, F.lit(0.0))
        scaled = (F.col(self.col) - F.lit(self.mn)) / F.lit(self.mx - self.mn)
        # Java's Math.min/max propagate NaN; Spark's least/greatest treat
        # NaN as the largest double (least(1.0, NaN) = 1.0) — guard it
        clipped = F.when(F.isnan(scaled), scaled).otherwise(
            F.least(F.lit(1.0), F.greatest(F.lit(0.0), scaled)))
        return df.withColumn(out, clipped)


def fit_normalized(df: DataFrame, col: str) -> NormalizedModel:
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
    if row["mn"] is None:  # no examples: reference defaults (0, 1)
        return NormalizedModel(col, 0.0, 1.0)
    return NormalizedModel(col, float(row["mn"]), float(row["mx"]))


# ---------------------------------------------------------------- Min/Max & order statistics

def fit_min_max(df: DataFrame, col: str) -> tuple:
    """Global min/max (common/.../object/Max.java:7-16, Min.java:16)."""
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
    return row["mn"], row["mx"]


def order_statistic(df: DataFrame, col: str, quantiles: list[float], *,
                    approx: bool = False, accuracy: int = 10000) -> list[float]:
    """Global quantiles (common/.../object/OrderStatistic.java:25-33).
    Exact by default (Spark's sort-based `percentile`); ``approx=True``
    switches to the KLL-sketch `percentile_approx` — the scale path when
    the column has billions of distinct values (mergeable sketch, single
    pass, no global sort)."""
    arr = f"array({','.join(str(q) for q in quantiles)})"
    expr = (f"percentile_approx({col}, {arr}, {accuracy})" if approx
            else f"percentile({col}, {arr})")
    row = df.agg(F.expr(expr).alias("qs")).first()
    return list(row["qs"])


# ---------------------------------------------------------------- Rank

@dataclass
class RankModel:
    """Rank of a probe value among the fitted population
    (common/.../object/Rank.java:17-28): number of fitted *instances*
    strictly smaller. State = sorted (value, cnt) boundaries — top-K-capped
    when ``limit`` is set, exactly like the reference's limited list
    (Rank.java:21-22 keeps only the ranks it can distinguish); apply =
    one broadcast of the boundary arrays + ``np.searchsorted`` in an
    Arrow-batched pandas UDF. No per-probe join, no nested-loop fallback:
    cost is O(|probes| log |boundaries|) regardless of how many probes
    miss an exact match (the round-1 fallback was O(misses x boundaries))."""
    col: str
    cumulative: DataFrame  # value, below (= #instances strictly below), cnt
    limit: int | None = None

    def _arrays(self):
        """Sorted boundary arrays, collected ONCE per model (apply may be
        called on many frames — re-collecting per call would re-run the
        fit's sort job every time). Dtype-preserving: integer populations
        stay int64 (exact beyond 2^53), strings stay objects (numpy object
        searchsorted uses Python comparisons == Spark's UTF-8 order),
        floats go float64."""
        cached = getattr(self, "_state", None)
        if cached is None:
            state = (self.cumulative.select("value", "cnt")
                     .orderBy("value").collect())
            raw = [r["value"] for r in state]
            if all(isinstance(v, int) for v in raw):
                values = np.array(raw, dtype=np.int64)
            elif any(isinstance(v, str) for v in raw):
                values = np.array(raw, dtype=object)
            else:
                values = np.array([float(v) for v in raw], dtype=np.float64)
            prefix = np.concatenate(
                [[0], np.cumsum([int(r["cnt"]) for r in state])]
            ).astype(np.int64)
            cached = (values, prefix)
            self._state = cached
        return cached

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import IntegralType, LongType

        out = out or f"{self.col}_rank"
        values, prefix = self._arrays()
        limit = self.limit
        bc = df.sparkSession.sparkContext.broadcast((values, prefix))

        @pandas_udf(LongType())
        def _rank(s: pd.Series) -> pd.Series:
            v, p = bc.value
            null_mask = s.isna().to_numpy()
            if v.dtype == object:
                x = s.fillna("").to_numpy(dtype=object)
            elif v.dtype == np.int64 and s.dtype.kind in "iu":
                x = s.fillna(0).to_numpy(dtype=np.int64)
            else:
                # float probes against an int population (or any float
                # side) compare in float64 — numpy promotes v the same way
                x = s.astype("float64").fillna(0.0).to_numpy()
            r = p[np.searchsorted(v, x, side="left")]
            r[null_mask] = 0  # legacy null-probe rank
            if limit is not None:
                r = np.minimum(r, limit)
            return pd.Series(r)

        # integral probes ride in null-free (coalesce in, when() out):
        # Arrow hands an int64 batch containing a null to pandas as
        # float64, which would round probes beyond 2^53 and shunt the UDF
        # onto its float comparison path for the whole batch
        if isinstance(df.schema[self.col].dataType, IntegralType):
            ranked = _rank(F.coalesce(F.col(self.col), F.lit(0)))
            ranked = F.when(F.col(self.col).isNull(), F.lit(0)) \
                .otherwise(ranked)
        else:
            ranked = _rank(F.col(self.col))
        return df.withColumn(out, ranked)


def fit_rank(df: DataFrame, col: str, *, limit: int | None = None,
             ignore_duplicates: bool = False,
             max_state: int = 100_000) -> RankModel:
    """Reference golden semantics (RankTest.java): rank(probe) = number of
    fitted *instances* strictly below probe ([2,1,3,1] -> [2,0,3,0]);
    ignore_duplicates counts distinct values instead ([2,1,1,1,1,3,1,4]:
    probe 3 -> 2); limit caps the rank (withLimit(3): probe 4 -> 3) AND
    caps the fitted state: boundaries whose below >= limit can never
    change a capped rank, so they are dropped (Rank.java:21-22's limited
    list) — fitted size is min(|distinct|, limit) with a limit set.

    Null fit instances are EXCLUDED from the population: a null value has
    no place in the strict order, so it neither gets a boundary nor counts
    toward any probe's "instances strictly below" (the reference's Rank
    never sees nulls — Dagli inputs are non-null by contract; keeping them
    would also poison the collected boundary arrays in ``_arrays``).

    Continuous-state guard (``max_state``, unlimited fits only): when the
    approximate distinct count exceeds ~max_state, values are first
    quantized into <= max_state fixed-width bins (boundary = the bin's max
    actual value, cnt = instances in the bin) — a documented rank
    APPROXIMATION, error bounded by one bin's population, mirroring the
    ``continuous_bin_expr`` guard the bucket/isotonic fits use. Without it
    an unlimited fit over a continuous column collects one driver row per
    distinct value — an OOM at 100x. Exact fits (discrete columns, or any
    fit with ``limit`` set, whose state is already capped at ``limit``
    rows) are unaffected."""
    from dagli_spark.operators.twophase import global_running_sum

    src = df.where(F.col(col).isNotNull())
    binned = continuous_bin_expr(src, col, max_state) if limit is None else None
    if binned is not None:
        agg = (F.countDistinct(col) if ignore_duplicates
               else F.count(F.lit(1)))
        counts = (src.groupBy(binned.alias("__bin"))
                  .agg(F.max(col).alias("value"), agg.alias("cnt"))
                  .drop("__bin"))
    else:
        counts = src.groupBy(F.col(col).alias("value")).agg(
            F.count(F.lit(1)).alias("cnt"))
        if ignore_duplicates:
            counts = counts.withColumn("cnt", F.lit(1))
    cum = global_running_sum(counts, [F.col("value").asc()], "cnt", "below")
    if limit is not None:
        # state cap: every kept row has below < limit (its uncapped value),
        # every dropped row's rank saturates to `limit` via the prefix total
        cum = cum.where(F.col("below") < F.lit(limit))
    return RankModel(col, cum.select("value", "below", "cnt"), limit=limit)


def continuous_bin_expr(df: DataFrame, col: str, max_bins: int):
    """Shared continuous-input guard for driver-side fits (BucketIndex DP,
    isotonic PAV): when the approximate distinct count exceeds ``max_bins``
    (within approx_count_distinct's ~5% error), return a fixed-width bin
    Column quantizing ``col`` into <= max_bins bins (clamped at the top
    edge); return None for the exact path. Bounding the histogram here is
    what keeps the subsequent driver collect dictionary-sized on continuous
    columns at 100x scale. Non-numeric columns (strings, categorical keys)
    always take the exact path: they cannot be range-quantized, and the
    double cast in the stats probe would throw under ANSI sessions — their
    cardinality is the caller's contract, as it was before this guard."""
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[col].dataType, NumericType):
        return None
    stats = df.agg(
        F.approx_count_distinct(col).alias("nd"),
        F.min(F.col(col).cast("double")).alias("mn"),
        F.max(F.col(col).cast("double")).alias("mx"),
    ).first()
    nd, mn, mx = stats["nd"], stats["mn"], stats["mx"]
    if not (nd is not None and mn is not None
            and nd > max_bins and mx > mn):
        return None
    width = (mx - mn) / max_bins
    return F.least(
        F.floor((F.col(col).cast("double") - F.lit(mn)) / F.lit(width)),
        F.lit(max_bins - 1),
    )


# ---------------------------------------------------------------- BucketIndex (equi-depth DP)

@dataclass
class BucketModel:
    """Equi-depth bucket boundaries; out-of-range probes clamp to the
    first/last bucket (common/.../object/BucketIndex.java:28-40)."""
    col: str
    boundaries: list  # ascending upper-inclusive bounds of buckets 0..k-2

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        out = out or f"{self.col}_bucket"
        if len(self.boundaries) <= 64:
            # small k: a codegen'd when-chain stays JVM-side (no Python
            # round trip) and compiles instantly
            expr = F.lit(len(self.boundaries))  # default: last bucket
            for i in range(len(self.boundaries) - 1, -1, -1):
                expr = F.when(F.col(self.col) <= F.lit(self.boundaries[i]),
                              F.lit(i)).otherwise(expr)
            return df.withColumn(out, expr)
        # large k: the when-chain's plan/codegen size grows O(k) — switch to
        # the broadcast-boundaries + np.searchsorted Arrow UDF shape used by
        # RankModel.apply (plan stays O(1) in k). Same semantics: smallest i
        # with probe <= boundaries[i], clamped to the last bucket; null
        # probes fall through every when() above, i.e. last bucket.
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import IntegerType, IntegralType

        # integral columns stay in int64 end to end: a float64 detour
        # rounds probes/boundaries above 2^53 and can flip a bucket vs the
        # small-k when-chain's exact native comparison. Nulls are handled
        # JVM-side (coalesce in, when() out) because Arrow hands an int64
        # batch CONTAINING A NULL to pandas as float64 — which would round
        # the surviving probes before the UDF ever saw them.
        integral = (isinstance(df.schema[self.col].dataType, IntegralType)
                    and all(float(b).is_integer() for b in self.boundaries))
        dt = np.int64 if integral else np.float64
        bounds = np.asarray(self.boundaries, dtype=dt)
        bc = df.sparkSession.sparkContext.broadcast(bounds)
        k_last = len(self.boundaries)

        @pandas_udf(IntegerType())
        def _bucket(s: pd.Series) -> pd.Series:
            b = bc.value
            x = s.to_numpy(dtype=b.dtype)
            return pd.Series(np.searchsorted(b, x, side="left")
                             .astype(np.int32))

        probe = F.col(self.col) if integral else F.col(self.col).cast("double")
        return df.withColumn(out, F.when(
            F.col(self.col).isNull(), F.lit(k_last)
        ).otherwise(_bucket(F.coalesce(probe, F.lit(0)))))


def fit_bucket_index(df: DataFrame, col: str, k: int, *,
                     max_bins: int = 4096) -> BucketModel:
    """Dagli's BucketIndex fit: choose bucket boundaries over the DISTINCT
    value histogram minimizing the squared deviation from equal fill
    (BucketIndex.java:28-40 does this with DP). The distinct-value histogram
    is dictionary-sized for discrete inputs, so the DP runs on the driver in
    numpy — the scan itself is one distributed groupBy.

    Continuous-input guard: if the approximate distinct count exceeds
    ~``max_bins`` the values are first quantized into <= max_bins
    fixed-width bins (bin representative = the bin's max actual value, so
    boundaries remain real data values and the upper-inclusive clamp
    semantics are unchanged). Without this a continuous column would
    collect one driver row per distinct value — an OOM at 100x — and the
    O(k n^2) DP would be intractable anyway."""
    b = continuous_bin_expr(df, col, max_bins)
    if b is not None:
        hist = (
            df.groupBy(b.alias("bin"))
            .agg(F.max(col).alias("v"), F.count(F.lit(1)).alias("count"))
            .orderBy("bin").select("v", "count").collect()
        )
    else:
        hist = (
            df.groupBy(F.col(col).alias("v")).count().orderBy("v").collect()
        )
    vals = [r["v"] for r in hist]
    cnts = np.array([r["count"] for r in hist], dtype=np.float64)
    n = len(vals)
    if n <= k:
        return BucketModel(col, vals[:-1] if n > 1 else [])
    total = cnts.sum()
    target = total / k
    prefix = np.concatenate([[0.0], np.cumsum(cnts)])
    # DP over (distinct values, buckets): cost = (fill - target)^2
    INF = float("inf")
    dp = np.full((n + 1, k + 1), INF)
    back = np.zeros((n + 1, k + 1), dtype=np.int64)
    dp[0, 0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, n + 1):
            fills = prefix[i] - prefix[j - 1:i]
            costs = dp[j - 1:i, j - 1] + (fills - target) ** 2
            b = int(np.argmin(costs))
            dp[i, j] = costs[b]
            back[i, j] = j - 1 + b
    bounds = []
    i = n
    for j in range(k, 1, -1):
        i = int(back[i, j])
        bounds.append(vals[i - 1])
    return BucketModel(col, sorted(bounds))


# ---------------------------------------------------------------- KFold / group routing

def kfold_column(df: DataFrame, group_col: str, k: int, *, seed: int = 0,
                 out: str = "fold", method: str = "xxhash64") -> DataFrame:
    """Assign each row's group to one of k folds by hashing the group value —
    the reference's leakage-safe split (KFoldCrossTrained hashes the group,
    common/.../meta/KFoldCrossTrained.java:44-49,63). No group ever crosses
    folds. ``method='lcg'`` uses a Knuth multiplicative hash expressible in
    portable SQL (used by the DuckDB oracle); 'xxhash64' is the engine
    default."""
    if method == "xxhash64":
        h = F.xxhash64(F.col(group_col), F.lit(seed))
    elif method == "lcg":
        dt = dict(df.dtypes).get(group_col, "")
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"method='lcg' requires an integer group column, got "
                f"{group_col}: {dt} — use method='xxhash64' (strings hash "
                "natively; a silent cast would null the fold and drop rows "
                "from every cross-trained split)")
        h = (F.col(group_col).cast("long") * F.lit(2654435761)) % F.lit(2**32)
    else:
        raise ValueError(method)
    # null group keys: xxhash64 hashes the null marker deterministically;
    # pin fold 0 for both methods so no row ever carries a null fold
    # (a null fold would silently vanish from BOTH sides of a
    # fold==i / fold!=i cross-training split)
    return df.withColumn(
        out, F.coalesce(F.pmod(h, F.lit(k)).cast("int"), F.lit(0)))


# ---------------------------------------------------------------- NullFiltered

def null_filtered_fit(df: DataFrame, input_cols: list[str], fit_fn):
    """Fit a wrapped preparable only on rows where no input is null
    (common/.../meta/NullFiltered.java:26-52); the caller's apply should
    null-out results for rows with null inputs (Dagli still emits one result
    per row — documentation/dag.md:12-13)."""
    clean = df.na.drop(subset=input_cols)
    return fit_fn(clean)
