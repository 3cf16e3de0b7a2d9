"""Vector algebra over ArrayType columns — the reference's math-vector
lazy-algebra family re-expressed as Catalyst higher-order functions (the
laziness of LazySumVector et al. corresponds exactly to Catalyst expression
fusion; SURVEY.md §2.10).

Dense vectors = array<float|double>; sparse vectors = map<bigint,double>
(the reference's logically-infinite long-indexed Vector,
/root/reference/math-vector/src/main/java/com/linkedin/dagli/math/vector/Vector.java:14-18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------- dense ops

def vec_sum(a, b) -> Column:
    """Element-wise sum (VectorSum, common/.../vector/VectorSum.java:11-14;
    LazySumVector). The reference sums logically-infinite vectors where a
    missing index is 0 — zip_with pads the shorter array with nulls, so
    coalesce keeps the longer vector's tail instead of nulling it."""
    return F.zip_with(
        _c(a), _c(b),
        lambda x, y: F.coalesce(x, F.lit(0.0)) + F.coalesce(y, F.lit(0.0)))


def vec_scale(a, s) -> Column:
    return F.transform(_c(a), lambda x: x * s)


def vec_clip(a, lo: float, hi: float) -> Column:
    """LazyClippedVector (common/.../vector/LazyClippedVector.java:10-14).
    Null elements stay null — Spark's least/greatest SKIP nulls, so the
    naive form would silently turn a null element into ``hi``."""
    return F.transform(
        _c(a),
        lambda x: F.when(
            x.isNotNull(), F.greatest(F.least(x, F.lit(hi)), F.lit(lo))),
    )


def vec_concat(a, b) -> Column:
    """LazyConcatenatedDenseVector (common/.../vector/LazyConcatenatedDenseVector.java:34)."""
    return F.concat(_c(a), _c(b))


def dot(a, b) -> Column:
    """Double-precision dot product, JVM-side (zip_with + aggregate)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    # try_divide: a zero vector yields null, not a DIVIDE_BY_ZERO error in
    # ANSI-on sessions (non-ANSI returns null either way)
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def element_at_index(a, i: int) -> Column:
    """VectorElementAtIndex (common/.../vector/VectorElementAtIndex.java:10)."""
    return F.element_at(_c(a), i + 1)  # 0-based reference semantics


def vec_mean(a) -> Column:
    return F.try_divide(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double")),
        F.size(_c(a)))  # empty array -> null, not DIVIDE_BY_ZERO


def nearest_vector(vec, candidates: list[list[float]], *, metric: str = "l2") -> Column:
    """Index of the nearest candidate vector (NearestVector,
    common/.../vector/NearestVector.java:14-22): the candidate list is a
    plan literal (Dagli broadcasts the fixed candidate list the same way),
    distances fuse into one codegen'd expression — a broadcast nested-loop
    with no Python. Returns struct(idx int, dist double); ties break to the
    lower index (deterministic). metric: 'l2' (squared) or 'cosine'
    (distance = 1 - cosine similarity)."""
    v = _c(vec)
    cands = F.array(*[
        F.array(*[F.lit(float(x)) for x in cand]) for cand in candidates
    ])
    if metric == "l2":
        # coalesce: a dimension-mismatched candidate yields a null distance
        # (zip_with pads nulls) which would sort FIRST and win the argmin
        dist_fn = lambda c: F.coalesce(F.aggregate(  # noqa: E731
            F.zip_with(v, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, x: acc + x), F.lit(float("inf")))
    elif metric == "cosine":
        # null similarity (zero vector, try_divide) must sort LAST, not
        # first: struct ordering puts null fields before every real value,
        # so a zero-vector candidate would silently win the argmin
        dist_fn = lambda c: F.coalesce(  # noqa: E731
            F.lit(1.0) - cosine(v, c), F.lit(float("inf")))
    else:
        raise ValueError(metric)
    scored = F.transform(
        cands,
        lambda c, i: F.struct(dist_fn(c).alias("dist"), i.cast("int").alias("idx")),
    )
    best = F.array_min(scored)  # struct ordering: (dist asc, idx asc)
    # every distance undefined (e.g. zero INPUT vector under cosine):
    # null result, not an arbitrary winner
    return F.when(
        best["dist"] != F.lit(float("inf")),
        F.struct(best["idx"].alias("idx"), best["dist"].alias("dist")))


# ---------------------------------------------------------------- sparse ops

def max_nonzero_index(col, *, on_zero=None) -> Column:
    """Highest index with a non-zero value in a sparse ``map<long,double>``
    vector; null (or ``on_zero``) for zero/empty vectors
    (common/.../vector/MaxNonZeroVectorElementIndex.java:16-39)."""
    mx = F.array_max(
        F.map_keys(F.map_filter(_c(col), lambda k, v: v != 0)))
    return mx if on_zero is None else F.coalesce(mx, F.lit(on_zero))


def dense_capacity(col) -> Column:
    """Length of a dense ``array`` vector — DenseVector#capacity()
    (common/.../vector/DenseVectorCapacity.java:12-20)."""
    return F.size(_c(col)).cast("long")


def many_hot(indices) -> Column:
    """indices array -> map of 1.0 (ManyHotVector,
    common/.../vector/ManyHotVector.java:15-20). Repeated indices are
    idempotent like the reference (a raw map_from_arrays would throw
    DUPLICATED_MAP_KEY under the default dedup policy)."""
    arr = F.array_distinct(_c(indices))
    return F.map_from_arrays(arr, F.transform(arr, lambda _: F.lit(1.0)))


def categorical_feature(position, value, *, seed: int = 0) -> Column:
    """One-hot id by hash-combining feature position and value
    (CategoricalFeatureVector, common/.../vector/CategoricalFeatureVector.java:17-34
    uses hash(hash(pos)+hash(val)); we use xxhash64(seed, pos, val))."""
    return F.xxhash64(F.lit(seed), _c(position), _c(value))


def composite_sparse(*maps, seed: int = 0) -> Column:
    """Hash-combine several sparse vectors into one collision-avoiding map
    (CompositeSparseVector, common/.../vector/CompositeSparseVector.java:21):
    each constituent's keys are re-hashed with its position so identical
    indices in different inputs stay distinct."""
    def _rehash(i):
        # single-arg lambda: a 2-arg callable would make F.transform pass
        # (element, index) and shadow the constituent position
        return lambda k: F.xxhash64(F.lit(seed), F.lit(i), k)

    rehashed = [
        F.map_from_arrays(
            F.transform(F.map_keys(_c(m)), _rehash(i)),
            F.map_values(_c(m)),
        )
        for i, m in enumerate(maps)
    ]
    out = rehashed[0]
    for m in rehashed[1:]:
        out = F.map_concat(out, m)
    return out


def sparse_from_counts(keys, *, seed: int = 0) -> Column:
    """array of tokens -> map<hash, count> (hashed count vector — the
    HashingTF-shaped NgramVector apply, common/.../list/NgramVector.java:10-16)."""
    arr = F.transform(_c(keys), lambda t: F.xxhash64(F.lit(seed), t))
    distinct = F.array_distinct(arr)
    counts = F.transform(
        distinct, lambda k: F.size(F.filter(arr, lambda x: x == k)).cast("double")
    )
    return F.map_from_arrays(distinct, counts)
