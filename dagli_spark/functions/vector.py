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
    LazySumVector)."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x + y)


def vec_scale(a, s) -> Column:
    return F.transform(_c(a), lambda x: x * s)


def vec_clip(a, lo: float, hi: float) -> Column:
    """LazyClippedVector (common/.../vector/LazyClippedVector.java:10-14)."""
    return F.transform(_c(a), lambda x: F.greatest(F.least(x, F.lit(hi)), F.lit(lo)))


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
    return dot(a, b) / (norm(a) * norm(b))


def element_at_index(a, i: int) -> Column:
    """VectorElementAtIndex (common/.../vector/VectorElementAtIndex.java:10)."""
    return F.element_at(_c(a), i + 1)  # 0-based reference semantics


def vec_mean(a) -> Column:
    return F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double")) / F.size(_c(a))


# ---------------------------------------------------------------- sparse ops

def many_hot(indices) -> Column:
    """indices array -> map of 1.0 (ManyHotVector,
    common/.../vector/ManyHotVector.java:15-20)."""
    arr = _c(indices)
    return F.map_from_arrays(arr, F.transform(arr, lambda _: F.lit(1.0)))


def categorical_feature(position, value, *, seed: int = 0) -> Column:
    """One-hot id by hash-combining feature position and value
    (CategoricalFeatureVector, common/.../vector/CategoricalFeatureVector.java:17-34
    uses hash(hash(pos)+hash(val)); we use xxhash64(seed, pos, val))."""
    return F.xxhash64(F.lit(seed), _c(position), _c(value))


def sparse_from_counts(keys, *, seed: int = 0) -> Column:
    """array of tokens -> map<hash, count> (hashed count vector — the
    HashingTF-shaped NgramVector apply, common/.../list/NgramVector.java:10-16)."""
    arr = F.transform(_c(keys), lambda t: F.xxhash64(F.lit(seed), t))
    distinct = F.array_distinct(arr)
    counts = F.transform(
        distinct, lambda k: F.size(F.filter(arr, lambda x: x == k)).cast("double")
    )
    return F.map_from_arrays(distinct, counts)
