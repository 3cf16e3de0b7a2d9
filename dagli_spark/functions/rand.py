"""Deterministic hash-derived randomness.

The reference's RandomDouble is a pure function of (seed, exampleIndex)
backed by stateless hash RNGs
(/root/reference/core/src/main/java/com/linkedin/dagli/generator/RandomDouble.java:10-21,
math-hashing/.../DoubleXorShift.java, MurmurHash3.java:34). We reproduce the
*contract* (quasi-determinism: same key + seed -> same value at any
parallelism, documentation/transformers.md:11-17) with Spark's built-in
xxhash64 — NOT the same hash family, so values differ from Java; parity
tests pin OUR outputs. Never use F.rand(): it is partition-order dependent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASK53 = (1 << 53) - 1


def random_double(key: Column | str, seed: int = 0) -> Column:
    """Deterministic U[0,1) from (seed, key). 53-bit mantissa precision."""
    h = F.xxhash64(F.lit(seed), key)
    return (h.bitwiseAND(F.lit(_MASK53))).cast("double") / F.lit(float(1 << 53))


def random_long(key: Column | str, seed: int = 0) -> Column:
    return F.xxhash64(F.lit(seed), key)


def random_double_lcg(key: Column | str, seed: int = 0) -> Column:
    """Portable U[0,1) from a Knuth multiplicative hash of an integer key —
    weaker than xxhash64 but expressible in ANSI SQL, so DuckDB oracles can
    reproduce draws exactly (same pattern as sources.readers'
    stratified_sample 'lcg' method)."""
    k = F.col(key) if isinstance(key, str) else key
    # pmod, not %: Spark's % is sign-preserving, so a negative key would
    # yield u < 0 and inverse-CDF consumers would degenerate to always
    # picking the first entry (readers.stratified_sample uses pmod too)
    h = F.pmod(k.cast("long") * F.lit(2654435761) + F.lit(seed),
               F.lit(2 ** 32))
    return h.cast("double") / F.lit(float(2 ** 32))


def sample_segment(key: Column | str, lo: float, hi: float, seed: int = 0) -> Column:
    """Deterministic [lo, hi) segment sampling predicate — the reference's
    SampleReader/SampleSegment (objectio-core/.../SampleReader.java:8-11)."""
    u = random_double(key, seed)
    return (u >= F.lit(lo)) & (u < F.lit(hi))


def shuffle_key(key: Column | str, seed: int = 0) -> Column:
    """Order-by key for a full deterministic shuffle — the scalable analogue
    of LazyShuffledBufferReader's partial K-buffer shuffle
    (objectio-core/.../LazyShuffledBufferReader.java:9-14). Delegates to
    :func:`random_long` so there is exactly one hashing definition."""
    return random_long(key, seed)