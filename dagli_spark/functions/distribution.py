"""DiscreteDistribution operators (SURVEY.md §2.11).

A distribution is a ``map<label, double>`` column (the reference's
DiscreteDistribution, math-distribution/.../DiscreteDistribution.java:30).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dagli_spark.functions.rand import random_double


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _entries_desc(col) -> Column:
    """map entries sorted by (prob desc, label asc) — deterministic argmax."""
    return F.sort_array(
        F.transform(
            F.map_entries(_c(col)),
            lambda e: F.struct((-e["value"]).alias("negp"),
                               e["key"].alias("label"),
                               e["value"].alias("prob")),
        )
    )


def most_likely_label(col) -> Column:
    """argmax label (common/.../distribution/MostLikelyLabelFromDistribution.java:12-19).
    try_element_at: an empty distribution yields null instead of an
    INVALID_ARRAY_INDEX error in ANSI-on sessions."""
    return F.try_element_at(_entries_desc(col), F.lit(1))["label"]


def most_likely_labels(col, k: int) -> Column:
    """top-k labels (MostLikelyLabelsFromDistribution.java:19)."""
    return F.transform(F.slice(_entries_desc(col), 1, k), lambda e: e["label"])


def label_probability(col, label) -> Column:
    """LabelProbabilityFromDistribution.java:14 — 0.0 when absent.
    try_element_at: absent labels yield 0.0 (not MAP_KEY_DOES_NOT_EXIST)
    under ANSI-on sessions too, consistent with most_likely_label."""
    return F.coalesce(F.try_element_at(_c(col), F.lit(label)), F.lit(0.0))


def distribution_from_vector(labels: list, vec) -> Column:
    """DistributionFromVector.java:22 — zip fixed labels with scores."""
    return F.map_from_arrays(
        F.array(*[F.lit(la) for la in labels]),
        F.transform(_c(vec), lambda x: x.cast("double")),
    )


def binary_distribution(prob) -> Column:
    """BinaryDistributionFromProbability.java:13"""
    p = _c(prob).cast("double")
    return F.map_from_arrays(
        F.array(F.lit(True), F.lit(False)), F.array(p, F.lit(1.0) - p)
    )


def sparse_vector_from_distribution(col, *, seed: int = 0) -> Column:
    """Distribution -> sparse vector ``map<hash(label), prob>``
    (common/.../distribution/SparseVectorFromDistribution.java:19-33: each
    label hashes to its vector index, probability becomes the value).
    Hash family: xxhash64(seed, label) — documented swap for the
    reference's default Object.hashCode()/custom hasher."""
    m = _c(col)
    return F.map_from_arrays(
        F.transform(F.map_keys(m), lambda k: F.xxhash64(F.lit(seed), k)),
        F.map_values(m),
    )


def dense_vector_from_distribution(col, labels: list) -> Column:
    """Distribution -> dense probability vector over a KNOWN label order
    (common/.../distribution/DenseVectorFromDistribution.java:50-60:
    element i = probability of labels[i]; labels absent from the
    distribution get 0.0, distribution labels outside the list are
    ignored)."""
    m = _c(col)
    return F.array(*[
        F.coalesce(F.try_element_at(m, F.lit(la)), F.lit(0.0))
        for la in labels
    ])


def sampled_with_replacement(col, key, *, seed: int = 0,
                             method: str = "xxhash64") -> Column:
    """Seeded sampling from a per-row distribution
    (common/.../transformer/SampledWithReplacement.java:27, AliasSampler).
    Inverse-CDF over the deterministically sorted entries with a
    hash-derived uniform — same (key, seed) -> same draw at any
    parallelism (quasi-determinism contract §1.4). ``method='lcg'`` uses
    the portable Knuth-hash uniform (SQL-reproducible, for oracles)."""
    if method == "lcg":
        from dagli_spark.functions.rand import random_double_lcg

        u = random_double_lcg(key, seed)
    else:
        u = random_double(key, seed)
    entries = _entries_desc(col)
    cum = F.transform(
        entries,
        lambda e, i: F.aggregate(
            F.slice(entries, 1, i + 1), F.lit(0.0),
            lambda acc, x: acc + x["prob"],
        ),
    )
    total = F.aggregate(entries, F.lit(0.0), lambda a, e: a + e["prob"])
    target = u * total
    # array_position returns 0 (not null) when nothing matches — e.g. an
    # empty map or NaN probabilities; fall back to the first entry, and use
    # try_element_at so an empty distribution yields null under ANSI too
    pos = F.array_position(F.transform(cum, lambda c: c >= target), True)
    idx = F.when(pos == 0, F.lit(1).cast("long")).otherwise(pos)
    return F.try_element_at(entries, idx.cast("int"))["label"]
