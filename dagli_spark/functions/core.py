"""Core scalar/collection operator mappings (SURVEY.md §2.2-2.3) — thin,
documented Catalyst equivalents of the reference's per-row transformers.
Kept as a named inventory so coverage is auditable line-by-line."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def conditional_value(cond, v_true, v_false) -> Column:
    """cond ? v1 : v2 (common/.../object/ConditionalValue.java:16-25).
    Catalyst's SimplifyConditionals is the reference's constant-condition
    branch-elimination reducer (documentation/transformers.md:172-175)."""
    return F.when(_c(cond), v_true).otherwise(v_false)


def first_non_null(*cols) -> Column:
    """common/.../object/FirstNonNull.java:15-19"""
    return F.coalesce(*[_c(c) for c in cols])


def cast(col, t) -> Column:
    """common/.../object/Cast.java:9-14 / Convert.java:10-14"""
    return _c(col).cast(t)


def dictionary_value(col, mapping: dict, default=None) -> Column:
    """Fixed-map lookup with default (common/.../map/DictionaryValue.java:9-13).
    Inlined as a literal map expression — the broadcast-join form for big
    dictionaries is operators.fit.IndexModel.apply."""
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.coalesce(F.element_at(F.create_map(*pairs), _c(col)), F.lit(default))


def tupled(*cols) -> Column:
    """Tupled2..20 (core/src/template/generated/.../Tupled2.java:14);
    fields named _1.._n like Scala tuples."""
    return F.struct(*[_c(c).alias(f"_{i + 1}") for i, c in enumerate(cols)])


def value_from_tuple(col, i: int) -> Column:
    """ValueXFromTuple (Value0FromTuple.java:19), 0-based. Catalyst's
    SimplifyExtractValueOps is the reference's inverse-elimination reducer
    (core/.../reducer/InverseClassReducer.java:12-23)."""
    return _c(col).getField(f"_{i + 1}")


def array_element(col, i: int) -> Column:
    """common/.../array/ArrayElement.java:9-14 (0-based)"""
    return F.element_at(_c(col), i + 1)


def variadic_list(*cols) -> Column:
    """common/.../list/VariadicList.java:16"""
    return F.array(*[_c(c) for c in cols])


def size(col) -> Column:
    """common/.../list/Size.java:9-13"""
    return F.size(_c(col))


def filtered_list(col, predicate) -> Column:
    """common/.../list/FilteredList.java:13-19 (predicate form)"""
    return F.filter(_c(col), predicate)


def filtered_list_include(col, include: list) -> Column:
    """FilteredList include-set form -> array_intersect keeps order of col"""
    return F.filter(_c(col), lambda x: x.isin(include))


def filtered_list_exclude(col, exclude: list) -> Column:
    return F.filter(_c(col), lambda x: ~x.isin(exclude))


def truncated_list(col, max_len: int) -> Column:
    """common/.../list/TruncatedList.java:16-22"""
    return F.slice(_c(col), 1, max_len)


def mapped_iterable(col, fn) -> Column:
    """MappedIterable for a prepared (stateless) inner op: lift a column
    function over a per-row collection (core/.../transformer/MappedIterable.java:22-36).
    For a *trainable* inner op use explode -> fit/apply -> collect_list."""
    return F.transform(_c(col), fn)


def logged(col) -> Column:
    """common/.../object/Logged.java:34 — identity; side-channel logging in
    Spark is df.observe()/accumulators at the frame level."""
    return _c(col)


def kth_smallest(items, cum_counts, k) -> Column:
    """k-th smallest (1-indexed) element of a weighted multiset given as
    parallel (items, cumulative counts) arrays — the reference's per-row
    OrderStatistic apply (common/.../object/OrderStatistic.java:25-33,
    golden cases in OrderStatisticTest.java). Pure Catalyst."""
    zipped = F.arrays_zip(_c(items).alias("it"), _c(cum_counts).alias("cc"))
    kk = _c(k) if not isinstance(k, int) else F.lit(k)
    # try_element_at: k beyond the total weight yields null (ANSI-safe)
    return F.try_element_at(
        F.filter(zipped, lambda x: x["cc"] >= kk), F.lit(1))["it"]


def kth_largest(items, cum_counts, k) -> Column:
    """k-th largest: k-th smallest counted from the other end."""
    cc = _c(cum_counts)
    total = F.try_element_at(cc, F.lit(-1))  # empty multiset -> null
    kk = _c(k) if not isinstance(k, int) else F.lit(k)
    return kth_smallest(items, cc, total - kk + 1)


def order_percentile(items, cum_counts, p) -> Column:
    """Element at percentile p of the weighted multiset — index =
    max(1, round(p * total)) with round-half-up, matching the reference's
    Math.round (common/.../object/OrderStatistic.java:235; a ceil here
    would pick the next element for any fractional product below .5)."""
    cc = _c(cum_counts)
    total = F.try_element_at(cc, F.lit(-1))  # empty multiset -> null
    pp = _c(p) if not isinstance(p, (int, float)) else F.lit(float(p))
    k = F.greatest(F.lit(1).cast("long"),
                   F.floor(pp * total + F.lit(0.5)).cast("long"))
    return kth_smallest(items, cc, k)
