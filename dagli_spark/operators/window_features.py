"""Windowed feature generators: lag/lead, LOCF fill, sessionization, rolling.

The reference has no ORDER BY-window operator — its "window" is either the
whole dataset (a preparable transformer's fit pass) or the single row; its
only positional primitive is ExampleIndex
(/root/reference/core/src/main/java/com/linkedin/dagli/generator/ExampleIndex.java:7-20).
The north rule adds real event-time windows; this module implements them as
compositions of Spark's built-in window functions so the whole feature set
stays JVM-side in whole-stage codegen.

**One sort serves all**: every generator takes the same ``(keys, order_by)``
spec and Catalyst reuses a single Exchange+Sort for any number of features
over the same spec — define all per-entity features from one
:func:`spec` and the physical plan contains exactly one shuffle.

Determinism (reference contract, documentation/transformers.md:11-17;
documentation/dag.md:12-13): callers must include a tiebreak column in
``order_by`` when the time column can contain duplicates — every feature
is then invariant to partitioning and parallelism, which is what the
local[8]-vs-local[32] scaling runs assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def spec(keys: str | list[str], order_by: str | list[str | Column]) -> WindowSpec:
    """Canonical per-entity window spec: partition by entity keys, order by
    (event_time, tiebreak...)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    return Window.partitionBy(*keys).orderBy(*order_by)


def with_lag(
    df: DataFrame, col: str, n: int, w: WindowSpec, *, alias: str | None = None,
    default=None,
) -> DataFrame:
    """``lag(col, n)`` over the entity/time spec (Dagli analogue: none —
    new temporal operator mandated by the north rule)."""
    return df.withColumn(alias or f"{col}_lag{n}", F.lag(col, n, default).over(w))


def with_lead(
    df: DataFrame, col: str, n: int, w: WindowSpec, *, alias: str | None = None,
    default=None,
) -> DataFrame:
    return df.withColumn(alias or f"{col}_lead{n}", F.lead(col, n, default).over(w))


def forward_fill(
    df: DataFrame, col: str, w: WindowSpec, *, alias: str | None = None
) -> DataFrame:
    """LOCF: last non-null value at or before the current row."""
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias or col, F.last(col, ignorenulls=True).over(frame))


def backward_fill(
    df: DataFrame, col: str, w: WindowSpec, *, alias: str | None = None
) -> DataFrame:
    """NOCB: next non-null value at or after the current row."""
    frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return df.withColumn(alias or col, F.first(col, ignorenulls=True).over(frame))


def sessionize(
    df: DataFrame,
    time_col: str,
    gap,
    w: WindowSpec,
    *,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap since the
    previous event exceeds ``gap`` (a Column interval, e.g.
    ``F.expr("INTERVAL 30 MINUTES")``, or a numeric delta for numeric time).

    session_id is the 0-based cumulative count of session starts per entity
    — the classic cumulative-sum formulation; entirely JVM-side.
    Streaming analogue: ``F.session_window(time, gap)`` (see
    dagli_spark.streaming).
    """
    prev = F.lag(time_col).over(w)
    is_new = F.when(prev.isNull() | (F.col(time_col) > prev + gap), 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__is_new", is_new).withColumn(
        session_col, F.sum("__is_new").over(cum) - 1
    ).drop("__is_new")


def rolling(
    df: DataFrame,
    aggs: dict[str, Column],
    w: WindowSpec,
    *,
    rows: tuple[int, int] | None = None,
    range_: tuple | None = None,
) -> DataFrame:
    """Rolling-frame aggregations. ``rows=(-4, 0)`` = last 5 rows;
    ``range_=(-3600, 0)`` = trailing range in the orderBy column's units
    (use ``rangeBetween`` semantics; for timestamps order by
    ``unix_micros(ts)`` or cast). Frame end at 0 (current row) keeps the
    zero-leakage invariant: a feature at t never reads rows after t.
    """
    if rows is not None and range_ is not None:
        raise ValueError("pass rows or range_, not both")
    if rows is not None:
        frame = w.rowsBetween(rows[0], rows[1])
    elif range_ is not None:
        frame = w.rangeBetween(range_[0], range_[1])
    else:
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(frame))
    return out


def example_index(df: DataFrame, w: WindowSpec, *, alias: str = "example_index") -> DataFrame:
    """0-based deterministic row position over an explicit sort key —
    Dagli's ExampleIndex generator
    (core/.../generator/ExampleIndex.java:7-20). Uses row_number over an
    explicit key, NOT monotonically_increasing_id, so the value is
    partition-count-invariant (reference determinism contract §1.4)."""
    return df.withColumn(alias, F.row_number().over(w) - 1)
