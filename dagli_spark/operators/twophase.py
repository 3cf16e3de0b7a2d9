"""Two-phase global ordering primitives — scale-safe replacements for
single-partition ``Window.orderBy`` in fit passes.

A global ``row_number()``/running sum with no PARTITION BY plans a
single-partition Exchange: the whole input serializes through one task.
That is fine while fitted state is dictionary-sized, but a 100M-term
vocabulary (Index/Indices over web-scale token streams) would bottleneck
the job on that one task. The classic fix is two phases:

1. range-partition by the sort key (globally ordered partitions) and
   number rows *within* each partition, then
2. add per-partition offsets computed from the P-sized partition-count
   side table (broadcast back — never a second shuffle of the data).

Results are identical to the single-partition plan whenever the ordering
is total (unique sort key), which every fit dictionary here guarantees —
asserted id-for-id by tests/test_parallelism_grid.py. Reference analogue:
Dagli assigns Index ids from a single in-memory pass
(common/src/main/java/com/linkedin/dagli/object/AbstractIndex.java); the
two-phase plan is the distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__tp_pid"


def _with_partition_order(df: DataFrame, order_cols) -> DataFrame:
    """Range-partition on the sort key and tag rows with their (globally
    ordered) partition id. Partition boundaries come from Spark's sampled
    range partitioner; the final ranks do not depend on where the
    boundaries fall because the ordering is total.

    Correctness precondition: the local-rank and offsets subtrees both hang
    off this exchange, and they must see the SAME partition boundaries.
    AQE's runtime stage reuse guarantees that (verified: the final adaptive
    plan contains exactly one materialized range stage + a ReusedExchange —
    pinned by tests/test_plans_skew_sources.py); with exchange reuse
    disabled the two subtrees would re-sample boundaries independently and
    could silently disagree, so refuse to build the plan at all."""
    reuse = df.sparkSession.conf.get("spark.sql.exchange.reuse", "true")
    if str(reuse).lower() == "false":
        raise RuntimeError(
            "two-phase global ordering requires spark.sql.exchange.reuse "
            "(the local-rank and offsets subtrees must share one range "
            "exchange; without reuse their sampled partition boundaries "
            "can diverge and ranks would be silently wrong)")
    return (
        df.repartitionByRange(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )


def global_row_number(
    df: DataFrame, order_cols, out: str, *, start: int = 0
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols) - 1 + start`` without a
    single-partition exchange. ``order_cols`` must be a total order."""
    part = _with_partition_order(df, order_cols)
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    local = part.withColumn("__tp_rn", F.row_number().over(w))
    # the offsets subtree shares `part`, so Catalyst reuses the range
    # exchange (ReusedExchange) — one pass over the data; the remaining
    # single-partition window runs over P rows (partition counts), not data
    wo = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy(_PID).agg(F.count(F.lit(1)).alias("__tp_c"))
        .withColumn("__tp_off",
                    F.coalesce(F.sum("__tp_c").over(wo), F.lit(0)))
        .select(_PID, "__tp_off")
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, (F.col("__tp_off") + F.col("__tp_rn")
                          - F.lit(1) + F.lit(start)).cast("long"))
        .drop(_PID, "__tp_rn", "__tp_off")
    )


def global_running_sum(
    df: DataFrame, order_cols, value_col: str, out: str
) -> DataFrame:
    """Exclusive global prefix sum of ``value_col`` in ``order_cols`` order
    (sum over rows strictly before the current row), two-phase."""
    part = _with_partition_order(df, order_cols)
    w = (Window.partitionBy(_PID).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = part.withColumn(
        "__tp_ls", F.coalesce(F.sum(value_col).over(w), F.lit(0)))
    wo = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy(_PID).agg(F.sum(value_col).alias("__tp_c"))
        .withColumn("__tp_off",
                    F.coalesce(F.sum("__tp_c").over(wo), F.lit(0)))
        .select(_PID, "__tp_off")
    )
    # no cast: the output keeps sum(value_col)'s type (long for integer
    # inputs, double for doubles — a long cast would silently truncate a
    # future weighted/fractional caller)
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.col("__tp_off") + F.col("__tp_ls"))
        .drop(_PID, "__tp_ls", "__tp_off")
    )
