"""Physical-plan inspection helpers (the engine's `.explain` discipline)."""

from dagli_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    pushed_filters,
    scan_columns,
)

__all__ = ["formatted_plan", "count_exchanges", "pushed_filters", "scan_columns"]
