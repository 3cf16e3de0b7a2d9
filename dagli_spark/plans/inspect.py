"""Plan inspection: make "is the filter pushed down / is the bytes column
pruned / how many shuffles" assertable in tests instead of eyeballed.

The reference's optimizer surface is graph reducers applied at DAG
construction (core/.../dag/DAGReducer.java:33-130); on Spark the optimizer
is Catalyst, so the engine's job is to *not defeat it* — these helpers are
the regression harness for that (SURVEY.md §4.1)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excluding broadcasts/reused)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\n\s*[^(]*\(\d+\) Exchange\b", plan))


def count_broadcasts(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"BroadcastExchange", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — the column-pruning audit: a scan
    reading `bytes` outside a decode stage is a bug."""
    plan = formatted_plan(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.split(",") if c.strip()]
        out.append(cols)
    return out


def observed(df, name: str, *metrics):
    """Side-channel metrics without an extra action — the frame-level form
    of the reference's Logged identity transformer (common/.../object/
    Logged.java:34): attach aggregate expressions that are computed during
    the NEXT action on the frame and retrieved from the listener-visible
    observation (df.observe). Example::

        df = observed(df, "ingest", F.count(F.lit(1)).alias("rows"),
                      F.sum("value").alias("total"))

    Retrieve via a QueryExecutionListener / StreamingQueryListener, or
    `Observation` for the blocking variant."""
    return df.observe(name, *metrics)
