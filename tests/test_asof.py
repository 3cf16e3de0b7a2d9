"""As-of join semantics, pinned against a DuckDB ASOF JOIN oracle and
hand-built golden cases (strictness, ties, tolerance, no-event entities)."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from dagli_spark.operators.asof import asof_join, asof_join_broadcast

T0 = dt.datetime(2026, 1, 1)


def _mk(spark):
    events = spark.createDataFrame(
        [
            ("a", T0 + dt.timedelta(minutes=10), 1.0, 1),
            ("a", T0 + dt.timedelta(minutes=20), 2.0, 2),
            ("a", T0 + dt.timedelta(minutes=20), 2.5, 3),  # duplicate ts: tiebreak
            ("a", T0 + dt.timedelta(minutes=40), 4.0, 4),
            ("b", T0 + dt.timedelta(minutes=5), 10.0, 5),
        ],
        "entity_id string, event_time timestamp, val double, eid int",
    )
    queries = spark.createDataFrame(
        [
            ("a", T0 + dt.timedelta(minutes=15)),   # between events -> 1.0
            ("a", T0 + dt.timedelta(minutes=20)),   # exactly on tie -> 2.5 (<=) / 1.0 (<)
            ("a", T0 + dt.timedelta(minutes=999)),  # after all -> 4.0
            ("a", T0 + dt.timedelta(minutes=1)),    # before all -> null
            ("b", T0 + dt.timedelta(minutes=5)),    # exact single -> 10.0 (<=) / null (<)
            ("c", T0 + dt.timedelta(minutes=30)),   # no events -> null
        ],
        "entity_id string, asof_time timestamp",
    )
    return events, queries


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda t: tuple(str(x) for x in t)
    )


def test_asof_basic_le(spark):
    events, queries = _mk(spark)
    out = asof_join(
        queries, events, on="entity_id", left_time="asof_time",
        right_time="event_time", values=["val"], tiebreak="eid",
    )
    got = {(r.entity_id, r.asof_time.minute + 60 * r.asof_time.hour): r.val
           for r in out.collect()}
    assert got[("a", 15)] == 1.0
    assert got[("a", 20)] == 2.5  # tie at same ts: max tiebreak wins
    assert got[("a", 999)] == 4.0  # 999 min = 16h39m
    assert got[("a", 1)] is None
    assert got[("b", 5)] == 10.0
    assert got[("c", 30)] is None


def test_asof_strict(spark):
    events, queries = _mk(spark)
    out = asof_join(
        queries, events, on="entity_id", left_time="asof_time",
        right_time="event_time", values=["val"], tiebreak="eid", strict=True,
    )
    got = {(r.entity_id, r.asof_time.minute + 60 * r.asof_time.hour): r.val
           for r in out.collect()}
    assert got[("a", 20)] == 1.0   # events at ==t invisible
    assert got[("b", 5)] is None


def test_asof_tolerance(spark):
    events, queries = _mk(spark)
    out = asof_join(
        queries, events, on="entity_id", left_time="asof_time",
        right_time="event_time", values=["val"], tiebreak="eid",
        tolerance=F.expr("INTERVAL 6 MINUTES"),
    )
    got = {(r.entity_id, r.asof_time.minute + 60 * r.asof_time.hour): r.val
           for r in out.collect()}
    assert got[("a", 15)] == 1.0      # 5 min old, within tolerance
    assert got[("a", 999)] is None     # 16h old match -> nulled


def test_asof_matches_duckdb_oracle_on_events_table(spark, sf_dir):
    """Purchases as-of-joined to the latest prior event of any type per user."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    queries = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("asof_time"), "event_id"
    )
    events = ev.select("user_id", "ts", F.col("value").alias("ev_value"),
                       F.col("event_id").alias("ev_id"))
    out = asof_join(
        queries, events, on="user_id", left_time="asof_time", right_time="ts",
        values=["ev_value", "ev_id"], tiebreak="ev_id", strict=True,
    )
    got = _rows(out.select("user_id", "asof_time", "ev_value", "ev_id"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    exp = con.execute(
        """
        WITH q AS (SELECT user_id, ts AS asof_time, event_id
                   FROM events WHERE event_type='purchase'),
             e AS (SELECT user_id, ts, value AS ev_value, event_id AS ev_id
                   FROM events)
        SELECT q.user_id, q.asof_time, last.ev_value, last.ev_id
        FROM q LEFT JOIN LATERAL (
            SELECT ev_value, ev_id FROM e
            WHERE e.user_id = q.user_id AND e.ts < q.asof_time
            ORDER BY e.ts DESC, e.ev_id DESC LIMIT 1
        ) last ON TRUE
        """
    ).fetchall()
    exp = sorted([tuple(r) for r in exp], key=lambda t: tuple(str(x) for x in t))
    assert got == exp


@pytest.mark.parametrize("variant", ["bucketed", "broadcast"])
def test_asof_variants_match_baseline(spark, sf_dir, variant):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    queries = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("asof_time"), "event_id"
    )
    events = ev.select("user_id", "ts", F.col("value").alias("ev_value"),
                       F.col("event_id").alias("ev_id"))
    base = asof_join(
        queries, events, on="user_id", left_time="asof_time", right_time="ts",
        values=["ev_value", "ev_id"], tiebreak="ev_id",
    )
    if variant == "bucketed":
        alt = asof_join(
            queries, events, on="user_id", left_time="asof_time",
            right_time="ts", values=["ev_value", "ev_id"], tiebreak="ev_id",
            time_buckets=16, bucket_width=F.lit(6 * 3600 * 1_000_000),  # 6h in micros
        )
    else:
        alt = asof_join_broadcast(
            queries, events, on="user_id", left_time="asof_time",
            right_time="ts", values=["ev_value", "ev_id"], tiebreak="ev_id",
        )
    cols = ["user_id", "asof_time", "ev_value", "ev_id"]
    assert _rows(base.select(*cols)) == _rows(alt.select(*cols))
