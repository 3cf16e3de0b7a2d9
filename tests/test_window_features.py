"""lag/lead, LOCF fills, sessionization, rolling frames vs DuckDB oracle."""

import duckdb
from pyspark.sql import functions as F

from dagli_spark.operators import window_features as wf


def _rows(df):
    return sorted([tuple(r) for r in df.collect()],
                  key=lambda t: tuple(str(x) for x in t))


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    out = con.execute(sql).fetchall()
    return sorted([tuple(r) for r in out], key=lambda t: tuple(str(x) for x in t))


def test_lag_lead(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = wf.spec("user_id", ["ts", "event_id"])
    out = wf.with_lag(ev, "value", 1, w, alias="prev_value")
    out = wf.with_lead(out, "value", 2, w, alias="next2_value")
    got = _rows(out.select("event_id", "prev_value", "next2_value"))
    exp = _duck(sf_dir, """
        SELECT event_id,
               lag(value, 1) OVER w AS prev_value,
               lead(value, 2) OVER w AS next2_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """)
    assert got == exp


def test_forward_backward_fill(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "v", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    w = wf.spec("user_id", ["ts", "event_id"])
    out = wf.forward_fill(ev, "v", w, alias="v_ffill")
    out = wf.backward_fill(out, "v", w, alias="v_bfill")
    got = _rows(out.select("event_id", "v_ffill", "v_bfill"))
    exp = _duck(sf_dir, """
        WITH e AS (SELECT *, CASE WHEN event_type='purchase' THEN value END AS v
                   FROM events)
        SELECT event_id,
               last(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
               first(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill
        FROM e
    """)
    assert got == exp


def test_sessionize(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = wf.spec("user_id", ["ts", "event_id"])
    out = wf.sessionize(ev, "ts", F.expr("INTERVAL 30 MINUTES"), w)
    got = _rows(out.select("event_id", "session_id"))
    exp = _duck(sf_dir, """
        WITH g AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                 AS session_id
        FROM g
    """)
    assert got == exp


def test_rolling_rows(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = wf.spec("user_id", ["ts", "event_id"])
    out = wf.rolling(
        ev,
        {"roll_avg": F.avg("value"), "roll_cnt": F.count("value")},
        w, rows=(-4, 0),
    )
    got = _rows(out.select("event_id", "roll_avg", "roll_cnt"))
    exp = _duck(sf_dir, """
        SELECT event_id,
               avg(value) OVER w AS roll_avg,
               count(value) OVER w AS roll_cnt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """)
    # float-tolerant compare
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[2] == e[2]
        assert abs(g[1] - e[1]) < 1e-9


def test_example_index_partition_invariant(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = wf.spec("user_id", ["ts", "event_id"])
    a = wf.example_index(ev.repartition(3), w).select("event_id", "example_index")
    b = wf.example_index(ev.repartition(17), w).select("event_id", "example_index")
    assert _rows(a) == _rows(b)
