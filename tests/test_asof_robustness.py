"""Edge probes for the as-of join (the verify-skill checklist): colliding
column names, empty event side, numeric time columns, null query times."""

import pytest
from pyspark.sql import functions as F

from dagli_spark.operators.asof import asof_join


def _frames(spark):
    q = spark.createDataFrame(
        [(1, 10.0, "q1"), (1, 5.0, "q2"), (2, 7.0, "q3")],
        "k long, asof_time double, qid string")
    e = spark.createDataFrame(
        [(1, 4.0, 100.0), (1, 9.0, 200.0), (3, 1.0, 300.0)],
        "k long, t double, v double")
    return q, e


def test_colliding_value_columns_raise(spark):
    q, e = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(q, e.withColumnRenamed("v", "qid"), on="k",
                  left_time="asof_time", right_time="t", values=["qid"])


def test_empty_event_side_keeps_query_rows(spark):
    q, e = _frames(spark)
    out = asof_join(q, e.where(F.lit(False)), on="k",
                    left_time="asof_time", right_time="t", values=["v"])
    rows = {r["qid"]: r["v"] for r in out.collect()}
    assert rows == {"q1": None, "q2": None, "q3": None}


def test_numeric_time_columns(spark):
    q, e = _frames(spark)
    out = asof_join(q, e, on="k", left_time="asof_time", right_time="t",
                    values=["v"])
    rows = {r["qid"]: r["v"] for r in out.collect()}
    # q1@10 sees t=9 -> 200; q2@5 sees t=4 -> 100; k=2 has no history
    assert rows == {"q1": 200.0, "q2": 100.0, "q3": None}


def test_null_query_time_yields_no_match(spark):
    q, e = _frames(spark)
    qn = q.withColumn(
        "asof_time",
        F.when(F.col("qid") == "q1", F.lit(None).cast("double"))
        .otherwise(F.col("asof_time")))
    out = asof_join(qn, e, on="k", left_time="asof_time", right_time="t",
                    values=["v"])
    rows = {r["qid"]: r["v"] for r in out.collect()}
    assert rows["q1"] is None and rows["q2"] == 100.0
