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


def test_broadcast_variant_zero_query_shuffle_and_map_payload(spark):
    """Round-2 review fixes: the broadcast as-of variant must not shuffle
    the query side (packed-history broadcast join) and must pass through
    unorderable (map-typed) query payload columns untouched."""
    from dagli_spark.plans.inspect import count_exchanges
    from dagli_spark.operators.asof import asof_join_broadcast

    q = spark.createDataFrame(
        [(1, 10.0, {"a": 1}), (1, 5.0, {"b": 2}), (2, 7.0, None)],
        "k long, asof_time double, payload map<string,int>")
    e = spark.createDataFrame(
        [(1, 4.0, 100.0), (1, 9.0, 200.0)], "k long, t double, v double")
    out = asof_join_broadcast(q, e, on="k", left_time="asof_time",
                              right_time="t", values=["v"])
    # inspect BEFORE executing: AQE's post-execution formatted plan repeats
    # the tree (final + initial) and would double-count the one exchange
    assert count_exchanges(out) <= 1, count_exchanges(out)
    rows = sorted((r["k"], r["asof_time"], r["v"],
                   dict(r["payload"]) if r["payload"] else None)
                  for r in out.collect())
    assert rows == [(1, 5.0, 100.0, {"b": 2}), (1, 10.0, 200.0, {"a": 1}),
                    (2, 7.0, None, None)]


def test_broadcast_variant_collision_check(spark):
    import pytest as _pytest
    from dagli_spark.operators.asof import asof_join_broadcast

    q = spark.createDataFrame([(1, 10.0, 0.0)], "k long, asof_time double, v double")
    e = spark.createDataFrame([(1, 4.0, 1.0)], "k long, t double, v double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join_broadcast(q, e, on="k", left_time="asof_time",
                            right_time="t", values=["v"])


def test_bucketed_path_matches_plain_with_null_keys(spark):
    """Null entity keys: the bucketed carry join must group them like the
    window path does (null-safe equality)."""
    from dagli_spark.operators.asof import asof_join
    from pyspark.sql import functions as F2

    q = spark.createDataFrame(
        [(None, 100.0, "qa"), (1, 100.0, "qb")],
        "k string, asof_time double, qid string")
    e = spark.createDataFrame(
        [(None, 1.0, 10.0), (1, 2.0, 20.0)], "k string, t double, v double")
    plain = asof_join(q, e, on="k", left_time="asof_time", right_time="t",
                      values=["v"])
    bucketed = asof_join(q, e, on="k", left_time="asof_time",
                         right_time="t", values=["v"],
                         time_buckets=4, bucket_width=F2.lit(10.0))
    a = sorted((r["qid"], r["v"]) for r in plain.collect())
    b = sorted((r["qid"], r["v"]) for r in bucketed.collect())
    assert a == b == [("qa", 10.0), ("qb", 20.0)]


def test_broadcast_variant_null_semantics_match_union_path(spark):
    """Round-2 re-review: null keys, null tiebreaks and null event times
    behave identically in asof_join and asof_join_broadcast."""
    from dagli_spark.operators.asof import asof_join, asof_join_broadcast

    q = spark.createDataFrame(
        [(None, 100.0, "qa"), ("1", 100.0, "qb")],
        "k string, asof_time double, qid string")
    e = spark.createDataFrame(
        [(None, 1.0, 10.0), ("1", 2.0, 20.0), ("1", None, 5.0)],
        "k string, t double, v double")
    a = {r["qid"]: r["v"] for r in asof_join(
        q, e, on="k", left_time="asof_time", right_time="t",
        values=["v"], tiebreak="v").collect()}
    b = {r["qid"]: r["v"] for r in asof_join_broadcast(
        q, e, on="k", left_time="asof_time", right_time="t",
        values=["v"], tiebreak="v").collect()}
    assert a == b == {"qa": 10.0, "qb": 20.0}

    # null event time is visible at minus-infinity in both paths
    e2 = spark.createDataFrame([("1", None, 99.0)], "k string, t double, v double")
    a2 = asof_join(q, e2, on="k", left_time="asof_time", right_time="t",
                   values=["v"]).collect()
    b2 = asof_join_broadcast(q, e2, on="k", left_time="asof_time",
                             right_time="t", values=["v"]).collect()
    av = {r["qid"]: r["v"] for r in a2}
    bv = {r["qid"]: r["v"] for r in b2}
    assert av == bv and av["qb"] == 99.0

    # null tiebreaks order nulls-first in both paths (insertion-order
    # independent): the non-null tiebreak wins the equal-time tie
    e3 = spark.createDataFrame(
        [("1", 5.0, 100.0, None), ("1", 5.0, 200.0, 7)],
        "k string, t double, v double, tb int")
    for frame in (e3, e3.orderBy(F.col("v").desc())):
        got = asof_join_broadcast(
            q.where(F.col("qid") == "qb"), frame, on="k",
            left_time="asof_time", right_time="t", values=["v"],
            tiebreak="tb").first()["v"]
        assert got == 200.0
