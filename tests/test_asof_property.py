"""Property-based as-of join correctness: random event/query sets vs a
pandas oracle, covering duplicate timestamps, empty histories, strictness,
tolerance, and the bucketed skew path. (The reference has no property
tests — SURVEY.md §5 notes this as a gap our engine closes.)"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dagli_spark.operators.asof import asof_join

EVENT = st.tuples(
    st.integers(0, 3),          # entity
    st.integers(0, 50),         # time
    st.integers(0, 10_000),     # value (also tiebreak id via uniqueness)
)


def _pandas_asof(events, queries, strict, tol=None):
    """Oracle: per query, the event with max (time, eid) subject to the
    time predicate; tolerance filters matches older than asof - tol."""
    out = []
    for (qe, qt, qid) in queries:
        cands = [
            (t, eid, v) for (e, t, eid, v) in events
            if e == qe and ((t < qt) if strict else (t <= qt))
            and (tol is None or t >= qt - tol)
        ]
        if cands:
            t, eid, v = max(cands)
            out.append((qe, qt, qid, v, eid))
        else:
            out.append((qe, qt, qid, None, None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    ev=st.lists(EVENT, min_size=0, max_size=40),
    qs=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)),
                min_size=1, max_size=25),
    strict=st.booleans(),
    tol=st.one_of(st.none(), st.integers(1, 20)),
    bucketed=st.booleans(),
)
def test_asof_matches_pandas_oracle(spark, ev, qs, strict, tol, bucketed):
    # unique event ids -> pinned tiebreak; numeric time column
    events = [(f"e{e}", t, i, float(v)) for i, (e, t, v) in enumerate(ev)]
    queries = [(f"e{e}", t, i) for i, (e, t) in enumerate(qs)]
    edf = spark.createDataFrame(
        events or [("__none__", -1, -1, 0.0)],
        "entity string, ts long, eid long, val double")
    if not events:
        edf = edf.where("ts >= 0")  # empty event side
    qdf = spark.createDataFrame(
        queries, "entity string, asof long, qid long")

    from pyspark.sql import functions as F

    kwargs = dict(on="entity", left_time="asof", right_time="ts",
                  values=["val", "eid"], tiebreak="eid", strict=strict)
    if tol is not None:
        kwargs["tolerance"] = F.lit(tol)
    if bucketed:
        kwargs.update(time_buckets=4, bucket_width=F.lit(13))
    got = asof_join(qdf, edf, **kwargs)

    got_rows = sorted(
        ((r["entity"], r["asof"], r["qid"], r["val"], r["eid"])
         for r in got.collect()),
        key=lambda r: (r[0], r[1], r[2]))
    exp = _pandas_asof(
        [(e, t, i, v) for (e, t, i, v) in events],
        queries, strict, tol)
    exp = [(e, t, q, v, eid) for (e, t, q, v, eid) in exp]
    assert len(got_rows) == len(exp)
    for g, x in zip(got_rows, exp):
        assert g[:3] == x[:3]
        assert (g[3] is None) == (x[3] is None), (g, x)
        if g[3] is not None:
            assert g[3] == x[3] and g[4] == x[4], (g, x)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    ev=st.lists(EVENT, min_size=0, max_size=40),
    qs=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)),
                min_size=1, max_size=25),
    strict=st.booleans(),
)
def test_broadcast_variant_matches_pandas_oracle(spark, ev, qs, strict):
    """Cross-variant equivalence on random data: the packed-history
    broadcast as-of must agree with the same oracle the union path is
    pinned against (round-2 rewrite)."""
    from pyspark.sql import functions as F
    from dagli_spark.operators.asof import asof_join_broadcast

    events = [(f"e{e}", t, i, float(v)) for i, (e, t, v) in enumerate(ev)]
    queries = [(f"e{e}", t, i) for i, (e, t) in enumerate(qs)]
    edf = spark.createDataFrame(
        events or [("__none__", -1, -1, 0.0)],
        "entity string, ts long, eid long, val double")
    if not events:
        edf = edf.where("ts >= 0")
    qdf = spark.createDataFrame(
        queries, "entity string, asof long, qid long")

    got = asof_join_broadcast(
        qdf, edf, on="entity", left_time="asof", right_time="ts",
        values=["val", "eid"], tiebreak="eid", strict=strict)
    got_rows = sorted(
        ((r["entity"], r["asof"], r["qid"], r["val"], r["eid"])
         for r in got.collect()),
        key=lambda r: (r[0], r[1], r[2]))
    exp = _pandas_asof(
        [(e, t, i, v) for (e, t, i, v) in events], queries, strict)
    assert len(got_rows) == len(exp)
    for g, x in zip(got_rows, exp):
        assert g[:3] == x[:3]
        assert (g[3] is None) == (x[3] is None), (g, x)
        if g[3] is not None:
            assert g[3] == x[3] and g[4] == x[4], (g, x)
