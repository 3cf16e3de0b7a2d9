"""Property-based windowed-feature correctness vs a pandas oracle:
sessionize (gap rule), forward fill, lag, and rolling frames on random
per-entity event sets with duplicate timestamps."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dagli_spark.operators import window_features as wf

EVENT = st.tuples(
    st.integers(0, 2),                    # entity
    st.integers(0, 1000),                 # time (seconds)
    st.one_of(st.none(), st.integers(0, 100)),  # nullable value
)


def _oracle(rows, gap):
    """Per entity sorted by (t, eid): session cumsum, locf, lag, roll3."""
    out = {}
    by_e: dict = {}
    for (e, t, eid, v) in rows:
        by_e.setdefault(e, []).append((t, eid, v))
    for e, evs in by_e.items():
        evs.sort()
        sess, last_t, locf = -1, None, None
        vals = []
        for i, (t, eid, v) in enumerate(evs):
            if last_t is None or t - last_t > gap:
                sess += 1
            last_t = t
            if v is not None:
                locf = v
            prev = evs[i - 1][2] if i else None
            window = [x for (_, _, x) in evs[max(0, i - 2):i + 1]
                      if x is not None]
            roll = sum(window) / len(window) if window else None
            out[eid] = (sess, locf, prev, roll)
            vals.append(v)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ev=st.lists(EVENT, min_size=1, max_size=50),
       gap=st.integers(1, 100))
def test_window_features_match_oracle(spark, ev, gap):
    rows = [(f"e{e}", t, i, float(v) if v is not None else None)
            for i, (e, t, v) in enumerate(ev)]
    df = spark.createDataFrame(rows, "entity string, t long, eid long, v double")
    w = wf.spec("entity", ["t", "eid"])
    out = wf.sessionize(df, "t", F.lit(gap), w)  # numeric-delta gap path
    out = wf.forward_fill(out, "v", w, alias="locf")
    out = wf.with_lag(out, "v", 1, w, alias="prev")
    out = wf.rolling(out, {"roll3": F.avg("v")}, w, rows=(-2, 0))
    got = {r["eid"]: (r["session_id"], r["locf"], r["prev"], r["roll3"])
           for r in out.collect()}
    exp = _oracle(rows, gap)
    assert set(got) == set(exp)
    for eid in exp:
        g, x = got[eid], exp[eid]
        assert g[0] == x[0], (eid, "session", g, x)
        assert g[1] == x[1], (eid, "locf", g, x)
        assert g[2] == x[2], (eid, "lag", g, x)
        if x[3] is None:
            assert g[3] is None
        else:
            assert abs(g[3] - x[3]) < 1e-9, (eid, "roll", g, x)
