"""Property-based pins for the round-2 Rank/two-phase rewrites: the
searchsorted Arrow apply and the range-partitioned ranking must agree with
the naive definitions for arbitrary multisets, probes and limits."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dagli_spark.operators.fit import fit_rank
from dagli_spark.operators.twophase import global_running_sum

values = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=60)
probes = st.lists(
    st.one_of(st.integers(min_value=-60, max_value=60), st.none()),
    min_size=1, max_size=30)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=values, prb=probes,
       limit=st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
       ignore_dups=st.booleans())
def test_rank_matches_naive(spark, vals, prb, limit, ignore_dups):
    pop = spark.createDataFrame([(float(v),) for v in vals], "v double")
    m = fit_rank(pop, "v", limit=limit, ignore_duplicates=ignore_dups)
    probe_df = spark.createDataFrame(
        [(float(p) if p is not None else None,) for p in prb], "v double")
    got = [r["r"] for r in m.apply(probe_df, out="r").collect()]

    base = sorted(set(vals)) if ignore_dups else sorted(vals)
    for p, g in zip(prb, got):
        if p is None:
            expected = 0  # legacy null-probe rank
        else:
            expected = sum(1 for v in base if v < p)
            if limit is not None:
                expected = min(expected, limit)
        assert g == expected, (vals, p, limit, ignore_dups, g, expected)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=80, unique=True))
def test_global_running_sum_matches_numpy(spark, vals):
    df = spark.createDataFrame(
        [(v, abs(v) % 7 + 1) for v in vals], "k long, c long")
    out = {r["k"]: r["below"] for r in global_running_sum(
        df, [F.col("k").asc()], "c", "below").collect()}
    order = np.argsort(vals, kind="stable")
    run = 0
    for i in order:
        assert out[vals[i]] == run
        run += abs(vals[i]) % 7 + 1


def test_rank_null_fit_values(spark):
    """Null fit instances are EXCLUDED from the population: apply must not
    crash on a fit that saw nulls (the collected boundary arrays would be
    poisoned), and ranks count only non-null instances strictly below."""
    pop = spark.createDataFrame(
        [(2.0,), (None,), (1.0,), (None,), (3.0,)], "v double")
    m = fit_rank(pop, "v")
    probes = spark.createDataFrame([(0.5,), (2.5,), (None,)], "v double")
    assert [r["r"] for r in m.apply(probes, out="r").collect()] == [0, 2, 0]

    pop_s = spark.createDataFrame([("b",), (None,), ("a",)], "v string")
    ms = fit_rank(pop_s, "v")
    probes_s = spark.createDataFrame([("c",), (None,)], "v string")
    assert [r["r"] for r in ms.apply(probes_s, out="r").collect()] == [2, 0]


def test_rank_continuous_state_guard(spark):
    """An UNLIMITED fit over a high-cardinality continuous column pre-bins
    into <= max_state boundaries (documented approximation, error bounded
    by one bin's population) instead of collecting one driver row per
    distinct value — the 100x-scale guard mirroring continuous_bin_expr."""
    n = 5000
    df = spark.range(n).select((F.col("id") * 1.0).alias("v"))
    m = fit_rank(df, "v", max_state=100)
    state_rows = m.cumulative.count()
    assert state_rows <= 100
    _, prefix = m._arrays()
    assert int(prefix[-1]) == n  # total population preserved exactly
    probes = [0.0, 2500.0, 4999.5]
    probe_df = spark.createDataFrame([(p,) for p in probes], "v double")
    got = [r["r"] for r in m.apply(probe_df, out="r").collect()]
    bin_pop = n / 100 + 1
    for p, g in zip(probes, got):
        exact = sum(1 for x in range(n) if float(x) < p)
        assert abs(g - exact) <= bin_pop, (p, g, exact)

    # a fit WITH a limit is already state-capped — no binning, exact ranks
    m2 = fit_rank(df, "v", limit=10, max_state=100)
    assert m2.cumulative.count() == 10
    got2 = [r["r"] for r in m2.apply(probe_df, out="r").collect()]
    assert got2 == [0, 10, 10]
