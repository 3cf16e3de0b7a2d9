"""Round-2 closures of the last SURVEY §2 'no' rows: RankingEvaluationResult,
Sparse/DenseVectorFromDistribution, MaxNonZeroVectorElementIndex,
DenseVectorCapacity, AllTransformationsMap."""

import pytest
from pyspark.sql import functions as F

from dagli_spark.functions.distribution import (
    dense_vector_from_distribution,
    sparse_vector_from_distribution,
)
from dagli_spark.functions.vector import dense_capacity, max_nonzero_index
from dagli_spark.operators.evaluation import ranking_evaluation
from dagli_spark.operators.meta import all_transformations_map


def test_ranking_evaluation_reference_semantics(spark):
    # (truth, ranked list): correct@2 -> rr 1/2; correct@1 -> rr 1;
    # non-empty miss -> incorrect, rr 0; empty -> no prediction
    rows = [
        ("a", ["b", "a", "c"]),
        ("b", ["b", "x"]),
        ("z", ["a", "b", "c"]),
        ("q", []),
    ]
    df = spark.createDataFrame(rows, "truth string, ranked array<string>")
    r = ranking_evaluation(df, "truth", "ranked", 3)
    assert r["total_count"] == 4
    assert r["correct_count"] == 2 and r["incorrect_count"] == 1
    assert r["no_prediction_count"] == 1
    assert r["unweighted_mrr"] == pytest.approx((0.5 + 1.0) / 4)
    assert r["unweighted_accuracy"] == pytest.approx(0.5)
    # weighted variant (RankingEvaluationResultBase.java:32,60-64)
    dfw = df.withColumn("w", F.when(F.col("truth") == "a", 3.0).otherwise(1.0))
    rw = ranking_evaluation(dfw, "truth", "ranked", 3, weight="w")
    assert rw["total_weight"] == pytest.approx(6.0)
    assert rw["weighted_mrr"] == pytest.approx((3 * 0.5 + 1.0) / 6.0)
    assert rw["no_prediction_weight"] == pytest.approx(1.0)
    # top-k restriction: correct@2 stops counting at k=1
    r1 = ranking_evaluation(df, "truth", "ranked", 1)
    assert r1["correct_count"] == 1 and r1["incorrect_count"] == 2


def test_distribution_vector_bridges(spark):
    df = spark.createDataFrame(
        [({"x": 0.7, "y": 0.3},), ({},)], "dist map<string,double>")
    out = df.select(
        sparse_vector_from_distribution("dist").alias("sv"),
        dense_vector_from_distribution("dist", ["y", "x", "missing"]).alias("dv"),
    ).collect()
    sv = out[0]["sv"]
    assert set(sv.values()) == {0.7, 0.3} and len(sv) == 2
    assert all(isinstance(k, int) for k in sv)  # hashed label indices
    assert list(out[0]["dv"]) == [0.3, 0.7, 0.0]  # known-label order, 0-fill
    assert out[1]["sv"] == {} and list(out[1]["dv"]) == [0.0, 0.0, 0.0]


def test_max_nonzero_and_capacity(spark):
    df = spark.createDataFrame(
        [({5: 1.0, 9: 2.0, 12: 0.0}, [1.0, 2.0, 3.0]),
         ({3: 0.0}, []),
         ({}, [0.0])],
        "sv map<bigint,double>, dv array<double>")
    rows = df.select(
        max_nonzero_index("sv").alias("mx"),
        max_nonzero_index("sv", on_zero=-1).alias("mx0"),
        dense_capacity("dv").alias("cap"),
    ).collect()
    assert rows[0]["mx"] == 9 and rows[0]["mx0"] == 9  # 12 has value 0
    assert rows[1]["mx"] is None and rows[1]["mx0"] == -1
    assert rows[2]["mx"] is None and rows[2]["mx0"] == -1
    assert [r["cap"] for r in rows] == [3, 0, 1]


def test_all_transformations_map(spark):
    df = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    out = all_transformations_map(
        df, {"sq": F.col("v") * F.col("v"),
             "neg": -F.col("v"),
             "plus1": lambda d: F.col("v") + 1},
        out="m",
    ).orderBy("v").collect()
    assert out[0]["m"] == {"sq": 4.0, "neg": -2.0, "plus1": 3.0}
    assert out[1]["m"]["sq"] == 9.0


def test_kmeans_apply_null_and_ragged_vectors(spark):
    """Null / wrong-dimension vectors yield null cluster+distance instead
    of crashing the Arrow stage (round-2 review fix)."""
    from dagli_spark.operators.models import KMeansModel

    m = KMeansModel("vec", [[0.0, 0.0], [10.0, 10.0]])
    df = spark.createDataFrame(
        [([0.5, 0.5],), (None,), ([1.0],), ([9.0, 9.0],)],
        "vec array<float>")
    rows = m.apply(df, out="c").collect()
    got = [(r["c"], r["c_dist2"] is not None) for r in rows]
    assert got[0] == (0, True) and got[3] == (1, True)
    assert got[1] == (None, False) and got[2] == (None, False)


def test_rank_string_population(spark):
    """Rank over a string column (reference Rank accepts any Comparable;
    the searchsorted apply must not force float64)."""
    from dagli_spark.operators.fit import fit_rank

    pop = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",)], "v string")
    m = fit_rank(pop, "v")
    probe = spark.createDataFrame(
        [("a",), ("b",), ("bb",), ("z",), (None,)], "v string")
    got = [r["r"] for r in m.apply(probe, out="r").collect()]
    assert got == [0, 2, 3, 4, 0]


def test_rank_big_long_population_exact(spark):
    """int64 values beyond 2^53 must not collapse in a float64 cast."""
    from dagli_spark.operators.fit import fit_rank

    base = 1 << 60
    pop = spark.createDataFrame(
        [(base,), (base + 1,), (base + 2,)], "v long")
    m = fit_rank(pop, "v")
    probe = spark.createDataFrame([(base + 1,), (base + 2,)], "v long")
    got = [r["r"] for r in m.apply(probe, out="r").collect()]
    assert got == [1, 2]


def test_lcg_uniform_nonnegative_for_negative_keys(spark):
    from dagli_spark.functions.rand import random_double_lcg
    from pyspark.sql import functions as F2

    df = spark.range(-500, 500).select(random_double_lcg(F2.col("id"), 3)
                                       .alias("u"))
    mn, mx = df.agg(F2.min("u"), F2.max("u")).first()
    assert 0.0 <= mn and mx < 1.0
