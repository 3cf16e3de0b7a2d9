"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship as-of-join + windowed-feature query at
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
as (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-runnable
ANSI-SQL equivalent (column names aligned; float aggregates rounded on BOTH
sides so the driver's value-hash comparison is byte-stable).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # module-level: pandas_udf hints stringify under
# `from __future__ import annotations` and resolve against module globals

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dagli_spark.operators import window_features as wf
from dagli_spark.operators.asof import asof_join
from dagli_spark.operators.dedup import (
    exact_dedup,
    jaccard_dup_pairs,
    minhash_lsh_pairs,
    simhash_dup_pairs,
)
from dagli_spark.operators.fit import (
    fit_index,
    fit_rank,
    kfold_column,
    multiplicity,
    multiset,
    order_statistic,
)
from dagli_spark.operators.evaluation import binary_evaluation
from dagli_spark.operators.models import fit_isotonic, fit_kmeans
from dagli_spark.operators.similarity import (
    embedding_dup_pairs,
    knn_bruteforce,
    knn_lsh,
)
from dagli_spark.functions import core as C
from dagli_spark.functions import distribution as D
from dagli_spark.functions import text as T
from dagli_spark.functions.vector import norm


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- flagship

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-user purchase requests as-of-joined to the latest prior
    event, with lag / rolling / session features — the north-rule pipeline
    shape over the driver's events table at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    ev = _t(spark, sf_dir, "events")
    w = wf.spec("user_id", ["ts", "event_id"])
    feats = wf.sessionize(ev, "ts", F.expr("INTERVAL 30 MINUTES"), w)
    feats = wf.with_lag(feats, "value", 1, w, alias="value_lag1")
    feats = wf.rolling(
        feats,
        {"value_avg5": F.avg("value"), "cnt5": F.count("value")},
        w, rows=(-4, 0),
    )
    events_side = feats.select(
        "user_id", "ts",
        F.col("value").alias("ev_value"),
        F.col("event_id").alias("ev_id"),
        "session_id", "value_lag1",
        F.round("value_avg5", 4).alias("value_avg5"), "cnt5",
    )
    queries = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("asof_time"), F.col("event_id").alias("qid")
    )
    return asof_join(
        queries, events_side, on="user_id", left_time="asof_time",
        right_time="ts",
        values=["ev_value", "ev_id", "session_id", "value_lag1", "value_avg5", "cnt5"],
        tiebreak="ev_id", strict=True,
    )


# --------------------------------------------------------------- queries

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_orders_per_cust(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


def q_region_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def _purchase_queries(ev):
    return ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("asof_time"), F.col("event_id").alias("qid")
    )


def q_asof_strict(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    events = ev.select("user_id", "ts", F.col("value").alias("prev_value"),
                       F.col("event_id").alias("prev_event_id"))
    return asof_join(
        _purchase_queries(ev), events, on="user_id", left_time="asof_time",
        right_time="ts", values=["prev_value", "prev_event_id"],
        tiebreak="prev_event_id", strict=True,
    ).select("user_id", "asof_time", "qid",
             F.round("prev_value", 2).alias("prev_value"), "prev_event_id")


def q_asof_tolerance(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    events = ev.select("user_id", "ts", F.col("value").alias("prev_value"),
                       F.col("event_id").alias("prev_event_id"))
    return asof_join(
        _purchase_queries(ev), events, on="user_id", left_time="asof_time",
        right_time="ts", values=["prev_value", "prev_event_id"],
        tiebreak="prev_event_id", strict=True,
        tolerance=F.expr("INTERVAL 1 HOUR"),
    ).select("user_id", "asof_time", "qid",
             F.round("prev_value", 2).alias("prev_value"), "prev_event_id")


def q_asof_bucketed(spark, sf_dir):
    """Same semantics as q_asof_strict through the hot-entity-parallel
    3-pass path (time_buckets) — proves the skew path returns identical
    results (same oracle)."""
    ev = _t(spark, sf_dir, "events")
    events = ev.select("user_id", "ts", F.col("value").alias("prev_value"),
                       F.col("event_id").alias("prev_event_id"))
    return asof_join(
        _purchase_queries(ev), events, on="user_id", left_time="asof_time",
        right_time="ts", values=["prev_value", "prev_event_id"],
        tiebreak="prev_event_id", strict=True,
        time_buckets=16, bucket_width=F.lit(6 * 3600 * 1_000_000),
    ).select("user_id", "asof_time", "qid",
             F.round("prev_value", 2).alias("prev_value"), "prev_event_id")


def q_lag_lead(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = wf.spec("user_id", ["ts", "event_id"])
    out = wf.with_lag(ev, "value", 1, w, alias="value_lag1")
    out = wf.with_lead(out, "value", 2, w, alias="value_lead2")
    return out.select("event_id",
                      F.round("value_lag1", 2).alias("value_lag1"),
                      F.round("value_lead2", 2).alias("value_lead2"))


def q_forward_fill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "pv", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    w = wf.spec("user_id", ["ts", "event_id"])
    out = wf.forward_fill(ev, "pv", w, alias="last_purchase_value")
    out = wf.backward_fill(out, "pv", w, alias="next_purchase_value")
    return out.select(
        "event_id",
        F.round("last_purchase_value", 2).alias("last_purchase_value"),
        F.round("next_purchase_value", 2).alias("next_purchase_value"),
    )


def q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = wf.spec("user_id", ["ts", "event_id"])
    return wf.sessionize(ev, "ts", F.expr("INTERVAL 30 MINUTES"), w).select(
        "event_id", "user_id", "session_id"
    )


def q_session_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = wf.spec("user_id", ["ts", "event_id"])
    s = wf.sessionize(ev, "ts", F.expr("INTERVAL 30 MINUTES"), w)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        (F.unix_micros(F.max("ts").cast("timestamp"))
         - F.unix_micros(F.min("ts").cast("timestamp"))).alias("duration_us"),
    )


def q_rolling_rows(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = wf.spec("user_id", ["ts", "event_id"])
    out = wf.rolling(ev, {"roll_avg5": F.avg("value"),
                          "roll_cnt5": F.count("value")}, w, rows=(-4, 0))
    return out.select("event_id", F.round("roll_avg5", 4).alias("roll_avg5"),
                      "roll_cnt5")


def q_rolling_range(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "epoch_s", F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    )
    w = Window.partitionBy("user_id").orderBy("epoch_s")
    out = wf.rolling(ev, {"roll_sum_1h": F.sum("value")}, w, range_=(-3600, 0))
    return out.select("event_id", F.round("roll_sum_1h", 2).alias("roll_sum_1h"))


def q_example_index(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = wf.spec("user_id", ["ts", "event_id"])
    return wf.example_index(ev, w).select("event_id", "example_index")


def q_index_dict(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return fit_index(ev, "event_type").mapping.select(
        F.col("value").alias("event_type"), F.col("id").alias("type_id")
    )


def q_index_applied(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    model = fit_index(ev, "event_type")
    return model.apply(ev, out="type_id").select("event_id", "type_id")


def q_multiplicity(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return multiplicity(ev, "event_type", out="type_multiplicity").select(
        "event_id", "type_multiplicity"
    )


def q_multiset(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return multiset(ev, "event_type").select(
        F.col("value").alias("event_type"), F.col("count").alias("cnt")
    )


def q_order_statistic(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    qs = order_statistic(ev, "value", [0.25, 0.5, 0.75])
    return spark.createDataFrame(
        [(round(q, 4), i) for i, q in enumerate(qs)], "quantile double, idx int"
    ).select("idx", "quantile")


def q_bucket_ntile(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy(F.col("value").asc(), F.col("event_id").asc())
    return ev.withColumn("bucket", F.ntile(4).over(w) - 1).select(
        "event_id", "bucket"
    )


def q_rank_population(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    model = fit_rank(ev, "value")
    return model.apply(ev, out="value_rank").select("event_id", "value_rank")


def q_kfold(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        kfold_column(ev, "user_id", 5, method="lcg")
        .groupBy("fold").agg(F.count(F.lit(1)).alias("n"),
                             F.countDistinct("user_id").alias("n_groups"))
    )


def q_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.aggregate(F.transform(toks, lambda t: F.length(t).cast("double")),
                        F.lit(0.0), lambda a, x: a + x) / F.size(toks), 4
        ).alias("avg_token_len"),
        F.length("text").alias("len_chars"),
    )


def q_token_count_bpe(spark, sf_dir):
    """BPE-ish regex token counting (training-data token budgeting)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.token_count_bpe("text").alias("n_bpe_tokens"))


def q_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(T.quality_score("text"), 4).alias("quality"))


def q_exact_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select("doc_id")


def q_top_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(20)
    )


def q_knn_bruteforce(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = knn_bruteforce(probes, e, k=3)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 4).alias("cosine"))


def q_centroid_norm(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(norm("embedding")), 4).alias("avg_norm"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 4)
         .alias("avg_e0"),
    )


# ------- hash-family-dependent ops: rows-only checks (no portable oracle)

def q_minhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5)


def q_minhash_portable(spark, sf_dir):
    """MinHash+LSH near-dup pairs with the PORTABLE polynomial hash family
    (dedup._poly31 / poly_hash_params): the full pipeline — shingles,
    16 minhashes, 4-band bucketing, candidate join, exact-Jaccard verify —
    replays exactly in SQL, giving the dedup family an end-to-end oracle
    (the production default stays xxhash64 -> rows-only)."""
    d = _t(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5,
                            hash_method="poly31")
    return out.select("id_a", "id_b",
                      F.round("jaccard", 4).alias("jaccard"))


def q_jaccard_dedup(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs, blocked by the documents
    table's `lang` column (cross-language near-dups are out of scope by
    construction, and the block bounds the quadratic verify to per-language
    partitions — the honest scale shape for an EXACT verifier; the
    sub-quadratic scale path is minhash_lsh_pairs / simhash_dup_pairs).
    Hash-free — shingling, blocking, set Jaccard and the threshold all
    replay in SQL. threshold=0.8: the synthetic corpus plants 6 near-dup
    pairs at j>=0.98 while every non-dup pair sits under 0.1."""
    d = _t(spark, sf_dir, "documents")
    out = jaccard_dup_pairs(d, "text", "doc_id", n=3, threshold=0.8,
                            block_col="lang")
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: 4-table random-hyperplane LSH
    candidate generation + exact-cosine verify (similarity.
    embedding_dup_pairs). The hyperplanes are pure splitmix arithmetic, so
    the oracle replays bucketing, candidate join and the threshold verify
    with the plane vectors inlined (same pattern as knn_lsh). threshold
    0.35 is calibrated to the synthetic embeddings (no planted dups; max
    pairwise cosine 0.513, nearest candidate 7e-5 off the cut — float-safe)
    so the row exercises non-trivial candidate recall rather than
    returning empty."""
    e = _t(spark, sf_dir, "embeddings")
    out = embedding_dup_pairs(e, dim=64, id_col="vec_id",
                              vec_col="embedding", threshold=0.35)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_simhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return simhash_dup_pairs(d, "text", "doc_id", max_hamming=3)


def q_simhash_portable(spark, sf_dir):
    """SimHash near-dup pairs with the portable 32-bit polynomial-family
    hash: token hashing, per-bit signed sums, pigeonhole banding and the
    Hamming verify all replay in SQL (production default stays the 64-bit
    xxhash64 variant -> rows-only). max_hamming=1 of 32 bits — comparable
    selectivity to the 64-bit variant's 3."""
    d = _t(spark, sf_dir, "documents")
    return simhash_dup_pairs(d, "text", "doc_id", max_hamming=1,
                             hash_method="poly31")


def q_knn_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN. The planes are pure splitmix arithmetic (no
    string hashing), so the oracle replays bucketing + candidate join +
    cosine top-k with the plane vectors inlined."""
    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = knn_lsh(probes, e, dim=64, k=3)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 4).alias("cosine"))


def q_knn_ivf(spark, sf_dir):
    """IVF ANN (k-means coarse quantizer + multi-probe). Only the quantizer
    FIT is non-SQL: the oracle inlines the fitted centers (fitted-literal
    pattern) and checks assignment + routing + cosine top-k independently;
    exhaustive-probe equivalence to brute force is additionally pinned in
    tests/test_meta_vector_text.py."""
    from dagli_spark.operators.similarity import knn_ivf

    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10)
    out = knn_ivf(probes, e, k=3, n_centroids=8, n_probe=3)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 4).alias("cosine"))


def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.lang_id_heuristic("text").alias("lang_guess"))


def q_rank_limited(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    m = fit_rank(ev, "value", limit=100)
    return m.apply(ev, out="value_rank_cap").select("event_id", "value_rank_cap")


def q_dict_value(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    mapping = {"click": 1, "view": 2, "purchase": 3, "signup": 4, "error": 5}
    return ev.select(
        "event_id", C.dictionary_value("event_type", mapping, default=0)
        .cast("int").alias("type_code"),
    )


def q_dist_argmax(spark, sf_dir):
    """Per-row DiscreteDistribution ops: build map{low,high}, take argmax
    + probability (distribution family, SURVEY §2.11)."""
    ev = _t(spark, sf_dir, "events")
    dist = F.map_from_arrays(
        F.array(F.lit("low"), F.lit("high")),
        F.array(F.col("value") / 200.0, 1.0 - F.col("value") / 200.0),
    )
    d = ev.withColumn("dist", dist)
    return d.select(
        "event_id",
        D.most_likely_label("dist").alias("likely"),
        (F.floor(D.label_probability("dist", "low") * 10000) / 10000)
        .alias("p_low"),
    )


def q_binary_auc(spark, sf_dir):
    """BinaryEvaluation (AUC via exact rank-sum): label==0 vs first
    embedding component."""
    e = _t(spark, sf_dir, "embeddings").select(
        (F.col("label") == 0).alias("y"),
        F.element_at("embedding", 1).cast("double").alias("s"),
    )
    ev = binary_evaluation(e, "y", "s")
    return spark.createDataFrame(
        [(round(ev["auc"], 6), int(ev["tp"] + ev["fn"]))],
        "auc double, n_pos int",
    )


def q_kmeans(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    m = fit_kmeans(e, "embedding", 4, max_iter=5, seed=7, id_col="vec_id")
    return m.apply(e, out="cluster").groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"))


def q_isotonic(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    df = e.select(F.element_at("embedding", 1).cast("double").alias("s"),
                  (F.col("label") == 0).cast("double").alias("y"))
    m = fit_isotonic(df, "s", "y")
    return m.apply(df, out="cal").select(F.round("s", 4).alias("s"),
                                         F.round("cal", 4).alias("cal"))


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-class sampling (class rebalancing): portable-hash
    variant so the oracle reproduces it exactly; partition-count invariant,
    pure filter (pushes into the scan)."""
    from dagli_spark.sources.readers import stratified_sample

    ev = _t(spark, sf_dir, "events")
    fr = {"click": 0.25, "view": 0.5, "purchase": 1.0, "signup": 1.0,
          "error": 0.0}
    out = stratified_sample(ev, "event_type", fr, "event_id", seed=3,
                            method="lcg")
    return out.select("event_id", "event_type")


def q_normalized(spark, sf_dir):
    """The reference's canonical NormalizedDouble example
    (examples/assorted/.../NormalizedDouble.java): fit min/max, scale to
    [0,1]."""
    from dagli_spark.operators.fit import fit_normalized

    ev = _t(spark, sf_dir, "events")
    m = fit_normalized(ev, "value")
    return m.apply(ev, out="v_norm").select(
        "event_id", F.round("v_norm", 6).alias("v_norm"))


def q_grouped_mean(spark, sf_dir):
    """PreparedByGroup (meta family): fit avg(value) per event_type, apply
    routes rows to their group's fitted state (broadcast join)."""
    from dagli_spark.operators.meta import fit_by_group

    ev = _t(spark, sf_dir, "events")
    m = fit_by_group(ev, "event_type", {"type_mean": F.avg("value")})
    return m.apply(ev).select(
        "event_id", F.round("type_mean", 4).alias("type_mean"))


def q_kfold_target_encode(spark, sf_dir):
    """KFoldCrossTrained specialized to target-mean encoding: each row's
    feature is the mean value of its event_type over the OTHER folds
    (leakage-free, single-shuffle leave-one-fold-out algebra)."""
    from dagli_spark.operators.meta import kfold_target_encode

    ev = _t(spark, sf_dir, "events")
    out = kfold_target_encode(ev, "event_type", "value", k=3,
                              group_col="user_id", method="lcg", out="enc")
    return out.select("event_id", "fold", F.round("enc", 4).alias("enc"))


def q_nearest_centroid(spark, sf_dir):
    """NearestVector: argmin L2 distance vs a fixed candidate list (basis
    vectors at dims 0..2), pure Catalyst broadcast nested-loop."""
    from dagli_spark.functions.vector import nearest_vector

    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()["embedding"])
    cands = []
    for i in range(3):
        v = [0.0] * dim
        v[i] = 1.0
        cands.append(v)
    nn = nearest_vector(F.col("embedding"), cands)
    return e.select("vec_id", nn["idx"].alias("nn_idx"))


def q_avg_embedding(spark, sf_dir):
    """AveragedDenseVector: column-wise mean embedding (posexplode +
    groupBy(pos) — map-side combine keeps the shuffle dim-sized)."""
    from dagli_spark.operators.vector_select import averaged_dense_vector

    e = _t(spark, sf_dir, "embeddings")
    means = averaged_dense_vector(e, "embedding")
    return spark.createDataFrame(
        [(i, round(m, 4)) for i, m in enumerate(means)], "pos int, mean double"
    )


def q_text_ops(spark, sf_dir):
    """Scalar text family: ReplacedRegex / SubstringCount /
    ContainsEmailAddress over documents."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.replaced_regex(F.col("text"), "[0-9]", "#").alias("masked"),
        T.substring_count("text", "the").alias("n_the"),
        T.contains_email("text").alias("has_email"),
    )


def q_phone_plan(spark, sf_dir):
    """ContainsPhoneNumber at both leniencies (round-3 number-plan port:
    NANP structural rules, reference default VALID bars local numbers).
    The RE2-safe patterns replay byte-for-byte in the DuckDB oracle.
    The corpus text contains no phone-shaped strings (all-false — the
    negative path), so a deterministic doc_id-derived probe column cycles
    through the three decision branches: full NANP number (valid +
    possible), 7-digit local (possible only), currency amount (neither)."""
    d = _t(spark, sf_dir, "documents")
    four = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    probe = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("call 442-253-"), four, F.lit(" now")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("local 253-"), four, F.lit(" line")))
        .otherwise(F.concat(F.lit("cost $"),
                            (F.col("doc_id") * 37).cast("string")))
    )
    return d.select(
        "doc_id",
        T.contains_phone("text").alias("has_phone_valid"),
        T.contains_phone("text", leniency="possible")
            .alias("has_phone_possible"),
        T.contains_phone(probe).alias("probe_valid"),
        T.contains_phone(probe, leniency="possible").alias("probe_possible"),
    )


def q_phone_intl(spark, sf_dir):
    """ContainsPhoneNumber with non-NANP region plans (GB/DE/FR digit
    groupings behind the same leniency API; the reference's libphonenumber
    wrapper is region-parameterized even though ContainsPhoneNumber.java:19
    pins US). A doc_id-derived probe cycles a valid number per region plus
    a no-phone branch; every (region, leniency) decision replays in DuckDB
    with the byte-identical RE2-safe pattern."""
    d = _t(spark, sf_dir, "documents")
    four = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    probe = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("ring +44 20 7031 "), four, F.lit(" today")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("buero (030) 12345"), four.substr(1, 3)))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("appelez 01 42 68 "),
                       four.substr(1, 2), F.lit(" "), four.substr(3, 2)))
        .otherwise(F.concat(F.lit("ref #"), four.substr(1, 3)))
    )
    cols = [F.col("doc_id")]
    for region in ("GB", "DE", "FR"):
        for len_ in ("valid", "possible"):
            cols.append(
                T.contains_phone(probe, region=region, leniency=len_)
                .alias(f"{region.lower()}_{len_}"))
    return d.select(*cols)


def _phone_intl_oracle() -> str:
    from dagli_spark.functions.text import phone_pattern

    checks = ",\n                   ".join(
        f"regexp_matches(probe, '{phone_pattern(r, le)}') "
        f"AS {r.lower()}_{le}"
        for r in ("GB", "DE", "FR") for le in ("valid", "possible"))
    return f"""
        WITH p AS (
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 4 = 0 THEN 'ring +44 20 7031 ' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' today'
                     WHEN doc_id % 4 = 1 THEN 'buero (030) 12345' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 3)
                     WHEN doc_id % 4 = 2 THEN 'appelez 01 42 68 ' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 2) || ' ' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              3, 2)
                     ELSE 'ref #' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 3)
                   END AS probe
            FROM documents)
        SELECT doc_id,
               {checks}
        FROM p
    """


def q_phone_intl3(spark, sf_dir):
    """ContainsPhoneNumber round-5 second-session region plans
    (CN/IT/ES/MX — four more high-traffic regions behind the same
    leniency API; goldens in tests/test_dagli_golden.py mirror
    libphonenumber's public example numbers). A doc_id-derived probe
    cycles one valid number per region (the MX branch through the
    parenthesized-area form; the ES branch through the trunk-less
    9-digit plan) plus a no-phone branch; every (region, leniency)
    decision replays in DuckDB with the byte-identical RE2-safe
    pattern."""
    d = _t(spark, sf_dir, "documents")
    four = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    probe = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("dianhua +86 131 2345 "), four))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("chiama +39 02 3661 "), four))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("llama +34 810 123 "), four.substr(1, 3)))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("marca (55) 1234 "), four))
        .otherwise(F.concat(F.lit("ref #"), four.substr(1, 3)))
    )
    cols = [F.col("doc_id")]
    for region in ("CN", "IT", "ES", "MX"):
        for len_ in ("valid", "possible"):
            cols.append(
                T.contains_phone(probe, region=region, leniency=len_)
                .alias(f"{region.lower()}_{len_}"))
    return d.select(*cols)


def _phone_intl3_oracle() -> str:
    from dagli_spark.functions.text import phone_pattern

    checks = ",\n                   ".join(
        f"regexp_matches(probe, '{phone_pattern(r, le)}') "
        f"AS {r.lower()}_{le}"
        for r in ("CN", "IT", "ES", "MX") for le in ("valid", "possible"))
    return f"""
        WITH p AS (
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 5 = 0 THEN 'dianhua +86 131 2345 ' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     WHEN doc_id % 5 = 1 THEN 'chiama +39 02 3661 ' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     WHEN doc_id % 5 = 2 THEN 'llama +34 810 123 ' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 3)
                     WHEN doc_id % 5 = 3 THEN 'marca (55) 1234 ' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE 'ref #' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 3)
                   END AS probe
            FROM documents)
        SELECT doc_id,
               {checks}
        FROM p
    """


def q_phone_intl4(spark, sf_dir):
    """ContainsPhoneNumber round-5 third-session region plans
    (KR/RU/NL/TR — four more high-traffic regions behind the same
    leniency API; goldens in tests/test_dagli_golden.py pin each plan's
    documented national formatting conventions). A doc_id-derived probe
    cycles one valid number per region (the RU branch through trunk 8 +
    parenthesized area — the one plan whose trunk digit is not 0; the
    NL branch through the paren form) plus a no-phone branch; every
    (region, leniency) decision replays in DuckDB with the
    byte-identical RE2-safe pattern."""
    d = _t(spark, sf_dir, "documents")
    four = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    probe = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("jeonhwa +82 2 312 "), four))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("zvoni 8 (495) 123-"), four.substr(1, 2),
                       F.lit("-"), four.substr(3, 2)))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("bel (020) 624 "), four))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("ara 0212 345 "), four.substr(1, 2),
                       F.lit(" "), four.substr(3, 2)))
        .otherwise(F.concat(F.lit("ref #"), four.substr(1, 3)))
    )
    cols = [F.col("doc_id")]
    for region in ("KR", "RU", "NL", "TR"):
        for len_ in ("valid", "possible"):
            cols.append(
                T.contains_phone(probe, region=region, leniency=len_)
                .alias(f"{region.lower()}_{len_}"))
    return d.select(*cols)


def _phone_intl4_oracle() -> str:
    from dagli_spark.functions.text import phone_pattern

    checks = ",\n                   ".join(
        f"regexp_matches(probe, '{phone_pattern(r, le)}') "
        f"AS {r.lower()}_{le}"
        for r in ("KR", "RU", "NL", "TR") for le in ("valid", "possible"))
    return f"""
        WITH p AS (
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 5 = 0 THEN 'jeonhwa +82 2 312 ' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     WHEN doc_id % 5 = 1 THEN 'zvoni 8 (495) 123-' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 2) || '-' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              3, 2)
                     WHEN doc_id % 5 = 2 THEN 'bel (020) 624 ' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     WHEN doc_id % 5 = 3 THEN 'ara 0212 345 ' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 2) || ' ' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              3, 2)
                     ELSE 'ref #' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 3)
                   END AS probe
            FROM documents)
        SELECT doc_id,
               {checks}
        FROM p
    """


def q_phone_intl2(spark, sf_dir):
    """ContainsPhoneNumber round-5 region plans (JP/IN/BR/AU — the next
    four high-traffic regions behind the same leniency API; goldens in
    tests/test_dagli_golden.py mirror libphonenumber's public example
    numbers). A doc_id-derived probe cycles one valid number per region
    (the BR branch through the parenthesized-area form, exercising the
    valid⊆possible paren alternative) plus a no-phone branch; every
    (region, leniency) decision replays in DuckDB with the byte-identical
    RE2-safe pattern."""
    d = _t(spark, sf_dir, "documents")
    four = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    probe = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("denwa +81 90-1234-"), four))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("call +91 74104 1"), four))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("fone (11) 96123-"), four))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("ring +61 2 3661 "), four))
        .otherwise(F.concat(F.lit("ref #"), four.substr(1, 3)))
    )
    cols = [F.col("doc_id")]
    for region in ("JP", "IN", "BR", "AU"):
        for len_ in ("valid", "possible"):
            cols.append(
                T.contains_phone(probe, region=region, leniency=len_)
                .alias(f"{region.lower()}_{len_}"))
    return d.select(*cols)


def _phone_intl2_oracle() -> str:
    from dagli_spark.functions.text import phone_pattern

    checks = ",\n                   ".join(
        f"regexp_matches(probe, '{phone_pattern(r, le)}') "
        f"AS {r.lower()}_{le}"
        for r in ("JP", "IN", "BR", "AU") for le in ("valid", "possible"))
    return f"""
        WITH p AS (
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 5 = 0 THEN 'denwa +81 90-1234-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     WHEN doc_id % 5 = 1 THEN 'call +91 74104 1' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     WHEN doc_id % 5 = 2 THEN 'fone (11) 96123-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     WHEN doc_id % 5 = 3 THEN 'ring +61 2 3661 ' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE 'ref #' ||
                       substr(lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                              1, 3)
                   END AS probe
            FROM documents)
        SELECT doc_id,
               {checks}
        FROM p
    """


def _sparse_events(spark, sf_dir):
    """Deterministic sparse-vector column for the densify/top-by-value
    family: map{event_id % 97 -> value}."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.create_map((F.col("event_id") % 97).cast("long"),
                     F.col("value")).alias("sv"),
    )


def q_densify(spark, sf_dir):
    """DensifiedVector: observed sparse indices -> contiguous remap,
    output exploded as (event_id, new_idx, val)."""
    from dagli_spark.operators.vector_select import fit_densify

    sp = _sparse_events(spark, sf_dir)
    m = fit_densify(sp, "sv")
    out = m.apply(sp, out="dv")
    return out.select(
        "event_id", F.explode("dv").alias("new_idx", "val")
    ).select("event_id", "new_idx", F.round("val", 2).alias("val"))


def q_top_by_value(spark, sf_dir):
    """TopVectorElementsByValue: top-10 sparse indices by summed value."""
    from dagli_spark.operators.vector_select import fit_top_by_value

    sp = _sparse_events(spark, sf_dir)
    m = fit_top_by_value(sp, "sv", 10)
    return m.keep.select(F.col("idx").cast("long").alias("idx"))


def q_top_by_pmi(spark, sf_dir):
    """TopVectorElementsByPMI: top-10 sparse indices by pointwise mutual
    information with a binary label (value > 100)."""
    from dagli_spark.operators.vector_select import fit_top_by_pmi

    sp = _t(spark, sf_dir, "events").select(
        "event_id",
        F.create_map((F.col("event_id") % 97).cast("long"),
                     F.col("value")).alias("sv"),
        (F.col("value") > 100).cast("int").alias("y"),
    )
    m = fit_top_by_pmi(sp, "sv", "y", 10)
    return m.keep.select(F.col("idx").cast("long").alias("idx"))


def q_bucket_index(spark, sf_dir):
    """BucketIndex: equi-depth DP boundaries over floor(value), applied to
    every row (DP objective is not SQL-expressible -> rows-only check)."""
    from dagli_spark.operators.fit import fit_bucket_index

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_int", F.floor("value").cast("int"))
    m = fit_bucket_index(ev, "value_int", 8)
    return m.apply(ev, out="bucket").select("event_id", "bucket")


def q_multinomial_eval(spark, sf_dir):
    """MultinomialEvaluation: weighted confusion cells of event_type vs a
    derived prediction."""
    from dagli_spark.operators.evaluation import multinomial_evaluation

    ev = _t(spark, sf_dir, "events").withColumn(
        "pred",
        F.when(F.col("value") > 100, F.lit("purchase"))
         .otherwise(F.col("event_type")),
    )
    res = multinomial_evaluation(ev, "event_type", "pred")
    rows = sorted(
        ((t, p, float(w)) for (t, p), w in res["confusion"].items())
    )
    return spark.createDataFrame(rows, "truth string, pred string, w double")


def q_topk_eval(spark, sf_dir):
    """TopKEvaluation: hit@3 / MRR@3 of the true label among the 10 first
    embedding components ranked descending."""
    from dagli_spark.operators.evaluation import topk_evaluation

    e = _t(spark, sf_dir, "embeddings")
    pairs = F.array(*[
        F.struct((-F.element_at("embedding", i + 1).cast("double")).alias("nd"),
                 F.lit(i).alias("i"))
        for i in range(10)
    ])
    ranked = F.transform(F.array_sort(pairs), lambda s: s["i"])
    res = topk_evaluation(e.withColumn("ranked", ranked), "label", "ranked", 3)
    return spark.createDataFrame(
        [(res["count"], round(res["hit@3"], 6), round(res["mrr@3"], 6))],
        "n long, hit3 double, mrr3 double",
    )


def q_word_ngrams(spark, sf_dir):
    """NgramVector's shingle primitive: word 3-grams, exploded."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(T.word_ngrams("text", 3)).alias("ngram"))


def q_char_ngrams(spark, sf_dir):
    """CharacterNgramVector's primitive: char 3-grams, exploded."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(T.char_ngrams("text", 3)).alias("ngram"))


def q_indices(spark, sf_dir):
    """Indices: the Index dictionary fitted over exploded token lists,
    applied back element-wise (order preserved)."""
    from dagli_spark.operators.fit import fit_indices

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.tokens("text").alias("toks"))
    m = fit_indices(d, "toks")
    out = m.apply(d, out="ids")
    # exploded scalar rows (doc_id, pos, id): array-free output so the
    # driver's value-hash is format-independent across engines
    return out.select(
        "doc_id", F.posexplode(F.col("ids").cast("array<long>"))
        .alias("pos", "id"))


def q_hamming(spark, sf_dir):
    """Hamming distance between two derived 64-bit codes (the phash-distance
    primitive, JVM bit_count — images/phash.py at scale)."""
    from dagli_spark.operators.dedup import hamming64

    ev = _t(spark, sf_dir, "events")
    a = (F.col("user_id") * F.lit(2654435761)).cast("long")
    b = (F.col("event_id") * F.lit(40503)).cast("long")
    return ev.select(
        "event_id", hamming64(a, b).cast("int").alias("hamming"))


# sf tier -> deterministic north-rule fixture tier (FIXTURES.md): the
# flagship's driver row scales with the driver's correctness scale
_NR_TIERS = {"sf0.001": "smoke", "sf0.01": "correctness", "sf0.1": "bench"}


def northrule_tier(sf_dir: str) -> str:
    return _NR_TIERS.get(os.path.basename(sf_dir.rstrip("/")), "smoke")


def q_northrule(spark, sf_dir):
    """The flagship image+caption feature pipeline over the deterministic
    north-rule fixture at the tier matching ``sf_dir`` (generated+cached
    under /tmp; sf0.01 -> the 10k-image/60k-event 'correctness' tier).

    Output shape per the repo oracle convention: the 13-dim
    ``feature_vector`` is posexploded to scalar (pos, value) rows with
    values rounded to 4dp — every feature, including the six decoded
    pixel stats, is oracle-checked (the fixture stores the single-image
    oracle stats; the pipeline recomputes them from ``bytes`` through the
    batched Arrow kernel)."""
    from dagli_spark.fixtures import materialize
    from dagli_spark.northrule import run as northrule_run

    paths = materialize(spark, northrule_tier(sf_dir))
    out = northrule_run(spark, paths)
    vec = F.transform(F.col("feature_vector"), lambda v: F.round(v, 4))
    return out.select(
        "entity_id", "asof_time", "qseq",
        F.posexplode(vec).alias("pos", "value"))


def q_vector_accessors(spark, sf_dir):
    """MaxNonZeroVectorElementIndex + DenseVectorCapacity over the derived
    sparse/dense vector columns (SURVEY §2.10 accessors)."""
    from dagli_spark.functions.vector import dense_capacity, max_nonzero_index

    sp = _t(spark, sf_dir, "events").select(
        "event_id",
        F.create_map((F.col("event_id") % 97).cast("long"),
                     F.col("value")).alias("sv"),
        F.array_repeat(F.col("value"), (F.col("event_id") % 5).cast("int"))
         .alias("dv"),
    )
    return sp.select(
        "event_id",
        max_nonzero_index("sv").alias("max_nz"),
        max_nonzero_index("sv", on_zero=-1).alias("max_nz0"),
        dense_capacity("dv").alias("capacity"),
    )


def q_dist_vector_bridge(spark, sf_dir):
    """DenseVectorFromDistribution: distribution -> probability vector over
    a known label order, exploded to scalar rows (§2.11 bridge)."""
    ev = _t(spark, sf_dir, "events")
    dist = F.map_from_arrays(
        F.array(F.lit("low"), F.lit("high")),
        F.array(F.col("value") / 200.0, 1.0 - F.col("value") / 200.0),
    )
    d = ev.withColumn("dist", dist)
    vec = D.dense_vector_from_distribution("dist", ["high", "low", "absent"])
    return d.select(
        "event_id", F.posexplode(F.transform(vec, lambda p: F.round(p, 6)))
        .alias("pos", "p"))


def q_dist_sample(spark, sf_dir):
    """SampledWithReplacement: inverse-CDF draw from the per-row
    distribution {low: v/200, high: 1-v/200} with the portable-hash
    uniform, so the oracle reproduces every draw exactly (§2.11)."""
    ev = _t(spark, sf_dir, "events")
    dist = F.map_from_arrays(
        F.array(F.lit("low"), F.lit("high")),
        F.array(F.col("value") / 200.0, 1.0 - F.col("value") / 200.0),
    )
    d = ev.withColumn("dist", dist)
    return d.select(
        "event_id",
        D.sampled_with_replacement("dist", F.col("event_id"), seed=5,
                                   method="lcg").alias("draw"),
    )


def q_text_normalize(spark, sf_dir):
    """Accentless (Latin translate fast path) + NormalizedUnicode (NFC,
    Arrow UDF) + ReplacedSubstrings + ContainsPhoneNumber over documents
    (§2.9 scalar text family)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.accentless(F.col("text")).alias("latin_folded"),
        F.length(T.normalized_unicode("text", "NFC")).alias("nfc_len"),
        T.replaced_substrings(
            F.col("text"), {"the": "THE", "and": "AND"}).alias("subst"),
        T.contains_phone("text").alias("has_phone"),
    )


def q_many_hot(spark, sf_dir):
    """ManyHotVector: indices array -> {idx: 1.0} sparse map, exploded to
    scalar rows (§2.10)."""
    from dagli_spark.functions.vector import many_hot

    ev = _t(spark, sf_dir, "events")
    idxs = F.array_distinct(F.array(
        (F.col("event_id") % 7).cast("long"),
        (F.col("event_id") % 11).cast("long")))
    return ev.select(
        "event_id", F.explode(many_hot(idxs)).alias("idx", "hot"))


def q_grouped_multiplicity(spark, sf_dir):
    """PreparedByGroup(Multiplicity): count of this row's value-bucket
    within its event_type group (known group + unseen value -> 0 is pinned
    by the golden test; here every value is seen)."""
    from dagli_spark.operators.meta import fit_multiplicity_by_group

    ev = _t(spark, sf_dir, "events").withColumn(
        "vb", F.floor(F.col("value") / 50).cast("int"))
    m = fit_multiplicity_by_group(ev, "event_type", "vb")
    return m.apply(ev, out="gm").select("event_id", "gm")


def q_null_filtered_normalized(spark, sf_dir):
    """NullFiltered(NormalizedDouble): fit min/max on non-null rows only;
    apply nulls out rows whose input is null (one result per row)."""
    from dagli_spark.operators.fit import fit_normalized, null_filtered_fit

    ev = _t(spark, sf_dir, "events").withColumn(
        "v_opt",
        F.when(F.col("event_id") % 10 != 0, F.col("value")))
    m = null_filtered_fit(ev, ["v_opt"],
                          lambda clean: fit_normalized(clean, "v_opt"))
    out = m.apply(ev, out="vn")
    return out.select(
        "event_id",
        F.when(F.col("v_opt").isNotNull(),
               F.round("vn", 6)).alias("vn"))


def q_ngram_padding(spark, sf_dir):
    """NgramVector padding semantics (none/single/full sentinel modes,
    sizes 1..3): the combined n-gram counts pin the reference's padded
    window arithmetic (NGramVectorTest.java golden counts)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.tokens("text").alias("toks"))
    return d.select(
        "doc_id",
        F.size(T.ngram_vector("toks", min_size=1, max_size=3,
                              padding="none")).alias("n_none"),
        F.size(T.ngram_vector("toks", min_size=1, max_size=3,
                              padding="single")).alias("n_single"),
        F.size(T.ngram_vector("toks", min_size=1, max_size=3,
                              padding="full")).alias("n_full"),
    )


def q_ranking_eval(spark, sf_dir):
    """RankingEvaluationResult: full ranking-evaluation struct (correct /
    incorrect / no-prediction counts, accuracy, MRR@3) where the ranked
    list is the top-10 embedding component indices (empty every 7th row to
    exercise the no-prediction branch)."""
    from dagli_spark.operators.evaluation import ranking_evaluation

    e = _t(spark, sf_dir, "embeddings")
    pairs = F.array(*[
        F.struct((-F.element_at("embedding", i + 1).cast("double")).alias("nd"),
                 F.lit(i).alias("i"))
        for i in range(10)
    ])
    ranked = F.when(
        F.col("vec_id") % 7 != 0,
        F.transform(F.array_sort(pairs), lambda s: s["i"]),
    ).otherwise(F.array().cast("array<int>"))
    res = ranking_evaluation(
        e.withColumn("ranked", ranked), "label", "ranked", 3)
    return spark.createDataFrame(
        [(res["total_count"], res["correct_count"], res["incorrect_count"],
          res["no_prediction_count"],
          round(res["unweighted_accuracy"], 6),
          round(res["unweighted_mrr"], 6))],
        "total_n long, n_correct long, n_incorrect long, n_nopred long, "
        "acc double, mrr double",
    )


def q_tokens_locale(spark, sf_dir):
    """Locale-aware rule-based tokenizer (the reference Tokens.java parity
    path; JFlex-grammar rules as a cached compiled alternation). The rule
    regex needs lookahead, which DuckDB's RE2 lacks -> rows-only; the
    Python-side oracle is pinned in tests/test_tokens_locale.py."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(T.tokens_locale("text", "en")).alias("pos", "token"))


def q_tokens_ascii(spark, sf_dir):
    """The rule-engine tokenizer under its GENERIC locale (the reference's
    JFlexTokenizer default-lexer path, JFlexTokenizer.java:30-37) over
    printable-ASCII documents: the shared JFlex macro rules contain no
    lookahead, so the SAME alternation replays verbatim in DuckDB RE2 —
    the driver-checkable face of the tokens_locale family (the EN/DE
    clitic rules need lookahead and stay Python-oracle-pinned)."""
    # engine-neutral ASCII filter: an UNANCHORED negative class ("contains
    # any non-printable-ASCII char") means the same thing in java.util.regex
    # and RE2 — '$' does not (Java matches before a final \n, RE2 does not),
    # so an anchored '^[ -~]*$' would diverge on text ending in a newline
    d = _t(spark, sf_dir, "documents").where(~F.col("text").rlike("[^ -~]"))
    return d.select(
        "doc_id",
        F.posexplode(T.tokens_locale("text", "xx")).alias("pos", "token"))


def _tokens_ascii_oracle() -> str:
    from dagli_spark.functions.text import locale_pattern_source

    pat = locale_pattern_source("xx").replace("'", "''")
    return f"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '{pat}', 0, 'i') AS toks
                   FROM documents
                   WHERE NOT regexp_matches(text, '[^ -~]'))
        SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
               unnest(toks) AS token
        FROM t
    """


def q_tokens_en_core(spark, sf_dir):
    """The ENGLISH locale tokenizer (the reference's JFlexEnglishLexer
    path, contraction/abbrev rules loaded) over the document subset where
    its lookahead-dependent rules cannot fire: printable ASCII, no
    apostrophe/backtick, no abbrev-word+period substring
    (text.EN_CORE_EXCLUDE_RES — each filter regex means the same thing in
    java.util.regex and RE2). On that subset the EN output replays
    verbatim in DuckDB as the lookahead-free EN-core alternation
    (text.locale_pattern_source_en_core — fuzz-pinned equivalent), moving
    the EN path from Python-oracle-only into driver-oracle territory;
    the full clitic/abbrev behavior stays pinned by
    tests/test_tokens_locale.py."""
    from dagli_spark.functions.text import EN_CORE_EXCLUDE_RES

    d = _t(spark, sf_dir, "documents")
    for r in EN_CORE_EXCLUDE_RES:
        d = d.where(~F.col("text").rlike(r))
    return d.select(
        "doc_id",
        F.posexplode(T.tokens_locale("text", "en")).alias("pos", "token"))


def _tokens_en_core_oracle() -> str:
    from dagli_spark.functions.text import (
        EN_CORE_EXCLUDE_RES,
        locale_pattern_source_en_core,
    )

    pat = locale_pattern_source_en_core().replace("'", "''")
    conds = " AND ".join(
        f"NOT regexp_matches(text, '{r.replace(chr(39), chr(39) * 2)}')"
        for r in EN_CORE_EXCLUDE_RES)
    return f"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '{pat}', 0, 'i') AS toks
                   FROM documents
                   WHERE {conds})
        SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
               unnest(toks) AS token
        FROM t
    """


def q_tokens_de_core(spark, sf_dir):
    """The GERMAN locale tokenizer (the reference's JFlexGermanLexer
    path, GermanAbbrev + genitive clitic loaded) over the document subset
    where BOTH its lookahead rules cannot fire (no apostrophe, no
    GermanAbbrev+period substring — text.DE_CORE_EXCLUDE_RES): there the
    DE output equals the lookahead-free GENERIC alternation verbatim
    (fuzz-pinned in tests/test_tokens_locale.py), so the DE path joins EN
    (tokens_en_core) and the generic lexer (tokens_ascii) in driver-
    oracle territory; the full clitic/abbrev behavior stays pinned by
    the Python-oracle goldens."""
    from dagli_spark.functions.text import DE_CORE_EXCLUDE_RES

    d = _t(spark, sf_dir, "documents")
    for r in DE_CORE_EXCLUDE_RES:
        d = d.where(~F.col("text").rlike(r))
    return d.select(
        "doc_id",
        F.posexplode(T.tokens_locale("text", "de")).alias("pos", "token"))


def _tokens_de_core_oracle() -> str:
    from dagli_spark.functions.text import (
        DE_CORE_EXCLUDE_RES,
        locale_pattern_source,
    )

    pat = locale_pattern_source("xx").replace("'", "''")
    conds = " AND ".join(
        f"NOT regexp_matches(text, '{r.replace(chr(39), chr(39) * 2)}')"
        for r in DE_CORE_EXCLUDE_RES)
    return f"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '{pat}', 0, 'i') AS toks
                   FROM documents
                   WHERE {conds})
        SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
               unnest(toks) AS token
        FROM t
    """


def q_audio_features(spark, sf_dir):
    """Multimodal audio through the REAL RIFF/WAVE PCM decoder
    (features/multimodal._decode_wav, stdlib wave — round 5): a
    doc_id-derived probe builds constant-amplitude WAV payloads (plus a
    FAKA-container branch and a truncated-WAV corrupt branch) in an
    Arrow-batched UDF, decodes them through with_audio_features, and the
    oracle computes every feature ANALYTICALLY — a constant signal's rms
    and peak are exactly c/32768 (dyadic, bit-exact through numpy's
    sum/mean/sqrt), duration is one IEEE division both engines round
    identically, zero-crossing rate is exactly 0. Corrupt rows must
    degrade to nulls, never fail the stage."""
    from dagli_spark.features.multimodal import (
        encode_fake_audio,
        with_audio_features,
    )

    @F.pandas_udf("binary")
    def wav_probe(doc_id: pd.Series) -> pd.Series:
        import io
        import wave

        import numpy as np

        out = []
        for i in doc_id:
            i = int(i)
            n = 1024 + 32 * (i % 8)
            c = 256 * (1 + i % 64)
            m7 = i % 7
            if m7 == 5:
                out.append(encode_fake_audio(
                    np.full(n, c, np.int16), 8000))
                continue
            buf = io.BytesIO()
            w = wave.open(buf, "wb")
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.full(n, c, dtype="<i2").tobytes())
            w.close()
            b = buf.getvalue()
            out.append(b[:37] if m7 == 3 else b)
        return pd.Series(out)

    d = _t(spark, sf_dir, "documents").select("doc_id")
    out = with_audio_features(d.withColumn("audio_bytes",
                                           wav_probe("doc_id")))
    return out.select(
        "doc_id",
        F.round("au_duration_s", 9).alias("au_duration_s"),
        "au_sample_rate",
        F.round("au_rms", 9).alias("au_rms"),
        F.round("au_zero_cross_rate", 9).alias("au_zero_cross_rate"),
        F.round("au_peak", 9).alias("au_peak"),
    )


def _audio_features_oracle() -> str:
    # analytic expectations; m7=3 is the truncated-WAV corrupt branch
    return """
        WITH p AS (SELECT doc_id,
                          1024 + 32 * (doc_id % 8) AS n,
                          256 * (1 + doc_id % 64) AS c,
                          doc_id % 7 AS m7
                   FROM documents)
        SELECT doc_id,
               CASE WHEN m7 = 3 THEN NULL
                    ELSE round(n / CAST(8000 AS DOUBLE), 9) END AS au_duration_s,
               CASE WHEN m7 = 3 THEN NULL
                    ELSE CAST(8000 AS INTEGER) END AS au_sample_rate,
               CASE WHEN m7 = 3 THEN NULL
                    ELSE round(c / CAST(32768 AS DOUBLE), 9) END AS au_rms,
               CASE WHEN m7 = 3 THEN NULL
                    ELSE CAST(0.0 AS DOUBLE) END AS au_zero_cross_rate,
               CASE WHEN m7 = 3 THEN NULL
                    ELSE round(c / CAST(32768 AS DOUBLE), 9) END AS au_peak
        FROM p
    """


def q_audio_g711(spark, sf_dir):
    """Multimodal audio through the REAL G.711 mu-law/A-law WAV decoder
    (features/multimodal._decode_wav_companded, stdlib audioop over a
    manual RIFF chunk walk — round-5 second session): a doc_id-derived
    probe companding-encodes constant-amplitude signals as format-tag-7
    (mu-law) and tag-6 (A-law) WAV, plus a truncated corrupt branch. The
    oracle inlines the 64 relevant companding round-trip constants
    c' = expand(compress(c)) as a literal table (same convention as the
    fitted-literal oracles: deterministic spec-derived state, pinned at
    build time) — a constant decoded signal's rms and peak are exactly
    |c'|/32768 (dyadic, bit-exact through numpy), zcr exactly 0."""
    from dagli_spark.features.multimodal import with_audio_features

    @F.pandas_udf("binary")
    def g711_probe(doc_id: pd.Series) -> pd.Series:
        import struct
        import warnings

        import numpy as np

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop

        def riff(payload: bytes, sr: int, tag: int) -> bytes:
            fmt = struct.pack("<HHIIHH", tag, 1, sr, sr, 1, 8)
            body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(payload)) + payload
                    + (b"\x00" if len(payload) & 1 else b""))
            return b"RIFF" + struct.pack("<I", len(body)) + body

        out = []
        for i in doc_id:
            i = int(i)
            n = 800 + 16 * (i % 8)
            c = 256 * (1 + i % 64)
            m5 = i % 5
            tag = 6 if m5 == 2 else 7
            compress = audioop.lin2alaw if tag == 6 else audioop.lin2ulaw
            payload = compress(np.full(n, c, dtype="<i2").tobytes(), 2)
            b = riff(payload, 8000, tag)
            out.append(b[:37] if m5 == 3 else b)
        return pd.Series(out)

    d = _t(spark, sf_dir, "documents").select("doc_id")
    out = with_audio_features(d.withColumn("audio_bytes",
                                           g711_probe("doc_id")))
    return out.select(
        "doc_id",
        F.round("au_duration_s", 9).alias("au_duration_s"),
        "au_sample_rate",
        F.round("au_rms", 9).alias("au_rms"),
        F.round("au_zero_cross_rate", 9).alias("au_zero_cross_rate"),
        F.round("au_peak", 9).alias("au_peak"),
    )


def _audio_g711_oracle() -> str:
    # literal companding round-trip table: c' = expand(compress(c)) for
    # the 64 probe amplitudes, both laws — spec-derived constants, the
    # same pin-at-build-time shape as the fitted-literal oracles
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    def rt(c: int, law: str) -> int:
        comp, exp = ((audioop.lin2ulaw, audioop.ulaw2lin) if law == "u"
                     else (audioop.lin2alaw, audioop.alaw2lin))
        raw = exp(comp(np.full(1, c, dtype="<i2").tobytes(), 2), 2)
        return int(np.frombuffer(raw, dtype="<i2")[0])

    vals = ", ".join(
        f"({r}, {rt(256 * (1 + r), 'u')}, {rt(256 * (1 + r), 'a')})"
        for r in range(64))
    return f"""
        WITH p AS (SELECT doc_id,
                          800 + 16 * (doc_id % 8) AS n,
                          doc_id % 64 AS r,
                          doc_id % 5 AS m5
                   FROM documents),
             j AS (SELECT p.*, CASE WHEN m5 = 2 THEN ca ELSE cu END AS cp
                   FROM p JOIN (VALUES {vals}) m(r, cu, ca) ON p.r = m.r)
        SELECT doc_id,
               CASE WHEN m5 = 3 THEN NULL
                    ELSE round(n / CAST(8000 AS DOUBLE), 9) END AS au_duration_s,
               CASE WHEN m5 = 3 THEN NULL
                    ELSE CAST(8000 AS INTEGER) END AS au_sample_rate,
               CASE WHEN m5 = 3 THEN NULL
                    ELSE round(cp / CAST(32768 AS DOUBLE), 9) END AS au_rms,
               CASE WHEN m5 = 3 THEN NULL
                    ELSE CAST(0.0 AS DOUBLE) END AS au_zero_cross_rate,
               CASE WHEN m5 = 3 THEN NULL
                    ELSE round(cp / CAST(32768 AS DOUBLE), 9) END AS au_peak
        FROM j
    """


def q_video_features(spark, sf_dir):
    """Multimodal video through BOTH supported containers: rows with
    doc_id % 3 == 1 encode as REAL YUV4MPEG2 (features/multimodal
    ._parse_y4m — pure-numpy demux of the public raw-video interchange
    format, round-5 second session) and the rest as the FAKV test
    container; identical luma frames must feature identically, so ONE
    analytic oracle covers both demux paths. Alternating constant frames
    make mean brightness a two-term integer ratio and motion energy
    exactly |200 - v|. Includes a zero-frame branch (counts 0, stats
    NULL) and a truncated-header corrupt branch (all NULL)."""
    from dagli_spark.features.multimodal import (
        encode_fake_video,
        encode_y4m,
        with_video_features,
    )

    @F.pandas_udf("binary")
    def video_probe(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for i in doc_id:
            i = int(i)
            m9 = i % 9
            if m9 == 4:
                out.append(b"FAKV\x00")  # truncated header
                continue
            if m9 == 7:
                out.append(encode_fake_video(np.zeros((0, 8, 8), np.uint8)))
                continue
            nf = 2 + i % 5
            ve = 16 * (1 + i % 12)
            frames = np.stack([
                np.full((8, 8), ve if k % 2 == 0 else 200, np.uint8)
                for k in range(nf)])
            out.append(encode_y4m(frames) if i % 3 == 1
                       else encode_fake_video(frames))
        return pd.Series(out)

    d = _t(spark, sf_dir, "documents").select("doc_id")
    out = with_video_features(d.withColumn("video_bytes",
                                           video_probe("doc_id")))
    return out.select(
        "doc_id", "vi_n_frames", "vi_sampled_frames",
        F.round("vi_mean_brightness", 9).alias("vi_mean_brightness"),
        F.round("vi_motion_energy", 9).alias("vi_motion_energy"),
    )


def _video_features_oracle() -> str:
    # m9=4 truncated header -> all NULL; m9=7 zero frames -> counts 0,
    # stats NULL; else ceil(nf/2) frames at ve and floor(nf/2) at 200
    return """
        WITH p AS (SELECT doc_id,
                          2 + doc_id % 5 AS nf,
                          16 * (1 + doc_id % 12) AS ve,
                          doc_id % 9 AS m9
                   FROM documents)
        SELECT doc_id,
               CASE WHEN m9 = 4 THEN NULL WHEN m9 = 7 THEN 0
                    ELSE CAST(nf AS INTEGER) END AS vi_n_frames,
               CASE WHEN m9 = 4 THEN NULL WHEN m9 = 7 THEN 0
                    ELSE CAST(nf AS INTEGER) END AS vi_sampled_frames,
               CASE WHEN m9 = 4 OR m9 = 7 THEN NULL
                    ELSE round(((nf + 1) // 2 * ve + nf // 2 * 200)
                               / CAST(nf AS DOUBLE), 9)
               END AS vi_mean_brightness,
               CASE WHEN m9 = 4 OR m9 = 7 THEN NULL
                    ELSE round(CAST(abs(200 - ve) AS DOUBLE), 9)
               END AS vi_motion_energy
        FROM p
    """


def q_northrule_temporal(spark, sf_dir):
    """The flagship pipeline's TEMPORAL feature subset (sessionize + lag +
    rolling + strict as-of), oracle-checkable over the standard events table
    — same composition as ``entry``/northrule.run minus the pixel stage
    (which stays PSNR-pinned in tests/test_northrule.py). Gives the north
    rule a driver-visible correctness row."""
    ev = _t(spark, sf_dir, "events")
    w = wf.spec("user_id", ["ts", "event_id"])
    feats = wf.sessionize(ev, "ts", F.expr("INTERVAL 30 MINUTES"), w)
    feats = wf.with_lag(feats, "value", 1, w, alias="value_lag1")
    feats = wf.rolling(
        feats, {"value_avg5": F.avg("value"), "cnt5": F.count("value")},
        w, rows=(-4, 0),
    )
    events_side = feats.select(
        "user_id", "ts",
        F.col("value").alias("ev_value"),
        F.col("event_id").alias("ev_id"),
        "session_id", "value_lag1", "value_avg5", "cnt5",
    )
    out = asof_join(
        _purchase_queries(ev), events_side, on="user_id",
        left_time="asof_time", right_time="ts",
        values=["ev_value", "ev_id", "session_id", "value_lag1",
                "value_avg5", "cnt5"],
        tiebreak="ev_id", strict=True,
    )
    return out.select(
        "user_id", "asof_time", "qid",
        F.round("ev_value", 2).alias("ev_value"), "ev_id", "session_id",
        F.round("value_lag1", 2).alias("value_lag1"),
        F.round("value_avg5", 4).alias("value_avg5"), "cnt5",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering matters: the driver's correctness gate samples the FIRST 50
    # entries.  Round-5 rotation (VERDICT r04 task #5, oldest-evidence
    # first): (a) flagships + everything touched this round (phone_intl2 /
    # phone_intl4 / tokens_en_core are new; phone_plan/phone_intl ride the
    # plan-table change; top_by_value/top_by_pmi/densify ride the KeepSet
    # distinct/column-order fix; simhash_portable rides the packed-lane
    # aggregate rewrite; tokens_ascii + phone_intl keep their slot for a
    # second consecutive row); (b) the 19 veterans whose newest driver
    # evidence is r03 rotate back in; (c) family anchors; (d) r04-checked
    # rows fill to 50.  EVERY in-window entry has a SQL oracle — the
    # rows-only trio (minhash_pairs/simhash_pairs: xxhash64 family;
    # tokens_locale: lookahead rules) sits past position 50,
    # replica-pinned like all rotated-out greens
    # (tests/test_oracle_parity.py).
    return {
        # -- (a) flagships + touched this round ---------------------------
        "northrule_features": q_northrule,
        "northrule_temporal": q_northrule_temporal,
        "phone_intl2": q_phone_intl2,
        "phone_intl3": q_phone_intl3,
        "phone_intl4": q_phone_intl4,
        "tokens_en_core": q_tokens_en_core,
        "audio_features": q_audio_features,
        "audio_g711": q_audio_g711,
        "video_features": q_video_features,
        "tokens_ascii": q_tokens_ascii,
        "tokens_de_core": q_tokens_de_core,
        "phone_intl": q_phone_intl,
        "phone_plan": q_phone_plan,
        "top_by_value": q_top_by_value,
        "top_by_pmi": q_top_by_pmi,
        "densify": q_densify,
        "simhash_portable": q_simhash_portable,
        # -- (b) veterans with r03-old evidence rotated back in ------------
        "pricing_summary": q_pricing_summary,
        "top_orders_per_cust": q_top_orders_per_cust,
        "region_revenue": q_region_revenue,
        "asof_tolerance": q_asof_tolerance,
        "lag_lead": q_lag_lead,
        "forward_fill": q_forward_fill,
        "sessionize": q_sessionize,
        "rolling_rows": q_rolling_rows,
        "index_dict": q_index_dict,
        "index_applied": q_index_applied,
        "kfold": q_kfold,
        "text_stats": q_text_stats,
        "exact_dedup": q_exact_dedup,
        "jaccard_dedup": q_jaccard_dedup,
        "embedding_dedup": q_embedding_dedup,
        "top_tokens": q_top_tokens,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_lsh": q_knn_lsh,
        "binary_auc": q_binary_auc,
        "normalized": q_normalized,
        "nearest_centroid": q_nearest_centroid,
        # -- (c) family anchors --------------------------------------------
        "asof_strict": q_asof_strict,
        "asof_bucketed": q_asof_bucketed,
        "kmeans": q_kmeans,
        "knn_ivf": q_knn_ivf,
        "kfold_target_encode": q_kfold_target_encode,
        "rank_population": q_rank_population,
        "isotonic": q_isotonic,
        "minhash_portable": q_minhash_portable,
        # -- (d) r04-checked rows to fill the window to 50 ------------------
        "bucket_index": q_bucket_index,
        "indices": q_indices,
        "hamming": q_hamming,
        "word_ngrams": q_word_ngrams,
        "char_ngrams": q_char_ngrams,
        "ngram_padding": q_ngram_padding,
        "text_normalize": q_text_normalize,
        "many_hot": q_many_hot,
        "grouped_multiplicity": q_grouped_multiplicity,
        # ---- past position 50: replica-checked every run -----------------
        # (ranking_eval/multinomial_eval/null_filtered_normalized rotated
        # out by the round-5 multimodal + tokens_de_core rows — all
        # r04-green, replica-pinned)
        "null_filtered_normalized": q_null_filtered_normalized,
        "ranking_eval": q_ranking_eval,
        "multinomial_eval": q_multinomial_eval,
        "topk_eval": q_topk_eval,
        "vector_accessors": q_vector_accessors,
        "dist_vector_bridge": q_dist_vector_bridge,
        "dist_sample": q_dist_sample,
        "rolling_range": q_rolling_range,
        "session_stats": q_session_stats,
        "example_index": q_example_index,
        "multiplicity": q_multiplicity,
        "multiset": q_multiset,
        "order_statistic": q_order_statistic,
        "bucket_ntile": q_bucket_ntile,
        "token_count_bpe": q_token_count_bpe,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "rank_limited": q_rank_limited,
        "dict_value": q_dict_value,
        "dist_argmax": q_dist_argmax,
        "stratified_sample": q_stratified_sample,
        "grouped_mean": q_grouped_mean,
        "avg_embedding": q_avg_embedding,
        "text_ops": q_text_ops,
        "centroid_norm": q_centroid_norm,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "tokens_locale": q_tokens_locale,
    }


_EVENT_WINDOW = "PARTITION BY user_id ORDER BY ts, event_id"


# ---- fitted-literal oracles (bucket_index / kmeans / isotonic) ----------
# Only the FIT of these is non-SQL-expressible; the APPLY is plain SQL over
# the fitted state, so we inline the state (fitted once at sf0.01 — the
# driver's correctness scale — by tools/gen_oracle_literals.py; stability
# across session configs pinned by tests/test_oracle_literals.py) and let
# DuckDB check the apply independently.

def _bucket_oracle() -> str:
    from dagli_spark.oracle_literals import BUCKET_BOUNDS

    cases = " ".join(
        f"WHEN value_int <= {b} THEN {i}" for i, b in enumerate(BUCKET_BOUNDS)
    )
    return f"""
        SELECT event_id,
               CASE {cases} ELSE {len(BUCKET_BOUNDS)} END AS bucket
        FROM (SELECT event_id, CAST(floor(value) AS INT) AS value_int
              FROM events)
    """


def _kmeans_oracle() -> str:
    from dagli_spark.oracle_literals import KMEANS_CENTERS

    return f"""
        WITH d AS (SELECT {", ".join(_dist_exprs(KMEANS_CENTERS))}
                   FROM embeddings)
        SELECT {_argmin_case(len(KMEANS_CENTERS))} AS cluster, count(*) AS n
        FROM d GROUP BY cluster
    """


def _dist_exprs(centers, emb_expr: str = "embedding") -> list[str]:
    """Squared-L2 distance SQL expressions to each literal center."""
    dim = len(centers[0])
    out = []
    for ci, c in enumerate(centers):
        lit = "[" + ", ".join(repr(x) for x in c) + "]"
        out.append(
            f"list_sum(list_transform(range(1, {dim + 1}), i -> "
            f"(CAST({emb_expr}[i] AS DOUBLE) - ({lit})[i])"
            f" * (CAST({emb_expr}[i] AS DOUBLE) - ({lit})[i]))) AS d{ci}"
        )
    return out


def _argmin_case(k: int) -> str:
    """argmin over d0..d{k-1} with ties to the lower index (np.argmin)."""
    return "CASE " + " ".join(
        "WHEN " + " AND ".join(f"d{i} <= d{j}" for j in range(i + 1, k))
        + f" THEN {i}" for i in range(k - 1)
    ) + f" ELSE {k - 1} END"


def _knn_ivf_oracle() -> str:
    """Fitted-literal IVF oracle: quantizer centers inlined (only the
    k-means FIT is non-SQL); corpus assignment, stable top-n_probe probe
    routing, candidate join, exact cosine and window top-k are all plain
    SQL."""
    from dagli_spark.oracle_literals import IVF_CENTERS

    k = len(IVF_CENTERS)
    structs = ", ".join(
        f"struct_pack(d := d{i}, c := {i})" for i in range(k))
    return f"""
        WITH cd AS (SELECT vec_id, embedding, {", ".join(_dist_exprs(IVF_CENTERS))}
                    FROM embeddings),
             a AS (SELECT vec_id, embedding, {_argmin_case(k)} AS c FROM cd),
             pr AS (SELECT vec_id AS query_id, embedding AS qv,
                           unnest(list_transform(
                               (list_sort([{structs}]))[1:3], s -> s.c)) AS c
                    FROM cd WHERE vec_id < 10),
             cand AS (SELECT pr.query_id, pr.qv,
                             a.vec_id AS neighbor_id, a.embedding AS nv
                      FROM pr JOIN a USING (c)
                      WHERE a.vec_id <> pr.query_id),
             scored AS (SELECT query_id, neighbor_id,
                               list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                   CAST(nv AS DOUBLE[])) AS cos
                        FROM cand),
             ranked AS (SELECT query_id, neighbor_id, cos,
                               row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id ASC) AS rank
                        FROM scored)
        SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
        FROM ranked WHERE rank <= 3
    """


def _text_normalize_oracle() -> str:
    """Accentless via the same translate tables; NFC via DuckDB's
    nfc_normalize; ReplacedSubstrings in the engine's sorted-key order;
    phone regex shared verbatim (constructs valid in both Java regex and
    RE2)."""
    from dagli_spark.functions.text import (_ACCENT_DST, _ACCENT_SRC,
                                            PHONE_VALID_RE)

    return f"""
        SELECT doc_id,
               translate(text, '{_ACCENT_SRC}', '{_ACCENT_DST}')
                 AS latin_folded,
               length(nfc_normalize(text)) AS nfc_len,
               replace(replace(text, 'and', 'AND'), 'the', 'THE') AS subst,
               regexp_matches(text, '{PHONE_VALID_RE}') AS has_phone
        FROM documents
    """


def _minhash_portable_oracle() -> str:
    """End-to-end SQL replay of the portable-hash MinHash+LSH pipeline
    (q_minhash_portable params: shingle=3, 16 hashes, 4 bands,
    threshold=0.5): 3-gram shingles, the 31-bit polynomial shingle hash,
    the splitmix-derived affine minhash family, folded band keys,
    candidate self-join, and exact-Jaccard verification."""
    from dagli_spark.operators.dedup import _POLY_M, poly_hash_params

    params = poly_hash_params(16, 7)
    mh_cols = ", ".join(
        f"min((hv * {a} + {b}) % {_POLY_M}) AS mh_{i}"
        for i, (a, b) in enumerate(params))
    band_keys = []
    for b in range(4):
        k = f"CAST({b + 1} AS BIGINT)"
        for i in range(b * 4, (b + 1) * 4):
            k = f"(({k}) * 31 + mh_{i} + 1) % {_POLY_M}"
        band_keys.append(f"SELECT doc_id, {k} AS band_key FROM sig")
    banded = " UNION ALL ".join(band_keys)
    return rf"""
        WITH t AS (SELECT doc_id,
                          list_filter(regexp_split_to_array(trim(text),
                              '\s+'), x -> x <> '') AS toks
                   FROM documents),
             g AS (SELECT doc_id,
                          list_distinct(list_transform(range(1, len(toks) - 1),
                              i -> array_to_string(toks[i:i+2], ' '))) AS sh
                   FROM t),
             e AS (SELECT doc_id, unnest(sh) AS s FROM g),
             h AS (SELECT doc_id,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                              list_transform(range(1, length(s) + 1),
                                  i -> CAST(unicode(s[i]) AS BIGINT))),
                              (acc, c) -> (acc * 31 + c) % {_POLY_M}) AS hv
                   FROM e),
             sig AS (SELECT doc_id, {mh_cols} FROM h GROUP BY doc_id),
             banded AS ({banded}),
             cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                      FROM banded a JOIN banded b USING (band_key)
                      WHERE a.doc_id < b.doc_id),
             v AS (SELECT cand.id_a, cand.id_b,
                          len(list_intersect(ga.sh, gb.sh))
                            / CAST(len(list_distinct(
                                  list_concat(ga.sh, gb.sh))) AS DOUBLE)
                            AS jaccard
                   FROM cand
                   JOIN g ga ON ga.doc_id = cand.id_a
                   JOIN g gb ON gb.doc_id = cand.id_b)
        SELECT id_a, id_b, round(jaccard, 4) AS jaccard
        FROM v WHERE jaccard >= 0.5
    """


def _jaccard_dedup_oracle() -> str:
    """jaccard_dedup is hash-free: whitespace tokens -> 3-gram shingle
    sets (same CTEs the green minhash_portable oracle uses) -> lang-blocked
    pair join -> |∩|/|∪| as a double division of the same integer sizes
    Spark divides -> round(4). q_jaccard_dedup params: n=3, threshold=0.8,
    block_col='lang'."""
    return r"""
        WITH t AS (SELECT doc_id, lang,
                          list_filter(regexp_split_to_array(trim(text),
                              '\s+'), x -> x <> '') AS toks
                   FROM documents),
             g AS (SELECT doc_id, lang,
                          list_distinct(list_transform(range(1, len(toks) - 1),
                              i -> array_to_string(toks[i:i+2], ' '))) AS sh
                   FROM t),
             gb AS (SELECT * FROM g WHERE len(sh) > 0),
             cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             len(list_intersect(a.sh, b.sh))
                               / CAST(len(list_distinct(
                                     list_concat(a.sh, b.sh))) AS DOUBLE)
                               AS j
                      FROM gb a JOIN gb b
                        ON a.doc_id < b.doc_id AND a.lang = b.lang)
        SELECT id_a, id_b, round(j, 4) AS jaccard
        FROM cand WHERE j >= 0.8
    """


def _embedding_dedup_oracle() -> str:
    """embedding_dedup is NOT hash-family-bound: the hyperplanes come from
    the pure splitmix generator (similarity._hyperplanes), so bucketing,
    candidate join and the exact-cosine threshold verify replay in SQL
    with the plane vectors inlined (q_embedding_dedup params: dim=64,
    num_planes=8, num_tables=4, seed=17, threshold=0.35)."""
    from dagli_spark.operators.similarity import _hyperplanes

    num_planes, num_tables, seed = 8, 4, 17
    sides = []
    for t in range(num_tables):
        planes = _hyperplanes(64, num_planes, seed + 101 * t)
        bits = []
        for p_i, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
            dot = (f"list_sum(list_transform(range(1, 65), i -> "
                   f"CAST(embedding[i] AS DOUBLE) * ({lit})[i]))")
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p_i} ELSE 0 END)")
        bucket = " + ".join(bits)
        sides.append(
            f"SELECT vec_id, embedding, "
            f"{t} * {1 << num_planes} + ({bucket}) AS tb FROM embeddings")
    keyed = " UNION ALL ".join(sides)
    return f"""
        WITH keyed AS ({keyed}),
             cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                             a.embedding AS va, b.embedding AS vb
                      FROM keyed a JOIN keyed b USING (tb)
                      WHERE a.vec_id < b.vec_id),
             scored AS (SELECT id_a, id_b,
                               list_cosine_similarity(CAST(va AS DOUBLE[]),
                                   CAST(vb AS DOUBLE[])) AS c
                        FROM cand)
        SELECT id_a, id_b, round(c, 4) AS cosine
        FROM scored WHERE c >= 0.35
    """


def _simhash_portable_oracle() -> str:
    """SQL replay of the portable 32-bit simhash pipeline
    (q_simhash_portable params: max_hamming=1, seed=11): token polynomial
    hash + two affine re-hashes -> 32 signed bit-sums per doc -> bit
    recombine -> 2x16-bit pigeonhole banding -> bit_count Hamming verify."""
    from dagli_spark.operators.dedup import _POLY_M, poly_hash_params

    (a1, b1), (a2, b2) = poly_hash_params(2, 11)
    max_hamming = 1
    blocks, width = max_hamming + 1, 32 // (max_hamming + 1)
    sums = ", ".join(
        f"sum(CASE WHEN (h32 >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(32))
    sim = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(32))
    banded = " UNION ALL ".join(
        f"SELECT doc_id, sim, {blk} * {1 << width}"
        f" + ((sim >> {blk * width}) & {(1 << width) - 1})"
        f" AS bk FROM sig" for blk in range(blocks))
    return rf"""
        WITH t AS (SELECT doc_id,
                          list_filter(regexp_split_to_array(trim(lower(text)),
                              '\s+'), x -> x <> '') AS toks
                   FROM documents),
             e AS (SELECT doc_id, unnest(toks) AS s FROM t),
             h AS (SELECT doc_id,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                              list_transform(range(1, length(s) + 1),
                                  i -> CAST(unicode(s[i]) AS BIGINT))),
                              (acc, c) -> (acc * 31 + c) % {_POLY_M}) AS hv
                   FROM e),
             hb AS (SELECT doc_id,
                           ((hv * {a1} + {b1}) % {_POLY_M})
                             | ((((hv * {a2} + {b2}) % {_POLY_M}) & 1) << 31)
                             AS h32
                    FROM h),
             sums AS (SELECT doc_id, {sums} FROM hb GROUP BY doc_id),
             sig AS (SELECT doc_id, {sim} AS sim FROM sums),
             banded AS ({banded}),
             cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                             a.sim AS sim_a, b.sim AS sim_b
                      FROM banded a JOIN banded b USING (bk)
                      WHERE a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 1
    """


def _knn_lsh_oracle() -> str:
    """knn_lsh is NOT hash-family-bound: its hyperplanes come from the
    pure splitmix generator (similarity._hyperplanes — plain arithmetic),
    so bucketing, candidate join and cosine top-k replay exactly in SQL
    with the plane vectors inlined (q_knn_lsh params: dim=64, k=3,
    num_planes=6, num_tables=4, seed=13)."""
    from dagli_spark.operators.similarity import _hyperplanes

    num_planes, num_tables, seed = 6, 4, 13
    sides = []
    for t in range(num_tables):
        planes = _hyperplanes(64, num_planes, seed + 101 * t)
        bits = []
        for p_i, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
            dot = (f"list_sum(list_transform(range(1, 65), i -> "
                   f"CAST(embedding[i] AS DOUBLE) * ({lit})[i]))")
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p_i} ELSE 0 END)")
        bucket = " + ".join(bits)
        sides.append(
            f"SELECT vec_id, embedding, "
            f"{t} * {1 << num_planes} + ({bucket}) AS tb FROM embeddings")
    keyed = " UNION ALL ".join(sides)
    return f"""
        WITH keyed AS ({keyed}),
             pk AS (SELECT * FROM keyed WHERE vec_id < 10),
             cand AS (SELECT DISTINCT pk.vec_id AS query_id,
                             k2.vec_id AS neighbor_id,
                             pk.embedding AS qv, k2.embedding AS nv
                      FROM pk JOIN keyed k2 USING (tb)
                      WHERE pk.vec_id <> k2.vec_id),
             scored AS (SELECT query_id, neighbor_id,
                               list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                   CAST(nv AS DOUBLE[])) AS cos
                        FROM cand),
             ranked AS (SELECT query_id, neighbor_id, cos,
                               row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id ASC) AS rank
                        FROM scored)
        SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
        FROM ranked WHERE rank <= 3
    """


def _lang_id_oracle() -> str:
    """lang_id is hash-free (stopword-hit argmax over whitespace tokens of
    the lowered text): fully SQL-expressible. Tie semantics mirror the
    engine's array_max over struct(hits, lang) — equal hit counts resolve
    to the lexicographically GREATEST language code."""
    from dagli_spark.functions.text import _LANG_STOPWORDS

    hits = ", ".join(
        "(" + " + ".join(
            f"CAST(list_contains(toks, '{w}') AS INT)" for w in ws
        ) + f") AS h_{lang}"
        for lang, ws in _LANG_STOPWORDS.items()
    )
    langs_desc = sorted(_LANG_STOPWORDS, reverse=True)
    best = "greatest(" + ", ".join(f"h_{la}" for la in _LANG_STOPWORDS) + ")"
    pick = " ".join(
        f"WHEN h_{la} = {best} THEN '{la}'" for la in langs_desc[:-1]
    )
    return rf"""
        WITH t AS (SELECT doc_id,
                          list_filter(regexp_split_to_array(trim(lower(text)),
                                      '\s+'), x -> x <> '') AS toks
                   FROM documents),
             h AS (SELECT doc_id, {hits} FROM t)
        SELECT doc_id,
               CASE WHEN {best} = 0 THEN 'und'
                    {pick}
                    ELSE '{langs_desc[-1]}' END AS lang_guess
        FROM h
    """


def _isotonic_oracle() -> str:
    from dagli_spark.oracle_literals import ISO_XS, ISO_YS

    vals = ", ".join(f"({x!r}, {y!r})" for x, y in zip(ISO_XS, ISO_YS))
    # np.interp semantics: clamp outside [xs[0], xs[-1]], else linear
    # interpolation on the bracketing segment (same float-op order)
    return f"""
        WITH b AS (SELECT * FROM (VALUES {vals}) t(x, y)),
             p AS (SELECT CAST(embedding[1] AS DOUBLE) AS s FROM embeddings)
        SELECT round(p.s, 4) AS s,
               round(CASE
                   WHEN p.s <= {ISO_XS[0]!r} THEN {ISO_YS[0]!r}
                   WHEN p.s >= {ISO_XS[-1]!r} THEN {ISO_YS[-1]!r}
                   ELSE lo.y + (p.s - lo.x) * ((hi.y - lo.y) / (hi.x - lo.x))
               END, 4) AS cal
        FROM p
        LEFT JOIN LATERAL (SELECT x, y FROM b WHERE b.x <= p.s
                           ORDER BY b.x DESC LIMIT 1) lo ON TRUE
        LEFT JOIN LATERAL (SELECT x, y FROM b WHERE b.x > p.s
                           ORDER BY b.x ASC LIMIT 1) hi ON TRUE
    """

_ASOF_ORACLE = """
    WITH q AS (SELECT user_id, ts AS asof_time, event_id AS qid
               FROM events WHERE event_type='purchase')
    SELECT q.user_id, q.asof_time, q.qid,
           round(m.prev_value, 2) AS prev_value, m.prev_event_id
    FROM q LEFT JOIN LATERAL (
        SELECT value AS prev_value, event_id AS prev_event_id
        FROM events e
        WHERE e.user_id = q.user_id AND e.ts < q.asof_time {extra}
        ORDER BY e.ts DESC, e.event_id DESC LIMIT 1
    ) m ON TRUE
"""


def _northrule_features_oracle() -> str:
    """Full DuckDB replay of the flagship over the SAME fixture parquet
    the Spark query reads (fixtures.fixture_root). Temporal features are
    re-derived with plain SQL windows + the as-of LATERAL; the six pixel
    stats come from the fixture's stored single-image-oracle columns,
    while Spark recomputes them from the raw ``bytes`` through the batched
    Arrow decode kernel — so the row checks the decode+reduction round
    trip end to end.

    Tier: pinned to 'correctness' because oracle_sql() takes no sf_dir by
    driver contract — the gate runs at sf0.01, which is exactly the tier
    q_northrule derives for that sf_dir (northrule_tier). If the fixture
    is missing, it is materialized through an ALREADY-EXISTING Spark
    session only (the caller's — config respected); building a session
    here would hijack getOrCreate for every later caller in the process
    (a default local[32] leaked into the pytest session once). A driver
    that executes DuckDB before ANY Spark work on a fresh host still
    needs the Spark side to run first — documented residual, same as the
    r04 contract."""
    from pyspark.sql import SparkSession

    from dagli_spark.fixtures import fixture_root

    tier = "correctness"
    root = fixture_root(tier)
    if not os.path.isdir(root):
        sess = (SparkSession.getActiveSession()
                or getattr(SparkSession, "_instantiatedSession", None))
        if sess is not None:
            from dagli_spark.fixtures import materialize
            materialize(sess, tier)
    win = "PARTITION BY entity_id ORDER BY event_time, eseq"
    px = ["px_mean_r", "px_mean_g", "px_mean_b", "px_std",
          "px_brightness", "px_edge_energy"]
    fv = ",\n                    ".join(
        f"COALESCE(m.{c}, 'NaN'::DOUBLE)"
        for c in ["label", "label_lag1", "label_avg5", "cnt_1h",
                  "session_id", "secs_since_prev", "hamming_prev", *px])
    return f"""
        WITH ev AS (
            SELECT e.entity_id, e.event_time, e.eseq, e.label,
                   i.phash, {", ".join("i." + c for c in px)}
            FROM '{root}/image_events/*.parquet' e
            JOIN '{root}/images/*.parquet' i USING (image_id)
        ),
        w1 AS (
            SELECT *,
                   epoch_us(event_time) // 1000000 AS epoch_s,
                   lag(label) OVER ({win}) AS label_lag1,
                   avg(label) OVER ({win}
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS label_avg5,
                   COALESCE(CAST(bit_count(xor(phash, lag(phash) OVER ({win})))
                                 AS DOUBLE), -1.0) AS hamming_prev,
                   CASE WHEN lag(event_time) OVER ({win}) IS NULL
                          OR event_time > lag(event_time) OVER ({win})
                               + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM ev
        ),
        w2 AS (
            SELECT *,
                   CAST(sum(is_new) OVER ({win}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                     AS DOUBLE) AS session_id,
                   COALESCE(CAST(epoch_s - lag(epoch_s) OVER ({win}) AS DOUBLE),
                            -1.0) AS secs_since_prev,
                   CAST(count(*) OVER (PARTITION BY entity_id ORDER BY epoch_s
                       RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                     AS DOUBLE) AS cnt_1h
            FROM w1
        ),
        q AS (SELECT entity_id, asof_time, qseq
              FROM '{root}/queries/*.parquet'),
        j AS (
            SELECT q.entity_id, q.asof_time, q.qseq,
                   [{fv}] AS fv
            FROM q LEFT JOIN LATERAL (
                SELECT * FROM w2 f
                WHERE f.entity_id = q.entity_id
                  AND f.event_time <= q.asof_time
                ORDER BY f.event_time DESC, f.eseq DESC LIMIT 1
            ) m ON TRUE
        )
        SELECT entity_id, asof_time, qseq, CAST(r.pos AS INT) AS pos,
               round(fv[r.pos + 1], 4) AS value
        FROM j CROSS JOIN (SELECT unnest(range(13)) AS pos) r
    """


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders_per_cust": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
            FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                  FROM orders)
            WHERE rn <= 3
        """,
        "region_revenue": """
            SELECT r_name, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "asof_strict": _ASOF_ORACLE.format(extra=""),
        "asof_tolerance": _ASOF_ORACLE.format(
            extra="AND e.ts >= q.asof_time - INTERVAL 1 HOUR"
        ),
        "asof_bucketed": _ASOF_ORACLE.format(extra=""),
        "lag_lead": f"""
            SELECT event_id,
                   round(lag(value, 1) OVER ({_EVENT_WINDOW}), 2) AS value_lag1,
                   round(lead(value, 2) OVER ({_EVENT_WINDOW}), 2) AS value_lead2
            FROM events
        """,
        "forward_fill": f"""
            WITH e AS (SELECT *, CASE WHEN event_type='purchase' THEN value END AS pv
                       FROM events)
            SELECT event_id,
                   round(last(pv IGNORE NULLS) OVER ({_EVENT_WINDOW}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                     AS last_purchase_value,
                   round(first(pv IGNORE NULLS) OVER ({_EVENT_WINDOW}
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2)
                     AS next_purchase_value
            FROM e
        """,
        "sessionize": f"""
            WITH g AS (SELECT event_id, user_id, ts,
                              CASE WHEN lag(ts) OVER ({_EVENT_WINDOW}) IS NULL
                                     OR ts > lag(ts) OVER ({_EVENT_WINDOW})
                                          + INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS is_new
                       FROM events)
            SELECT event_id, user_id,
                   CAST(sum(is_new) OVER ({_EVENT_WINDOW}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                     AS BIGINT) AS session_id
            FROM g
        """,
        "session_stats": f"""
            WITH g AS (SELECT *,
                              CASE WHEN lag(ts) OVER ({_EVENT_WINDOW}) IS NULL
                                     OR ts > lag(ts) OVER ({_EVENT_WINDOW})
                                          + INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS is_new
                       FROM events),
                 s AS (SELECT *, CAST(sum(is_new) OVER ({_EVENT_WINDOW}
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                             AS BIGINT) AS session_id
                       FROM g)
            SELECT user_id, session_id, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
            FROM s GROUP BY user_id, session_id
        """,
        "rolling_rows": f"""
            SELECT event_id,
                   round(avg(value) OVER ({_EVENT_WINDOW}
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS roll_avg5,
                   count(value) OVER ({_EVENT_WINDOW}
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_cnt5
            FROM events
        """,
        "rolling_range": """
            WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
                       FROM events)
            SELECT event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_s
                       RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
                     AS roll_sum_1h
            FROM e
        """,
        "example_index": f"""
            SELECT event_id,
                   row_number() OVER ({_EVENT_WINDOW}) - 1 AS example_index
            FROM events
        """,
        "index_dict": """
            SELECT event_type,
                   row_number() OVER (ORDER BY cnt DESC, event_type ASC) - 1
                     AS type_id
            FROM (SELECT event_type, count(*) AS cnt FROM events
                  GROUP BY event_type)
        """,
        "index_applied": """
            WITH d AS (SELECT event_type,
                              row_number() OVER (ORDER BY cnt DESC, event_type ASC) - 1
                                AS type_id
                       FROM (SELECT event_type, count(*) AS cnt FROM events
                             GROUP BY event_type))
            SELECT e.event_id, d.type_id FROM events e JOIN d USING (event_type)
        """,
        "multiplicity": """
            SELECT event_id,
                   count(*) OVER (PARTITION BY event_type) AS type_multiplicity
            FROM events
        """,
        "multiset": """
            SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
        """,
        "order_statistic": """
            SELECT 0 AS idx, round(quantile_cont(value, 0.25), 4) AS quantile
            FROM events
            UNION ALL
            SELECT 1, round(quantile_cont(value, 0.5), 4) FROM events
            UNION ALL
            SELECT 2, round(quantile_cont(value, 0.75), 4) FROM events
        """,
        "bucket_ntile": """
            SELECT event_id,
                   ntile(4) OVER (ORDER BY value ASC, event_id ASC) - 1 AS bucket
            FROM events
        """,
        "rank_population": """
            SELECT event_id,
                   rank() OVER (ORDER BY value ASC) - 1 AS value_rank
            FROM events
        """,
        "kfold": """
            SELECT CAST((user_id * 2654435761) % 4294967296 % 5 AS INT) AS fold,
                   count(*) AS n, count(DISTINCT user_id) AS n_groups
            FROM events GROUP BY 1
        """,
        "text_stats": r"""
            WITH t AS (SELECT doc_id, text,
                              list_filter(regexp_split_to_array(trim(text), '\s+'),
                                          x -> x <> '') AS toks
                       FROM documents)
            SELECT doc_id, len(toks) AS n_tokens,
                   round(list_sum(list_transform(toks,
                         x -> CAST(length(x) AS DOUBLE))) / len(toks), 4)
                     AS avg_token_len,
                   length(text) AS len_chars
            FROM t
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
                     AS n_bpe_tokens
            FROM documents
        """,
        "quality": r"""
            WITH m AS (SELECT doc_id,
                              CAST(length(text) AS DOUBLE) AS n,
                              CAST(length(text) -
                                   length(regexp_replace(text, '[^\w\s]', '', 'g'))
                                   AS DOUBLE) AS punct,
                              CAST(length(text) -
                                   length(regexp_replace(text, '[0-9]', '', 'g'))
                                   AS DOUBLE) AS digits
                       FROM documents)
            SELECT doc_id,
                   round(least(n / 200.0, 1.0)
                         * (1.0 - least(punct / greatest(n, 1.0) * 5, 1.0))
                         * (1.0 - least(digits / greatest(n, 1.0) * 5, 1.0)), 4)
                     AS quality
            FROM m
        """,
        "exact_dedup": r"""
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY array_to_string(list_filter(
                regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> ''), ' ')
        """,
        "top_tokens": r"""
            SELECT token, count(*) AS cnt
            FROM (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                            x -> x <> '')) AS token
                  FROM documents)
            GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20
        """,
        "knn_bruteforce": """
            WITH p AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 10),
                 scored AS (
                   SELECT p.query_id, e.vec_id AS neighbor_id,
                          list_cosine_similarity(
                              CAST(p.qv AS DOUBLE[]),
                              CAST(e.embedding AS DOUBLE[])) AS cos
                   FROM p JOIN embeddings e ON e.vec_id <> p.query_id),
                 ranked AS (
                   SELECT query_id, neighbor_id, cos,
                          row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
                   FROM scored)
            SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
            FROM ranked WHERE rank <= 3
        """,
        "centroid_norm": """
            SELECT label, count(*) AS n,
                   round(avg(sqrt(list_sum(list_transform(
                        CAST(embedding AS DOUBLE[]), x -> x * x)))), 4)
                     AS avg_norm,
                   round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_e0
            FROM embeddings GROUP BY label
        """,
        "rank_limited": """
            SELECT event_id,
                   least(rank() OVER (ORDER BY value ASC) - 1, 100)
                     AS value_rank_cap
            FROM events
        """,
        "dict_value": """
            SELECT event_id,
                   CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                        WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                        WHEN 'error' THEN 5 ELSE 0 END AS type_code
            FROM events
        """,
        "dist_argmax": """
            SELECT event_id,
                   CASE WHEN value / 200.0 > 1.0 - value / 200.0
                        THEN 'low' ELSE 'high' END AS likely,
                   floor(value / 200.0 * 10000) / 10000 AS p_low
            FROM events
        """,
        "binary_auc": """
            WITH r AS (SELECT (label = 0) AS pos,
                              CAST(embedding[1] AS DOUBLE) AS s
                       FROM embeddings),
                 ranked AS (SELECT pos, s,
                                   row_number() OVER (ORDER BY s) AS r1
                            FROM r),
                 avg_r AS (SELECT s, avg(r1) AS ar FROM ranked GROUP BY s),
                 j AS (SELECT pos, ar FROM ranked JOIN avg_r USING (s))
            SELECT round((sum(CASE WHEN pos THEN ar END)
                          - (sum(CASE WHEN pos THEN 1 ELSE 0 END)
                             * (sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1)) / 2.0)
                         / (sum(CASE WHEN pos THEN 1 ELSE 0 END)
                            * sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)), 6)
                     AS auc,
                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS INT) AS n_pos
            FROM j
        """,
        "stratified_sample": """
            SELECT event_id, event_type FROM events
            WHERE ((event_id * 2654435761 + 3) % 4294967296) / 4294967296.0
                  < CASE event_type WHEN 'click' THEN 0.25
                        WHEN 'view' THEN 0.5 WHEN 'purchase' THEN 1.0
                        WHEN 'signup' THEN 1.0 ELSE 0.0 END
        """,
        "normalized": """
            SELECT event_id,
                   round((value - min(value) OVER ())
                         / (max(value) OVER () - min(value) OVER ()), 6)
                     AS v_norm
            FROM events
        """,
        "grouped_mean": """
            SELECT event_id,
                   round(avg(value) OVER (PARTITION BY event_type), 4)
                     AS type_mean
            FROM events
        """,
        "kfold_target_encode": """
            WITH routed AS (
                SELECT *, CAST((user_id * 2654435761) % 4294967296 % 3 AS INT)
                            AS fold
                FROM events),
            p AS (SELECT event_type, fold, sum(value) AS s, count(value) AS c
                  FROM routed GROUP BY event_type, fold),
            o AS (SELECT event_type, fold,
                         sum(s) OVER (PARTITION BY event_type) - s AS os,
                         sum(c) OVER (PARTITION BY event_type) - c AS oc
                  FROM p)
            SELECT r.event_id, r.fold, round(o.os / o.oc, 4) AS enc
            FROM routed r JOIN o USING (event_type, fold)
        """,
        "nearest_centroid": """
            -- candidates are basis vectors e0,e1,e2: L2 dist_i = |v|^2 - 2 v[i] + 1,
            -- so argmin_i = argmax of the first three components (ties -> lower i)
            SELECT vec_id,
                   CASE WHEN e0 >= e1 AND e0 >= e2 THEN 0
                        WHEN e1 >= e2 THEN 1 ELSE 2 END AS nn_idx
            FROM (SELECT vec_id,
                         CAST(embedding[1] AS DOUBLE) AS e0,
                         CAST(embedding[2] AS DOUBLE) AS e1,
                         CAST(embedding[3] AS DOUBLE) AS e2
                  FROM embeddings)
        """,
        "avg_embedding": """
            SELECT pos, round(avg(v), 4) AS mean
            FROM (SELECT unnest(range(0, len(embedding))) AS pos,
                         CAST(unnest(embedding) AS DOUBLE) AS v
                  FROM embeddings)
            GROUP BY pos
        """,
        "text_ops": """
            SELECT doc_id,
                   regexp_replace(text, '[0-9]', '#', 'g') AS masked,
                   CAST((length(text) - length(replace(text, 'the', '')))
                        / 3 AS INT) AS n_the,
                   regexp_matches(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')
                     AS has_email
            FROM documents
        """,
        # same RE2-safe pattern strings the engine compiles (single source
        # of truth: functions/text.PHONE_*_RE — no lookarounds, so Java
        # regex and RE2 agree)
        "phone_plan": f"""
            WITH p AS (
                SELECT doc_id, text,
                       CASE
                         WHEN doc_id % 3 = 0 THEN 'call 442-253-' ||
                           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ' now'
                         WHEN doc_id % 3 = 1 THEN 'local 253-' ||
                           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ' line'
                         ELSE 'cost $' || CAST(doc_id * 37 AS VARCHAR)
                       END AS probe
                FROM documents)
            SELECT doc_id,
                   regexp_matches(text, '{T.PHONE_VALID_RE}')
                     AS has_phone_valid,
                   regexp_matches(text, '{T.PHONE_POSSIBLE_RE}')
                     AS has_phone_possible,
                   regexp_matches(probe, '{T.PHONE_VALID_RE}')
                     AS probe_valid,
                   regexp_matches(probe, '{T.PHONE_POSSIBLE_RE}')
                     AS probe_possible
            FROM p
        """,
        "densify": """
            WITH s AS (SELECT event_id, event_id % 97 AS idx, value AS val
                       FROM events),
                 d AS (SELECT idx, dense_rank() OVER (ORDER BY idx) - 1
                                 AS new_idx
                       FROM (SELECT DISTINCT idx FROM s))
            SELECT s.event_id, d.new_idx, round(s.val, 2) AS val
            FROM s JOIN d USING (idx)
        """,
        "top_by_value": """
            SELECT idx FROM (
                SELECT event_id % 97 AS idx, sum(value) AS s
                FROM events GROUP BY 1
                ORDER BY s DESC, idx ASC LIMIT 10)
        """,
        "top_by_pmi": """
            WITH s AS (SELECT event_id % 97 AS idx, value AS val,
                              CAST(value > 100 AS INT) AS y FROM events),
                 tot AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                                CAST(sum(y) AS DOUBLE) AS ny FROM s),
                 co AS (SELECT idx, CAST(count(*) AS DOUBLE) AS n_x,
                               CAST(sum(y) AS DOUBLE) AS n_xy
                        FROM s WHERE val <> 0 GROUP BY idx)
            SELECT idx FROM (
                SELECT co.idx,
                       ln(((n_xy + 1.0) / n)
                          / (((n_x + 1.0) / n) * (ny / n))) AS pmi
                FROM co, tot
                ORDER BY pmi DESC, idx ASC LIMIT 10)
        """,
        "multinomial_eval": """
            SELECT event_type AS truth,
                   CASE WHEN value > 100 THEN 'purchase' ELSE event_type END
                     AS pred,
                   CAST(count(*) AS DOUBLE) AS w
            FROM events GROUP BY truth, pred
        """,
        "topk_eval": """
            WITH x AS (SELECT label,
                              list_transform(embedding[1:10],
                                             e -> CAST(e AS DOUBLE)) AS c,
                              CAST(embedding[label + 1] AS DOUBLE) AS et
                       FROM embeddings),
                 p AS (SELECT 1 + len(list_filter(c, e -> e > et)) AS pos
                       FROM x)
            SELECT count(*) AS n,
                   round(avg(CASE WHEN pos <= 3 THEN 1.0 ELSE 0.0 END), 6)
                     AS hit3,
                   round(avg(CASE WHEN pos <= 3 THEN 1.0 / pos ELSE 0.0 END), 6)
                     AS mrr3
            FROM p
        """,
        "word_ngrams": r"""
            WITH t AS (SELECT doc_id,
                              list_filter(regexp_split_to_array(trim(text), '\s+'),
                                          x -> x <> '') AS toks
                       FROM documents)
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' '))) AS ngram
            FROM t
        """,
        "char_ngrams": """
            SELECT doc_id,
                   unnest(list_transform(range(1, length(text) - 1),
                          i -> text[i:i+2])) AS ngram
            FROM documents
        """,
        "indices": r"""
            WITH t AS (SELECT doc_id,
                              list_filter(regexp_split_to_array(trim(text), '\s+'),
                                          x -> x <> '') AS toks
                       FROM documents),
                 e AS (SELECT doc_id, unnest(toks) AS tok,
                              generate_subscripts(toks, 1) - 1 AS pos
                       FROM t),
                 d AS (SELECT tok,
                              row_number() OVER (ORDER BY cnt DESC, tok ASC) - 1
                                AS id
                       FROM (SELECT tok, count(*) AS cnt FROM e GROUP BY tok))
            SELECT e.doc_id, e.pos, d.id
            FROM e JOIN d USING (tok)
        """,
        "hamming": """
            SELECT event_id,
                   CAST(bit_count(xor(CAST(user_id * 2654435761 AS BIGINT),
                                      CAST(event_id * 40503 AS BIGINT)))
                        AS INT) AS hamming
            FROM events
        """,
        "northrule_temporal": f"""
            WITH g AS (SELECT *,
                              CASE WHEN lag(ts) OVER ({_EVENT_WINDOW}) IS NULL
                                     OR ts > lag(ts) OVER ({_EVENT_WINDOW})
                                          + INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS is_new
                       FROM events),
                 f AS (SELECT event_id, user_id, ts, value,
                              CAST(sum(is_new) OVER ({_EVENT_WINDOW}
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                                AS BIGINT) AS session_id,
                              lag(value, 1) OVER ({_EVENT_WINDOW}) AS value_lag1,
                              avg(value) OVER ({_EVENT_WINDOW}
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                                AS value_avg5,
                              count(value) OVER ({_EVENT_WINDOW}
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS cnt5
                       FROM g),
                 q AS (SELECT user_id, ts AS asof_time, event_id AS qid
                       FROM events WHERE event_type='purchase')
            SELECT q.user_id, q.asof_time, q.qid,
                   round(m.ev_value, 2) AS ev_value, m.ev_id, m.session_id,
                   round(m.value_lag1, 2) AS value_lag1,
                   round(m.value_avg5, 4) AS value_avg5, m.cnt5
            FROM q LEFT JOIN LATERAL (
                SELECT f.value AS ev_value, f.event_id AS ev_id, f.session_id,
                       f.value_lag1, f.value_avg5, f.cnt5
                FROM f
                WHERE f.user_id = q.user_id AND f.ts < q.asof_time
                ORDER BY f.ts DESC, f.event_id DESC LIMIT 1
            ) m ON TRUE
        """,
        "text_normalize": _text_normalize_oracle(),
        "many_hot": """
            SELECT event_id,
                   unnest(list_distinct([event_id % 7, event_id % 11]))
                     AS idx,
                   CAST(1.0 AS DOUBLE) AS hot
            FROM events
        """,
        "grouped_multiplicity": """
            SELECT event_id,
                   count(*) OVER (PARTITION BY event_type,
                       CAST(floor(value / 50) AS INT)) AS gm
            FROM events
        """,
        "null_filtered_normalized": """
            WITH e AS (SELECT event_id,
                              CASE WHEN event_id % 10 <> 0 THEN value END AS v
                       FROM events),
                 s AS (SELECT min(v) AS mn, max(v) AS mx FROM e)
            SELECT event_id,
                   CASE WHEN v IS NOT NULL
                        THEN round((v - mn) / (mx - mn), 6) END AS vn
            FROM e, s
        """,
        "ngram_padding": r"""
            -- count_n(L, pad p) = max(L + 2p - n + 1, 0), summed n=1..3;
            -- none: p=0; single: p=min(1, n-1); full: p=n-1
            WITH t AS (SELECT doc_id,
                              len(list_filter(regexp_split_to_array(trim(text),
                                  '\s+'), x -> x <> '')) AS L
                       FROM documents)
            SELECT doc_id,
                   CAST(greatest(L, 0) + greatest(L - 1, 0)
                        + greatest(L - 2, 0) AS INT) AS n_none,
                   CAST(greatest(L, 0) + greatest(L + 1, 0)
                        + greatest(L + 2 - 2, 0) AS INT) AS n_single,
                   CAST(greatest(L, 0) + greatest(L + 1, 0)
                        + greatest(L + 2, 0) AS INT) AS n_full
            FROM t
        """,
        "dist_sample": """
            -- engine semantics: entries sorted by (prob desc, label asc),
            -- cumulative inverse-CDF, u = knuth-lcg(event_id, seed=5);
            -- for the 2-label dist the sorted-first entry is 'high' when
            -- p_high >= p_low (label 'high' < 'low' breaks exact ties)
            WITH p AS (SELECT event_id,
                              value / 200.0 AS p_low,
                              1.0 - value / 200.0 AS p_high,
                              CAST((event_id * 2654435761 + 5) % 4294967296
                                   AS DOUBLE) / 4294967296.0 AS u
                       FROM events),
                 s AS (SELECT event_id, u,
                              CASE WHEN p_high >= p_low THEN 'high'
                                   ELSE 'low' END AS first_label,
                              CASE WHEN p_high >= p_low THEN 'low'
                                   ELSE 'high' END AS second_label,
                              CASE WHEN p_high >= p_low THEN p_high
                                   ELSE p_low END AS p1,
                              CASE WHEN p_high >= p_low THEN p_low
                                   ELSE p_high END AS p2
                       FROM p)
            SELECT event_id,
                   CASE WHEN p1 >= u * (p1 + p2) THEN first_label
                        ELSE second_label END AS draw
            FROM s
        """,
        "vector_accessors": """
            -- sv = map{event_id % 97 -> value}: max nonzero key is the
            -- single key when value != 0, else NULL / the on_zero default
            SELECT event_id,
                   CASE WHEN value <> 0 THEN event_id % 97 END AS max_nz,
                   CASE WHEN value <> 0 THEN event_id % 97
                        ELSE -1 END AS max_nz0,
                   event_id % 5 AS capacity
            FROM events
        """,
        "dist_vector_bridge": """
            -- dense vector over labels [high, low, absent], exploded
            SELECT event_id, pos,
                   round(CASE pos WHEN 0 THEN 1.0 - value / 200.0
                                  WHEN 1 THEN value / 200.0
                                  ELSE 0.0 END, 6) AS p
            FROM events, (SELECT unnest([0, 1, 2]) AS pos)
        """,
        "ranking_eval": """
            -- pos = 1 + #(strictly greater components): matches the
            -- engine's (value desc, index asc) struct sort whenever the
            -- first-10 components hold no exact duplicates (true of the
            -- continuous testdata embeddings; same convention as the
            -- topk_eval oracle)
            WITH x AS (SELECT vec_id, label,
                              list_transform(embedding[1:10],
                                             e -> CAST(e AS DOUBLE)) AS c,
                              CAST(embedding[label + 1] AS DOUBLE) AS et
                       FROM embeddings),
                 p AS (SELECT CASE WHEN vec_id % 7 = 0 THEN NULL
                                   ELSE 1 + len(list_filter(c, e -> e > et))
                              END AS pos
                       FROM x)
            SELECT count(*) AS total_n,
                   CAST(count(CASE WHEN pos <= 3 THEN 1 END) AS BIGINT)
                     AS n_correct,
                   CAST(count(CASE WHEN pos > 3 THEN 1 END) AS BIGINT)
                     AS n_incorrect,
                   CAST(count(CASE WHEN pos IS NULL THEN 1 END) AS BIGINT)
                     AS n_nopred,
                   round(count(CASE WHEN pos <= 3 THEN 1 END)
                         / CAST(count(*) AS DOUBLE), 6) AS acc,
                   round(sum(CASE WHEN pos <= 3 THEN 1.0 / pos ELSE 0.0 END)
                         / count(*), 6) AS mrr
            FROM p
        """,
        "bucket_index": _bucket_oracle(),
        "kmeans": _kmeans_oracle(),
        "isotonic": _isotonic_oracle(),
        "lang_id": _lang_id_oracle(),
        "knn_ivf": _knn_ivf_oracle(),
        "knn_lsh": _knn_lsh_oracle(),
        "minhash_portable": _minhash_portable_oracle(),
        "simhash_portable": _simhash_portable_oracle(),
        "jaccard_dedup": _jaccard_dedup_oracle(),
        "embedding_dedup": _embedding_dedup_oracle(),
        "northrule_features": _northrule_features_oracle(),
        "tokens_ascii": _tokens_ascii_oracle(),
        "tokens_en_core": _tokens_en_core_oracle(),
        "audio_features": _audio_features_oracle(),
        "audio_g711": _audio_g711_oracle(),
        "video_features": _video_features_oracle(),
        "tokens_de_core": _tokens_de_core_oracle(),
        "phone_intl": _phone_intl_oracle(),
        "phone_intl2": _phone_intl2_oracle(),
        "phone_intl3": _phone_intl3_oracle(),
        "phone_intl4": _phone_intl4_oracle(),
        # minhash_pairs / simhash_pairs: xxhash64-family
        # dependent (documented different hash family than the reference's
        # MurmurHash3) — rows-only; tokens_locale: rule regex needs
        # lookahead (absent from DuckDB's RE2) — rows-only with a pytest
        # Python oracle (tests/test_tokens_locale.py), while the RE2-safe
        # ASCII subset is oracle-checked via tokens_ascii.
    }


if __name__ == "__main__":
    from dagli_spark import get_spark

    spark = get_spark("entry-smoke", master="local[4]", shuffle_partitions=8)
    df = entry(spark)
    print("entry rows:", df.count())
    df.show(5, truncate=False)
