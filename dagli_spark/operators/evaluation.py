"""Evaluation aggregates (SURVEY.md §2.23 / reference §2.5 table):
MultinomialEvaluation, BinaryEvaluation (incl. AUC), TopKEvaluation —
weighted full-table aggregates producing one constant result row, exactly
the reference's "preparable whose fitted state is the result"
(common/.../evaluation/MultinomialEvaluation.java:23-29,
BinaryEvaluation.java:26-38, TopKEvaluation.java:37).

All distributed: confusion cells via groupBy, AUC via a rank-sum
(Mann-Whitney U) formulation — one sort, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def multinomial_evaluation(
    df: DataFrame, truth: str, prediction: str, weight=None,
) -> dict:
    """Weighted accuracy + per-(truth, prediction) confusion counts."""
    w = F.col(weight) if weight else F.lit(1.0)
    agg = df.agg(
        F.sum(w).alias("total_w"),
        F.sum(F.when(F.col(truth) == F.col(prediction), w).otherwise(0.0))
         .alias("correct_w"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    confusion = [
        ((r[truth], r[prediction]), float(r["w"]))
        for r in df.groupBy(truth, prediction).agg(F.sum(w).alias("w")).collect()
    ]
    return {
        "count": int(agg["n"]),
        "weight": float(agg["total_w"]),
        "accuracy": float(agg["correct_w"]) / float(agg["total_w"]),
        "confusion": dict(confusion),
    }


def binary_evaluation(
    df: DataFrame, truth: str, score: str, *, threshold: float = 0.5,
    weight=None,
) -> dict:
    """Weighted confusion at a threshold + AUC.

    AUC = (rank_sum_pos - n_pos*(n_pos+1)/2) / (n_pos * n_neg) with average
    ranks for score ties (exact Mann-Whitney) — a single global sort +
    one aggregate; scales as one shuffle."""
    w = F.col(weight) if weight else F.lit(1.0)
    t = F.col(truth).cast("boolean")
    pred = F.col(score) >= F.lit(threshold)
    base = df.agg(
        F.sum(F.when(t & pred, w).otherwise(0.0)).alias("tp"),
        F.sum(F.when(~t & pred, w).otherwise(0.0)).alias("fp"),
        F.sum(F.when(t & ~pred, w).otherwise(0.0)).alias("fn"),
        F.sum(F.when(~t & ~pred, w).otherwise(0.0)).alias("tn"),
    ).first()
    tp, fp, fn, tn = (float(base[k]) for k in ("tp", "fp", "fn", "tn"))

    # average rank per row over the global score order (ties -> mean rank)
    ranked = df.select(t.alias("pos"), F.col(score).alias("s")).withColumn(
        "r1", F.row_number().over(Window.orderBy("s"))
    )
    avg_rank = ranked.groupBy("s").agg(F.avg("r1").alias("ar"))
    joined = ranked.join(avg_rank, "s")
    agg = joined.agg(
        F.sum(F.when(F.col("pos"), F.col("ar"))).alias("rank_sum_pos"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("n_neg"),
    ).first()
    n_pos, n_neg = int(agg["n_pos"]), int(agg["n_neg"])
    auc = None
    if n_pos and n_neg:
        auc = (float(agg["rank_sum_pos"]) - n_pos * (n_pos + 1) / 2.0) \
            / (n_pos * n_neg)
    prec = tp / (tp + fp) if tp + fp else None
    rec = tp / (tp + fn) if tp + fn else None
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "accuracy": (tp + tn) / (tp + fp + fn + tn),
        "precision": prec, "recall": rec,
        "f1": (2 * prec * rec / (prec + rec)) if prec and rec else None,
        "auc": auc,
    }


def topk_evaluation(
    df: DataFrame, truth: str, labels_ranked: str, k: int,
) -> dict:
    """Hit@k / MRR@k over a per-row ranked label array
    (TopKEvaluation.java:37)."""
    pos = F.array_position(F.slice(F.col(labels_ranked), 1, k), F.col(truth))
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(pos > 0, 1).otherwise(0)).alias("hits"),
        F.sum(F.when(pos > 0, 1.0 / pos).otherwise(0.0)).alias("rr"),
    ).first()
    n = int(agg["n"])
    return {
        "count": n,
        f"hit@{k}": float(agg["hits"]) / n if n else None,
        f"mrr@{k}": float(agg["rr"]) / n if n else None,
    }
