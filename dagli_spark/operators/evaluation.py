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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multinomial_evaluation(
    df: DataFrame, truth: str, prediction: str, weight=None,
) -> dict:
    """Weighted accuracy + per-(truth, prediction) confusion counts.
    ONE distributed pass: totals and accuracy derive from the collected
    confusion cells (two separate jobs would recompute the upstream
    lineage twice — and on a nondeterministic source could even compute
    accuracy and confusion from different snapshots)."""
    w = F.col(weight) if weight else F.lit(1.0)
    cells = df.groupBy(truth, prediction).agg(
        F.sum(w).alias("w"), F.count(F.lit(1)).alias("n")).collect()
    n = sum(int(r["n"]) for r in cells)
    total_w = sum(float(r["w"]) for r in cells)
    if n == 0 or not total_w:
        return {"count": n, "weight": 0.0, "accuracy": None, "confusion": {}}
    correct_w = sum(float(r["w"]) for r in cells
                    if r[truth] == r[prediction] and r[truth] is not None)
    return {
        "count": n,
        "weight": total_w,
        "accuracy": correct_w / total_w,
        "confusion": {(r[truth], r[prediction]): float(r["w"])
                      for r in cells},
    }


def binary_evaluation(
    df: DataFrame, truth: str, score: str, *, threshold: float = 0.5,
    weight=None,
) -> dict:
    """Weighted confusion at a threshold + (unweighted) AUC.

    AUC = sum over distinct scores of pos(s) * (neg_below(s) + neg(s)/2)
    over (P*N) — the tie-averaged Mann-Whitney statistic computed from
    per-score pos/neg counts: ONE map-side-combinable groupBy(score), then
    a window over the distinct-score table (bounded by score cardinality,
    not row count — at extreme continuous-score scale, quantize scores
    first). ``auc`` is None when a weight column is given (a weighted
    rank-sum is a different statistic; computing the unweighted one under
    a weighted call would be silently inconsistent with tp/fp/fn/tn)."""
    w = F.col(weight) if weight else F.lit(1.0)
    t = F.col(truth).cast("boolean")
    pred = F.col(score) >= F.lit(threshold)
    base = df.agg(
        F.sum(F.when(t & pred, w).otherwise(0.0)).alias("tp"),
        F.sum(F.when(~t & pred, w).otherwise(0.0)).alias("fp"),
        F.sum(F.when(t & ~pred, w).otherwise(0.0)).alias("fn"),
        F.sum(F.when(~t & ~pred, w).otherwise(0.0)).alias("tn"),
    ).first()
    if base["tp"] is None:  # empty input
        return {"tp": 0.0, "fp": 0.0, "fn": 0.0, "tn": 0.0,
                "accuracy": None, "precision": None, "recall": None,
                "f1": None, "auc": None}
    tp, fp, fn, tn = (float(base[k]) for k in ("tp", "fp", "fn", "tn"))

    auc = None
    if weight is None:
        from dagli_spark.operators.twophase import global_running_sum

        # null scores are excluded — the tp/fp/fn/tn confusion above
        # already skips them (a null predicate falls through both when
        # branches); counting them here as a lowest-score group would make
        # auc and the confusion describe different populations
        per_score = df.where(F.col(score).isNotNull()) \
            .groupBy(F.col(score).alias("s")).agg(
                F.sum(F.when(t, 1).otherwise(0)).alias("np"),
                F.sum(F.when(~t, 1).otherwise(0)).alias("nn"),
            )
        # two-phase prefix sum: the distinct-score table never serializes
        # through a single-partition window (operators/twophase.py)
        contrib = global_running_sum(
            per_score, [F.col("s").asc()], "nn", "neg_below"
        ).agg(
            F.sum(F.col("np") * (F.col("neg_below") + F.col("nn") / 2.0))
             .alias("u"),
            F.sum("np").alias("p"), F.sum("nn").alias("n"),
        ).first()
        if contrib["p"] and contrib["n"]:
            auc = float(contrib["u"]) / (contrib["p"] * contrib["n"])
    total = tp + fp + fn + tn
    prec = tp / (tp + fp) if tp + fp else None
    rec = tp / (tp + fn) if tp + fn else None
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "accuracy": (tp + tn) / total if total else None,
        "precision": prec, "recall": rec,
        "f1": (2 * prec * rec / (prec + rec)) if prec and rec else None,
        "auc": auc,
    }


def ranking_evaluation(
    df: DataFrame, truth: str, labels_ranked: str, k: int | None = None,
    *, weight=None,
) -> dict:
    """RankingEvaluationResult
    (common/.../evaluation/RankingEvaluationResultBase.java:20-78, filled
    the way TopKEvaluation.java:190-205 does): per example, pos = 1-based
    position of the true label in the (top-k of the) ranked list.

    - present -> correct (count + weight), reciprocal rank = 1/pos;
    - absent from a NON-EMPTY list -> incorrect, reciprocal rank 0;
    - empty/null list -> "no prediction" (neither correct nor incorrect,
      derived as total - correct - incorrect, reciprocal rank 0).

    One distributed aggregate; result is the reference's full struct
    including weighted/unweighted accuracy and MRR."""
    w = F.col(weight) if weight else F.lit(1.0)
    lst = (F.col(labels_ranked) if k is None
           else F.slice(F.col(labels_ranked), 1, k))
    pos = F.array_position(lst, F.col(truth))
    hit = pos > 0
    empty = F.col(labels_ranked).isNull() | (F.size(F.col(labels_ranked)) == 0)
    miss = ~empty & (pos == 0)
    agg = df.agg(
        F.count(F.lit(1)).alias("total_count"),
        F.sum(w).alias("total_weight"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("correct_count"),
        F.sum(F.when(hit, w).otherwise(0.0)).alias("correct_weight"),
        F.sum(F.when(miss, 1).otherwise(0)).alias("incorrect_count"),
        F.sum(F.when(miss, w).otherwise(0.0)).alias("incorrect_weight"),
        F.sum(F.when(hit, 1.0 / pos).otherwise(0.0)).alias("rr_sum"),
        F.sum(F.when(hit, w / pos).otherwise(0.0)).alias("wrr_sum"),
    ).first()
    tc, tw = int(agg["total_count"]), float(agg["total_weight"] or 0.0)
    cc, cw = int(agg["correct_count"] or 0), float(agg["correct_weight"] or 0.0)
    ic, iw = int(agg["incorrect_count"] or 0), float(agg["incorrect_weight"] or 0.0)
    return {
        "total_count": tc, "total_weight": tw,
        "correct_count": cc, "correct_weight": cw,
        "incorrect_count": ic, "incorrect_weight": iw,
        "no_prediction_count": tc - cc - ic,
        "no_prediction_weight": tw - cw - iw,
        "unweighted_accuracy": cc / tc if tc else None,
        "weighted_accuracy": cw / tw if tw else None,
        "unweighted_mrr": float(agg["rr_sum"]) / tc if tc else None,
        "weighted_mrr": float(agg["wrr_sum"]) / tw if tw else None,
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
