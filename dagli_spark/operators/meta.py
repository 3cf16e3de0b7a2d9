"""Meta / control-flow operators: PreparedByGroup, KFoldCrossTrained,
BestModel — the reference's DAG-level semantics (SURVEY.md §2.12).

Reference behaviors re-expressed Spark-first:

- ``PreparedByGroup`` (common/.../meta/PreparedByGroup.java:30-49): fit the
  wrapped preparable once per group value; apply routes each row to its
  group's fitted state. On Spark the per-group fit IS a ``groupBy().agg()``
  producing a fitted-state table keyed by group; apply is a broadcast hash
  join — one shuffle of group-sized partials, never k separate jobs.
- ``KFoldCrossTrained`` (common/.../meta/KFoldCrossTrained.java:30-63): each
  row's feature comes from the model NOT trained on its fold — the
  reference's anti-leakage contract. For aggregate-shaped preparables
  (target statistics) we compute per-fold partial aggregates ONCE and
  combine the other k-1 folds' partials per row (leave-one-fold-out
  algebra) — one shuffle total instead of k training passes, which is the
  difference between feasible and not at 100 TB.
- ``BestModel`` (common/.../meta/BestModel.java:44-51,96): cross-validated
  selection over a candidate grid; losers discarded, winner refit on all
  rows ("for new data" model).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dagli_spark.operators.fit import kfold_column


# ---------------------------------------------------------- PreparedByGroup

@dataclass
class GroupedModel:
    """Fitted-state table keyed by group; apply = broadcast join.

    Unseen groups get null state (the reference routes unknown groups to a
    missing model and yields null — PreparedByGroup.java:30-49)."""

    group_col: str
    state: DataFrame  # group_col + one column per fitted statistic

    def apply(self, df: DataFrame) -> DataFrame:
        # no forced broadcast hint: group cardinality is unbounded in
        # general (a forced hint would OOM on a high-cardinality group
        # column); AQE still broadcasts automatically whenever the fitted
        # state is under the threshold
        return df.join(self.state, on=self.group_col, how="left")


def fit_by_group(
    df: DataFrame, group_col: str, aggs: dict[str, Column]
) -> GroupedModel:
    """PreparedByGroup for aggregate-shaped preparables: ONE distributed
    groupBy fits every group simultaneously (vs the reference's model-per-
    group loop — same result, cluster-parallel)."""
    state = df.groupBy(group_col).agg(
        *[a.alias(name) for name, a in aggs.items()]
    )
    return GroupedModel(group_col, state)


def fit_by_group_pandas(
    df: DataFrame, group_col: str, fit_fn, state_schema: str
) -> GroupedModel:
    """PreparedByGroup for arbitrary (non-aggregate) inner preparables:
    ``fit_fn(pdf) -> pdf`` runs per group via applyInPandas and must return
    one state row per group. Use only when the inner fit genuinely can't be
    an aggregate; groups must fit in executor memory (salt upstream if a
    group is hotter than a partition)."""
    state = df.groupBy(group_col).applyInPandas(fit_fn, schema=state_schema)
    return GroupedModel(group_col, state)


@dataclass
class GroupedMultiplicityModel:
    """Per-group Multiplicity (the reference's PreparedByGroupTest case):
    count of this row's value within its group's fitted data. Distinguishes
    unknown GROUP (-> null, UnknownGroupPolicy.RETURN_NULL) from a known
    group with an unseen value (-> 0)."""

    group_col: str
    value_col: str
    counts: DataFrame   # group, value, cnt
    groups: DataFrame   # distinct fitted groups

    def apply(self, df: DataFrame, *, out: str | None = None) -> DataFrame:
        out = out or f"{self.value_col}_group_multiplicity"
        j = df.join(
            F.broadcast(self.counts.withColumnRenamed("cnt", out)),
            on=[self.group_col, self.value_col], how="left",
        ).join(
            F.broadcast(self.groups.withColumn("__known", F.lit(True))),
            on=self.group_col, how="left",
        )
        return j.withColumn(
            out,
            F.when(F.col("__known"), F.coalesce(F.col(out), F.lit(0))),
        ).drop("__known")


def fit_multiplicity_by_group(
    df: DataFrame, group_col: str, value_col: str
) -> GroupedMultiplicityModel:
    """PreparedByGroup(Multiplicity): ONE groupBy fits every group's value
    counts simultaneously (PreparedByGroup.java:30-49 + Multiplicity)."""
    counts = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("cnt"))
    groups = df.select(group_col).distinct()
    return GroupedMultiplicityModel(group_col, value_col, counts, groups)


# ------------------------------------------------------- KFoldCrossTrained

def kfold_target_encode(
    df: DataFrame,
    key_col: str,
    target_col: str,
    *,
    k: int = 5,
    group_col: str | None = None,
    seed: int = 0,
    method: str = "xxhash64",
    smoothing: float = 0.0,
    prior: float | None = None,
    out: str | None = None,
    fold_col: str = "fold",
) -> DataFrame:
    """Leakage-free target encoding: each row's encoded value is the mean of
    ``target_col`` over rows of the same ``key_col`` in the OTHER k-1 folds.

    This is KFoldCrossTrained (KFoldCrossTrained.java:30-63) specialized to
    the mean-aggregate preparable, computed with leave-one-fold-out algebra:

        enc(row in fold i, key v) = (sum_all(v) - sum_i(v) + smoothing*prior)
                                    / (cnt_all(v) - cnt_i(v) + smoothing)

    ONE groupBy (key, fold) produces the per-fold partials; window sums give
    the all-fold totals; apply is a broadcast join on (key, fold). No k
    training passes, no row ever sees its own fold's targets.

    ``group_col`` is the fold-routing group (defaults to key_col) — rows of
    one group never split across folds, matching the reference's
    hash-of-group routing (KFoldCrossTrained.java:44-49).
    """
    from pyspark.sql import Window

    out = out or f"{key_col}_target_enc"
    routed = kfold_column(
        df, group_col or key_col, k, seed=seed, out=fold_col, method=method
    )
    partials = routed.groupBy(key_col, fold_col).agg(
        # a fold whose targets are all null must contribute (0, 0), not
        # null — a null partial would poison the window subtraction and
        # null out encodings for rows that DO have other-fold data
        F.coalesce(F.sum(target_col), F.lit(0.0)).alias("__s"),
        F.count(target_col).alias("__c"),
    )
    wk = Window.partitionBy(key_col)
    others = partials.select(
        key_col,
        fold_col,
        (F.sum("__s").over(wk) - F.col("__s")).alias("__os"),
        (F.sum("__c").over(wk) - F.col("__c")).alias("__oc"),
    )
    if prior is None and smoothing > 0:
        prior = df.agg(F.avg(target_col)).first()[0]
    # try_divide: a key whose OTHER folds are all empty has denominator 0 —
    # null encoding, not a job-killing DIVIDE_BY_ZERO under ANSI sessions
    enc = F.try_divide(
        F.col("__os") + F.lit(smoothing) * F.lit(prior or 0.0),
        F.col("__oc") + F.lit(smoothing),
    )
    state = others.withColumn(out, enc).drop("__os", "__oc")
    # state is |distinct keys| x k rows — typically broadcastable, but
    # target encoding exists precisely for high-cardinality keys, so let
    # AQE decide instead of forcing a driver-side collect of 250M rows on
    # a 50M-key column
    return routed.join(state, on=[key_col, fold_col], how="left")


def kfold_cross_trained(
    df: DataFrame,
    group_col: str,
    k: int,
    fit_fn: Callable[[DataFrame], object],
    apply_fn: Callable[[object, DataFrame], DataFrame],
    *,
    seed: int = 0,
    method: str = "xxhash64",
    fold_col: str = "fold",
) -> tuple[DataFrame, object]:
    """General KFoldCrossTrained for arbitrary inner preparables: fit k
    models on the k leave-one-fold-out subsets plus one all-data model for
    future rows (KFoldCrossTrained.java:30-63 fits k+1 models). Each row is
    transformed by the model that never saw its fold. Returns
    (transformed training rows, all-data model).

    Use :func:`kfold_target_encode` when the inner op is a target aggregate
    — it does this in one shuffle instead of k+1 fit jobs.

    The routed frame stays cached for the session (it feeds k+1 fit jobs);
    call ``spark.catalog.clearCache()`` between independent sweeps."""
    routed = kfold_column(df, group_col, k, seed=seed, out=fold_col,
                          method=method).cache()
    parts = []
    for i in range(k):
        model_i = fit_fn(routed.where(F.col(fold_col) != i))
        parts.append(apply_fn(model_i, routed.where(F.col(fold_col) == i)))
    applied = parts[0]
    for p in parts[1:]:
        applied = applied.unionByName(p)
    return applied, fit_fn(routed)


# ----------------------------------------------------------------- BestModel

def best_model(
    df: DataFrame,
    candidates: dict[str, Callable[[DataFrame], object]],
    apply_fn: Callable[[object, DataFrame], DataFrame],
    score_fn: Callable[[DataFrame], float],
    *,
    group_col: str,
    k: int = 3,
    seed: int = 0,
) -> tuple[str, object, dict[str, float]]:
    """Cross-validated model selection (BestModel.java:44-51,96): score every
    candidate by k-fold cross-validation (higher is better), refit the
    winner on all rows. Returns (name, fitted winner, per-candidate scores).

    ``apply_fn(model, df)`` must add the candidate's prediction column(s);
    ``score_fn`` reduces the cross-fitted predictions to one float."""
    routed = kfold_column(df, group_col, k, seed=seed).cache()
    scores: dict[str, float] = {}
    for name, fit_fn in candidates.items():
        parts = []
        for i in range(k):
            m = fit_fn(routed.where(F.col("fold") != i))
            parts.append(apply_fn(m, routed.where(F.col("fold") == i)))
        pred = parts[0]
        for p in parts[1:]:
            pred = pred.unionByName(p)
        scores[name] = float(score_fn(pred))
    winner = max(sorted(scores), key=lambda n: scores[n])
    return winner, candidates[winner](df), scores


def all_transformations_map(
    df: DataFrame, transformations: dict, *, out: str = "transformations",
) -> DataFrame:
    """Attach a ``map<string, value>`` column holding the result of EVERY
    named transformation for each row — the reference's diagnostic
    AllTransformationsMap (common/.../meta/AllTransformationsMap.java:40-58:
    applies a keyed map of prepared transformers to the shared inputs and
    returns the keyed results). Values are Column expressions (or callables
    df -> Column); Spark requires a common value type — pass ``cast`` forms
    or rely on Catalyst's implicit coercion, exactly as the reference
    requires a common result type R."""
    entries = []
    for name in sorted(transformations):
        v = transformations[name]
        col = v(df) if callable(v) and not isinstance(v, Column) else v
        entries.extend([F.lit(name), col])
    return df.withColumn(out, F.create_map(*entries))
