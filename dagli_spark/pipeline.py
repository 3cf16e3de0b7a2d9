"""Pipeline DSL — Dagli's prepared/preparable DAG re-expressed for Spark.

Mapping from the reference (SURVEY.md §1.1, §3):

- ``Stage``        ≙ PreparedTransformer: a pure DataFrame->DataFrame
  function (core/.../transformer/PreparedTransformer.java:23).
- ``PreparableStage`` ≙ PreparableTransformer + Preparer: ``fit(df)``
  consumes the training frame and returns a fitted ``Stage``
  (core/.../transformer/PreparableTransformer.java:31; the fit pass is the
  Preparer's process/finish, core/.../preparer/Preparer.java:22).
- ``Pipeline.fit`` ≙ DAG.prepare: stages run in declaration order (the
  topological phases of DAGStructure, core/.../dag/DAGStructure.java:39-79):
  each preparable is fitted on the output of everything before it, then its
  prepared form transforms the frame for the stages after it — exactly the
  executor's "prepared transformers then run over the training rows so
  downstream preparers see their outputs" (documentation/dag.md:83).
- Construction-time rewrites ≙ the reference's reducers (SURVEY.md §4.1):
  ``Pipeline`` interns equal stages by key (CSE — DeduplicatedDAG,
  core/.../dag/DeduplicatedDAG.java:69-80) and drops no-op stages
  (RemoveIfUnaryReducer). Catalyst does every expression-level rewrite.
- ``FittedPipeline.save/load`` ≙ the prepared DAG's Java serialization
  (documentation/dag.md:100): a JSON manifest + pickled fitted stages.

Quasi-determinism contract (documentation/transformers.md:11-17): stages
must be pure functions of their inputs + params; anything random must be
hash-derived (dagli_spark.functions.rand). This is what makes fit/apply
partition-count invariant and checkpoints reusable.
"""

from __future__ import annotations

import json
import os
from pyspark import cloudpickle
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Stage:
    """A prepared (stateless) transformation."""
    name: str
    fn: Callable[[DataFrame], DataFrame]
    params: tuple = ()

    def key(self) -> str:
        return f"{self.name}:{self.params!r}"

    def transform(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass(frozen=True)
class PreparableStage:
    """A trainable transformation: fit() -> fitted Stage.

    ``fit_fn(df) -> state``; ``apply_fn(state, df) -> df``. State must be
    picklable (broadcast dictionaries, boundaries, models...).
    """
    name: str
    fit_fn: Callable[[DataFrame], object]
    apply_fn: Callable[[object, DataFrame], DataFrame]
    params: tuple = ()

    def key(self) -> str:
        return f"{self.name}:{self.params!r}"

    def fit(self, df: DataFrame) -> "FittedStage":
        state = self.fit_fn(df)
        return FittedStage(self.name, self.apply_fn, state, self.params)


@dataclass(frozen=True)
class FittedStage:
    name: str
    apply_fn: Callable[[object, DataFrame], DataFrame]
    state: object
    params: tuple = ()

    def key(self) -> str:
        return f"{self.name}:{self.params!r}"

    def transform(self, df: DataFrame) -> DataFrame:
        return self.apply_fn(self.state, df)


def _identity_fn(df: DataFrame) -> DataFrame:
    return df


def identity_stage(name: str = "identity") -> Stage:
    return Stage(name, _identity_fn)


class Pipeline:
    """Ordered stages; preparables are fitted in sequence on the running
    output (Dagli phase semantics). Identity no-ops are removed
    (RemoveIfUnaryReducer)."""

    def __init__(self, stages: list):
        # Linear-chain semantics: a stage's input IS its predecessor's
        # output, so no two occurrences of a stage are ever value-equal in
        # Dagli's sense (@ValueEquality compares fields + INPUTS,
        # documentation/dag.md) — a position-blind CSE here would silently
        # drop a repeated non-idempotent stage (x*2 twice must be x*4).
        # DAG-level node sharing belongs to a branching representation this
        # linear Pipeline does not express; only true no-ops are removed.
        # Already-fitted stages (FittedStage) compose freely with new ones.
        self.stages = [
            s for s in stages
            if not (isinstance(s, Stage) and s.fn is _identity_fn)
        ]

    def fit(self, df: DataFrame) -> "FittedPipeline":
        fitted, metrics = [], []
        cur = df
        for s in self.stages:
            t0 = time.time()
            fs = s.fit(cur) if isinstance(s, PreparableStage) else s
            cur = fs.transform(cur)
            fitted.append(fs)
            metrics.append({"stage": s.key(),
                            "fit_sec": round(time.time() - t0, 3),
                            "preparable": isinstance(s, PreparableStage)})
        return FittedPipeline(fitted_stages=fitted, metrics=metrics)

    def fit_transform(self, df: DataFrame) -> tuple["FittedPipeline", DataFrame]:
        fp = self.fit(df)
        return fp, fp.transform(df)


@dataclass
class FittedPipeline:
    fitted_stages: list = field(default_factory=list)
    metrics: list = field(default_factory=list)

    def transform(self, df: DataFrame) -> DataFrame:
        cur = df
        for s in self.fitted_stages:
            cur = s.transform(cur)
        return cur

    # ---------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """JSON manifest (stage inventory, params, metrics) + pickled
        stages — the prepared-DAG serialization analogue
        (documentation/dag.md:100)."""
        os.makedirs(path, exist_ok=True)
        manifest = {
            "version": 1,
            "stages": [
                {"name": s.name, "key": s.key(),
                 "fitted": isinstance(s, FittedStage)}
                for s in self.fitted_stages
            ],
            "metrics": self.metrics,
        }
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        with open(os.path.join(path, "stages.pkl"), "wb") as f:
            cloudpickle.dump(self.fitted_stages, f)

    @classmethod
    def load(cls, path: str) -> "FittedPipeline":
        with open(os.path.join(path, "stages.pkl"), "rb") as f:
            stages = cloudpickle.load(f)
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        return cls(fitted_stages=stages, metrics=manifest.get("metrics", []))
