#!/usr/bin/env python
"""End-to-end library tour: the Dagli-style preparable pipeline on Spark.

A user of the reference (linkedin/dagli) composes a DAG of preparable +
prepared transformers; here the same program is a `Pipeline` of stages
over DataFrames — fit once, apply anywhere, save/load the fitted result.

Run:  python examples/feature_pipeline_demo.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dagli_spark import asof_join, get_spark
from dagli_spark.operators import window_features as wf
from dagli_spark.operators.fit import fit_index, fit_rank
from dagli_spark.operators.meta import kfold_target_encode
from dagli_spark.pipeline import Pipeline, PreparableStage, Stage


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("feature-pipeline-demo", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # ---- Dagli preparables as pipeline stages -------------------------
    p = Pipeline([
        # prepared (stateless) stage: leakage-free fold routing + target
        # mean encoding of event_type over the OTHER folds
        Stage("target_encode", lambda df: kfold_target_encode(
            df, "event_type", "value", k=3, group_col="user_id",
            method="lcg", out="type_enc")),
        # preparable: dictionary id for event_type (Index)
        PreparableStage(
            "index_event_type",
            fit_fn=lambda df: fit_index(df, "event_type"),
            apply_fn=lambda m, df: m.apply(df, out="type_id"),
        ),
        # preparable: population rank of value (Rank, limit-capped state)
        PreparableStage(
            "rank_value",
            fit_fn=lambda df: fit_rank(df, "value", limit=1000),
            apply_fn=lambda m, df: m.apply(df, out="value_rank"),
        ),
    ])
    fitted, encoded = p.fit_transform(ev)

    # ---- temporal features + point-in-time join -----------------------
    w = wf.spec("user_id", ["ts", "event_id"])
    feats = wf.sessionize(encoded, "ts", F.expr("INTERVAL 30 MINUTES"), w)
    feats = wf.rolling(feats, {"avg5": F.avg("value")}, w, rows=(-4, 0))
    events_side = feats.select(
        "user_id", "ts", F.col("event_id").alias("ev_id"),
        "type_id", "type_enc", "value_rank", "session_id", "avg5")
    queries = encoded.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("asof_time"),
        F.col("event_id").alias("qid"))
    out = asof_join(
        queries, events_side, on="user_id", left_time="asof_time",
        right_time="ts",
        values=["ev_id", "type_id", "type_enc", "value_rank",
                "session_id", "avg5"],
        tiebreak="ev_id", strict=True)

    n = out.count()
    print(f"feature rows: {n}")
    out.show(5, truncate=False)
    for m in fitted.metrics:
        print(m)
    return 0 if n > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
