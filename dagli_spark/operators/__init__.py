"""Temporal + relational operators of the engine.

- :mod:`dagli_spark.operators.asof` — point-in-time as-of join
- :mod:`dagli_spark.operators.window_features` — lag/lead, LOCF fill,
  gap sessionization, rolling frames
- :mod:`dagli_spark.operators.fit` — Dagli-style preparable transformers
  (Index, Rank, BucketIndex, Multiplicity, ...)
- :mod:`dagli_spark.operators.dedup` — exact/MinHash/SimHash/Jaccard dedup
- :mod:`dagli_spark.operators.similarity` — cosine top-k ANN
"""

from dagli_spark.operators.asof import asof_join, asof_join_broadcast
from dagli_spark.operators.window_features import (
    backward_fill,
    forward_fill,
    rolling,
    sessionize,
    with_lag,
    with_lead,
)

__all__ = [
    "asof_join",
    "asof_join_broadcast",
    "with_lag",
    "with_lead",
    "forward_fill",
    "backward_fill",
    "sessionize",
    "rolling",
]
