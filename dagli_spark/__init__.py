"""dagli_spark — a PySpark-native feature-engineering engine.

A from-scratch reimagining of the capabilities of linkedin/dagli
(/root/reference) on Spark's DataFrame/Catalyst execution model:

- Dagli's immutable producer DAG (Placeholder / Generator /
  PreparedTransformer / PreparableTransformer / TransformerView,
  reference: core/src/main/java/com/linkedin/dagli/producer/Producer.java:18-33)
  becomes a :class:`dagli_spark.pipeline.Pipeline` of DataFrame->DataFrame
  stages, where *prepared* transformers are Catalyst column expressions or
  Arrow-vectorized pandas UDFs, and *preparable* transformers are fit passes
  (aggregations) whose fitted state is broadcast back into the plan.
- Dagli's positional row alignment (documentation/dag.md:12-13) generalizes
  to keyed, temporal alignment: the point-in-time **as-of join** plus
  windowed feature generators (lag/lead, LOCF backfill, gap sessionization,
  rolling frames) in :mod:`dagli_spark.operators`.
- Dagli's anti-leakage contract (KFoldCrossTrained,
  common/src/main/java/com/linkedin/dagli/meta/KFoldCrossTrained.java:30-63)
  generalizes to event time: no feature at (entity, t) may read rows with
  event_time > t — enforced by construction (every window frame ends at the
  current row; the as-of join admits only event_time <= asof_time) and
  audited at runtime by :func:`dagli_spark.northrule.leakage_audit`.

Everything here is built on public PySpark 4.x APIs only.
"""

from dagli_spark.operators import (
    asof_join,
    asof_join_broadcast,
    backward_fill,
    forward_fill,
    rolling,
    sessionize,
    with_lag,
    with_lead,
)
from dagli_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "asof_join",
    "asof_join_broadcast",
    "with_lag",
    "with_lead",
    "forward_fill",
    "backward_fill",
    "sessionize",
    "rolling",
    "__version__",
]
