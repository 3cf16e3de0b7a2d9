"""Structured Streaming variants of the temporal operators."""

from dagli_spark.streaming.ops import (
    streaming_locf_features,
    streaming_session_agg,
    streaming_windowed_agg,
)

__all__ = ["streaming_session_agg", "streaming_locf_features",
           "streaming_windowed_agg"]
