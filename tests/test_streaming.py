"""Streaming operators: streaming results must equal the batch semantics
(the engine-wide parallelism/execution-strategy invariance contract)."""

import os

from pyspark.sql import functions as F

from dagli_spark.fixtures import materialize
from dagli_spark.operators import window_features as wf
from dagli_spark.streaming import streaming_locf_features, streaming_session_agg


def _stream_from_parquet(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode("append" if name == "locf" else "complete")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_session_agg_matches_batch(spark):
    paths = materialize(spark, "smoke")
    batch = spark.read.parquet(paths["image_events"])
    got_batch = streaming_session_agg(batch)

    sdf = _stream_from_parquet(spark, paths["image_events"])
    got_stream = _run_stream(spark, streaming_session_agg(sdf), "sess")

    cols = ["entity_id", "session_start", "session_end", "n_events", "sum_label"]
    a = sorted(str(r) for r in got_batch.select(*cols).collect())
    b = sorted(str(r) for r in got_stream.select(*cols).collect())
    assert a == b and len(a) > 0


def test_streaming_locf_matches_batch_window(spark):
    paths = materialize(spark, "smoke")
    batch = spark.read.parquet(paths["image_events"]).select(
        "entity_id", "event_time", "label"
    )
    sdf = _stream_from_parquet(spark, paths["image_events"]).select(
        "entity_id", "event_time", "label"
    )
    got = _run_stream(spark, streaming_locf_features(sdf), "locf")

    w = wf.spec("entity_id", ["event_time"])
    exp = wf.forward_fill(batch, "label", w, alias="label_locf").select(
        "entity_id", "event_time", "label_locf"
    )
    # fixture has ~1% duplicate timestamps; LOCF at equal times is
    # order-dependent there, so compare on unique (entity, time) keys
    dup = batch.groupBy("entity_id", "event_time").count().where("count > 1") \
        .select("entity_id", "event_time")
    got_u = got.join(dup, ["entity_id", "event_time"], "left_anti")
    exp_u = exp.join(dup, ["entity_id", "event_time"], "left_anti")
    a = sorted(str(r) for r in got_u.collect())
    b = sorted(str(r) for r in exp_u.collect())
    assert a == b and len(a) > 0


def test_streaming_windowed_agg_matches_batch(spark):
    from dagli_spark.streaming.ops import streaming_windowed_agg

    paths = materialize(spark, "smoke")
    batch = spark.read.parquet(paths["image_events"])
    got_batch = streaming_windowed_agg(batch, window="2 hours", slide="1 hour")

    sdf = _stream_from_parquet(spark, paths["image_events"])
    got_stream = _run_stream(
        spark, streaming_windowed_agg(sdf, window="2 hours", slide="1 hour"),
        "winagg")

    cols = ["entity_id", "window_start", "window_end", "n_events", "sum_label"]
    a = sorted(str(r) for r in got_batch.select(*cols).collect())
    b = sorted(str(r) for r in got_stream.select(*cols).collect())
    assert a == b and len(a) > 0


def test_streaming_locf_state_survives_restart(spark, tmp_path):
    """Kill-and-restart resumability for the STATEFUL streaming path: the
    second run must resume from the checkpointed state store (carrying each
    entity's last observation across the restart), not recompute or lose
    state — the streaming analogue of the batch checkpoint/resume test."""
    import shutil

    from pyspark.sql import functions as F2

    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    rows1 = [("e1", "2026-01-01 00:00:00", 1.0),
             ("e1", "2026-01-01 00:10:00", None),
             ("e2", "2026-01-01 00:00:00", 7.0)]
    rows2 = [("e1", "2026-01-01 01:00:00", None),   # must LOCF to 1.0 (old state)
             ("e2", "2026-01-01 01:00:00", None),   # must LOCF to 7.0
             ("e2", "2026-01-01 01:30:00", 9.0)]

    def write_batch(rows, name):
        df = spark.createDataFrame(rows, "entity_id string, t string, label double") \
            .select("entity_id", F2.col("t").cast("timestamp").alias("event_time"),
                    "label")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/{name}")
        return df.schema

    schema = write_batch(rows1, "b1")

    def run_once():
        sdf = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "100").parquet(f"{src_dir}/*")
        q = streaming_locf_features(sdf).writeStream \
            .format("parquet").option("path", out_dir) \
            .option("checkpointLocation", ckpt) \
            .outputMode("append").trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_once()                      # run 1: consumes b1, checkpoints state
    write_batch(rows2, "b2")
    run_once()                      # run 2: restart from checkpoint, b2 only

    got = {(r["entity_id"], str(r["event_time"])): r["label_locf"]
           for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 6            # no duplicates: b1 not reprocessed
    assert got[("e1", "2026-01-01 01:00:00")] == 1.0   # state survived restart
    assert got[("e2", "2026-01-01 01:00:00")] == 7.0
    assert got[("e2", "2026-01-01 01:30:00")] == 9.0


def test_streaming_locf_late_data_does_not_regress_state(spark, tmp_path):
    """A late (in-watermark) event older than the carried state must not
    overwrite it — subsequent rows keep the newest observation."""
    from pyspark.sql import functions as F2

    src_dir = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out2")

    def write_batch(rows, name):
        df = spark.createDataFrame(rows, "entity_id string, t string, label double") \
            .select("entity_id", F2.col("t").cast("timestamp").alias("event_time"),
                    "label")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/{name}")
        return df.schema

    schema = write_batch([("e1", "2026-01-01 10:00:00", 5.0)], "b1")

    def run_once():
        sdf = spark.readStream.schema(schema).parquet(f"{src_dir}/*")
        q = streaming_locf_features(sdf).writeStream \
            .format("parquet").option("path", out_dir) \
            .option("checkpointLocation", ckpt) \
            .outputMode("append").trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_once()
    # batch 2: a LATE observation (09:30 < carried 10:00) plus a new null row
    write_batch([("e1", "2026-01-01 09:30:00", 3.0),
                 ("e1", "2026-01-01 11:00:00", None)], "b2")
    run_once()

    got = {str(r["event_time"]): r["label_locf"]
           for r in spark.read.parquet(out_dir).collect()}
    assert got["2026-01-01 11:00:00"] == 5.0  # NOT regressed to 3.0


def test_locf_late_row_never_reads_future_state():
    """Zero-leakage for late rows (round-2 review fix): a row older than
    the carried state must not be stamped with that state's label
    (observed at a LATER time); it may only take same-batch observations
    at or before its own time."""
    import pandas as pd

    from dagli_spark.streaming.ops import _locf_fn

    class _State:
        def __init__(self, value):
            self._v = value
        @property
        def exists(self):
            return self._v is not None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self._v = v

    t = pd.Timestamp
    state = _State((t("2026-01-01 10:00"), 5.0))
    batch = pd.DataFrame({
        "entity_id": ["e"] * 4,
        "event_time": [t("2026-01-01 08:00"), t("2026-01-01 09:00"),
                       t("2026-01-01 11:00"), t("2026-01-01 12:00")],
        "label": [7.0, None, None, 9.0],
    })
    [out] = list(_locf_fn(("e",), iter([batch]), state))
    got = dict(zip(out["event_time"], out["label_locf"]))
    # late null row (09:00) takes the same-batch 08:00 obs, NOT state 5.0
    assert got[t("2026-01-01 09:00")] == 7.0
    # non-late null row (11:00) takes the carried state (observed 10:00)
    assert got[t("2026-01-01 11:00")] == 5.0
    assert got[t("2026-01-01 12:00")] == 9.0
    # state advanced to the newest observation
    assert state.get == (t("2026-01-01 12:00"), 9.0)
    # and with no same-batch obs, a late row is null (never the state)
    state2 = _State((t("2026-01-01 10:00"), 5.0))
    batch2 = pd.DataFrame({
        "entity_id": ["e"],
        "event_time": [t("2026-01-01 09:30")],
        "label": [None],
    })
    [out2] = list(_locf_fn(("e",), iter([batch2]), state2))
    assert out2["label_locf"][0] is None
