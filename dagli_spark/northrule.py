"""The north-rule pipeline: point-in-time feature vectors for
(entity_id, asof_time) requests over an image+caption event stream.

Dataflow (each step one declarative DataFrame stage; Catalyst fuses):

1. ``image_events ⋈ images[image_id, phash]`` — narrow dimension join
   (phash only; the fat ``bytes`` column is never read here — column
   pruning keeps it out of the scan).
2. Per-entity windowed features over ``(event_time, eseq)``: lag(label),
   phash Hamming distance to previous image, rolling label mean (5 rows),
   trailing 1h event count, gap sessionization, seconds-since-previous.
   One window spec -> one sort serves all (SURVEY.md §2.6).
3. As-of join of the query table onto the featured events (union + LOCF
   sort-merge; optional time-bucketed path for hot entities).
4. Decode-stage features for the matched image only (Arrow UDF): pixel
   stats + phash recheck — bounded by |queries|, never |events|.
5. Assemble ``feature_vector`` (array<double>) + the 64-dim phash
   embedding; keep ``__asof_matched_time`` for the leakage audit.

Zero-temporal-leakage contract: every window frame ends at the current
row and the as-of join only admits event_time <= asof_time; the audit
query (:func:`leakage_audit`) verifies max(matched event_time) <= asof_time
over the output — the event-time generalization of the reference's
KFoldCrossTrained anti-leakage contract
(/root/reference/common/src/main/java/com/linkedin/dagli/meta/KFoldCrossTrained.java:30-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagli_spark.features.image_features import (
    phash_embedding_col,
    phash_hamming_col,
    with_decode_features,
)
from dagli_spark.operators import window_features as wf
from dagli_spark.operators.asof import MATCHED_TIME, asof_join

FEATURE_NAMES = [
    "label_locf", "label_lag1", "label_avg5", "cnt_1h", "session_id",
    "secs_since_prev", "hamming_prev",
    "px_mean_r", "px_mean_g", "px_mean_b", "px_std", "px_brightness",
    "px_edge_energy",
]


def event_features(events: DataFrame, images: DataFrame) -> DataFrame:
    """Steps 1-2: per-event windowed features (no pixels touched)."""
    dim = images.select("image_id", "phash")  # narrow projection -> prunable
    ev = events.join(dim, "image_id")
    w = wf.spec("entity_id", ["event_time", "eseq"])
    out = wf.with_lag(ev, "label", 1, w, alias="label_lag1")
    out = out.withColumn("phash_prev", F.lag("phash").over(w))
    out = out.withColumn(
        "hamming_prev",
        F.coalesce(phash_hamming_col("phash", F.col("phash_prev")), F.lit(-1))
        .cast("double"),
    ).drop("phash_prev")
    out = wf.rolling(out, {"label_avg5": F.avg("label")}, w, rows=(-4, 0))
    out = out.withColumn(
        "epoch_s",
        F.floor(F.unix_micros(F.col("event_time").cast("timestamp")) / 1_000_000),
    )
    w_range = wf.spec("entity_id", ["epoch_s"])
    out = wf.rolling(out, {"cnt_1h": F.count(F.lit(1))}, w_range, range_=(-3600, 0))
    out = wf.sessionize(out, "event_time", F.expr("INTERVAL 30 MINUTES"), w)
    out = out.withColumn(
        "secs_since_prev",
        F.coalesce(
            (F.col("epoch_s") - F.lag("epoch_s").over(w)).cast("double"),
            F.lit(-1.0),
        ),
    )
    return out


def asof_features(
    queries: DataFrame, featured_events: DataFrame, *,
    strict: bool = False, time_buckets: int = 0, bucket_width=None,
) -> DataFrame:
    """Step 3: attach the latest visible event's features to each query."""
    vals = ["image_id", "label", "label_lag1", "label_avg5", "cnt_1h",
            "session_id", "secs_since_prev", "hamming_prev"]
    ev = featured_events.select(
        "entity_id", "event_time", "eseq",
        *[F.col(v).alias(f"ev_{v}") for v in vals],
    )
    return asof_join(
        queries, ev, on="entity_id", left_time="asof_time",
        right_time="event_time",
        values=[f"ev_{v}" for v in vals], tiebreak="eseq", strict=strict,
        keep_matched_time=True, time_buckets=time_buckets,
        bucket_width=bucket_width,
    )


def attach_pixel_features(asof_out: DataFrame, images: DataFrame) -> DataFrame:
    """Step 4: decode only matched images. The bytes column enters the plan
    here and nowhere else."""
    matched = asof_out.withColumnRenamed("ev_image_id", "image_id")
    with_bytes = matched.join(
        images.select("image_id", "bytes", "phash"), "image_id", "left"
    )
    return with_decode_features(with_bytes, "bytes").drop("bytes")


def assemble_vector(df: DataFrame) -> DataFrame:
    cols = {
        "label_locf": F.col("ev_label"),
        "label_lag1": F.col("ev_label_lag1"),
        "label_avg5": F.col("ev_label_avg5"),
        "cnt_1h": F.col("ev_cnt_1h").cast("double"),
        "session_id": F.col("ev_session_id").cast("double"),
        "secs_since_prev": F.col("ev_secs_since_prev"),
        "hamming_prev": F.col("ev_hamming_prev"),
        "px_mean_r": F.col("px_mean_r"),
        "px_mean_g": F.col("px_mean_g"),
        "px_mean_b": F.col("px_mean_b"),
        "px_std": F.col("px_std"),
        "px_brightness": F.col("px_brightness"),
        "px_edge_energy": F.col("px_edge_energy"),
    }
    vec = F.array(*[F.coalesce(cols[n], F.lit(float("nan"))).cast("double")
                    for n in FEATURE_NAMES])
    return df.withColumn("feature_vector", vec).withColumn(
        "phash_embedding",
        F.when(F.col("phash").isNotNull(), phash_embedding_col("phash")),
    )


def build_features(
    queries: DataFrame, events: DataFrame, images: DataFrame, *,
    strict: bool = False, time_buckets: int = 0, bucket_width=None,
    with_pixels: bool = True,
) -> DataFrame:
    """Full pipeline; returns one row per query row with feature_vector,
    phash_embedding, and the leakage-audit matched-time column."""
    feats = event_features(events, images)
    out = asof_features(queries, feats, strict=strict,
                        time_buckets=time_buckets, bucket_width=bucket_width)
    if with_pixels:
        out = attach_pixel_features(out, images)
    else:
        out = out.withColumn("phash", F.lit(None).cast("long"))
        for c in ("px_mean_r", "px_mean_g", "px_mean_b", "px_std",
                  "px_brightness", "px_edge_energy"):
            out = out.withColumn(c, F.lit(None).cast("double"))
    return assemble_vector(out)


def leakage_audit(result: DataFrame) -> dict:
    """Runtime zero-leakage proof: no feature row used an event newer than
    its asof_time. Returns counters; raises AssertionError on violation."""
    agg = result.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.col(MATCHED_TIME) > F.col("asof_time"), 1).otherwise(0)
        ).alias("violations"),
        F.sum(F.when(F.col(MATCHED_TIME).isNull(), 1).otherwise(0))
         .alias("no_history_rows"),
    ).first()
    out = {k: (int(agg[k]) if agg[k] is not None else 0)
           for k in ("rows", "violations", "no_history_rows")}
    if out["violations"]:
        raise AssertionError(f"temporal leakage detected: {out}")
    return out


def run(spark: SparkSession, paths: dict[str, str], **opts) -> DataFrame:
    images = spark.read.parquet(paths["images"])
    events = spark.read.parquet(paths["image_events"])
    queries = spark.read.parquet(paths["queries"])
    return build_features(queries, events, images, **opts)
