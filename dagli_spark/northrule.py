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


def image_stats(events: DataFrame, images: DataFrame) -> DataFrame:
    """Decode-stage stats for every DISTINCT image referenced by events —
    each image decoded exactly once, in one massively parallel Arrow-UDF
    pass over the images scan (the distinct id set is broadcast onto it, so
    the fat bytes column never crosses a shuffle)."""
    needed = events.select("image_id").distinct()
    to_decode = images.select("image_id", "bytes", "phash").join(
        F.broadcast(needed), "image_id"
    )
    return with_decode_features(to_decode, "bytes").drop("bytes")


def event_features(events: DataFrame, images: DataFrame,
                   *, with_pixels: bool = True) -> DataFrame:
    """Steps 1-2: per-event windowed features. With ``with_pixels`` the
    per-image decode stats ride along from the start (computed once per
    distinct image), so the whole pipeline is a single forward pass."""
    if with_pixels:
        dim = image_stats(events, images)
    else:
        dim = images.select("image_id", "phash")  # narrow -> prunable
    # LEFT join: an event whose image is missing/late must NOT silently
    # vanish — dropping it would shift every downstream lag/session/count
    # feature for its neighbors; unresolved rows just get null phash/pixel
    # stats (hamming_prev already coalesces null -> -1)
    ev = events.join(dim, "image_id", "left")
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
    out = wf.sessionize(out, "event_time", F.expr("INTERVAL 30 MINUTES"), w)
    out = out.withColumn(
        "secs_since_prev",
        F.coalesce(
            (F.col("epoch_s") - F.lag("epoch_s").over(w)).cast("double"),
            F.lit(-1.0),
        ),
    )
    # The one differently-ordered window comes LAST: every (event_time,
    # eseq)-ordered window above shares a single sort, and cnt_1h's
    # (epoch_s)-ordered range frame adds exactly one more — interleaving it
    # mid-chain (as round 2 did) made the planner re-sort the full event
    # table a THIRD time (2 sorts total now, pinned by
    # tests/test_images_northrule.py).
    w_range = wf.spec("entity_id", ["epoch_s"])
    out = wf.rolling(out, {"cnt_1h": F.count(F.lit(1))}, w_range, range_=(-3600, 0))
    return out


PX_COLS = ["px_mean_r", "px_mean_g", "px_mean_b", "px_std", "px_brightness",
           "px_edge_energy"]


def asof_features(
    queries: DataFrame, featured_events: DataFrame, *,
    strict: bool = False, time_buckets: int = 0, bucket_width=None,
) -> DataFrame:
    """Step 3: attach the latest visible event's features to each query."""
    vals = ["image_id", "label", "label_lag1", "label_avg5", "cnt_1h",
            "session_id", "secs_since_prev", "hamming_prev"]
    vals += [c for c in ("phash", *PX_COLS) if c in featured_events.columns]
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
    """Step 4: decode only matched images — each DISTINCT image exactly once
    (many queries share a matched image; decoding per query row would
    multiply the Python-side work). The decoded-stats frame is
    dictionary-sized, so it broadcast-joins back onto the query rows: the
    fat ``bytes`` column enters the plan only inside the decode stage and
    never crosses a shuffle attached to the fact table."""
    matched = asof_out.withColumnRenamed("ev_image_id", "image_id")
    needed = matched.select("image_id").where(F.col("image_id").isNotNull()).distinct()
    # broadcast the id set explicitly (like image_stats): `needed` comes
    # from a complex subtree Catalyst cannot size, and a sort-merge plan
    # here would shuffle the fat bytes column
    to_decode = F.broadcast(needed).join(
        images.select("image_id", "bytes", "phash"), "image_id")
    stats = with_decode_features(to_decode, "bytes").drop("bytes")
    return matched.join(F.broadcast(stats), "image_id", "left")


def assemble_vector(df: DataFrame) -> DataFrame:
    def pick(n):
        if f"ev_{n}" in df.columns:
            return F.col(f"ev_{n}")
        if n in df.columns:
            return F.col(n)
        return F.lit(None)

    named = {
        "label_locf": pick("label"),
        "cnt_1h": pick("cnt_1h").cast("double"),
        "session_id": pick("session_id").cast("double"),
    }
    vec = F.array(*[
        F.coalesce(named.get(n, pick(n)), F.lit(float("nan"))).cast("double")
        for n in FEATURE_NAMES
    ])
    ph = "ev_phash" if "ev_phash" in df.columns else "phash"
    out = df.withColumn("feature_vector", vec)
    if ph in df.columns:
        out = out.withColumn(
            "phash_embedding",
            F.when(F.col(ph).isNotNull(), phash_embedding_col(ph)),
        )
    else:
        out = out.withColumn("phash_embedding", F.lit(None).cast("array<float>"))
    return out


def build_features(
    queries: DataFrame, events: DataFrame, images: DataFrame, *,
    strict: bool = False, time_buckets: int = 0, bucket_width=None,
    with_pixels: bool = True, decode_scope: str = "events",
) -> DataFrame:
    """Full pipeline; returns one row per query row with feature_vector,
    phash_embedding, and the leakage-audit matched-time column.

    decode_scope:
      - ``"events"`` (default): decode every distinct image referenced by
        events ONCE and carry the stats through the single forward pass —
        no persist, no second as-of computation; the scalable shape when
        query coverage is dense.
      - ``"matched"``: decode only images actually matched by a query —
        cheaper when queries are sparse relative to events; costs one
        persist of the as-of output (two consumers).
    """
    if with_pixels and decode_scope == "events":
        feats = event_features(events, images, with_pixels=True)
        out = asof_features(queries, feats, strict=strict,
                            time_buckets=time_buckets, bucket_width=bucket_width)
        return assemble_vector(out)

    feats = event_features(events, images, with_pixels=False)
    out = asof_features(queries, feats, strict=strict,
                        time_buckets=time_buckets, bucket_width=bucket_width)
    if with_pixels:
        # the as-of output feeds two consumers (distinct-image id set and
        # the final stats join) — persist so the union+LOCF sort runs once.
        # The cache lives until session end / storage eviction; a long-lived
        # service calling this repeatedly should spark.catalog.clearCache()
        # between jobs (bench.py does).
        out = out.persist()
        out = attach_pixel_features(out, images)
    else:
        out = out.withColumn("phash", F.lit(None).cast("long"))
        for c in PX_COLS:
            out = out.withColumn(c, F.lit(None).cast("double"))
    return assemble_vector(out)


def leakage_audit(result: DataFrame, *, strict: bool = False) -> dict:
    """Runtime zero-leakage proof: no feature row used an event newer than
    its asof_time (with ``strict=True``, newer OR EQUAL — an equality
    match is a leak under the strict contract). Returns counters; raises
    AssertionError on violation."""
    leak = (F.col(MATCHED_TIME) >= F.col("asof_time") if strict
            else F.col(MATCHED_TIME) > F.col("asof_time"))
    agg = result.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(leak, 1).otherwise(0)).alias("violations"),
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
