"""Audio/video columns as opaque binary + typed metadata, with REAL
Spark-side plumbing (schema, Arrow batch shape, iterator-UDF signature —
the same stateful-minibatch pattern as image decode,
/root/reference/core/src/main/java/com/linkedin/dagli/transformer/internal/PreparedTransformerInternalAPI.java:96-165)
and STUB codecs: this container ships no libsndfile/ffmpeg, so real decode
raises ``NotImplementedError`` with the swap point documented, while a
deterministic fake container ("FAKA"/"FAKV", header + raw payload) lets
every downstream stage — batching, shape handling, feature math,
partitioning — be exercised end-to-end in tests.

Swapping in real codecs touches ONLY ``decode_audio`` / ``iter_video_frames``
(e.g. soundfile.read / av.open); schemas and UDFs are unchanged.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

_FAKA = b"FAKA"  # fake audio: FAKA | u32 sample_rate | u32 n | int16 PCM
_FAKV = b"FAKV"  # fake video: FAKV | u32 w | u32 h | u32 n_frames | frames
                 # (each frame = w*h bytes, single gray channel)


# ------------------------------------------------------------------ audio

def encode_fake_audio(pcm: np.ndarray, sample_rate: int) -> bytes:
    assert pcm.dtype == np.int16
    return _FAKA + struct.pack("<II", sample_rate, len(pcm)) + pcm.tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 PCM, sample_rate). Real formats (wav/flac/mp3) need an
    audio lib this container lacks — swap this function for
    ``soundfile.read`` on a real cluster."""
    if data[:4] == _FAKA:
        sr, n = struct.unpack("<II", data[4:12])
        return np.frombuffer(data[12:12 + 2 * n], dtype=np.int16), sr
    raise NotImplementedError(
        "real audio codecs unavailable in this environment; only the FAKA "
        "deterministic test container is supported (swap decode_audio for "
        "soundfile.read to enable wav/flac)")


AUDIO_FIELDS = [
    StructField("au_duration_s", DoubleType()),
    StructField("au_sample_rate", IntegerType()),
    StructField("au_rms", DoubleType()),
    StructField("au_zero_cross_rate", DoubleType()),
    StructField("au_peak", DoubleType()),
]


def with_audio_features(df: DataFrame, bytes_col: str = "audio_bytes",
                        *, drop_bytes: bool = True) -> DataFrame:
    """Duration / RMS / zero-crossing-rate / peak per row, Arrow-batched;
    the binary payload crosses into Python once and is not echoed back."""
    keep = [f for f in df.schema.fields
            if not (drop_bytes and f.name == bytes_col)]
    out_schema = StructType(keep + AUDIO_FIELDS)
    names = [f.name for f in AUDIO_FIELDS]
    keep_names = [f.name for f in keep]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for b in pdf[bytes_col]:
                if b is None:
                    rows.append((None,) * len(names))
                    continue
                pcm, sr = decode_audio(b)
                x = pcm.astype(np.float64) / 32768.0
                zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
                rows.append((
                    len(pcm) / sr, sr,
                    float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                    zc, float(np.max(np.abs(x))) if len(x) else 0.0,
                ))
            fdf = pd.DataFrame(rows, columns=names, index=pdf.index)
            yield pd.concat([pdf[keep_names], fdf], axis=1)

    return df.mapInPandas(gen, schema=out_schema)


# ------------------------------------------------------------------ video

def encode_fake_video(frames: np.ndarray) -> bytes:
    """frames: (n, h, w) uint8 grayscale."""
    n, h, w = frames.shape
    return _FAKV + struct.pack("<III", w, h, n) + frames.tobytes()


def iter_video_frames(data: bytes, *, every_n: int = 1):
    """Yield (frame_index, (h, w) uint8 array). Real containers (mp4/webm)
    need ffmpeg/PyAV — swap this for ``av.open`` frame iteration."""
    if data[:4] != _FAKV:
        raise NotImplementedError(
            "real video demuxers unavailable in this environment; only the "
            "FAKV deterministic test container is supported (swap "
            "iter_video_frames for PyAV to enable mp4/webm)")
    w, h, n = struct.unpack("<III", data[4:16])
    frame_sz = w * h
    for i in range(0, n, every_n):
        off = 16 + i * frame_sz
        yield i, np.frombuffer(data[off:off + frame_sz],
                               dtype=np.uint8).reshape(h, w)


VIDEO_FIELDS = [
    StructField("vi_n_frames", IntegerType()),
    StructField("vi_sampled_frames", IntegerType()),
    StructField("vi_mean_brightness", DoubleType()),
    StructField("vi_motion_energy", DoubleType()),
]


def with_video_features(df: DataFrame, bytes_col: str = "video_bytes",
                        *, every_n: int = 1,
                        drop_bytes: bool = True) -> DataFrame:
    """Frame-sampled brightness + inter-frame motion energy (mean |Δ|
    between consecutive SAMPLED frames) per row, Arrow-batched."""
    keep = [f for f in df.schema.fields
            if not (drop_bytes and f.name == bytes_col)]
    out_schema = StructType(keep + VIDEO_FIELDS)
    names = [f.name for f in VIDEO_FIELDS]
    keep_names = [f.name for f in keep]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for b in pdf[bytes_col]:
                if b is None:
                    rows.append((None,) * len(names))
                    continue
                total = struct.unpack("<III", b[4:16])[2]
                frames = [f for _, f in iter_video_frames(b, every_n=every_n)]
                bright = float(np.mean([f.mean() for f in frames]))
                motion = 0.0
                if len(frames) > 1:
                    motion = float(np.mean([
                        np.abs(frames[i + 1].astype(np.int32)
                               - frames[i].astype(np.int32)).mean()
                        for i in range(len(frames) - 1)
                    ]))
                rows.append((total, len(frames), bright, motion))
            fdf = pd.DataFrame(rows, columns=names, index=pdf.index)
            yield pd.concat([pdf[keep_names], fdf], axis=1)

    return df.mapInPandas(gen, schema=out_schema)
