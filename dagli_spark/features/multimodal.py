"""Audio/video columns as opaque binary + typed metadata, with REAL
Spark-side plumbing (schema, Arrow batch shape, iterator-UDF signature —
the same stateful-minibatch pattern as image decode,
/root/reference/core/src/main/java/com/linkedin/dagli/transformer/internal/PreparedTransformerInternalAPI.java:96-165)
and codecs split by what this container can honestly decode: RIFF/WAVE
integer PCM decodes FOR REAL through the stdlib ``wave`` module (round 5);
compressed audio (flac/mp3/ogg/ADPCM) and all real video containers still
raise ``NotImplementedError`` with the swap point documented (no
libsndfile/ffmpeg here), while a deterministic fake container
("FAKA"/"FAKV", header + raw payload) lets every downstream stage —
batching, shape handling, feature math, partitioning — be exercised
end-to-end in tests.

Swapping in real codecs touches ONLY ``decode_audio`` / ``iter_video_frames``
(e.g. soundfile.read / av.open); schemas and UDFs are unchanged.

Robustness contract: a corrupt payload degrades to an all-null feature row
(like a null payload) — one bad row must never fail the whole Spark stage.
Unsupported REAL formats still raise NotImplementedError loudly (that is a
deployment gap, not a data problem).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
)

from dagli_spark.features.image_features import append_binary_features

_FAKA = b"FAKA"  # fake audio: FAKA | u32 sample_rate | u32 n | int16 PCM
_FAKV = b"FAKV"  # fake video: FAKV | u32 w | u32 h | u32 n_frames | frames
                 # (each frame = w*h bytes, single gray channel)


# ------------------------------------------------------------------ audio

def encode_fake_audio(pcm: np.ndarray, sample_rate: int) -> bytes:
    assert pcm.dtype == np.int16
    return _FAKA + struct.pack("<II", sample_rate, len(pcm)) + pcm.tobytes()


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE PCM decode through the stdlib ``wave`` module
    (round-5: the one real audio container this environment CAN decode —
    no libsndfile needed). 8/16/32-bit integer PCM; multi-channel is
    downmixed to mono by channel mean (the feature set is
    channel-agnostic). Truncated/corrupt payloads raise ValueError (row
    degrades to nulls); compressed WAV variants (ADPCM, mu-law...) raise
    NotImplementedError (a codec gap, not a data problem)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data)) as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except wave.Error as e:
        if "unknown format" in str(e).lower():
            raise NotImplementedError(
                f"compressed WAV unsupported by the stdlib decoder: {e} "
                "(swap decode_audio for soundfile.read)") from e
        raise ValueError(f"corrupt WAV payload: {e}") from e
    except EOFError as e:
        raise ValueError("truncated WAV payload") from e
    if sr <= 0 or ch <= 0:
        raise ValueError("corrupt WAV header (zero rate/channels)")
    if sw == 2:
        pcm = np.frombuffer(raw, dtype="<i2")
    elif sw == 1:  # 8-bit WAV is unsigned by spec
        pcm = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128)
               << 8)
    elif sw == 4:
        pcm = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
    else:
        raise NotImplementedError(f"{sw * 8}-bit PCM WAV unsupported")
    if ch > 1:
        pcm = (pcm[: (len(pcm) // ch) * ch]
               .reshape(-1, ch).mean(axis=1).astype(np.int16))
    return pcm, sr


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 PCM, sample_rate). RIFF/WAVE integer PCM decodes for real
    (stdlib ``wave`` — see :func:`_decode_wav`); flac/mp3/ogg need an
    audio lib this container lacks — swap this function for
    ``soundfile.read`` on a real cluster. Raises ValueError for corrupt
    payloads (truncated, zero sample rate) in either container."""
    if data[:4] == _FAKA:
        if len(data) < 12:
            raise ValueError("truncated FAKA header")
        sr, n = struct.unpack("<II", data[4:12])
        if sr == 0 or len(data) < 12 + 2 * n:
            raise ValueError("corrupt FAKA payload")
        return np.frombuffer(data[12:12 + 2 * n], dtype=np.int16), sr
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return _decode_wav(data)
    raise NotImplementedError(
        "real audio codecs beyond RIFF/WAVE PCM unavailable in this "
        "environment; supported containers: WAV-PCM (stdlib) and the FAKA "
        "deterministic test container (swap decode_audio for "
        "soundfile.read to enable flac/mp3/ogg)")


AUDIO_FIELDS = [
    StructField("au_duration_s", DoubleType()),
    StructField("au_sample_rate", IntegerType()),
    StructField("au_rms", DoubleType()),
    StructField("au_zero_cross_rate", DoubleType()),
    StructField("au_peak", DoubleType()),
]

_AU_NULL = (None,) * len(AUDIO_FIELDS)


def _audio_batch(datas: pd.Series) -> list[tuple]:
    rows = []
    for b in datas:
        if b is None:
            rows.append(_AU_NULL)
            continue
        try:
            pcm, sr = decode_audio(b)
        except ValueError:
            rows.append(_AU_NULL)  # corrupt row degrades, job survives
            continue
        x = pcm.astype(np.float64) / 32768.0
        zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
        rows.append((
            len(pcm) / sr, sr,
            float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
            zc, float(np.max(np.abs(x))) if len(x) else 0.0,
        ))
    return rows


def with_audio_features(df: DataFrame, bytes_col: str = "audio_bytes",
                        *, drop_bytes: bool = True) -> DataFrame:
    """Duration / RMS / zero-crossing-rate / peak per row, Arrow-batched;
    the binary payload crosses into Python once and is not echoed back."""
    return append_binary_features(df, bytes_col, AUDIO_FIELDS,
                                  _audio_batch, drop_bytes=drop_bytes)


# ------------------------------------------------------------------ video

def encode_fake_video(frames: np.ndarray) -> bytes:
    """frames: (n, h, w) uint8 grayscale."""
    n, h, w = frames.shape
    return _FAKV + struct.pack("<III", w, h, n) + frames.tobytes()


def _parse_fakv_header(data: bytes) -> tuple[int, int, int]:
    """Validated (w, h, n_frames) — the ONE place the header is parsed."""
    if data[:4] != _FAKV:
        raise NotImplementedError(
            "real video demuxers unavailable in this environment; only the "
            "FAKV deterministic test container is supported (swap "
            "iter_video_frames for PyAV to enable mp4/webm)")
    if len(data) < 16:
        raise ValueError("truncated FAKV header")
    w, h, n = struct.unpack("<III", data[4:16])
    if len(data) < 16 + n * w * h:
        raise ValueError("truncated FAKV frames")
    return w, h, n


def iter_video_frames(data: bytes, *, every_n: int = 1):
    """Yield (frame_index, (h, w) uint8 array) lazily — one frame in memory
    at a time (a real PyAV swap keeps the same generator shape)."""
    w, h, n = _parse_fakv_header(data)
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

_VI_NULL = (None,) * len(VIDEO_FIELDS)


def _video_batch_fn(every_n: int):
    def batch(datas: pd.Series) -> list[tuple]:
        rows = []
        for b in datas:
            if b is None:
                rows.append(_VI_NULL)
                continue
            try:
                _w, _h, total = _parse_fakv_header(b)
            except ValueError:
                rows.append(_VI_NULL)
                continue
            # streaming fold: only the previous frame stays in memory —
            # materializing every sampled frame of a long video would OOM
            n_s, bright_sum, motion_sum, prev = 0, 0.0, 0.0, None
            for _, frame in iter_video_frames(b, every_n=every_n):
                n_s += 1
                bright_sum += float(frame.mean())
                if prev is not None:
                    motion_sum += float(
                        np.abs(frame.astype(np.int32)
                               - prev.astype(np.int32)).mean())
                prev = frame
            rows.append((
                total, n_s,
                bright_sum / n_s if n_s else None,
                motion_sum / (n_s - 1) if n_s > 1 else 0.0 if n_s else None,
            ))
        return rows

    return batch


def with_video_features(df: DataFrame, bytes_col: str = "video_bytes",
                        *, every_n: int = 1,
                        drop_bytes: bool = True) -> DataFrame:
    """Frame-sampled brightness + inter-frame motion energy (mean |Δ|
    between consecutive SAMPLED frames) per row, Arrow-batched."""
    return append_binary_features(df, bytes_col, VIDEO_FIELDS,
                                  _video_batch_fn(every_n),
                                  drop_bytes=drop_bytes)
