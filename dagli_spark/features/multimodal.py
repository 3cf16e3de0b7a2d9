"""Audio/video columns as opaque binary + typed metadata, with REAL
Spark-side plumbing (schema, Arrow batch shape, iterator-UDF signature —
the same stateful-minibatch pattern as image decode,
/root/reference/core/src/main/java/com/linkedin/dagli/transformer/internal/PreparedTransformerInternalAPI.java:96-165)
and codecs split by what this container can honestly decode: RIFF/WAVE
integer PCM decodes FOR REAL through the stdlib ``wave`` module (round 5),
and raw YUV4MPEG2 video (.y4m — the uncompressed interchange container
used by ffmpeg/x264/mjpegtools) demuxes FOR REAL in pure numpy (round 5,
second session); compressed audio (flac/mp3/ogg/ADPCM) and compressed
video containers (mp4/webm/mkv) still raise ``NotImplementedError`` with
the swap point documented (no libsndfile/ffmpeg here), while a
deterministic fake container ("FAKA"/"FAKV", header + raw payload) lets
every downstream stage — batching, shape handling, feature math,
partitioning — be exercised end-to-end in tests.

Swapping in the remaining codecs touches ONLY ``decode_audio`` /
``iter_video_frames`` (e.g. soundfile.read / av.open); schemas and UDFs
are unchanged.

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
            return _decode_wav_companded(data, e)
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


def _decode_wav_companded(data: bytes, err: Exception) -> tuple[np.ndarray, int]:
    """REAL G.711 μ-law / A-law WAV decode (format tags 7 / 6 — the two
    telephony companding codecs the stdlib CAN expand, via ``audioop``;
    the ``wave`` module itself refuses non-PCM, so the RIFF chunks are
    walked here per the public WAVE spec: 4-byte id + LE u32 size +
    payload, odd sizes padded). ADPCM/float and other compressed tags
    stay NotImplementedError. ``audioop`` is removed in Python 3.13 —
    on such hosts this path degrades to the same documented gap."""
    import struct as _s

    import warnings

    try:
        with warnings.catch_warnings():
            # deprecated-for-removal in 3.13 — that removal is exactly the
            # degrade this except clause documents
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
    except ImportError:
        raise NotImplementedError(
            f"compressed WAV unsupported (no audioop on this Python): "
            f"{err} (swap decode_audio for soundfile.read)") from err
    if len(data) < 12:
        raise ValueError("truncated WAV payload")
    fmt_tag = ch = sr = None
    frames = None
    pos = 12
    while pos + 8 <= len(data):
        cid, sz = data[pos:pos + 4], _s.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"fmt " and len(body) >= 16:
            fmt_tag, ch, sr = _s.unpack("<HHI", body[:8])
        elif cid == b"data":
            frames = body
        pos += 8 + sz + (sz & 1)
    if fmt_tag not in (6, 7):
        raise NotImplementedError(
            f"compressed WAV unsupported by the stdlib decoder: {err} "
            "(format tag "
            f"{fmt_tag}; swap decode_audio for soundfile.read)") from err
    if frames is None or not sr or not ch:
        raise ValueError("corrupt companded WAV (missing data/fmt fields)")
    expand = audioop.ulaw2lin if fmt_tag == 7 else audioop.alaw2lin
    pcm = np.frombuffer(expand(frames, 2), dtype="<i2")
    if ch > 1:
        pcm = (pcm[: (len(pcm) // ch) * ch]
               .reshape(-1, ch).mean(axis=1).astype(np.int16))
    return pcm, sr


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 PCM, sample_rate). RIFF/WAVE integer PCM decodes for real
    (stdlib ``wave`` — see :func:`_decode_wav`), as do G.711 μ-law/A-law
    WAV (:func:`_decode_wav_companded`, stdlib ``audioop``); flac/mp3/ogg
    need an audio lib this container lacks — swap this function for
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


_Y4M_MAGIC = b"YUV4MPEG2 "
# luma-relative chroma payload size per colourspace tag (8-bit planar):
# C420* = two (w/2, h/2) planes, C422 = two (w/2, h) planes,
# C444 = two full planes, Cmono = none. 10/12-bit (C420p10...) and 4:1:1
# are legal y4m we do NOT handle — NotImplementedError, a codec gap.
_Y4M_CHROMA = {
    b"420": (2, 2), b"420jpeg": (2, 2), b"420paldv": (2, 2),
    b"420mpeg2": (2, 2), b"422": (2, 1), b"444": (1, 1), b"mono": None,
}


def encode_y4m(frames: np.ndarray, *, chroma: str = "420") -> bytes:
    """REAL YUV4MPEG2 writer (fixture helper): grayscale luma frames with
    neutral (0x80) chroma planes — any y4m consumer (ffplay, mjpegtools)
    plays the output. frames: (n, h, w) uint8."""
    assert frames.dtype == np.uint8 and frames.ndim == 3
    n, h, w = frames.shape
    sub = _Y4M_CHROMA[chroma.encode()]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(f"C{chroma} requires dims divisible by {sub}")
    neutral = (b"" if sub is None
               else b"\x80" * (2 * (w // sub[0]) * (h // sub[1])))
    parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n"
             % (w, h, chroma.encode())]
    for f in frames:
        parts += [b"FRAME\n", f.tobytes(), neutral]
    return b"".join(parts)


def _parse_y4m(data: bytes) -> tuple[int, int, list[int]]:
    """-> (w, h, luma_offsets) for a YUV4MPEG2 stream — REAL demux, pure
    index arithmetic (no plane is copied here; frames materialize lazily
    in :func:`iter_video_frames`). Stream/frame headers are parsed per
    the public mjpegtools spec: magic + space-separated tags ending at
    LF; each frame is ``FRAME[ params]\\n`` + planar YUV payload."""
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m stream header")
    w = h = None
    chroma = b"420"  # spec default when the C tag is absent
    for tag in data[len(_Y4M_MAGIC):nl].split(b" "):
        if not tag:
            continue
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            chroma = tag[1:]
    if not w or not h or w < 0 or h < 0:
        raise ValueError("y4m header missing/invalid W or H")
    if chroma not in _Y4M_CHROMA:
        raise NotImplementedError(
            f"y4m colourspace C{chroma.decode(errors='replace')} "
            "unsupported (8-bit 420/422/444/mono only — swap "
            "iter_video_frames for PyAV for high-bit-depth streams)")
    sub = _Y4M_CHROMA[chroma]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(f"corrupt y4m: C{chroma.decode()} with odd dims")
    frame_sz = w * h + (0 if sub is None
                        else 2 * (w // sub[0]) * (h // sub[1]))
    offsets, pos = [], nl + 1
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt y4m: bad frame marker")
        fnl = data.find(b"\n", pos + 5)
        if fnl < 0 or fnl + 1 + frame_sz > len(data):
            raise ValueError("truncated y4m frame")
        offsets.append(fnl + 1)
        pos = fnl + 1 + frame_sz
    return w, h, offsets


def _parse_fakv_header(data: bytes) -> tuple[int, int, int]:
    """Validated FAKV (w, h, n_frames)."""
    if len(data) < 16:
        raise ValueError("truncated FAKV header")
    w, h, n = struct.unpack("<III", data[4:16])
    if len(data) < 16 + n * w * h:
        raise ValueError("truncated FAKV frames")
    return w, h, n


def parse_video_header(data: bytes) -> tuple[int, int, int]:
    """Validated (w, h, n_frames) for any supported container — the ONE
    dispatch point (FAKV test container | real YUV4MPEG2)."""
    if data[:4] == _FAKV:
        return _parse_fakv_header(data)
    if data[:len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        w, h, offs = _parse_y4m(data)
        return w, h, len(offs)
    raise NotImplementedError(
        "compressed video demuxers unavailable in this environment; "
        "supported containers: YUV4MPEG2 raw video (real) and the FAKV "
        "deterministic test container (swap iter_video_frames for PyAV "
        "to enable mp4/webm)")


def iter_video_frames(data: bytes, *, every_n: int = 1):
    """Yield (frame_index, (h, w) uint8 LUMA array) lazily — one frame in
    memory at a time (a real PyAV swap keeps the same generator shape).
    For y4m the Y plane IS the grayscale frame; chroma planes are never
    materialized (the feature set is luma-only, matching the image
    kernels' channel-agnostic stats)."""
    if data[:len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        w, h, offsets = _parse_y4m(data)
        for i in range(0, len(offsets), every_n):
            off = offsets[i]
            yield i, np.frombuffer(data[off:off + w * h],
                                   dtype=np.uint8).reshape(h, w)
        return
    w, h, n = parse_video_header(data)  # FAKV or NotImplementedError
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
                _w, _h, total = parse_video_header(b)
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
