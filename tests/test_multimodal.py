"""Multimodal (audio/video) binary-column plumbing: schemas, Arrow batch
shape, and feature math are real; codecs are deterministic fakes with the
real-codec swap points raising NotImplementedError (brief requirement)."""

import numpy as np
import pytest

from dagli_spark.features.multimodal import (
    decode_audio,
    encode_fake_audio,
    encode_fake_video,
    iter_video_frames,
    with_audio_features,
    with_video_features,
)


def _sine_pcm(sr=8000, secs=0.5, hz=440):
    t = np.arange(int(sr * secs)) / sr
    return (np.sin(2 * np.pi * hz * t) * 0.5 * 32767).astype(np.int16)


def test_audio_features_end_to_end(spark):
    pcm = _sine_pcm()
    rows = [(1, encode_fake_audio(pcm, 8000)), (2, None)]
    df = spark.createDataFrame(rows, "id int, audio_bytes binary")
    out = {r["id"]: r for r in with_audio_features(df).collect()}
    a = out[1]
    assert "audio_bytes" not in out[1].asDict()        # not echoed back
    assert abs(a["au_duration_s"] - 0.5) < 1e-9
    assert a["au_sample_rate"] == 8000
    assert abs(a["au_rms"] - 0.5 / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)
    assert 0.05 < a["au_zero_cross_rate"] < 0.3        # 440 Hz @ 8 kHz
    assert out[2]["au_rms"] is None                    # null payload -> nulls


def test_video_features_end_to_end(spark):
    # 6 frames, alternating dark/bright -> known brightness and motion
    frames = np.stack([np.full((8, 8), 10 if i % 2 == 0 else 200, np.uint8)
                       for i in range(6)])
    rows = [(1, encode_fake_video(frames))]
    df = spark.createDataFrame(rows, "id int, video_bytes binary")
    r = with_video_features(df).first()
    assert r["vi_n_frames"] == 6 and r["vi_sampled_frames"] == 6
    assert abs(r["vi_mean_brightness"] - 105.0) < 1e-9
    assert abs(r["vi_motion_energy"] - 190.0) < 1e-9
    # frame sampling: every 2nd frame -> all dark, zero motion
    r2 = with_video_features(df, every_n=2).first()
    assert r2["vi_sampled_frames"] == 3
    assert abs(r2["vi_mean_brightness"] - 10.0) < 1e-9
    assert r2["vi_motion_energy"] == 0.0


def test_real_codecs_are_clearly_stubbed():
    # WAV-PCM is REAL since round 5; the stub boundary moved to
    # compressed audio and all real video containers
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"OggS" + b"\x00" * 64)  # a real ogg header path
    with pytest.raises(NotImplementedError, match="PyAV"):
        next(iter_video_frames(b"\x00\x00\x00 ftypmp42"))


def _wav_bytes(pcm_bytes: bytes, sr: int, *, ch: int = 1,
               sampwidth: int = 2) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(ch)
    w.setsampwidth(sampwidth)
    w.setframerate(sr)
    w.writeframes(pcm_bytes)
    w.close()
    return buf.getvalue()


def test_wav_pcm_decodes_for_real(spark):
    """Round-5: RIFF/WAVE integer PCM is a REAL decode path (stdlib
    ``wave``) — same features end to end through Spark as the FAKA
    container, stereo downmixed, truncated WAV degrading to nulls."""
    pcm = _sine_pcm()
    stereo = np.empty(2 * len(pcm), np.int16)
    stereo[0::2] = pcm
    stereo[1::2] = pcm  # identical channels -> downmix == mono
    rows = [
        (1, _wav_bytes(pcm.tobytes(), 8000)),
        (2, _wav_bytes(stereo.tobytes(), 8000, ch=2)),
        (3, _wav_bytes(pcm.tobytes(), 8000)[:37]),  # truncated
        (4, encode_fake_audio(pcm, 8000)),          # FAKA alongside WAV
    ]
    df = spark.createDataFrame(rows, "id int, audio_bytes binary")
    got = {r["id"]: r for r in with_audio_features(df).collect()}
    for i in (1, 2, 4):
        assert abs(got[i]["au_duration_s"] - 0.5) < 1e-9, i
        assert got[i]["au_sample_rate"] == 8000
        assert abs(got[i]["au_rms"] - 0.5 / np.sqrt(2)) < 0.01, i
    assert got[1]["au_rms"] == got[4]["au_rms"]  # WAV == FAKA, same PCM
    assert got[3]["au_rms"] is None              # truncated -> null row

    # direct decode parity + 8-bit width support
    d, sr = decode_audio(_wav_bytes(pcm.tobytes(), 8000))
    assert sr == 8000 and np.array_equal(d, pcm)
    u8 = ((pcm.astype(np.int32) >> 8) + 128).astype(np.uint8)
    d8, _ = decode_audio(_wav_bytes(u8.tobytes(), 8000, sampwidth=1))
    assert np.array_equal(d8, (u8.astype(np.int16) - 128) << 8)


def test_corrupt_payloads_degrade_to_null_rows(spark):
    """One corrupt row must not fail the stage: truncated/zero-rate FAKA
    and truncated FAKV degrade to all-null feature rows; healthy rows in
    the same batch still produce features."""
    import struct as _struct

    good_a = encode_fake_audio(_sine_pcm(), 8000)
    bad_rate = b"FAKA" + _struct.pack("<II", 0, 4) + b"\x00" * 8
    truncated = b"FAKA" + b"\x01"
    df = spark.createDataFrame(
        [(1, good_a), (2, bad_rate), (3, truncated)],
        "id int, audio_bytes binary")
    got = {r["id"]: r["au_rms"] for r in with_audio_features(df).collect()}
    assert got[1] is not None and got[2] is None and got[3] is None

    frames = np.zeros((2, 4, 4), np.uint8)
    df2 = spark.createDataFrame(
        [(1, encode_fake_video(frames)), (2, b"FAKV\x00")],
        "id int, video_bytes binary")
    got2 = {r["id"]: r["vi_sampled_frames"]
            for r in with_video_features(df2).collect()}
    assert got2[1] == 2 and got2[2] is None


def test_zero_frame_video_is_null_not_nan(spark):
    empty = encode_fake_video(np.zeros((0, 4, 4), np.uint8))
    df = spark.createDataFrame([(1, empty)], "id int, video_bytes binary")
    r = with_video_features(df).first()
    assert r["vi_n_frames"] == 0 and r["vi_sampled_frames"] == 0
    assert r["vi_mean_brightness"] is None and r["vi_motion_energy"] is None
