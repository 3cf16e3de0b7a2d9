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


def _companded_wav(payload: bytes, sr: int, fmt_tag: int, *,
                   ch: int = 1) -> bytes:
    """Hand-built RIFF (the stdlib wave module refuses to WRITE non-PCM):
    fmt tag 7 = G.711 mu-law, 6 = A-law, one byte per sample."""
    import struct as _s

    fmt = _s.pack("<HHIIHH", fmt_tag, ch, sr, sr * ch, ch, 8)
    body = (b"WAVEfmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_g711_companded_wav_decodes_for_real(spark):
    """Round-5 second session: mu-law/A-law WAV (format tags 7/6) expand
    FOR REAL through stdlib audioop — decoded PCM matches audioop's own
    expansion exactly, end-to-end features within companding error of the
    clean signal, corrupt chunk layouts degrade to nulls."""
    audioop = pytest.importorskip("audioop")  # removed in Python 3.13

    pcm = _sine_pcm()
    ulaw = audioop.lin2ulaw(pcm.tobytes(), 2)
    alaw = audioop.lin2alaw(pcm.tobytes(), 2)

    d, sr = decode_audio(_companded_wav(ulaw, 8000, 7))
    assert sr == 8000
    assert np.array_equal(
        d, np.frombuffer(audioop.ulaw2lin(ulaw, 2), dtype="<i2"))
    d2, _ = decode_audio(_companded_wav(alaw, 8000, 6))
    assert np.array_equal(
        d2, np.frombuffer(audioop.alaw2lin(alaw, 2), dtype="<i2"))

    rows = [(1, _companded_wav(ulaw, 8000, 7)),
            (2, _companded_wav(alaw, 8000, 6)),
            (3, _wav_bytes(pcm.tobytes(), 8000)),      # clean PCM ref
            (4, _companded_wav(ulaw, 8000, 7)[:30]),   # truncated
            (5, _companded_wav(b"", 0, 7))]            # zero rate
    df = spark.createDataFrame(rows, "id int, audio_bytes binary")
    got = {r["id"]: r for r in with_audio_features(df).collect()}
    for i in (1, 2):
        assert abs(got[i]["au_duration_s"] - 0.5) < 1e-9, i
        # G.711 is lossy but within ~1% on a half-scale sine
        assert abs(got[i]["au_rms"] - got[3]["au_rms"]) < 0.01, i
    assert got[4]["au_rms"] is None and got[5]["au_rms"] is None

    # ADPCM (tag 2) is still an honest NotImplementedError, not a wrong
    # answer and not a silent null
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_audio(_companded_wav(ulaw, 8000, 2))


def test_y4m_video_decodes_for_real(spark):
    """Round-5 second session: YUV4MPEG2 is a REAL demux path (pure
    numpy over the public mjpegtools layout) — identical luma frames
    through y4m and FAKV must produce identical features end to end,
    across 420/422/444/mono chroma layouts, with frame sampling."""
    from dagli_spark.features.multimodal import encode_y4m

    frames = np.stack([np.full((8, 8), 10 if i % 2 == 0 else 200, np.uint8)
                       for i in range(6)])
    rows = [(1, encode_fake_video(frames)),
            (2, encode_y4m(frames)),                  # C420 default
            (3, encode_y4m(frames, chroma="mono")),
            (4, encode_y4m(frames, chroma="422")),
            (5, encode_y4m(frames, chroma="444"))]
    df = spark.createDataFrame(rows, "id int, video_bytes binary")
    got = {r["id"]: r.asDict() for r in with_video_features(df).collect()}
    ref = {k: v for k, v in got[1].items() if k != "id"}
    for i in (2, 3, 4, 5):
        assert {k: v for k, v in got[i].items() if k != "id"} == ref, i
    assert got[2]["vi_n_frames"] == 6
    assert abs(got[2]["vi_mean_brightness"] - 105.0) < 1e-9
    assert abs(got[2]["vi_motion_energy"] - 190.0) < 1e-9

    # frame sampling hits the same offsets in both containers
    r2 = with_video_features(
        df.where("id = 2"), every_n=2).first()
    assert r2["vi_sampled_frames"] == 3
    assert abs(r2["vi_mean_brightness"] - 10.0) < 1e-9

    # direct demux parity: luma planes round-trip exactly, chroma never
    # leaks into the frames; per-frame params after FRAME are legal
    decoded = [f for _, f in iter_video_frames(encode_y4m(frames))]
    assert np.array_equal(np.stack(decoded), frames)
    with_params = encode_y4m(frames).replace(b"FRAME\n", b"FRAME Xa=b\n")
    decoded2 = [f for _, f in iter_video_frames(with_params)]
    assert np.array_equal(np.stack(decoded2), frames)
    # a missing C tag defaults to 420 per the spec
    no_c = encode_y4m(frames).replace(b" C420\n", b"\n", 1)
    decoded3 = [f for _, f in iter_video_frames(no_c)]
    assert np.array_equal(np.stack(decoded3), frames)


def test_y4m_corrupt_and_unsupported(spark):
    """Truncated/garbled y4m degrades to null rows in-stage; legal y4m we
    cannot decode (10-bit) raises NotImplementedError loudly."""
    from dagli_spark.features.multimodal import encode_y4m

    frames = np.full((2, 4, 4), 7, np.uint8)
    good = encode_y4m(frames)
    df = spark.createDataFrame(
        [(1, good),
         (2, good[:-5]),                                   # truncated frame
         (3, good.replace(b"FRAME\n", b"FRUME\n", 1)),     # bad marker
         (4, good.replace(b" H4 ", b" ", 1))],             # missing H tag
        "id int, video_bytes binary")
    got = {r["id"]: r["vi_n_frames"]
           for r in with_video_features(df).collect()}
    assert got[1] == 2 and got[2] is None
    assert got[3] is None and got[4] is None

    with pytest.raises(NotImplementedError, match="C420p10"):
        next(iter_video_frames(good.replace(b" C420\n", b" C420p10\n", 1)))


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
