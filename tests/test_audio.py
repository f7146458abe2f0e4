"""Pure-Python WAV/PCM codec (operators/audio.py) + real-decode
window_audio path. Same discipline as tests/test_imaging.py: pin the
codec at sample level, then the operator on real payloads end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from xetl_spark.operators import audio

rng = np.random.default_rng(99)


def test_wav_roundtrip_mono():
    s = rng.integers(-32768, 32767, size=4321, dtype=np.int16)
    back, sr = audio.wav_decode(audio.wav_encode(s, 16000))
    assert sr == 16000
    assert back.shape == (4321, 1)
    assert np.array_equal(back[:, 0], s)


def test_wav_roundtrip_stereo():
    s = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int16)
    back, sr = audio.wav_decode(audio.wav_encode(s, 44100))
    assert sr == 44100
    assert np.array_equal(back, s)


def test_wav_unsupported_rejected():
    with pytest.raises(audio.UnsupportedAudioError):
        audio.wav_decode(b"OggS not a wav")
    # an unknown coding is rejected, not silently garbled (PCM-8 /
    # G.711 / IMA ADPCM decode since round 11 — see the tests below)
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(audio.UnsupportedAudioError, match="unsupported WAV"):
        audio.wav_decode(payload)


def test_duration_and_slicing():
    s = np.arange(2500, dtype=np.int16)  # 2.5s at 1 kHz
    payload = audio.wav_encode(s, 1000)
    assert audio.duration_ms(payload) == 2500
    samples, sr = audio.wav_decode(payload)
    win = audio.slice_window(samples, sr, 1000, 1500)
    assert np.array_equal(win[:, 0], np.arange(1000, 1500, dtype=np.int16))


def test_window_audio_real_decode(spark):
    """window_audio(decode_stub=False) on real WAVs: window count from
    true duration, payloads are the exact sample slices."""
    import pandas as pd

    from xetl_spark.operators.multimodal import window_audio

    s = ((np.arange(1800) * 13) % 997).astype(np.int16)  # 1.8s at 1 kHz
    payload = audio.wav_encode(s, 1000)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [payload]}),
        "doc_id long, media binary",
    )
    rows = window_audio(
        df, "media", "doc_id", window_ms=500, hop_ms=250, decode_stub=False
    ).collect()
    # hops at 0,250,...,1750 → 8 windows
    assert len(rows) == 8
    for r in rows:
        assert r.start_ms == r.window_idx * 250
        assert r.end_ms == min(r.start_ms + 500, 1800)
        got = np.frombuffer(bytes(r.pcm), dtype="<i2")
        assert np.array_equal(got, s[r.start_ms : r.end_ms])


def test_window_audio_rejects_non_wav_in_real_mode(spark):
    import pandas as pd

    from xetl_spark.operators.multimodal import window_audio

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [b"definitely not audio"]}),
        "doc_id long, media binary",
    )
    with pytest.raises(Exception, match="RIFF|WAVE|Unsupported"):
        window_audio(df, "media", "doc_id", decode_stub=False).collect()


def test_window_features_analytic():
    """Feature math pinned on analytic signals: a bin-aligned sine's
    dominant frequency is exact, its ZCR is 2f/sr, its RMS is
    amplitude/sqrt(2); a DC signal never crosses zero."""
    sr = 8000
    t = np.arange(sr)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    f = audio.window_features(sine[:, None], sr, 0, 1000)
    assert f["dom_hz"] == pytest.approx(440.0, abs=1e-9)
    assert f["zcr"] == pytest.approx(2 * 440 / sr, abs=0.01)
    assert f["rms"] == pytest.approx(10000 / np.sqrt(2), rel=0.01)

    dc = np.full(4000, 1234, dtype=np.int16)
    g = audio.window_features(dc[:, None], sr, 0, 500)
    assert g["zcr"] == 0.0
    assert g["rms"] == pytest.approx(1234.0)

    # empty window degrades to zeros, not NaN
    z = audio.window_features(sine[:, None], sr, 5000, 6000)
    assert (z["rms"], z["zcr"], z["dom_hz"]) == (0.0, 0.0, 0.0)


def test_audio_feature_windows_operator(spark):
    """Operator end-to-end: two tones in one WAV → each window's
    dominant frequency identifies its tone."""
    import pandas as pd

    from xetl_spark.operators.multimodal import audio_feature_windows

    sr = 4000
    t = np.arange(sr)  # 1s total
    first = 10000 * np.sin(2 * np.pi * 500 * t[: sr // 2] / sr)
    second = 10000 * np.sin(2 * np.pi * 1000 * t[sr // 2 :] / sr)
    payload = audio.wav_encode(
        np.concatenate([first, second]).astype(np.int16), sr
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "media": [payload]}),
        "doc_id long, media binary",
    )
    rows = {
        r.window_idx: r
        for r in audio_feature_windows(
            df, "media", "doc_id", window_ms=500, hop_ms=500
        ).collect()
    }
    assert len(rows) == 2
    assert rows[0].dom_hz == pytest.approx(500.0, abs=2.0)
    assert rows[1].dom_hz == pytest.approx(1000.0, abs=2.0)


def test_wav_truncated_data_rejected():
    """A data chunk shorter than its declared length is a truncated
    file; decoding must raise the typed error instead of silently
    returning fewer samples than the header promises."""
    samples = (np.sin(np.linspace(0, 40 * np.pi, 8000)) * 20000).astype(np.int16)
    payload = audio.wav_encode(samples, 8000)
    with pytest.raises(audio.UnsupportedAudioError, match="truncated"):
        audio.wav_decode(payload[:-100])
    # a short fmt chunk is typed too
    bad = payload[:16] + b"\x08\x00\x00\x00" + payload[20:28]
    with pytest.raises(audio.UnsupportedAudioError):
        audio.wav_decode(bad)


def test_activity_segments_tone_silence_tone(spark):
    """1s tone / 1s silence / 1s tone at 8kHz: exactly three segments
    with the right states and boundaries."""
    import numpy as np

    from xetl_spark.operators.audio import wav_encode
    from xetl_spark.operators.multimodal import activity_segments

    rate = 8000
    t = np.arange(rate) / rate
    tone = (10_000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    silence = np.zeros(rate, np.int16)
    payload = wav_encode(np.concatenate([tone, silence, tone]), rate)
    df = spark.createDataFrame([(5, bytearray(payload))], "doc_id long, media binary")
    segs = sorted(
        activity_segments(df, window_ms=100, rms_threshold=500.0).collect(),
        key=lambda r: r.seg_idx,
    )
    assert [(r.start_ms, r.end_ms, r.active) for r in segs] == [
        (0, 1000, True),
        (1000, 2000, False),
        (2000, 3000, True),
    ]
    # tone RMS of a full-cycle sine = amplitude/sqrt(2)
    assert abs(segs[0].rms - 10_000 / np.sqrt(2)) < 60
    assert segs[1].rms < 1.0


def test_g711_and_pcm8_wav_decode():
    """G.711 u-law/A-law and PCM-8 WAV codings: exact expansion
    (known ITU pairs + canonical 16-bit ranges), container roundtrip."""
    import numpy as np

    from xetl_spark.operators.audio import (
        _alaw_expand,
        _mulaw_expand,
        wav_build_raw,
        wav_decode,
    )

    assert _mulaw_expand(np.array([0xFF]))[0] == 0  # u-law +0
    assert _mulaw_expand(np.array([0x7F]))[0] == 0  # u-law -0
    assert _alaw_expand(np.array([0x55]))[0] == -8
    assert _alaw_expand(np.array([0xD5]))[0] == 8
    mu = _mulaw_expand(np.arange(256))
    al = _alaw_expand(np.arange(256))
    assert (int(mu.max()), int(mu.min())) == (32124, -32124)
    assert (int(al.max()), int(al.min())) == (32256, -32256)
    # each coding is a bijection on its 256 codewords up to +-0
    assert len(np.unique(mu)) == 255  # 0x7F and 0xFF both decode to 0
    assert len(np.unique(al)) == 256

    data = bytes((i * 13 + 7) % 256 for i in range(601))
    for fmt, table in ((7, mu), (6, al)):
        s, r = wav_decode(wav_build_raw(fmt, data, 8000))
        assert r == 8000 and s.shape == (601, 1)
        assert np.array_equal(s[:, 0], table[np.frombuffer(data, np.uint8)])
    s, _ = wav_decode(wav_build_raw(1, data, 8000, bits=8))
    assert np.array_equal(
        s[:, 0],
        (np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8,
    )


def test_ima_adpcm_wav_decode():
    """IMA ADPCM blocks: hand-verified first steps (predictor 100,
    index 10 / step 19, nibble 0x3 -> diff 15), multi-block stereo
    shape, and typed errors on malformed blocks."""
    import struct

    import numpy as np
    import pytest as _pytest

    from xetl_spark.operators.audio import (
        UnsupportedAudioError,
        _ima_decode_block,
        wav_build_raw,
        wav_decode,
    )

    blk = struct.pack("<hBB", 100, 10, 0) + bytes([0x03]) + bytes(3)
    dec = _ima_decode_block(blk, 1)
    assert dec[0, 0] == 100 and dec[1, 0] == 115
    blk2 = (
        struct.pack("<hBB", 0, 20, 0)
        + struct.pack("<hBB", 50, 30, 0)
        + bytes([0x12, 0x34, 0x56, 0x78])
        + bytes([0x9A, 0xBC, 0xDE, 0xF0])
    )
    wav = wav_build_raw(0x11, blk2 * 3, 8000, channels=2, bits=4,
                        block_align=len(blk2))
    s, _ = wav_decode(wav)
    assert s.shape == (27, 2)  # 3 x (1 header sample + 8 nibble samples)
    assert np.abs(s.astype(np.int64)).max() <= 32767
    with _pytest.raises(UnsupportedAudioError):
        _ima_decode_block(struct.pack("<hBB", 0, 89, 0), 1)  # index > 88
    with _pytest.raises(UnsupportedAudioError):
        wav_decode(wav_build_raw(0x11, blk2, 8000, channels=2, bits=4,
                                 block_align=0))


def test_unsupported_wav_codings_stay_typed():
    import pytest as _pytest

    from xetl_spark.operators.audio import (
        UnsupportedAudioError,
        wav_build_raw,
        wav_decode,
    )

    with _pytest.raises(UnsupportedAudioError, match="unsupported WAV"):
        wav_decode(wav_build_raw(3, b"\x00" * 64, 8000, bits=32))  # float
    with _pytest.raises(UnsupportedAudioError, match="unsupported WAV"):
        wav_decode(wav_build_raw(85, b"\x00" * 64, 8000))  # mp3-in-wav


def test_resample_linear_grids_and_exactness():
    """resample_linear: exact verbatim/midpoint behavior on integer
    ratios, fractional-ratio grid positions, identity, mono/stereo,
    and guards."""
    import numpy as np

    from xetl_spark.operators.audio import resample_linear

    s = np.arange(11, dtype=np.int64) * 10
    down = resample_linear(s, 32000, 16000)
    assert np.array_equal(down[:, 0], s[::2].astype(float))
    up = resample_linear(s, 8000, 16000)
    assert up.shape == (21, 1)
    assert np.array_equal(up[0::2, 0], s.astype(float))
    assert np.array_equal(up[1::2, 0], (s[:-1] + s[1:]) / 2)
    # 3:1 and 4:3 ratios: spot-check the position math
    third = resample_linear(s, 48000, 16000)
    assert np.array_equal(third[:, 0], s[::3].astype(float))
    r43 = resample_linear(np.array([0.0, 3.0, 6.0, 9.0]), 16000, 12000)
    assert np.allclose(r43[:, 0], [0.0, 4.0, 8.0])  # pos 0, 4/3, 8/3
    # identity, stereo shape, empty
    st = np.stack([s, -s], axis=1)
    assert np.array_equal(resample_linear(st, 9, 9), st.astype(float))
    assert resample_linear(st, 16000, 8000).shape == (6, 2)
    assert resample_linear(np.empty((0, 2)), 1, 2).shape == (0, 2)
    import pytest as _pytest

    from xetl_spark.operators.audio import UnsupportedAudioError

    with _pytest.raises(UnsupportedAudioError):
        resample_linear(s, 0, 16000)


def test_resample_audio_builtin_task(spark, tmp_path):
    """The `resample_audio` builtin decodes (WAV or FLAC) and
    resamples to the target rate through a YAML job."""
    import numpy as np

    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    s = (np.arange(800, dtype=np.int64) * 7 % 2003 - 1001).astype(np.int16)
    payload = audio.wav_encode(s, 32000)
    src = tmp_path / "clips"
    spark.createDataFrame(
        [(3, bytearray(payload))], "doc_id long, media binary"
    ).write.parquet(str(src))
    job = Job(
        name="rs",
        data=str(tmp_path),
        commands=[
            {"name": "clips", "task": "read_parquet", "env": {"PATH": str(src)}},
            {"name": "out", "task": "resample_audio",
             "env": {"TARGET_RATE": 16000}},
        ],
    )
    results = run_job(spark, job)
    assert all(r.status == "success" for r in results)
    row = results[-1].output.collect()[0]
    got = np.frombuffer(bytes(row.pcm), dtype="<i2")
    assert row.sample_rate == 16000 and row.n_samples == 400
    assert np.array_equal(got, s[::2])  # 2x down = verbatim every 2nd


def test_probe_media_wav_reports_true_channel_count(spark):
    """probe_media's WAV branch reports the fmt-chunk channel count
    (it used to hardcode mono)."""
    import pandas as pd

    from xetl_spark.operators.multimodal import probe_media

    stereo = audio.wav_encode(
        np.zeros((800, 2), dtype=np.int16), 16000
    )
    mono = audio.wav_encode(np.zeros(800, dtype=np.int16), 16000)
    pdf = pd.DataFrame({"doc_id": [1, 2], "media": [stereo, mono]})
    rows = {
        r.id: r
        for r in probe_media(spark.createDataFrame(pdf), "media", "doc_id").collect()
    }
    assert rows[1].container == "wav" and rows[1].channels == 2
    assert rows[2].channels == 1
