"""FLAC codec: roundtrips across every encoder mode, hand-built
streams for decode-only features (LPC subframes, wasted bits, Rice
escape partitions), CRC verification, hostile bytes, and the
decode_audio dispatch through the Spark audio ops."""

from __future__ import annotations

import numpy as np
import pytest

from xetl_spark.operators.audio import UnsupportedAudioError, decode_audio
from xetl_spark.operators.flac import (
    FlacDecodeError,
    _crc8,
    _crc16,
    _MsbWriter,
    flac_decode,
    flac_encode,
)


def _pcm(n, nch, seed=0, lo=-2000, hi=2000):
    return np.random.RandomState(seed).randint(lo, hi, (n, nch)).astype(np.int32)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2"])
@pytest.mark.parametrize("blocksize", [4096, 1024, 192])
def test_roundtrip_modes(mode, blocksize):
    for n, nch, seed in ((1, 1, 1), (500, 1, 2), (9000, 2, 3), (4096, 2, 4)):
        pcm = _pcm(n, nch, seed)
        dec, rate = flac_decode(
            flac_encode(pcm, 44100, mode=mode, blocksize=blocksize)
        )
        assert rate == 44100
        assert np.array_equal(dec, pcm), (mode, blocksize, n, nch)


def test_roundtrip_mid_side_and_constant():
    pcm = _pcm(6000, 2, 7)
    for mode in ("verbatim", "fixed1", "fixed2"):
        dec, _ = flac_decode(
            flac_encode(pcm, 48000, mode=mode, stereo="mid_side")
        )
        assert np.array_equal(dec, pcm), mode
    flat = np.full((5000, 2), -123, np.int32)
    dec, _ = flac_decode(flac_encode(flat, 16000, mode="constant"))
    assert np.array_equal(dec, flat)
    # smooth ramp compresses well under fixed2 and stays exact
    ramp = (np.arange(6000) % 997).astype(np.int32)
    dec, _ = flac_decode(flac_encode(ramp, 8000, mode="fixed2"))
    assert np.array_equal(dec[:, 0], ramp)


def test_roundtrip_bit_depths():
    for bps, lim in ((8, 127), (12, 2047), (16, 32767), (24, 8388607)):
        pcm = _pcm(3000, 1, bps, -lim, lim)
        dec, _ = flac_decode(flac_encode(pcm, 22050, bps=bps))
        assert np.array_equal(dec, pcm), bps


def _frame_shell(body_writer, n, bps=16, rate=8000):
    """Build a 1-frame FLAC stream whose subframe bits come from
    ``body_writer(bw)`` — independent scaffolding for decode-only
    features the fixture encoder never emits."""
    out = bytearray(b"fLaC")
    packed = (rate << 44) | (0 << 41) | ((bps - 1) << 36) | n
    si = (
        n.to_bytes(2, "big") + n.to_bytes(2, "big")
        + b"\x00\x00\x00" * 2 + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    bw = _MsbWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit blocksize follows
    bw.write(13, 4)  # 16-bit rate follows
    bw.write(0, 4)  # mono
    bw.write(4, 3)  # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)  # frame number 0
    bw.write(n - 1, 16)
    bw.write(rate, 16)
    bw.write(_crc8(bytes(bw.buf)), 8)
    body_writer(bw)
    bw.align()
    body = bytes(bw.buf)
    return bytes(out) + body + _crc16(body).to_bytes(2, "big")


def test_lpc_subframe_decode():
    """Hand-built LPC subframe (order 2, coefs [2, -1], shift 1):
    prediction = (2*prev - prev2) >> 1, residuals Rice-coded."""
    samples = [100, 104]
    coefs, shift = [2, -1], 1
    residuals = [3, -2, 5, 0, -7, 1, 4, -1]
    for r in residuals:
        pred = (coefs[0] * samples[-1] + coefs[1] * samples[-2]) >> shift
        samples.append(pred + r)
    n = len(samples)

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + (2 - 1), 6)  # LPC order 2
        bw.write(0, 1)  # no wasted bits
        for s in samples[:2]:
            bw.write(s & 0xFFFF, 16)
        bw.write(3, 4)  # precision 4 bits (value+1)
        bw.write(shift & 0x1F, 5)
        for c in coefs:
            bw.write(c & 0xF, 4)
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # partition order 0
        bw.write(3, 4)  # rice param
        for r in residuals:
            v = (abs(r) << 1) - (1 if r < 0 else 0)
            bw.unary(v >> 3)
            bw.write(v & 7, 3)

    dec, rate = flac_decode(_frame_shell(body, n))
    assert rate == 8000
    assert dec[:, 0].tolist() == samples


def test_wasted_bits_decode():
    """Subframe with 2 wasted bits: coded samples are s >> 2, decoder
    shifts back."""
    samples = [s * 4 for s in (-100, 50, 75, -25, 0, 124)]
    n = len(samples)

    def body(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # verbatim
        bw.write(1, 1)  # wasted-bits flag
        bw.unary(1)  # unary 1 -> wasted = 2
        for s in samples:
            bw.write((s >> 2) & 0x3FFF, 14)  # eff bps = 16 - 2

    dec, _ = flac_decode(_frame_shell(body, n))
    assert dec[:, 0].tolist() == samples


def test_rice_escape_partition_decode():
    """Residual partition with the escape parameter (raw 5-bit-length
    verbatim residuals) through a fixed order-1 subframe."""
    warm = [10]
    residuals = [4, -3, 2, -1, 0, 3, -4]
    samples = warm[:]
    for r in residuals:
        samples.append(samples[-1] + r)
    n = len(samples)

    def body(bw):
        bw.write(0, 1)
        bw.write(8 + 1, 6)  # fixed order 1
        bw.write(0, 1)
        bw.write(warm[0] & 0xFFFF, 16)
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # partition order 0
        bw.write(15, 4)  # ESCAPE
        bw.write(4, 5)  # raw residuals, 4 bits each
        for r in residuals:
            bw.write(r & 0xF, 4)

    dec, _ = flac_decode(_frame_shell(body, n))
    assert dec[:, 0].tolist() == samples


def test_crc_and_hostile_bytes():
    pcm = _pcm(2000, 2, 11)
    enc = bytearray(flac_encode(pcm, 44100))
    flac_decode(bytes(enc))  # sanity
    # flip one bit inside frame data -> CRC-16 must catch it
    bad = bytearray(enc)
    bad[-10] ^= 0x10
    with pytest.raises(FlacDecodeError):
        flac_decode(bytes(bad))
    # corrupt the frame header -> CRC-8 (or sync) must catch it
    hdr_off = 4 + 4 + 34 + 2  # magic + block header + STREAMINFO + into frame
    bad2 = bytearray(enc)
    bad2[hdr_off] ^= 0x04
    with pytest.raises(FlacDecodeError):
        flac_decode(bytes(bad2))
    for blob in (b"", b"fLaC", b"RIFF1234WAVE", bytes(enc[:20])):
        with pytest.raises(FlacDecodeError):
            flac_decode(blob)
    rng = np.random.RandomState(3)
    for _ in range(40):  # random corruption never escapes untyped
        blob = bytearray(enc)
        blob[rng.randint(4, len(blob))] = rng.randint(0, 256)
        try:
            flac_decode(bytes(blob))
        except FlacDecodeError:
            pass


def test_decode_audio_dispatch():
    from xetl_spark.operators.audio import wav_encode

    pcm16 = _pcm(1500, 2, 13).astype(np.int16)
    s, r = decode_audio(wav_encode(pcm16, 16000))
    assert r == 16000 and s.shape[0] == 1500
    s2, r2 = decode_audio(flac_encode(pcm16.astype(np.int32), 22050))
    assert r2 == 22050 and np.array_equal(s2, pcm16)
    with pytest.raises(UnsupportedAudioError):
        decode_audio(b"\x00" * 64)


def test_audio_features_over_flac(spark):
    """The generic audio ops accept FLAC payloads end-to-end now that
    they route through decode_audio."""
    import pandas as pd

    from xetl_spark.operators.multimodal import audio_feature_windows

    t = np.arange(16000)
    tone = (2000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int32)
    payloads = {1: flac_encode(tone, 16000, mode="fixed2")}
    pdf = pd.DataFrame({"doc_id": [1], "media": [payloads[1]]})
    rows = audio_feature_windows(
        spark.createDataFrame(pdf), "media", "doc_id"
    ).collect()
    assert rows, "no feature windows emitted"
    # a 440 Hz tone's dominant frequency lands on 440 +- bin width
    assert any(abs(r.dom_hz - 440) < 20 for r in rows)


def test_roundtrip_high_sample_rates():
    """Rates >= 65536 Hz use frame-header sr code 14 (rate/10): a
    16-bit Hz field (code 13) would wrap 96000 -> 30464 in every
    frame header while STREAMINFO carried the true rate."""
    pcm = _pcm(600, 2, 7)
    for rate in (88200, 96000, 176400, 192000):
        out, got_rate = flac_decode(flac_encode(pcm, rate))
        assert got_rate == rate
        assert np.array_equal(out, pcm)
    # sub-65536 path unchanged
    out, got_rate = flac_decode(flac_encode(pcm, 44100))
    assert got_rate == 44100
    # un-encodable: >= 65536 and not a multiple of 10
    with pytest.raises(FlacDecodeError, match="multiple of 10"):
        flac_encode(pcm, 96001)
