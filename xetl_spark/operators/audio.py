"""Pure-Python WAV (RIFF/PCM) codec and window math.

The container has no audio codec libraries, but WAV PCM needs none:
the format is a RIFF chunk header plus raw little-endian samples
(public spec: RIFF 1991 / RFC 2361 format registry). Decoding it with
stdlib ``struct`` + numpy makes the audio half of the multimodal
surface REAL — duration, sample rates, and window slicing computed
from actual samples — leaving only compressed codecs (mp3/ogg/ffmpeg
formats) as documented stubs.

Supported: PCM 16-bit (format code 1), any sample rate, any channel
count. Anything else raises ``UnsupportedAudioError``.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAudioError(ValueError):
    """Payload is not an audio format this codec handles."""


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — as PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out)) + out


# G.711 (ITU-T) expansions — exact table-free integer math, vectorized
def _mulaw_expand(u: np.ndarray) -> np.ndarray:
    u = (~u.astype(np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_expand(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.int64) ^ 0x55
    seg = (a & 0x70) >> 4
    t = ((a & 0x0F) << 4) + 8
    t = np.where(seg > 0, (t + 0x100) << np.maximum(seg - 1, 0), t)
    return np.where(a & 0x80, t, -t).astype(np.int16)


_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_block(
    block: bytes, channels: int
) -> np.ndarray:
    """One IMA-ADPCM block -> (n, ch) int16. Per channel: 4-byte
    header (predictor int16, step index, reserved), then nibble data
    interleaved in 4-byte channel groups (8 samples per group)."""
    hdr = 4 * channels
    if len(block) < hdr:
        raise UnsupportedAudioError("IMA ADPCM block shorter than header")
    preds = []
    idxs = []
    for ch in range(channels):
        p, i = struct.unpack_from("<hB", block, 4 * ch)
        if i > 88:
            raise UnsupportedAudioError("IMA ADPCM step index out of range")
        preds.append(int(p))
        idxs.append(int(i))
    data = block[hdr:]
    ngroups = len(data) // (4 * channels)
    out = [[p] for p in preds]  # header predictor IS the first sample
    for g in range(ngroups):
        for ch in range(channels):
            chunk = data[(g * channels + ch) * 4 : (g * channels + ch) * 4 + 4]
            for byte in chunk:
                for nib in (byte & 0xF, byte >> 4):
                    step = int(_IMA_STEPS[idxs[ch]])
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    pred = preds[ch] + (-diff if nib & 8 else diff)
                    pred = max(-32768, min(32767, pred))
                    preds[ch] = pred
                    out[ch].append(pred)
                    idxs[ch] = max(
                        0, min(88, idxs[ch] + int(_IMA_INDEX_ADJ[nib & 7]))
                    )
    return np.array(out, dtype=np.int16).T


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV to (samples int16 (n, ch), sample_rate). Formats:
    PCM-16 (1), PCM-8 unsigned (1, rescaled to int16), A-law (6) and
    u-law (7) via exact G.711 expansion, IMA ADPCM (0x11,
    block-decoded). Anything else raises the typed error."""
    if not sniff_wav(payload):
        raise UnsupportedAudioError("not a RIFF/WAVE payload")
    pos = 12
    fmt_code = channels = sample_rate = bits = None
    block_align = 0
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            # the header declared more bytes than the payload holds;
            # decoding the short slice would silently drop samples
            raise UnsupportedAudioError(
                f"truncated WAV {cid!r} chunk: declared {clen} bytes, "
                f"have {len(body)}"
            )
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if clen < 16:
                raise UnsupportedAudioError("WAV fmt chunk shorter than 16 bytes")
            fmt_code, channels, sample_rate, _br, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif cid == b"data":
            data = body
    if fmt_code is None or data is None:
        raise UnsupportedAudioError("WAV missing fmt/data chunk")
    if not channels:
        raise UnsupportedAudioError("WAV declares zero channels")
    if fmt_code == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif fmt_code == 1 and bits == 8:  # unsigned PCM-8 -> int16 scale
        arr = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif fmt_code == 6 and bits == 8:  # G.711 A-law
        arr = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif fmt_code == 7 and bits == 8:  # G.711 u-law
        arr = _mulaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif fmt_code == 0x11:  # IMA ADPCM
        if not block_align:
            raise UnsupportedAudioError("IMA ADPCM without block alignment")
        blocks = []
        for i in range(0, len(data), block_align):
            chunk = data[i : i + block_align]
            if len(chunk) < 4 * channels:  # trailing pad, not a block
                break
            blocks.append(_ima_decode_block(chunk, channels))
        if not blocks:
            raise UnsupportedAudioError("IMA ADPCM without data blocks")
        return np.vstack(blocks), sample_rate
    else:
        raise UnsupportedAudioError(
            f"unsupported WAV coding (format={fmt_code}, bits={bits})"
        )
    n = len(arr) // channels
    return arr[: n * channels].reshape(n, channels), sample_rate


def resample_linear(
    samples: np.ndarray, sr_from: int, sr_to: int
) -> np.ndarray:
    """Linear-interpolation resampling (the sample-rate normalization
    an ASR pipeline runs before feature extraction) -> float64
    (n_out, ch). Output grid: position i maps to source time
    i * sr_from / sr_to; n_out = floor((n_in-1) * sr_to / sr_from) + 1,
    so integer rate ratios are EXACT (2x down = every 2nd sample
    verbatim; 2x up = verbatim + midpoints). Vectorized numpy."""
    if sr_from <= 0 or sr_to <= 0:
        raise UnsupportedAudioError("sample rates must be positive")
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    n_in = s.shape[0]
    if n_in == 0:
        return s
    if sr_from == sr_to:
        return s.copy()
    n_out = (n_in - 1) * sr_to // sr_from + 1
    # exact integer split of i*sr_from/sr_to into floor + fraction
    num = np.arange(n_out, dtype=np.int64) * sr_from
    lo = num // sr_to
    frac = (num - lo * sr_to).astype(np.float64) / sr_to
    hi = np.minimum(lo + 1, n_in - 1)
    return s[lo] + frac[:, None] * (s[hi] - s[lo])


def wav_build_raw(
    fmt_code: int,
    data: bytes,
    sample_rate: int,
    channels: int = 1,
    bits: int = 8,
    block_align: int | None = None,
) -> bytes:
    """Wrap pre-encoded sample bytes in a RIFF/WAVE container with the
    given coding (fixture builder for the non-PCM16 decode paths:
    G.711 A-law/u-law, PCM-8, IMA ADPCM blocks)."""
    if block_align is None:
        block_align = max(1, channels * bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        fmt_code,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode any supported audio payload -> ((n, ch) int samples,
    sample_rate): PCM WAV, FLAC (operators/flac.py), or an ISO-BMFF
    (MP4/MOV) audio track — QuickTime G.711 ('ulaw'/'alaw' raw
    sample bytes) and FLAC-in-MP4 encapsulation ('fLaC' entry with a
    dfLa STREAMINFO box, samples = FLAC frames, reassembled and fed
    through the full FLAC decoder). The dispatcher the generic audio
    ops (windowing, features, silence detection) route through,
    mirroring imaging.decode_image."""
    if sniff_wav(payload):
        return wav_decode(payload)
    if payload[:4] == b"fLaC":
        from xetl_spark.operators.flac import FlacDecodeError, flac_decode

        try:
            return flac_decode(payload)
        except FlacDecodeError as e:
            raise UnsupportedAudioError(str(e)) from None
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return _mp4_audio_decode(payload)
    raise UnsupportedAudioError("unrecognized audio payload")


def _mp4_audio_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode the first audio track of an ISO-BMFF container via the
    sample-table walk (mediaprobe.mp4_samples)."""
    from xetl_spark.operators.mediaprobe import Mp4FormatError, mp4_samples

    try:
        info = mp4_samples(payload)
    except Mp4FormatError as e:
        raise UnsupportedAudioError(str(e)) from None
    track = next(
        (t for t in info["tracks"].values() if t["handler"] == "soun"), None
    )
    if track is None:
        raise UnsupportedAudioError("mp4: no audio track")
    tid = next(k for k, t in info["tracks"].items() if t is track)
    data = b"".join(
        s["data"]
        for s in sorted(
            (s for s in info["samples"] if s["track_id"] == tid),
            key=lambda s: s["index"],
        )
    )
    codec = track["codec"]
    rate = track["timescale"]
    if codec in ("ulaw", "alaw"):
        raw = np.frombuffer(data, dtype=np.uint8)
        pcm = _mulaw_expand(raw) if codec == "ulaw" else _alaw_expand(raw)
        # channel count from the AudioSampleEntry (body offset 16)
        body = track["stsd_body"]
        ch = (
            int.from_bytes(body[16:18], "big") if len(body) >= 18 else 1
        ) or 1
        if pcm.shape[0] % ch:
            raise UnsupportedAudioError("mp4: G.711 bytes not channel-aligned")
        return pcm.reshape(-1, ch), rate
    if codec == "fLaC":
        from xetl_spark.operators.flac import FlacDecodeError, flac_decode

        # dfLa (FLAC-in-ISO-BMFF): version/flags + METADATA_BLOCKs,
        # STREAMINFO first. Reassemble a native stream: the dfLa
        # STREAMINFO block header's last-block flag may be clear (more
        # blocks could follow in dfLa) — force it set so the decoder
        # sees a complete metadata region before the frames.
        body = track["stsd_body"]
        pos, dfla = 28, None  # fixed AudioSampleEntry body is 28 bytes
        while pos + 8 <= len(body):
            (bsz,) = struct.unpack_from(">I", body, pos)
            if body[pos + 4 : pos + 8] == b"dfLa" and bsz >= 12:
                dfla = body[pos + 12 : pos + bsz]  # skip version/flags
                break
            pos += max(bsz, 8)
        if dfla is None or len(dfla) < 38 or (dfla[0] & 0x7F) != 0:
            raise UnsupportedAudioError("mp4: fLaC entry without dfLa STREAMINFO")
        streaminfo = bytes([dfla[0] | 0x80]) + dfla[1:38]
        try:
            return flac_decode(b"fLaC" + streaminfo + data)
        except FlacDecodeError as e:
            raise UnsupportedAudioError(f"mp4/fLaC: {e}") from None
    raise UnsupportedAudioError(f"mp4: unsupported audio codec {codec!r}")


def duration_ms(payload: bytes) -> int:
    """Integer milliseconds of audio in a PCM WAV (floor)."""
    samples, sr = wav_decode(payload)
    return samples.shape[0] * 1000 // sr


def slice_window(
    samples: np.ndarray, sample_rate: int, start_ms: int, end_ms: int
) -> np.ndarray:
    """Samples covering [start_ms, end_ms) — pure index math."""
    lo = start_ms * sample_rate // 1000
    hi = end_ms * sample_rate // 1000
    return samples[lo:hi]


def window_features(
    samples: np.ndarray, sample_rate: int, start_ms: int, end_ms: int
) -> dict[str, float]:
    """Per-window acoustic features for filtering/clustering pipelines:
    RMS energy (loudness), zero-crossing rate (noisiness/voicing
    proxy), and dominant frequency in Hz via numpy rfft. Mono-mixes
    multichannel input. Deterministic — no windowing function, so a
    pure sine's dominant bin is exact for bin-aligned frequencies.
    """
    win = slice_window(samples, sample_rate, start_ms, end_ms)
    if win.shape[0] == 0:
        return {"rms": 0.0, "zcr": 0.0, "dom_hz": 0.0}
    mono = win.astype(np.float64).mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2)))
    signs = np.sign(mono)
    nz = signs != 0
    crossings = int(np.count_nonzero(np.diff(signs[nz]) != 0))
    zcr = crossings / max(1, mono.shape[0] - 1)
    spec = np.abs(np.fft.rfft(mono))
    if spec.shape[0] > 1:
        # ignore the DC bin when picking the dominant component
        k = 1 + int(np.argmax(spec[1:]))
        dom_hz = k * sample_rate / mono.shape[0]
    else:
        dom_hz = 0.0
    return {"rms": rms, "zcr": float(zcr), "dom_hz": float(dom_hz)}
