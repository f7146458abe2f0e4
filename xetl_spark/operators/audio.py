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


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to (samples int16 (n, ch), sample_rate)."""
    if not sniff_wav(payload):
        raise UnsupportedAudioError("not a RIFF/WAVE payload")
    pos = 12
    fmt_code = channels = sample_rate = bits = None
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
            fmt_code, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif cid == b"data":
            data = body
    if fmt_code is None or data is None:
        raise UnsupportedAudioError("WAV missing fmt/data chunk")
    if fmt_code != 1 or bits != 16:
        raise UnsupportedAudioError(
            f"only PCM-16 supported (format={fmt_code}, bits={bits})"
        )
    arr = np.frombuffer(data, dtype="<i2")
    n = len(arr) // channels
    return arr[: n * channels].reshape(n, channels), sample_rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode any supported audio payload -> ((n, ch) int samples,
    sample_rate): PCM WAV or FLAC (operators/flac.py). The dispatcher
    the generic audio ops (windowing, features, silence detection)
    route through, mirroring imaging.decode_image."""
    if sniff_wav(payload):
        return wav_decode(payload)
    if payload[:4] == b"fLaC":
        from xetl_spark.operators.flac import FlacDecodeError, flac_decode

        try:
            return flac_decode(payload)
        except FlacDecodeError as e:
            raise UnsupportedAudioError(str(e)) from None
    raise UnsupportedAudioError("unrecognized audio payload")


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
