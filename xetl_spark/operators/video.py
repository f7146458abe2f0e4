"""Pure-Python Y4M (YUV4MPEG2) video codec.

Compressed video (h264/vp9/...) genuinely requires ffmpeg and stays a
documented stub, but the interchange format Y4M is a plain-text header
plus raw YUV planes per frame (public spec: mjpegtools yuv4mpeg(5))
— decodable with numpy alone. That makes frame sampling REAL for
uncompressed video: true frame counts, true timestamps from the
header's rational frame rate, and actual luma planes out.

Supported: Cmono (luma-only) and C420/C420jpeg/C420mpeg2 (4:2:0 —
the Y plane is returned; chroma is parsed and skipped). Interlaced
flags are accepted and ignored. Anything else raises
``UnsupportedVideoError``.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2"


class UnsupportedVideoError(ValueError):
    """Payload is not a video format this codec handles."""


def sniff_y4m(payload: bytes) -> bool:
    return payload[: len(Y4M_MAGIC)] == Y4M_MAGIC


def y4m_encode(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode (n, h, w) uint8 luma frames as Cmono Y4M."""
    n, h, w = frames.shape
    num, den = fps
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 Cmono\n".encode())
    for f in range(n):
        out += b"FRAME\n"
        out += frames[f].astype(np.uint8).tobytes()
    return bytes(out)


def y4m_decode(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode Y4M to ((n, h, w) uint8 luma frames, (fps_num, fps_den))."""
    if not sniff_y4m(payload):
        raise UnsupportedVideoError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise UnsupportedVideoError("Y4M header not terminated")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    w = h = None
    num, den = 25, 1
    colorspace = "C420"
    for tok in header[1:]:
        if not tok:
            continue
        key, val = tok[0], tok[1:]
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = (int(x) for x in val.split(":"))
        elif key == "C":
            colorspace = tok
    if not w or not h:
        raise UnsupportedVideoError("Y4M header missing W/H")
    if colorspace == "Cmono":
        frame_bytes, luma_bytes = w * h, w * h
    elif colorspace in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        frame_bytes, luma_bytes = w * h * 3 // 2, w * h
    else:
        raise UnsupportedVideoError(f"unsupported Y4M colorspace {colorspace}")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise UnsupportedVideoError("malformed Y4M frame marker")
        eol = payload.find(b"\n", pos)
        if eol < 0:
            raise UnsupportedVideoError("Y4M frame header not terminated")
        pos = eol + 1
        # header-declared geometry bounds the payload; a short read means
        # a truncated file, not a smaller frame
        if pos + frame_bytes > len(payload):
            raise UnsupportedVideoError(
                f"truncated Y4M frame: need {frame_bytes} bytes, "
                f"have {len(payload) - pos}"
            )
        luma = np.frombuffer(payload, dtype=np.uint8, count=luma_bytes, offset=pos)
        frames.append(luma.reshape(h, w))
        pos += frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), (num, den)


def frame_times_ms(n_frames: int, fps: tuple[int, int]) -> list[int]:
    """Integer milliseconds of each frame's start (floor)."""
    num, den = fps
    return [i * 1000 * den // num for i in range(n_frames)]
