"""WebM / Matroska (EBML) container probe — pure-spec metadata
triage, no codec decode.

WebM is the dominant open web-video container (VP8/VP9/AV1 video,
Opus/Vorbis audio, served by every major video platform's open
pipeline); a crawl-scale media sweep needs to route/filter/cost it
without an ffmpeg dependency. This module parses the EBML structure
(RFC 8794 variable-length integers, Matroska/WebM element IDs):
DocType, Info (TimecodeScale/Duration), Tracks (codec ID, video
dimensions, audio rate/channels), and the Cluster/SimpleBlock stream
(block counts, per-track frame counts, keyframe flags). For V_VP8
tracks, the first video keyframe payload is handed to
operators/vp8.vp8_header_probe, so WebM corpora get the same
quantizer/quality curation signal as lossy WebP and IVF.

Like the other probes, this reads only element headers plus the first
video block — O(structure), not O(media) — and runs per payload
inside Arrow-batched mapInPandas (multimodal.probe_media).

Codec payload decode stays with the per-codec boundaries (VP8 pixels:
operators/vp8.py rationale; Opus/Vorbis: would need the full audio
codecs). The fixture writer emits spec-shaped EBML so the parser is
exercised on real structure, not synthetic shortcuts.
"""

from __future__ import annotations

import struct


class WebmFormatError(ValueError):
    """Payload is not an EBML/Matroska stream this probe reads."""


# Matroska/WebM element IDs (stored with the length-marker bit, the
# class-ID convention)
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMECODE_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F
CLUSTER = 0x1F43B675
CLUSTER_TIMECODE = 0xE7
SIMPLE_BLOCK = 0xA3

_UNKNOWN = -1  # unknown-size element (streamed segments)


def _vint(
    buf: bytes, pos: int, strip_marker: bool, unknown_ok: bool = True
) -> tuple[int, int]:
    """Read an EBML variable-length integer at ``pos`` -> (value,
    next_pos). Element IDs keep the marker bit (class-ID convention);
    sizes strip it. An all-ones size payload means 'unknown size' only
    for element SIZES (``unknown_ok=True``); block track numbers use
    ``unknown_ok=False`` so the single-byte encoding 0xFF legally
    decodes as track 127 instead of the _UNKNOWN sentinel."""
    if pos >= len(buf):
        raise WebmFormatError("vint beyond buffer")
    first = buf[pos]
    if first == 0:
        raise WebmFormatError("invalid vint (>8 bytes)")
    length = 9 - first.bit_length()  # leading-zero count + 1
    if pos + length > len(buf):
        raise WebmFormatError("vint truncated")
    value = first & ((1 << (8 - length)) - 1) if strip_marker else first
    for i in range(1, length):
        value = (value << 8) | buf[pos + i]
    if strip_marker and unknown_ok and value == (1 << (7 * length)) - 1:
        return _UNKNOWN, pos + length
    return value, pos + length


def _walk(buf: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for EBML children in
    [start, end). Unknown-size elements extend to ``end``."""
    pos = start
    while pos < end:
        eid, p = _vint(buf, pos, strip_marker=False)
        size, p = _vint(buf, p, strip_marker=True)
        body_end = end if size == _UNKNOWN else p + size
        if body_end > end:
            raise WebmFormatError(f"element 0x{eid:X} overruns parent")
        yield eid, p, body_end
        pos = body_end


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise WebmFormatError("float element must be 4 or 8 bytes")


def webm_probe(payload: bytes, max_blocks: int = 1_000_000) -> dict:
    """Parse a WebM/Matroska stream's structure: doctype, duration,
    tracks (codec/dims/audio params), cluster+block counts and
    per-track frame counts, and — for a V_VP8 video track — the first
    keyframe's full VP8 header (quantizer/quality signal)."""
    try:
        it = _walk(payload, 0, len(payload))
        eid, b0, b1 = next(it)
    except StopIteration:
        raise WebmFormatError("empty stream") from None
    if eid != EBML_HEADER:
        raise WebmFormatError("no EBML header")
    doctype = None
    for ceid, c0, c1 in _walk(payload, b0, b1):
        if ceid == DOCTYPE:
            doctype = payload[c0:c1].rstrip(b"\x00").decode("ascii", "replace")
    out: dict = {
        "container": "webm" if doctype == "webm" else "matroska",
        "doctype": doctype,
        "timecode_scale_ns": 1_000_000,
        "duration_ms": None,
        "tracks": {},
        "n_clusters": 0,
        "n_blocks": 0,
        "frames_per_track": {},
        "vp8_header": None,
        "vp9_header": None,
        "av1_header": None,
    }
    duration_ticks = None
    video_track_no = None
    seg = next((x for x in it if x[0] == SEGMENT), None)
    if seg is None:
        raise WebmFormatError("no Segment element")
    _eid, s0, s1 = seg
    for eid, e0, e1 in _walk(payload, s0, s1):
        if eid == INFO:
            for c, c0, c1 in _walk(payload, e0, e1):
                if c == TIMECODE_SCALE:
                    out["timecode_scale_ns"] = _uint(payload, c0, c1)
                elif c == DURATION:
                    duration_ticks = _float(payload, c0, c1)
        elif eid == TRACKS:
            for c, c0, c1 in _walk(payload, e0, e1):
                if c != TRACK_ENTRY:
                    continue
                t: dict = {
                    "number": None, "type": None, "codec": None,
                    "width": None, "height": None,
                    "sample_rate": None, "channels": None,
                }
                for f, f0, f1 in _walk(payload, c0, c1):
                    if f == TRACK_NUMBER:
                        t["number"] = _uint(payload, f0, f1)
                    elif f == TRACK_TYPE:
                        t["type"] = {1: "video", 2: "audio"}.get(
                            _uint(payload, f0, f1), "other"
                        )
                    elif f == CODEC_ID:
                        t["codec"] = payload[f0:f1].rstrip(b"\x00").decode(
                            "ascii", "replace"
                        )
                    elif f == VIDEO:
                        for v, v0, v1 in _walk(payload, f0, f1):
                            if v == PIXEL_WIDTH:
                                t["width"] = _uint(payload, v0, v1)
                            elif v == PIXEL_HEIGHT:
                                t["height"] = _uint(payload, v0, v1)
                    elif f == AUDIO:
                        for v, v0, v1 in _walk(payload, f0, f1):
                            if v == SAMPLING_FREQUENCY:
                                t["sample_rate"] = _float(payload, v0, v1)
                            elif v == CHANNELS:
                                t["channels"] = _uint(payload, v0, v1)
                if t["number"] is None:
                    raise WebmFormatError("TrackEntry without TrackNumber")
                out["tracks"][t["number"]] = t
                if t["type"] == "video" and video_track_no is None:
                    video_track_no = t["number"]
        elif eid == CLUSTER:
            out["n_clusters"] += 1
            for c, c0, c1 in _walk(payload, e0, e1):
                if c != SIMPLE_BLOCK:
                    continue
                out["n_blocks"] += 1
                if out["n_blocks"] > max_blocks:
                    raise WebmFormatError("block count exceeds cap")
                tno, p = _vint(
                    payload, c0, strip_marker=True, unknown_ok=False
                )
                if p + 3 > c1:
                    raise WebmFormatError("SimpleBlock header truncated")
                flags = payload[p + 2]
                keyframe = bool(flags & 0x80)
                lacing = (flags >> 1) & 3
                fpt = out["frames_per_track"]
                fpt[tno] = fpt.get(tno, 0) + 1
                vcodec = (
                    out["tracks"].get(tno, {}).get("codec")
                    if tno == video_track_no
                    else None
                )
                if (
                    out["vp8_header"] is None
                    and keyframe
                    and lacing == 0
                    and vcodec == "V_VP8"
                ):
                    from xetl_spark.operators.vp8 import (
                        Vp8FormatError,
                        vp8_header_probe,
                    )

                    try:
                        out["vp8_header"] = vp8_header_probe(
                            payload[p + 3 : c1]
                        )
                    except Vp8FormatError:
                        pass  # damaged first keyframe; keep walking
                elif (
                    out["vp9_header"] is None
                    and keyframe
                    and lacing == 0
                    and vcodec == "V_VP9"
                ):
                    from xetl_spark.operators.vp9 import (
                        Vp9FormatError,
                        vp9_header_probe,
                    )

                    try:
                        out["vp9_header"] = vp9_header_probe(
                            payload[p + 3 : c1]
                        )
                    except Vp9FormatError:
                        pass
                elif (
                    out.get("av1_header") is None
                    and keyframe
                    and lacing == 0
                    and vcodec == "V_AV1"
                ):
                    from xetl_spark.operators.av1 import (
                        Av1FormatError,
                        av1_sequence_probe,
                    )

                    try:
                        out["av1_header"] = av1_sequence_probe(
                            payload[p + 3 : c1]
                        )
                    except Av1FormatError:
                        pass
    if duration_ticks is not None:
        out["duration_ms"] = int(
            duration_ticks * out["timecode_scale_ns"] / 1_000_000
        )
    return out


# ------------------------------------------------------------- builder


def _enc_vint_size(value: int) -> bytes:
    """Encode an EBML size vint (marker bit set per length)."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            v = value | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise WebmFormatError("size too large for vint")


def _elem(eid: int, body: bytes) -> bytes:
    eid_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return eid_bytes + _enc_vint_size(len(body)) + body


def _uint_elem(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


def webm_build(
    tracks: list[dict],
    blocks: list[tuple[int, int, bool, bytes]],
    duration_ms: float | None = None,
    doctype: str = "webm",
    blocks_per_cluster: int = 4,
) -> bytes:
    """Spec-shaped WebM writer for the probe's fixtures. ``tracks``:
    dicts with number/type('video'|'audio')/codec and
    width/height or sample_rate/channels. ``blocks``: (track_number,
    timecode_ms, keyframe, payload) tuples, grouped into clusters of
    ``blocks_per_cluster`` with per-cluster base timecodes."""
    ebml = _elem(
        EBML_HEADER,
        _elem(DOCTYPE, doctype.encode("ascii"))
        + _uint_elem(0x4286, 1)  # EBMLVersion
        + _uint_elem(0x42F7, 1),  # EBMLReadVersion
    )
    info = _uint_elem(TIMECODE_SCALE, 1_000_000)
    if duration_ms is not None:
        info += _elem(DURATION, struct.pack(">d", float(duration_ms)))
    info = _elem(INFO, info)
    tr = b""
    for t in tracks:
        body = _uint_elem(TRACK_NUMBER, t["number"])
        body += _uint_elem(TRACK_TYPE, 1 if t["type"] == "video" else 2)
        body += _elem(CODEC_ID, t["codec"].encode("ascii"))
        if t["type"] == "video":
            body += _elem(
                VIDEO,
                _uint_elem(PIXEL_WIDTH, t["width"])
                + _uint_elem(PIXEL_HEIGHT, t["height"]),
            )
        else:
            body += _elem(
                AUDIO,
                _elem(SAMPLING_FREQUENCY, struct.pack(">f", t["sample_rate"]))
                + _uint_elem(CHANNELS, t.get("channels", 1)),
            )
        tr += _elem(TRACK_ENTRY, body)
    tracks_el = _elem(TRACKS, tr)
    clusters = b""
    for ci in range(0, len(blocks), blocks_per_cluster):
        group = blocks[ci : ci + blocks_per_cluster]
        base = group[0][1]
        body = _uint_elem(CLUSTER_TIMECODE, base)
        for tno, tc, key, data in group:
            rel = tc - base
            if not -32768 <= rel <= 32767:
                raise WebmFormatError("block timecode out of cluster range")
            blk = (
                _enc_vint_size(tno)
                + struct.pack(">h", rel)
                + bytes([0x80 if key else 0x00])
                + data
            )
            body += _elem(SIMPLE_BLOCK, blk)
        clusters += _elem(CLUSTER, body)
    segment = _elem(SEGMENT, info + tracks_el + clusters)
    return ebml + segment
