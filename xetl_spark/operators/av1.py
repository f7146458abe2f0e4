"""AV1 OBU-level analysis — container/stream triage for the third
web video codec (IVF 'AV01' streams, WebM 'V_AV1' tracks, AVIF's
payload), from the public AV1 Bitstream & Decoding Process spec.

Parsed with full confidence:
- the OBU framing walk (§5.3): forbidden bit, 4-bit type, extension
  and has-size flags, leb128 sizes — every OBU's type + byte extent;
- the sequence header's leading fields (§5.5): seq_profile,
  still_picture, reduced_still_picture_header, level, and the frame
  dimension fields (frame_width/height_bits_minus_1 + sized widths) —
  for BOTH the reduced still-picture layout (the AVIF shape) and the
  general layout without timing/decoder-model info.

Deliberately NOT parsed: sequence headers carrying timing_info /
decoder_model / initial_display_delay (rare outside broadcast
profiles — typed error naming the field), and everything after the
dimension fields (the enable_* flag run and color_config), because a
mis-ordered flag walk would roundtrip our own fixtures while
misreading real streams — the same transcribe-don't-recall boundary
as VP8's tables (CODECS.md). Dims/profile/level/still-picture are the
triage fields a media sweep routes on; bit depth stays None.

Frame reconstruction is out of scope entirely (AV1 entropy coding +
prediction is a full codec)."""

from __future__ import annotations

from xetl_spark.operators.imaging import UnsupportedImageError


class Av1FormatError(UnsupportedImageError):
    """Payload is not an AV1 OBU stream this parser reads."""


OBU_TYPES = {
    1: "sequence_header",
    2: "temporal_delimiter",
    3: "frame_header",
    4: "tile_group",
    5: "metadata",
    6: "frame",
    7: "redundant_frame_header",
    8: "tile_list",
    15: "padding",
}


def _leb128(buf: bytes, pos: int) -> tuple[int, int]:
    value = 0
    for i in range(8):
        if pos + i >= len(buf):
            raise Av1FormatError("av1: leb128 truncated")
        b = buf[pos + i]
        value |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return value, pos + i + 1
    raise Av1FormatError("av1: leb128 too long")


def obu_walk(payload: bytes):
    """Yield (type_name, type_id, body_start, body_end) per OBU."""
    pos = 0
    n = len(payload)
    while pos < n:
        hdr = payload[pos]
        if hdr & 0x80:
            raise Av1FormatError("av1: forbidden bit set in OBU header")
        otype = (hdr >> 3) & 0xF
        ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        pos += 1
        if ext:
            if pos >= n:
                raise Av1FormatError("av1: extension header truncated")
            pos += 1
        if has_size:
            size, pos = _leb128(payload, pos)
        else:
            size = n - pos  # last OBU extends to end (low-overhead mode)
        if pos + size > n:
            raise Av1FormatError("av1: OBU overruns payload")
        yield OBU_TYPES.get(otype, f"reserved_{otype}"), otype, pos, pos + size
        pos += size


class _MsbReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            i = self.pos >> 3
            if i >= len(self.d):
                raise Av1FormatError("av1: sequence header truncated")
            v = (v << 1) | ((self.d[i] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def av1_sequence_probe(payload: bytes) -> dict:
    """Walk an AV1 OBU stream, count OBUs per type, and parse the
    first sequence header's leading fields -> profile, level,
    still_picture, reduced header flag, and max frame dimensions."""
    counts: dict[str, int] = {}
    seq = None
    for name, _tid, b0, b1 in obu_walk(payload):
        counts[name] = counts.get(name, 0) + 1
        if name == "sequence_header" and seq is None:
            seq = payload[b0:b1]
    if seq is None:
        raise Av1FormatError("av1: no sequence header OBU")
    r = _MsbReader(seq)
    profile = r.bits(3)
    if profile > 2:
        raise Av1FormatError("av1: reserved seq_profile")
    still = r.bits(1)
    reduced = r.bits(1)
    if reduced:
        level = r.bits(5)
    else:
        if r.bits(1):  # timing_info_present_flag
            raise Av1FormatError(
                "av1: timing_info present (broadcast profile not parsed)"
            )
        if r.bits(1):  # initial_display_delay_present_flag
            raise Av1FormatError("av1: initial_display_delay not parsed")
        op_cnt = r.bits(5) + 1
        level = None
        for i in range(op_cnt):
            r.bits(12)  # operating_point_idc
            lvl = r.bits(5)
            if i == 0:
                level = lvl
            if lvl > 7:
                r.bits(1)  # seq_tier
    wbits = r.bits(4) + 1
    hbits = r.bits(4) + 1
    width = r.bits(wbits) + 1
    height = r.bits(hbits) + 1
    return {
        "codec": "av1",
        "profile": profile,
        "level": level,
        "still_picture": bool(still),
        "reduced_still_picture_header": bool(reduced),
        "width": width,
        "height": height,
        "obu_counts": counts,
    }


def av1_sequence_build(
    width: int,
    height: int,
    *,
    profile: int = 0,
    level: int = 8,
    still_picture: bool = False,
    reduced: bool = False,
    extra_obus: list[tuple[int, bytes]] | None = None,
) -> bytes:
    """Emit a minimal AV1 OBU stream: temporal delimiter + sequence
    header (leading fields only — a triage fixture, not a decodable
    frame) + optional (type, body) extra OBUs."""
    if not 0 <= profile <= 2:
        raise Av1FormatError("av1: profile 0..2")

    class W:
        def __init__(self) -> None:
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def bits(self, v: int, n: int) -> None:
            for i in reversed(range(n)):
                self.acc = (self.acc << 1) | ((v >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.buf.append(self.acc)
                    self.acc, self.n = 0, 0

        def done(self) -> bytes:
            if self.n:
                self.buf.append(self.acc << (8 - self.n))
            return bytes(self.buf)

    w = W()
    w.bits(profile, 3)
    w.bits(1 if still_picture else 0, 1)
    w.bits(1 if reduced else 0, 1)
    if reduced:
        w.bits(level, 5)
    else:
        w.bits(0, 1)  # no timing info
        w.bits(0, 1)  # no initial display delay
        w.bits(0, 5)  # one operating point
        w.bits(0, 12)
        w.bits(level, 5)
        if level > 7:
            w.bits(0, 1)
    wbits = max(1, (width - 1).bit_length())
    hbits = max(1, (height - 1).bit_length())
    w.bits(wbits - 1, 4)
    w.bits(hbits - 1, 4)
    w.bits(width - 1, wbits)
    w.bits(height - 1, hbits)
    seq = w.done()

    def obu(otype: int, body: bytes) -> bytes:
        head = bytes([(otype << 3) | 0x02])  # has_size, no extension
        size = bytearray()
        v = len(body)
        while True:
            b = v & 0x7F
            v >>= 7
            size.append(b | (0x80 if v else 0))
            if not v:
                break
        return head + bytes(size) + body

    out = obu(2, b"") + obu(1, seq)
    for otype, body in extra_obus or []:
        out += obu(otype, body)
    return out
