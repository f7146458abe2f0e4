"""VP8 (lossy WebP) bitstream analysis — RFC 6386 boolean coder and
the complete frame-header parse.

Scope, stated honestly (see CODECS.md): this module decodes every
VP8 field that is spec-defined WITHOUT the codec's default probability
tables — the uncompressed key-frame header (sync, dimensions, scale)
and the entire boolean-coded first-partition header: color space,
clamping, the segmentation block (segment quantizer/filter deltas and
map probabilities), loop-filter configuration (type, level, sharpness,
per-ref/per-mode delta adjustments), DCT token partition layout, and
the quantizer block (base qindex plus the five component deltas).
Those fields are read as uniform-probability literals and transmitted
probabilities (RFC 6386 §9.2-9.8) — no entropy context needed.

Macroblock reconstruction (modes, DCT tokens, prediction, loop
filtering) additionally requires RFC 6386's default coefficient
probability model and dequantization lookup tables (§13.5, §14.1 —
~2,000 constants). Reciting those from memory risks a decoder that
roundtrips its own fixtures while silently mis-decoding real files,
so pixel decode remains a typed UnsupportedImageError boundary
(operators/webp.py) until the tables can be sourced verbatim; the
swap-in point is documented in CODECS.md.

What this buys a 100 TB curation pass TODAY: the quantizer indices
are VP8's compression-quality dial (the analogue of JPEG quality /
our jpeg_quality_estimate): base qindex spans 0 (pristine) to 127
(mulch), and per-segment deltas expose adaptive-quality encodes. A
web-crawl image sweep can therefore score, rank, and threshold lossy
WebP quality — plus verify structural integrity of the partition
layout — without decoding a single macroblock, at O(header bytes) per
image.

Verification: encoder/decoder are an exact pair (the fixture builder
emits real boolean-coder output; hypothesis fuzzes the coder
roundtrip), the boolean coder follows RFC 6386 §7/§8 reference
behavior, and q_multimodal_vp8_quality puts header extraction under
the DuckDB hash gate.
"""

from __future__ import annotations

import struct

from xetl_spark.operators.imaging import UnsupportedImageError


class Vp8FormatError(UnsupportedImageError):
    """Payload is not a VP8 key-frame bitstream this parser reads."""


# ------------------------------------------------------- boolean coder
# RFC 6386 §7 (decoder) / §8 (encoder): an arithmetic coder over a
# [0,255] range with 8-bit probabilities; probability 128 = a uniform
# "literal" bit. The encoder's carry propagates through already-emitted
# 0xFF bytes, exactly as the spec's add_one_to_output does.


class BoolDecoder:
    def __init__(self, data: bytes) -> None:
        if len(data) < 2:
            data = data + b"\x00" * (2 - len(data))
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8) | data[1]
        self.range = 255
        self.bit_count = 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return bit

    def literal(self, n: int) -> int:
        """n uniform bits, MSB first (RFC 6386 read_literal)."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def signed(self, n: int) -> int:
        """n-bit magnitude followed by a sign bit (flagged deltas)."""
        v = self.literal(n)
        return -v if self.read(128) else v


class BoolEncoder:
    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i < 0:
            raise Vp8FormatError("carry out of stream start")
        self.out[i] += 1

    def write(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in reversed(range(n)):
            self.write(128, (v >> i) & 1)

    def signed(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.write(128, 1 if v < 0 else 0)

    def flush(self) -> bytes:
        # shift the remaining 32 bits of `bottom` out through the SAME
        # per-bit pipeline the renorm loop uses (carry check, byte emit
        # every 8th shift) — bit-exact with the write path by
        # construction, so the decoder's final reads see the interval
        # base it expects
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


# ------------------------------------------------------- frame header

_SYNC = b"\x9d\x01\x2a"
# upscale factors signaled in the 2 high bits of the 16-bit dims
_SCALE = ("none", "5/4", "5/3", "2/1")


def vp8_header_probe(payload: bytes) -> dict:
    """Parse a raw VP8 key-frame bitstream's full header (RFC 6386
    §9.1-9.8). Returns dims/scale, segmentation (with per-segment
    quantizer/filter deltas), loop-filter config, token partition
    sizes, and the quantizer block. ``payload`` is the VP8 chunk body
    (as stored in a WebP 'VP8 ' chunk or an IVF frame)."""
    if len(payload) < 10:
        raise Vp8FormatError("vp8: truncated frame tag")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    part0_size = tag >> 5
    if not key_frame:
        raise Vp8FormatError("vp8: interframe (no still-image header)")
    if payload[3:6] != _SYNC:
        raise Vp8FormatError("vp8: bad sync code")
    (wraw,) = struct.unpack_from("<H", payload, 6)
    (hraw,) = struct.unpack_from("<H", payload, 8)
    width, h_scale = wraw & 0x3FFF, wraw >> 14
    height, v_scale = hraw & 0x3FFF, hraw >> 14
    first = payload[10 : 10 + part0_size]
    if len(first) < part0_size:
        raise Vp8FormatError("vp8: first partition overruns payload")
    d = BoolDecoder(first)

    out: dict = {
        "codec": "vp8",
        "version": version,
        "show_frame": bool(show_frame),
        "width": width,
        "height": height,
        "h_scale": _SCALE[h_scale],
        "v_scale": _SCALE[v_scale],
        "color_space": d.literal(1),
        "clamping_type": d.literal(1),
    }
    # -- segmentation (§9.3)
    seg_enabled = d.read(128)
    seg = {"enabled": bool(seg_enabled)}
    if seg_enabled:
        update_map = d.read(128)
        update_data = d.read(128)
        if update_data:
            seg["abs_values"] = bool(d.read(128))  # segment_feature_mode
            seg["quantizer_deltas"] = [
                d.signed(7) if d.read(128) else None for _ in range(4)
            ]
            seg["loop_filter_deltas"] = [
                d.signed(6) if d.read(128) else None for _ in range(4)
            ]
        if update_map:
            seg["tree_probs"] = [
                d.literal(8) if d.read(128) else 255 for _ in range(3)
            ]
    out["segmentation"] = seg
    # -- loop filter (§9.4)
    lf = {
        "type": "simple" if d.literal(1) else "normal",
        "level": d.literal(6),
        "sharpness": d.literal(3),
    }
    lf_adj = d.read(128)
    lf["delta_enabled"] = bool(lf_adj)
    if lf_adj and d.read(128):  # mode_ref_lf_delta_update
        lf["ref_deltas"] = [d.signed(6) if d.read(128) else None for _ in range(4)]
        lf["mode_deltas"] = [d.signed(6) if d.read(128) else None for _ in range(4)]
    out["loop_filter"] = lf
    # -- token partitions (§9.5): count, then (count-1) 3-byte sizes
    # stored between the first partition and the token data
    n_parts = 1 << d.literal(2)
    sizes_at = 10 + part0_size
    part_sizes = []
    for i in range(n_parts - 1):
        off = sizes_at + 3 * i
        if off + 3 > len(payload):
            raise Vp8FormatError("vp8: partition size table truncated")
        part_sizes.append(int.from_bytes(payload[off : off + 3], "little"))
    data_at = sizes_at + 3 * (n_parts - 1)
    remaining = len(payload) - data_at
    if part_sizes:
        declared = sum(part_sizes)
        if declared > remaining:
            raise Vp8FormatError("vp8: token partitions overrun payload")
        part_sizes.append(remaining - declared)  # last partition = rest
    else:
        part_sizes.append(remaining)
    out["n_token_partitions"] = n_parts
    out["token_partition_sizes"] = part_sizes
    # -- quantizer (§9.6): the quality dial
    q = {"y_ac_qi": d.literal(7)}
    for name in ("y_dc_delta", "y2_dc_delta", "y2_ac_delta",
                 "uv_dc_delta", "uv_ac_delta"):
        q[name] = d.signed(4) if d.read(128) else 0
    out["quant"] = q
    # -- refresh (§9.7; key frames carry only this one flag)
    out["refresh_entropy_probs"] = bool(d.read(128))
    return out


def vp8_header_build(
    width: int,
    height: int,
    *,
    y_ac_qi: int = 40,
    quant_deltas: dict | None = None,
    filter_level: int = 20,
    sharpness: int = 0,
    simple_filter: bool = False,
    segments: list[int] | None = None,
    n_token_partitions: int = 1,
    token_data: bytes = b"",
    version: int = 0,
) -> bytes:
    """Emit a VP8 key-frame whose uncompressed + boolean-coded header
    is bit-exact RFC 6386 §9 syntax — the fixture generator for
    ``vp8_header_probe``. ``segments`` supplies per-segment quantizer
    deltas (enables the segmentation block). Macroblock data is NOT
    encoded (see module docstring); ``token_data`` pads the token
    partitions so size accounting is exercised. The result is what a
    header-level tool (including this module's probe, or any demuxer)
    accepts; it is not a renderable image."""
    if not 0 <= y_ac_qi <= 127:
        raise Vp8FormatError("vp8: y_ac_qi out of range")
    e = BoolEncoder()
    e.literal(0, 1)  # color_space
    e.literal(0, 1)  # clamping_type
    if segments is not None:
        e.write(128, 1)  # segmentation_enabled
        e.write(128, 1)  # update_mb_segmentation_map
        e.write(128, 1)  # update_segment_feature_data
        e.write(128, 1)  # abs_values mode
        for i in range(4):
            if i < len(segments) and segments[i] is not None:
                e.write(128, 1)
                e.signed(segments[i], 7)
            else:
                e.write(128, 0)
        for _ in range(4):  # no per-segment filter deltas
            e.write(128, 0)
        for _ in range(3):  # keep default tree probs (255)
            e.write(128, 0)
    else:
        e.write(128, 0)
    e.literal(1 if simple_filter else 0, 1)
    e.literal(filter_level, 6)
    e.literal(sharpness, 3)
    e.write(128, 0)  # loop_filter_adj_enable
    if n_token_partitions not in (1, 2, 4, 8):
        raise Vp8FormatError("vp8: token partitions must be 1/2/4/8")
    e.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_token_partitions], 2)
    e.literal(y_ac_qi, 7)
    qd = quant_deltas or {}
    for name in ("y_dc_delta", "y2_dc_delta", "y2_ac_delta",
                 "uv_dc_delta", "uv_ac_delta"):
        v = qd.get(name, 0)
        if v:
            e.write(128, 1)
            e.signed(v, 4)
        else:
            e.write(128, 0)
    e.write(128, 1)  # refresh_entropy_probs
    first = e.flush()

    # split token_data across partitions; the last gets the remainder
    per = len(token_data) // n_token_partitions
    parts = [
        token_data[i * per : (i + 1) * per] for i in range(n_token_partitions - 1)
    ]
    parts.append(token_data[(n_token_partitions - 1) * per :])
    size_table = b"".join(
        len(p).to_bytes(3, "little") for p in parts[:-1]
    )
    tag = (len(first) << 5) | (1 << 4) | (version << 1) | 0  # keyframe, shown
    head = tag.to_bytes(3, "little") + _SYNC
    head += struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
    return head + first + size_table + b"".join(parts)


# VP8's quantizer-to-quality mapping: qindex 0..127, where the AC
# quantizer roughly doubles every ~25 steps. A simple monotone score
# comparable to jpeg_quality_estimate's 0-100 scale.
def vp8_quality_estimate(header: dict) -> int:
    """Map the base quantizer index to a 0-100 quality score (100 =
    qindex 0, 0 = qindex 127), linear in qindex — monotone and
    deterministic, for ranking/thresholding lossy-WebP quality in a
    curation pass."""
    qi = header["quant"]["y_ac_qi"]
    return round(100 - qi * 100 / 127)
