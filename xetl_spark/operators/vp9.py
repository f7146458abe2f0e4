"""VP9 uncompressed frame-header analysis (the VP9 Bitstream &
Decoding Process Specification §6.2 `uncompressed_header`).

Unlike VP8 — whose quantizer lives behind the boolean coder — VP9
keeps its ENTIRE frame header as plain MSB-first bits, including the
base quantizer index. That makes the quality/config triage for VP9
corpora (IVF 'VP90' streams, WebM 'V_VP9' tracks) a pure bit walk:
profile, bit depth, color space/range/subsampling, frame dimensions,
render size, loop-filter level/sharpness, and ``base_q_idx`` with its
three delta fields — the compression-quality dial, same role as VP8's
y_ac_qi and JPEG quality.

Parsed here (key frames; what a still/first-frame triage needs):
frame marker, profile (0-3), show_existing_frame short-circuit, sync
code 0x498342, color config (10/12-bit for profiles 2-3, color space,
range, subsampling for profiles 1/3), frame + render size, the
error-resilient / frame-context fields, loop filter params (incl. ref/
mode delta lists), and quantization params. Segmentation, tile info,
and the compressed header (tree-coded probabilities) are beyond the
quality-triage need and stay unparsed; pixel reconstruction would
additionally need the full VP9 entropy decoder and is out of scope
for the same verbatim-tables reason as VP8 (see operators/vp8.py and
CODECS.md).

The fixture writer emits the same bit layout, so encode→probe is
closed under test; hostile bits degrade to the typed error.
"""

from __future__ import annotations

from xetl_spark.operators.imaging import UnsupportedImageError


class Vp9FormatError(UnsupportedImageError):
    """Payload is not a VP9 key-frame bitstream this parser reads."""


_SYNC = (0x49, 0x83, 0x42)

_COLOR_SPACES = (
    "unknown", "bt601", "bt709", "smpte170", "smpte240", "bt2020",
    "reserved", "rgb",
)


class _MsbReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def bit(self) -> int:
        i = self.pos >> 3
        if i >= len(self.d):
            raise Vp9FormatError("vp9: header truncated")
        v = (self.d[i] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sbits(self, n: int) -> int:
        """Magnitude + sign bit (the spec's su(n) inverse)."""
        v = self.bits(n)
        return -v if self.bit() else v


class _MsbWriter:
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

    def sbits(self, v: int, n: int) -> None:
        self.bits(abs(v), n)
        self.bits(1 if v < 0 else 0, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc, self.n = 0, 0
        return bytes(self.buf)


def vp9_header_probe(payload: bytes) -> dict:
    """Parse a VP9 KEY frame's uncompressed header -> dict with
    profile, bit_depth, color config, dimensions, render size, loop
    filter, and quantization (base_q_idx + deltas, lossless flag)."""
    r = _MsbReader(payload)
    if r.bits(2) != 2:
        raise Vp9FormatError("vp9: bad frame marker")
    profile = r.bit() | (r.bit() << 1)  # low bit first
    if profile == 3 and r.bit():
        raise Vp9FormatError("vp9: reserved profile bit set")
    if r.bit():  # show_existing_frame
        return {
            "codec": "vp9",
            "profile": profile,
            "show_existing_frame": True,
            "frame_to_show": r.bits(3),
        }
    frame_type = r.bit()
    show_frame = r.bit()
    error_resilient = r.bit()
    if frame_type != 0:
        raise Vp9FormatError("vp9: interframe (no still-image header)")
    if (r.bits(8), r.bits(8), r.bits(8)) != _SYNC:
        raise Vp9FormatError("vp9: bad sync code")
    # color_config
    if profile >= 2:
        bit_depth = 12 if r.bit() else 10
    else:
        bit_depth = 8
    cs = r.bits(3)
    color_space = _COLOR_SPACES[cs]
    if color_space != "rgb":
        color_range = r.bit()
        if profile in (1, 3):
            sub_x, sub_y = r.bit(), r.bit()
            if r.bit():
                raise Vp9FormatError("vp9: reserved color bit set")
        else:
            sub_x = sub_y = 1  # profiles 0/2 are 4:2:0
    else:
        color_range = 1
        sub_x = sub_y = 0
        if profile in (1, 3) and r.bit():
            raise Vp9FormatError("vp9: reserved color bit set")
    width = r.bits(16) + 1
    height = r.bits(16) + 1
    if r.bit():  # render_and_frame_size_different
        render_w = r.bits(16) + 1
        render_h = r.bits(16) + 1
    else:
        render_w, render_h = width, height
    # key frames: refresh_frame_flags is implicit (all); next fields
    if not error_resilient:
        refresh_frame_context = r.bit()
        frame_parallel = r.bit()
    else:
        refresh_frame_context = frame_parallel = 0
    frame_context_idx = r.bits(2)
    # loop_filter_params
    lf_level = r.bits(6)
    lf_sharpness = r.bits(3)
    lf = {"level": lf_level, "sharpness": lf_sharpness}
    if r.bit():  # loop_filter_delta_enabled
        lf["delta_enabled"] = True
        if r.bit():  # loop_filter_delta_update
            lf["ref_deltas"] = [
                r.sbits(6) if r.bit() else None for _ in range(4)
            ]
            lf["mode_deltas"] = [
                r.sbits(6) if r.bit() else None for _ in range(2)
            ]
    else:
        lf["delta_enabled"] = False
    # quantization_params
    base_q_idx = r.bits(8)
    deltas = {}
    for name in ("delta_q_y_dc", "delta_q_uv_dc", "delta_q_uv_ac"):
        deltas[name] = r.sbits(4) if r.bit() else 0
    lossless = base_q_idx == 0 and all(v == 0 for v in deltas.values())
    return {
        "codec": "vp9",
        "profile": profile,
        "show_existing_frame": False,
        "show_frame": bool(show_frame),
        "error_resilient": bool(error_resilient),
        "bit_depth": bit_depth,
        "color_space": color_space,
        "color_range": color_range,
        "subsampling": (sub_x, sub_y),
        "width": width,
        "height": height,
        "render_width": render_w,
        "render_height": render_h,
        "refresh_frame_context": bool(refresh_frame_context),
        "frame_parallel": bool(frame_parallel),
        "frame_context_idx": frame_context_idx,
        "loop_filter": lf,
        "quant": {"base_q_idx": base_q_idx, **deltas},
        "lossless": lossless,
    }


def vp9_header_build(
    width: int,
    height: int,
    *,
    profile: int = 0,
    base_q_idx: int = 60,
    quant_deltas: dict | None = None,
    filter_level: int = 12,
    sharpness: int = 0,
    color_space: str = "bt709",
    bit_depth: int = 8,
    render_size: tuple[int, int] | None = None,
    error_resilient: bool = False,
    tail: bytes = b"",
) -> bytes:
    """Emit a VP9 key frame's uncompressed header (fixture generator
    for ``vp9_header_probe``). ``tail`` pads the stream after the
    parsed fields (stand-in for segmentation/tiles/compressed data —
    this is a header fixture, not a renderable frame)."""
    if not 0 <= profile <= 3:
        raise Vp9FormatError("vp9: profile 0..3")
    if profile >= 2 and bit_depth not in (10, 12):
        raise Vp9FormatError("vp9: profiles 2-3 are 10/12-bit")
    if profile < 2 and bit_depth != 8:
        raise Vp9FormatError("vp9: profiles 0-1 are 8-bit")
    if not 0 <= base_q_idx <= 255:
        raise Vp9FormatError("vp9: base_q_idx 0..255")
    w = _MsbWriter()
    w.bits(2, 2)  # frame marker
    w.bits(profile & 1, 1)
    w.bits((profile >> 1) & 1, 1)
    if profile == 3:
        w.bits(0, 1)  # reserved
    w.bits(0, 1)  # show_existing_frame
    w.bits(0, 1)  # frame_type = key
    w.bits(1, 1)  # show_frame
    w.bits(1 if error_resilient else 0, 1)
    for b in _SYNC:
        w.bits(b, 8)
    if profile >= 2:
        w.bits(1 if bit_depth == 12 else 0, 1)
    cs = _COLOR_SPACES.index(color_space)
    w.bits(cs, 3)
    if color_space != "rgb":
        w.bits(1, 1)  # color_range full
        if profile in (1, 3):
            w.bits(0, 1)  # sub_x
            w.bits(0, 1)  # sub_y
            w.bits(0, 1)  # reserved
    elif profile in (1, 3):
        w.bits(0, 1)  # reserved
    w.bits(width - 1, 16)
    w.bits(height - 1, 16)
    if render_size is not None:
        w.bits(1, 1)
        w.bits(render_size[0] - 1, 16)
        w.bits(render_size[1] - 1, 16)
    else:
        w.bits(0, 1)
    if not error_resilient:
        w.bits(1, 1)  # refresh_frame_context
        w.bits(0, 1)  # frame_parallel
    w.bits(0, 2)  # frame_context_idx
    w.bits(filter_level, 6)
    w.bits(sharpness, 3)
    w.bits(0, 1)  # loop_filter_delta_enabled
    w.bits(base_q_idx, 8)
    qd = quant_deltas or {}
    for name in ("delta_q_y_dc", "delta_q_uv_dc", "delta_q_uv_ac"):
        v = qd.get(name, 0)
        if v:
            w.bits(1, 1)
            w.sbits(v, 4)
        else:
            w.bits(0, 1)
    return w.done() + tail


def vp9_quality_estimate(header: dict) -> int:
    """Map base_q_idx (0..255) to a 0-100 quality score, linear —
    monotone and deterministic, the VP9 twin of vp8_quality_estimate."""
    return round(100 - header["quant"]["base_q_idx"] * 100 / 255)
