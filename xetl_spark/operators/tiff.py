"""Pure-Python baseline TIFF decoder (8-bit gray/RGB/RGBA, strip
layout; uncompressed, PackBits, and LZW with the horizontal-
differencing predictor), from the public TIFF 6.0 spec.

Complements the PNG/JPEG/GIF/BMP codecs for multimodal triage; the
IFD structure mirrors operators/exif.py (which parses the same TIFF
container embedded in JPEG APP1). Tiled layout, 16-bit samples, and
JPEG-in-TIFF compression raise ``TiffFormatError`` — typed
boundaries, never wrong pixels. Validated against the JVM ImageIO
TIFF writer in all three compressions.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffFormatError(ValueError):
    """Payload is not a TIFF this decoder handles."""


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_tag_values(buf: bytes, e: str, typ: int, cnt: int, ent: int) -> list[int]:
    size = _TYPE_SIZE.get(typ, 0) * cnt
    if size == 0:
        raise TiffFormatError(f"unsupported tag type {typ}")
    voff = ent + 8 if size <= 4 else struct.unpack_from(e + "L", buf, ent + 8)[0]
    if voff + size > len(buf):
        raise TiffFormatError("tag value overruns file")
    fmt = {1: "B", 3: "H", 4: "L"}.get(typ)
    if fmt is None:
        raise TiffFormatError(f"unsupported tag type {typ}")
    return list(struct.unpack_from(e + fmt * cnt, buf, voff))


def _lzw_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (6.0 §13): MSB-first bit packing, 256-symbol
    alphabet with Clear=256/EOI=257, and EarlyChange — the code width
    grows one code EARLIER than the GIF variant (at table size
    2^width - 1)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = list(base)
                width = 9
                prev = None
                continue
            if code == EOI:
                if len(out) < expected:
                    raise TiffFormatError("LZW EOI before strip complete")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise TiffFormatError("LZW code before any output")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffFormatError("LZW code out of range")
            out += entry
            if len(out) > expected + 16:
                raise TiffFormatError("LZW output exceeds strip size")
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:  # EarlyChange
                width += 1
    if len(out) < expected:
        raise TiffFormatError("LZW strip short of expected size")
    return bytes(out[:expected])


def _packbits(data: bytes, expected: int) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): n>=0 → copy n+1 literal bytes;
    n in [-127,-1] → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:  # literal run
            if i + c + 1 > n:
                raise TiffFormatError("truncated PackBits literal")
            out += data[i : i + c + 1]
            i += c + 1
        elif c == 128:  # no-op
            continue
        else:
            if i >= n:
                raise TiffFormatError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) < expected:
        raise TiffFormatError("PackBits output short of strip size")
    return bytes(out[:expected])


def tiff_build(arr: np.ndarray) -> bytes:
    """Minimal single-strip uncompressed little-endian TIFF writer
    (fixtures and round-trips; the decoder handles the general strip
    layout)."""
    h, w, nch = arr.shape
    data = arr.astype(np.uint8).tobytes()
    bits_off = 8 + len(data)
    ifd_off = bits_off + (2 * nch if nch > 1 else 0)

    def entry(tag, typ, cnt, payload4):
        return struct.pack("<HHL", tag, typ, cnt) + payload4

    short4 = lambda v: struct.pack("<H", v) + b"\x00\x00"  # noqa: E731
    long4 = lambda v: struct.pack("<L", v)  # noqa: E731
    entries = [
        entry(256, 4, 1, long4(w)),
        entry(257, 4, 1, long4(h)),
        entry(258, 3, nch, short4(8) if nch == 1 else long4(bits_off)),
        entry(259, 3, 1, short4(1)),
        entry(262, 3, 1, short4(1 if nch == 1 else 2)),
        entry(273, 4, 1, long4(8)),
        entry(277, 3, 1, short4(nch)),
        entry(278, 4, 1, long4(h)),
        entry(279, 4, 1, long4(len(data))),
    ]
    out = bytearray(b"II" + struct.pack("<HL", 42, ifd_off))
    out += data
    if nch > 1:
        out += struct.pack("<" + "H" * nch, *([8] * nch))
    out += struct.pack("<H", len(entries))
    for b in entries:
        out += b
    out += struct.pack("<L", 0)
    return bytes(out)


def tiff_probe(payload: bytes) -> dict:
    """width/height/channels/compression from IFD0 tags only — no
    strip reads (O(IFD) per file, the triage contract)."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise TiffFormatError("not a TIFF")
    e = "<" if payload[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack_from(e + "HL", payload, 2)
    if magic != 42 or ifd0 + 2 > len(payload):
        raise TiffFormatError("not a TIFF")
    (count,) = struct.unpack_from(e + "H", payload, ifd0)
    out = {"width": None, "height": None, "channels": 1, "compression": 1}
    keymap = {256: "width", 257: "height", 277: "channels", 259: "compression"}
    for k in range(count):
        ent = ifd0 + 2 + 12 * k
        if ent + 12 > len(payload):
            break
        tag, typ, cnt = struct.unpack_from(e + "HHL", payload, ent)
        if tag in keymap and typ in (3, 4):
            out[keymap[tag]] = _read_tag_values(payload, e, typ, 1, ent)[0]
    return out


def tiff_decode(payload: bytes) -> np.ndarray:
    """Decode the first IFD's image → (H, W, C) uint8."""
    if len(payload) < 8:
        raise TiffFormatError("not a TIFF (too short)")
    bom = payload[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise TiffFormatError("not a TIFF (bad byte order mark)")
    magic, ifd0 = struct.unpack_from(e + "HL", payload, 2)
    if magic != 42:
        raise TiffFormatError("not a TIFF (bad magic)")
    if ifd0 + 2 > len(payload):
        raise TiffFormatError("truncated IFD")
    (count,) = struct.unpack_from(e + "H", payload, ifd0)
    tags: dict[int, list[int]] = {}
    for k in range(count):
        ent = ifd0 + 2 + 12 * k
        if ent + 12 > len(payload):
            raise TiffFormatError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(e + "HHL", payload, ent)
        if tag in (256, 257, 258, 259, 262, 273, 277, 278, 279, 284, 317, 322, 323):
            tags[tag] = _read_tag_values(payload, e, typ, cnt, ent)

    if 322 in tags or 323 in tags:
        raise TiffFormatError("tiled TIFF not supported (strip layout only)")
    try:
        width = tags[256][0]
        height = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as k:
        raise TiffFormatError(f"missing required tag {k}") from None
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise TiffFormatError(f"unsupported bits-per-sample {bits}")
    compression = tags.get(259, [1])[0]
    if compression not in (1, 5, 32773):
        raise TiffFormatError(
            f"unsupported TIFF compression {compression} (none/LZW/PackBits only)"
        )
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise TiffFormatError(f"unsupported TIFF predictor {predictor}")
    nch = tags.get(277, [len(bits)])[0]
    if tags.get(284, [1])[0] != 1:
        raise TiffFormatError("planar TIFF not supported (chunky only)")
    rows_per_strip = tags.get(278, [height])[0] or height
    photometric = tags.get(262, [1])[0]
    if photometric not in (0, 1, 2):
        raise TiffFormatError(f"unsupported photometric {photometric}")

    stride = width * nch
    body = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise TiffFormatError("strip overruns file")
        strip_rows = min(rows_per_strip, height - rows_done)
        expected = strip_rows * stride
        raw = payload[off : off + cnt]
        if compression == 32773:
            strip = _packbits(raw, expected)
        elif compression == 5:
            strip = _lzw_tiff(raw, expected)
        else:
            if cnt < expected:
                raise TiffFormatError("strip shorter than declared rows")
            strip = raw[:expected]
        if predictor == 2:  # horizontal differencing: undo by cumsum
            m = np.frombuffer(strip, dtype=np.uint8).reshape(
                strip_rows, width, nch
            )
            strip = np.cumsum(m, axis=1, dtype=np.uint32).astype(np.uint8).tobytes()
        body += strip
        rows_done += strip_rows
    if rows_done < height or len(body) < height * stride:
        raise TiffFormatError("strips cover fewer rows than ImageLength")
    img = np.frombuffer(bytes(body[: height * stride]), dtype=np.uint8).reshape(
        height, width, nch
    )
    if photometric == 0:  # WhiteIsZero: invert to the usual polarity
        img = 255 - img
    return img
