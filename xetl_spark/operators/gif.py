"""Pure-Python GIF codec: LZW decode (variable-width codes per the
GIF89a spec), first-frame decode to RGB/RGBA, a block-walking probe,
and an LZW encoder for round-trip fixtures.

Same clean-room posture as the PNG/JPEG codecs (operators/imaging.py,
jpeg.py): implemented from the public GIF89a specification so the
multimodal triage path covers the web-corpus formats without external
libraries. Animation scope: the first frame composites onto the
logical screen (background-filled); ``gif_probe`` walks every frame's
descriptor and Graphic Control Extension to report frame count and
total duration WITHOUT LZW-decoding pixel data — the O(KB-skip)
contract shared with operators/mediaprobe.py.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    """Payload is not a GIF this codec understands."""


def _typed(fn):
    """Translate low-level parse escapes on hostile bytes into
    GifFormatError (struct/index errors from truncated headers)."""
    import functools

    @functools.wraps(fn)
    def wrap(*a, **kw):
        try:
            return fn(*a, **kw)
        except GifFormatError:
            raise
        except (struct.error, IndexError, OverflowError) as e:
            raise GifFormatError(f"malformed GIF: {e}") from None

    return wrap


def _color_table(buf: bytes, pos: int, packed: int, flag_bit: int) -> tuple:
    """Read an (optional) color table after a descriptor; returns
    (table | None, new_pos)."""
    if not (packed >> flag_bit) & 1:
        return None, pos
    n = 2 << (packed & 0x7)
    tbl = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8)
    if tbl.size != 3 * n:
        raise GifFormatError("truncated color table")
    return tbl.reshape(n, 3), pos + 3 * n


def _skip_subblocks(buf: bytes, pos: int) -> int:
    while True:
        if pos >= len(buf):
            raise GifFormatError("truncated sub-blocks")
        n = buf[pos]
        pos += 1 + n
        if n == 0:
            return pos


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise GifFormatError("truncated sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise GifFormatError("truncated sub-blocks")
        out += buf[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: LSB-first bit packing, code width grows from
    min+1 to 12 bits, CLEAR resets the dictionary."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise GifFormatError("LZW code before any output")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise GifFormatError("LZW code out of range")
            out += entry
            if len(out) > max_pixels:
                raise GifFormatError("LZW output exceeds frame size")
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder (for fixtures/round-trips): emits CLEAR, codes
    with growing width, EOI; resets the table when it fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == 1 << width:
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                nxt = eoi + 1
                width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# GIF interlace passes: (row_start, row_step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


@_typed
def gif_decode(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame onto the logical screen → (H, W, 3)
    uint8, or (H, W, 4) when the frame declares a transparent index
    (transparent pixels get alpha 0)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF (bad signature)")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct, pos = _color_table(payload, pos, packed, 7)
    transparent = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                n = payload[pos]
                gpacked, _delay, tidx = struct.unpack_from("<BHB", payload, pos + 1)
                if gpacked & 1:
                    transparent = tidx
                pos += 1 + n + 1  # size byte + body + terminator
            else:
                pos = _skip_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        lct, pos = _color_table(payload, pos, ipacked, 7)
        palette = lct if lct is not None else gct
        if palette is None:
            raise GifFormatError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, w * h)
        if len(idx) < w * h:
            raise GifFormatError("LZW data shorter than frame")
        frame = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8)
        if int(frame.max(initial=0)) >= len(palette):
            raise GifFormatError("palette index out of range")
        if (ipacked >> 6) & 1:  # interlaced: remap rows
            rows = frame.reshape(h, w)
            seq = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE:
                cnt = len(range(start, h, step))
                seq[start::step] = rows[src : src + cnt]
                src += cnt
            frame = seq.reshape(-1)
        nch = 4 if transparent is not None else 3
        # background index addresses the GLOBAL color table (GIF89a §18),
        # not the frame's active (possibly local) palette
        bg_rgb = gct[bg] if gct is not None and bg < len(gct) else (0, 0, 0)
        out = np.zeros((sh, sw, nch), dtype=np.uint8)
        out[:, :, :3] = bg_rgb
        if nch == 4:
            out[:, :, 3] = 255
        if top >= sh or left >= sw:
            raise GifFormatError("frame rectangle outside logical screen")
        fh = min(h, sh - top)
        fw = min(w, sw - left)
        sub = frame.reshape(h, w)[:fh, :fw]
        out[top : top + fh, left : left + fw, :3] = palette[sub]
        if nch == 4:
            out[top : top + fh, left : left + fw, 3] = np.where(
                sub == transparent, 0, 255
            )
        return out
    raise GifFormatError("GIF contains no image frame")


@_typed
def gif_probe(payload: bytes) -> dict:
    """width/height/n_frames/duration_ms/version without LZW decode —
    frame pixel data is skipped sub-block by sub-block."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    _gct, pos = _color_table(payload, pos, packed, 7)
    n_frames = 0
    duration_cs = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9:
                _n, _gp, delay, _t = struct.unpack_from("<BBHB", payload, pos)
                duration_cs += delay
            pos = _skip_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown GIF block 0x{block:02x}")
        _l, _t2, _w, _h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        _lct, pos = _color_table(payload, pos, ipacked, 7)
        pos += 1  # LZW min code size
        pos = _skip_subblocks(payload, pos)
        n_frames += 1
    return {
        "version": payload[3:6].decode("ascii"),
        "width": sw,
        "height": sh,
        "n_frames": n_frames,
        "duration_ms": duration_cs * 10,
    }


def gif_encode(
    frames: list[np.ndarray],
    delays_cs: list[int] | None = None,
    *,
    offsets: list[tuple[int, int]] | None = None,
    disposals: list[int] | None = None,
    transparent_color: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode (H, W, 3) uint8 frames as a GIF with one shared 256-color
    table built from all frames' distinct colors (≤256 required — a
    fixture writer, not a general quantizer). Optional per-frame
    ``offsets`` (left, top) place sub-rectangle frames on the logical
    screen (= max extent); ``disposals`` (0..3) set the GCE disposal
    method; pixels equal to ``transparent_color`` are written as the
    GCE transparent index."""
    if not frames:
        raise GifFormatError("no frames")
    offsets = offsets or [(0, 0)] * len(frames)
    if len(offsets) != len(frames):
        raise GifFormatError("offsets length mismatch")
    w = max(ox + f.shape[1] for f, (ox, oy) in zip(frames, offsets))
    h = max(oy + f.shape[0] for f, (ox, oy) in zip(frames, offsets))
    colors = np.unique(
        np.vstack([f.reshape(-1, 3) for f in frames]), axis=0
    )
    if transparent_color is not None:
        colors = np.unique(
            np.vstack([colors, np.array([transparent_color], np.uint8)]), axis=0
        )
    if len(colors) > 256:
        raise GifFormatError("fixture encoder supports <=256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    table = np.zeros((2**depth, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    tidx = lut[transparent_color] if transparent_color is not None else None
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x7), 0, 0)
    out += table.tobytes()
    min_code = max(2, depth)
    for fi, f in enumerate(frames):
        if delays_cs is not None or disposals is not None or tidx is not None:
            disp = disposals[fi] if disposals is not None else 0
            gpacked = ((disp & 0x7) << 2) | (1 if tidx is not None else 0)
            out += bytes([0x21, 0xF9, 4, gpacked])
            out += struct.pack(
                "<HB",
                delays_cs[fi] if delays_cs is not None else 0,
                tidx or 0,
            )
            out += b"\x00"
        ox, oy = offsets[fi]
        out += b"\x2c" + struct.pack(
            "<HHHHB", ox, oy, f.shape[1], f.shape[0], 0
        )
        idx = bytes(lut[tuple(px)] for px in f.reshape(-1, 3))
        out.append(min_code)
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


@_typed
def gif_decode_frames(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode EVERY frame, fully composited onto the logical screen:
    ([frame (H, W, 4) uint8 RGBA, ...], [delay_ms, ...]). Honors the
    GCE transparent index (transparent pixels leave the canvas — GIF's
    binary alpha compositing), disposal methods 0/1 (keep), 2 (restore
    rectangle to background) and 3 (restore previous canvas). The
    canvas starts as the background color, matching gif_decode's
    first-frame contract."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF (bad signature)")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct, pos = _color_table(payload, pos, packed, 7)
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else (0, 0, 0)
    canvas = np.empty((sh, sw, 4), dtype=np.uint8)
    canvas[:, :, :3] = bg_rgb
    canvas[:, :, 3] = 255
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9:
                n = payload[pos]
                gpacked, delay_cs, tval = struct.unpack_from(
                    "<BHB", payload, pos + 1
                )
                transparent = tval if gpacked & 1 else None
                disposal = (gpacked >> 2) & 0x7
                pos += 1 + n + 1
            else:
                pos = _skip_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        lct, pos = _color_table(payload, pos, ipacked, 7)
        palette = lct if lct is not None else gct
        if palette is None:
            raise GifFormatError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, w * h)
        if len(idx) < w * h:
            raise GifFormatError("LZW data shorter than frame")
        frame = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8)
        if int(frame.max(initial=0)) >= len(palette):
            raise GifFormatError("palette index out of range")
        if (ipacked >> 6) & 1:
            rows = frame.reshape(h, w)
            seq = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE:
                cnt = len(range(start, h, step))
                seq[start::step] = rows[src : src + cnt]
                src += cnt
            frame = seq.reshape(-1)
        if top >= sh or left >= sw:
            raise GifFormatError("frame rectangle outside logical screen")
        fh, fw = min(h, sh - top), min(w, sw - left)
        sub = frame.reshape(h, w)[:fh, :fw]
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = sub != transparent
            region[:, :, :3][mask] = palette[sub[mask]]
            region[:, :, 3][mask] = 255
        else:
            region[:, :, :3] = palette[sub]
            region[:, :, 3] = 255
        frames.append(canvas.copy())
        delays.append(delay_cs * 10)
        if disposal == 2:  # restore rectangle to background
            region[:, :, :3] = bg_rgb
            region[:, :, 3] = 255
        elif disposal == 3 and prev is not None:
            canvas = prev
        transparent, disposal, delay_cs = None, 0, 0
    if not frames:
        raise GifFormatError("GIF contains no image frame")
    return frames, delays
