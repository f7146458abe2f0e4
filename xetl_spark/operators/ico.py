"""Windows ICO (favicon) decoding — web crawls carry one per site.

An ICO is an ICONDIR of entries, each either a PNG (magic-sniffed,
delegated to the PNG codec) or a DIB: a BITMAPINFOHEADER with DOUBLED
height holding a bottom-up XOR image (1/4/8-bit paletted or 24/32-bit
BGR(A)) followed by a 1-bit AND transparency mask. ``ico_decode``
returns the best entry (largest area, then deepest) as (H, W, 4)
RGBA; ``ico_probe`` lists every entry without decoding pixels.

Reference parity: favicon wrangling in the reference's world is an
ImageMagick subprocess (reference README.md:50-95); here it is part
of imaging.decode_image's dispatch.

Scale note: per-payload decode inside the Arrow batch, like every
codec here.
"""

from __future__ import annotations

import struct

import numpy as np

from xetl_spark.operators.imaging import PNG_MAGIC, UnsupportedImageError, _typed


def sniff_ico(payload: bytes) -> bool:
    """True when the header is a plausible ICONDIR: reserved 0, type
    1 (icon) or 2 (cursor), a sane entry count, and the first entry's
    data window inside the payload (guards against the weak 4-byte
    prefix matching random binaries)."""
    if len(payload) < 22 or payload[:2] != b"\x00\x00":
        return False
    (kind,) = struct.unpack_from("<H", payload, 2)
    (count,) = struct.unpack_from("<H", payload, 4)
    if kind not in (1, 2) or not 1 <= count <= 64:
        return False
    size, off = struct.unpack_from("<II", payload, 6 + 8)
    return 6 + 16 * count <= off <= len(payload) and off + size <= len(payload)


def _entries(payload: bytes) -> list[dict]:
    if not sniff_ico(payload):
        raise UnsupportedImageError("not an ICO (bad ICONDIR)")
    (count,) = struct.unpack_from("<H", payload, 4)
    out = []
    for i in range(count):
        base = 6 + 16 * i
        bw, bh, _colors, _rsvd = payload[base : base + 4]
        _planes, bpp = struct.unpack_from("<HH", payload, base + 4)
        size, off = struct.unpack_from("<II", payload, base + 8)
        if off + size > len(payload):
            raise UnsupportedImageError("ICO entry outside payload")
        data = payload[off : off + size]
        is_png = data[:8] == PNG_MAGIC
        if is_png:
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            depth = 32
        else:
            w = bw or 256
            h = bh or 256
            depth = bpp or (
                struct.unpack_from("<HH", data, 12)[1] if len(data) >= 16 else 0
            )
        out.append(
            {"width": w, "height": h, "bpp": depth, "png": is_png, "_data": data}
        )
    return out


@_typed
def ico_probe(payload: bytes) -> dict:
    """{n_entries, entries: [{width, height, bpp, png}, ...]} — header
    walk only, no pixel decode."""
    entries = _entries(payload)
    return {
        "n_entries": len(entries),
        "entries": [
            {k: e[k] for k in ("width", "height", "bpp", "png")}
            for e in entries
        ],
    }


def _decode_dib(data: bytes, w_hint: int, h_hint: int) -> np.ndarray:
    (hdr_size,) = struct.unpack_from("<I", data, 0)
    if hdr_size < 40:
        raise UnsupportedImageError("ICO DIB header too small")
    w, h2 = struct.unpack_from("<ii", data, 4)
    planes, bpp = struct.unpack_from("<HH", data, 12)
    (compression,) = struct.unpack_from("<I", data, 16)
    (clr_used,) = struct.unpack_from("<I", data, 32)
    if planes != 1 or compression != 0:
        raise UnsupportedImageError("unsupported ICO DIB")
    h = h2 // 2 if h2 == 2 * h_hint or h_hint == 0 else h2
    if w != w_hint and w_hint:
        raise UnsupportedImageError("ICO entry/DIB width mismatch")
    if bpp not in (1, 4, 8, 24, 32):
        raise UnsupportedImageError(f"unsupported ICO bpp {bpp}")
    pos = hdr_size
    palette = None
    if bpp <= 8:
        ncolors = clr_used or (1 << bpp)
        pal = np.frombuffer(data[pos : pos + 4 * ncolors], dtype=np.uint8)
        if len(pal) < 4 * ncolors:
            raise UnsupportedImageError("truncated ICO palette")
        palette = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        pos += 4 * ncolors

    xor_stride = ((w * bpp + 31) // 32) * 4
    xor = data[pos : pos + xor_stride * h]
    if len(xor) < xor_stride * h:
        raise UnsupportedImageError("truncated ICO XOR image")
    pos += xor_stride * h
    rows = np.frombuffer(xor, dtype=np.uint8).reshape(h, xor_stride)[::-1]
    out = np.empty((h, w, 4), dtype=np.uint8)
    if bpp == 32:
        px = rows.reshape(h, -1)[:, : w * 4].reshape(h, w, 4)
        out[:, :, 0], out[:, :, 1], out[:, :, 2] = (
            px[:, :, 2], px[:, :, 1], px[:, :, 0],
        )
        out[:, :, 3] = px[:, :, 3]
        # a fully-zero alpha plane means "alpha unused; AND mask rules"
        use_and = not px[:, :, 3].any()
        if use_and:
            out[:, :, 3] = 255  # visible unless the AND mask says not
    elif bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        out[:, :, :3] = px[:, :, ::-1]
        out[:, :, 3] = 255
        use_and = True
    else:
        per = 8 // bpp
        mask = (1 << bpp) - 1
        shifts = np.arange(per - 1, -1, -1) * bpp  # MSB-first packing
        idx = (
            (rows[:, :, None] >> shifts[None, None, :]) & mask
        ).reshape(h, -1)[:, :w]
        if int(idx.max(initial=0)) >= len(palette):
            raise UnsupportedImageError("ICO palette index out of range")
        out[:, :, :3] = palette[idx]
        out[:, :, 3] = 255
        use_and = True

    if use_and:
        and_stride = ((w + 31) // 32) * 4
        am = data[pos : pos + and_stride * h]
        if len(am) >= and_stride * h:
            arows = np.frombuffer(am, dtype=np.uint8).reshape(h, and_stride)[::-1]
            bits = np.unpackbits(arows, axis=1)[:, :w]
            out[:, :, 3] = np.where(bits == 1, 0, out[:, :, 3])
    return out


@_typed
def ico_decode(payload: bytes) -> np.ndarray:
    """Decode the best entry (largest area, then highest bit depth)
    -> (H, W, 4) uint8 RGBA."""
    entries = _entries(payload)
    best = max(entries, key=lambda e: (e["width"] * e["height"], e["bpp"]))
    if best["png"]:
        from xetl_spark.operators.imaging import png_decode

        arr = png_decode(best["_data"])
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[2] == 3:
            arr = np.dstack(
                [arr, np.full(arr.shape[:2], 255, np.uint8)]
            )
        elif arr.shape[2] == 1:
            arr = np.dstack(
                [arr, arr, arr, np.full(arr.shape[:2], 255, np.uint8)]
            )
        return arr
    return _decode_dib(best["_data"], best["width"], best["height"])


def ico_build(images: list[np.ndarray], *, as_png: bool = False) -> bytes:
    """Fixture writer: wrap (H, W, 3|4) uint8 frames as ICO entries —
    PNG entries (``as_png``) or 32-bit DIBs with an all-opaque AND
    mask (alpha carried in the DIB when the source has it)."""
    blobs = []
    metas = []
    for img in images:
        img = np.asarray(img, dtype=np.uint8)
        h, w = img.shape[:2]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise UnsupportedImageError("ICO entries are 1..256 px")
        if as_png:
            from xetl_spark.operators.imaging import png_encode

            blob = png_encode(img)
        else:
            a = (
                img[:, :, 3]
                if img.ndim == 3 and img.shape[2] == 4
                else np.full((h, w), 255, np.uint8)
            )
            rgb = img[:, :, :3]
            px = np.empty((h, w, 4), dtype=np.uint8)
            px[:, :, 0], px[:, :, 1], px[:, :, 2] = (
                rgb[:, :, 2], rgb[:, :, 1], rgb[:, :, 0],
            )
            px[:, :, 3] = a
            xor = px[::-1].reshape(h, -1)
            xor_stride = ((w * 32 + 31) // 32) * 4
            pad = np.zeros((h, xor_stride - w * 4), dtype=np.uint8)
            xor = np.hstack([xor, pad])
            and_stride = ((w + 31) // 32) * 4
            and_mask = np.zeros((h, and_stride), dtype=np.uint8)
            hdr = struct.pack(
                "<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
                xor.nbytes + and_mask.nbytes, 0, 0, 0, 0,
            )
            blob = hdr + xor.tobytes() + and_mask.tobytes()
        blobs.append(blob)
        metas.append((w, h))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    off = 6 + 16 * len(images)
    for (w, h), blob in zip(metas, blobs):
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HH", 1, 32)
        out += struct.pack("<II", len(blob), off)
        off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)
