"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF).

The reference's concrete image pipeline downloads an image and converts
it with ImageMagick as a subprocess task (reference README.md:66-77);
JPEG is the dominant wire format such a pipeline meets. The container
has no libjpeg/Pillow, but *baseline* JPEG needs none: it is Huffman
coding + dequantization + 8x8 inverse DCT, all public spec (ITU-T T.81
1992, Annex F/K; JFIF 1.02 for the YCbCr matrix) and all expressible
in numpy. Decode is the real thing — any baseline sequential JFIF file
(the output of libjpeg/Pillow/phones at default settings) decodes
here, including 4:2:0/4:2:2 chroma subsampling and restart markers.

The encoder emits baseline 4:4:4 with the Annex K example tables
(quality-scaled exactly as libjpeg's ``jpeg_quality_scaling``), which
is how the test fixtures are synthesized without any external codec.

Out of scope (typed ``UnsupportedImageError``): progressive (SOF2),
arithmetic coding, 12-bit precision, lossless, hierarchical — formats
a training-data pipeline meets rarely and that genuinely need a codec
library's worth of machinery.

Scale note: like the PNG codec, every image decodes independently
inside its Arrow batch on the executor; nothing touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

from xetl_spark.operators.imaging import UnsupportedImageError

# ---------------------------------------------------------------- shared

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: row k of C is the k-th cosine basis
# vector, so spatial = C.T @ coef @ C and coef = C @ spatial @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def sniff_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# ---------------------------------------------------------------- decode


class _Huff:
    """Canonical Huffman table with a 16-bit prefix lookup: peek 16
    bits, one array read gives (symbol, code length)."""

    __slots__ = ("sym", "length")

    def __init__(self, counts: bytes, symbols: bytes) -> None:
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.length = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for bitlen in range(1, 17):
            for _ in range(counts[bitlen - 1]):
                lo = code << (16 - bitlen)
                hi = (code + 1) << (16 - bitlen)
                self.sym[lo:hi] = symbols[k]
                self.length[lo:hi] = bitlen
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = int.from_bytes(data, "big") if data else 0
        self.nbits = len(data) * 8
        self.pos = 0

    def peek16(self) -> int:
        rem = self.nbits - self.pos
        if rem >= 16:
            return (self.data >> (rem - 16)) & 0xFFFF
        if rem <= 0:
            return 0xFFFF
        # pad past-end with 1s (spec: fill bits are 1s)
        return ((self.data << (16 - rem)) | ((1 << (16 - rem)) - 1)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise UnsupportedImageError("JPEG entropy stream truncated")

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        rem = self.nbits - self.pos
        if rem < n:
            raise UnsupportedImageError("JPEG entropy stream truncated")
        self.pos += n
        return (self.data >> (rem - n)) & ((1 << n) - 1)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(br: _BitReader, table: _Huff) -> int:
    idx = br.peek16()
    length = int(table.length[idx])
    if length == 0:
        raise UnsupportedImageError("invalid JPEG Huffman code")
    br.skip(length)
    return int(table.sym[idx])


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients -> (n, 8, 8) spatial samples."""
    return np.einsum("ij,njk,kl->nil", _C.T, coefs, _C)


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF/JPEG to (H, W, C) uint8
    (C=3 YCbCr->RGB, or C=1 grayscale)."""
    if not sniff_jpeg(payload):
        raise UnsupportedImageError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class, id)
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    scan = None

    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise UnsupportedImageError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq != 0:
                    raise UnsupportedImageError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                qtables[tq] = tab.reshape(8, 8)
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = seg[i + 1 : i + 17]
                nsym = sum(counts)
                symbols = seg[i + 17 : i + 17 + nsym]
                huff[(tc, th)] = _Huff(counts, symbols)
                i += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise UnsupportedImageError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF) for c in range(ns)]
            pos += seglen
            break
        pos += seglen

    if frame is None or scan is None:
        raise UnsupportedImageError("JPEG missing SOF/SOS")
    h, w, comps = frame

    # entropy-coded bytes: destuff FF00, split on restart markers
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker: end of scan
            break
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component coefficient planes (padded to whole MCUs)
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _tq in comps
    }
    comp_by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}

    pred = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    br = _BitReader(segments[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise UnsupportedImageError("JPEG missing restart segment")
                br = _BitReader(segments[seg_idx])
                pred = {cid: 0 for cid, *_ in comps}
                mcu_in_seg = 0
            for cid, dc_id, ac_id in scan:
                hs, vs, tq = comp_by_id[cid]
                dc_tab = huff.get((0, dc_id))
                ac_tab = huff.get((1, ac_id))
                if dc_tab is None or ac_tab is None:
                    raise UnsupportedImageError("JPEG missing Huffman table")
                q = qtables.get(tq)
                if q is None:
                    raise UnsupportedImageError("JPEG missing quant table")
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(br, dc_tab)
                        diff = _extend(br.receive(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: skip 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise UnsupportedImageError("JPEG AC index overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.int32)
                        block[ZIGZAG] = zz
                        coef = block.reshape(8, 8) * q
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = coef
            mcu_in_seg += 1

    # one vectorized IDCT pass per component over all its blocks
    out_comps = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        ph, pw = p.shape
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        spatial = _idct_blocks(blocks) + 128.0
        p = (
            spatial.reshape(ph // 8, pw // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph, pw)
        )
        # upsample subsampled chroma to full resolution (nearest)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_comps.append(p[:h, :w])

    if len(out_comps) == 1:
        return np.clip(np.round(out_comps[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out_comps) != 3:
        raise UnsupportedImageError(f"{len(out_comps)}-component JPEG unsupported")
    y, cb, cr = out_comps
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto
# standard every encoder scales)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 example Huffman tables: (bit-length counts, symbols)
_DC_LUMA = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_DC_CHROMA = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_AC_LUMA = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes(
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
            0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
            0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
            0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
            0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
            0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
            0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
            0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
            0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
            0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ]
    ),
)
_AC_CHROMA = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes(
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
            0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
            0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
            0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
            0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
            0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
            0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
            0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
            0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
            0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
            0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ]
    ),
)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's jpeg_quality_scaling (public API semantics)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255)


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:
            self.put((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # pad with 1s
        return bytes(self.buf)


def _build_codes(counts: bytes, symbols: bytes) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for bitlen in range(1, 17):
        for _ in range(counts[bitlen - 1]):
            codes[symbols[k]] = (code, bitlen)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit representation) per T.81 F.1.2.1.1."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def jpeg_encode(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """Encode (H, W[, C]) uint8 as baseline JFIF: 4:4:4, Annex K
    Huffman tables, quality-scaled Annex K quant tables.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what camera/libjpeg output commonly carries)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch == 1:
        ycc = [arr[:, :, 0].astype(np.float64) - 128.0]
        qsel = [0]
    elif nch >= 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ycc = [y - 128.0, cb - 128.0, cr - 128.0]
        qsel = [0, 1, 1]
    else:
        raise UnsupportedImageError(f"cannot JPEG-encode {nch}-channel image")

    qt = [_quality_scale(_Q_LUMA, quality), _quality_scale(_Q_CHROMA, quality)]
    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]

    bh, bw = -(-h // 8), -(-w // 8)
    bw8, bh8 = bw * 8, bh * 8
    wr = _BitWriter()
    pred = [0] * len(ycc)
    # quantized blocks per component, edge-padded by replication
    comp_blocks = []
    for ci, plane in enumerate(ycc):
        padded = np.empty((bh8, bw8), dtype=np.float64)
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]
        padded[:h, w:] = plane[:, -1:]
        padded[h:, w:] = plane[-1, -1]
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)
        qz = np.round(coefs / qt[qsel[ci]]).astype(np.int64)
        comp_blocks.append(qz)

    entropy = bytearray()
    rst = 0
    for bi in range(bh * bw):
        if restart_interval and bi and bi % restart_interval == 0:
            entropy += wr.flush()
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            wr = _BitWriter()
            pred = [0] * len(ycc)
        for ci in range(len(ycc)):
            qz = comp_blocks[ci][bi]
            zz = qz.reshape(-1)[ZIGZAG]
            dc = int(zz[0])
            diff = dc - pred[ci]
            pred[ci] = dc
            t, bits = _magnitude(diff)
            code, ln = dc_codes[qsel[ci]][t]
            wr.put(code, ln)
            wr.put(bits, t)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[qsel[ci]][0xF0]  # ZRL
                    wr.put(code, ln)
                    run -= 16
                t, bits = _magnitude(v)
                code, ln = ac_codes[qsel[ci]][(run << 4) | t]
                wr.put(code, ln)
                wr.put(bits, t)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[qsel[ci]][0x00]  # EOB
                wr.put(code, ln)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qt[: max(qsel) + 1]):
        out += seg(0xDB, bytes([ti]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))
    ncomp = len(ycc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qsel[ci]])
    out += seg(0xC0, sof)
    tables = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if ncomp > 1:
        tables += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (counts, symbols) in tables:
        out += seg(0xC4, bytes([(tc << 4) | th]) + counts + symbols)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (qsel[ci] << 4) | qsel[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    entropy += wr.flush()
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
