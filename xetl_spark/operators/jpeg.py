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

Progressive (SOF2) decodes too — ITU-T T.81 Annex G: spectral
selection, successive approximation (DC first/refine, AC first with
EOB runs, AC refinement with correction bits), interleaved DC and
non-interleaved AC scans, restart markers per scan. Golden-tested
against the JVM's ImageIO progressive encoder+decoder (the classic
jpeg_simple_progression scan script).

Lossless (SOF3, Annex H) decodes AND encodes too: sample-domain
predictive Huffman coding, all seven T.81 predictors, bit-exact
round-trip by construction (no DCT).

12-bit extended precision (SOF1 sequential / SOF2 progressive)
decodes AND encodes: the Huffman machinery is bit-width-generic, so
the extension is the wider level shift/clip range, 16-bit DQT
elements (Pq=1), and generic Huffman tables covering the larger
magnitude categories; output is uint16 in 0..4095.

Hierarchical mode (T.81 §16: DHP, EXP reference expansion, SOF5/SOF6
differential frames) decodes AND encodes — the pyramid machinery is
the same DCT codec minus the level shift for differential frames,
plus the J.1.1.2 integer upsampling filter; the encoder
mirror-decodes each frame so residuals are coded against the
decoder's true reference.

Arithmetic coding decodes AND encodes via the T.81 Annex D QM-coder
(operators/jpeg_arith.py: the 113-state probability machine, DC
diff-category conditioning, AC Kx-split contexts, DAC parsing,
restart segments): SOF9 (extended sequential, 8/12-bit), SOF10
(progressive: Annex G.2 successive approximation, the four scan
kinds DC first/refine + AC first/refine), SOF11 (round 11 —
lossless: the Annex H.1.2.2 sample-domain model, each prediction
difference conditioned on the 5x5 category classification of its
left/above neighbour diffs), and SOF13/SOF14 (round 11 —
differential sequential/progressive frames inside hierarchical
pyramids, F.2.1.3.1 PRED-pinned-to-0). Round-trip is bit-exact on
every quantized coefficient (bit-exact on PIXELS for SOF11) and
each arithmetic stream decodes pixel-identically to its Huffman
twin; see jpeg_arith's conformance note for the third-party-stream
caveat. Round 11 also closed the LAST T.81 frame family: lossless
frames inside hierarchical pyramids (SOF7/SOF15 differential over a
SOF3/SOF11 base, T.81 §16 + Annex H — scan Ss=0, residuals added
modulo 2^16 per J.4), encoded by jpeg_encode_hierarchical_lossless
and reconstructing BIT-EXACT pixels at every level. Every SOF0-SOF15
frame type T.81 defines now decodes.

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


def _typed(fn):
    """Translate low-level parse escapes on hostile/truncated bytes
    (struct/index errors) into UnsupportedImageError — the typed
    rejection shared with operators/imaging.py."""
    import functools

    @functools.wraps(fn)
    def wrap(*a, **kw):
        try:
            return fn(*a, **kw)
        except UnsupportedImageError:
            raise
        except (struct.error, IndexError, OverflowError, ValueError) as e:
            raise UnsupportedImageError(f"malformed JPEG: {e}") from None

    return wrap


def sniff_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# ---------------------------------------------------------------- decode


class _Huff:
    """Canonical Huffman table with a 16-bit prefix lookup: peek 16
    bits, ONE list read gives (length << 8) | symbol — a packed plain
    Python list, not numpy, because a scalar list index is ~4x cheaper
    than two numpy scalar extractions in the per-symbol hot loop."""

    __slots__ = ("lut",)

    def __init__(self, counts: bytes, symbols: bytes) -> None:
        lut = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        k = 0
        for bitlen in range(1, 17):
            for _ in range(counts[bitlen - 1]):
                lo = code << (16 - bitlen)
                hi = (code + 1) << (16 - bitlen)
                lut[lo:hi] = (bitlen << 8) | symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.lut = lut.tolist()


class _BitReader:
    """MSB-first reader over a destuffed entropy segment.

    Keeps a small (≤ 24-bit) accumulator refilled bytewise, so every
    peek/skip/receive is O(1). (The original held the WHOLE segment as
    one Python bignum and shifted it per read — O(segment) per bit,
    O(n²) per scan; the codec-bench flagged baseline decode at
    0.33 MB/s because of it.)"""

    __slots__ = ("data", "nbits", "pos", "acc", "bits", "bytepos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.nbits = len(data) * 8  # real (non-pad) bits available
        self.pos = 0  # real bits consumed
        self.acc = 0  # lookahead window
        self.bits = 0  # bits currently in acc
        self.bytepos = 0

    def _fill(self, need: int) -> None:
        data, n = self.data, len(self.data)
        while self.bits < need:
            if self.bytepos < n:
                self.acc = (self.acc << 8) | data[self.bytepos]
                self.bytepos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF  # spec: pad bits are 1s
            self.bits += 8

    def peek16(self) -> int:
        if self.bits < 16:
            self._fill(16)
        return (self.acc >> (self.bits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise UnsupportedImageError("JPEG entropy stream truncated")
        if self.bits < n:
            self._fill(n)
        self.bits -= n
        self.acc &= (1 << self.bits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos += n
        if self.pos > self.nbits:
            raise UnsupportedImageError("JPEG entropy stream truncated")
        if self.bits < n:
            self._fill(n)
        self.bits -= n
        out = self.acc >> self.bits
        self.acc &= (1 << self.bits) - 1
        return out


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(br: _BitReader, table: _Huff) -> int:
    packed = table.lut[br.peek16()]
    if packed == 0:
        raise UnsupportedImageError("invalid JPEG Huffman code")
    br.skip(packed >> 8)
    return packed & 0xFF


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients -> (n, 8, 8) spatial samples."""
    return np.einsum("ij,njk,kl->nil", _C.T, coefs, _C)


def _entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Extract one scan's entropy-coded bytes starting at ``pos``:
    destuff FF00, split on RSTn markers. Returns (segments, position of
    the next marker)."""
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
    return segments, i


def _block_sequential(br, zz, dc_tab, ac_tab, pred, cid, differential=False) -> None:
    """Baseline sequential block: DC diff + AC run-length (T.81 F.2).
    In differential frames PRED stays 0 (F.2.1.3.1)."""
    t = _decode_huff(br, dc_tab)
    if differential:
        zz[0] = _extend(br.receive(t), t)
    else:
        pred[cid] += _extend(br.receive(t), t)
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


def _block_dc_first(br, zz, dc_tab, pred, cid, al, differential=False) -> None:
    """Progressive DC, first pass (G.2): diffs of DC>>Al; the running
    predictor is kept in reduced precision and shifted out on store.
    Differential frames code DC unpredicted (PRED = 0, F.2.1.3.1)."""
    t = _decode_huff(br, dc_tab)
    if differential:
        zz[0] = _extend(br.receive(t), t) << al
    else:
        pred[cid] += _extend(br.receive(t), t)
        zz[0] = pred[cid] << al

def _block_dc_refine(br, zz, al) -> None:
    """Progressive DC refinement (G.1.2.1): one appended bit."""
    if br.receive(1):
        zz[0] = int(zz[0]) | (1 << al)


def _block_ac_first(br, zz, ac_tab, ss, se, al, state) -> None:
    """Progressive AC, first pass over a spectral band (G.1.2.2):
    run-length coding within Ss..Se plus EOBn run symbols that skip
    whole blocks (state['eobrun'] carries the remainder across
    blocks)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: this block ends; (1<<r)+bits-1 more follow
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.receive(r)
                return
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise UnsupportedImageError("JPEG AC index overflow")
            zz[k] = _extend(br.receive(s), s) << al
            k += 1


def _block_ac_refine(br, zz, ac_tab, ss, se, al, state) -> None:
    """Progressive AC refinement (G.1.2.3): each symbol either places a
    new ±1<<Al coefficient after a run of zero-history positions or
    starts an EOB run; every nonzero-history coefficient passed on the
    way reads one correction bit."""
    bit = 1 << al

    def correct(k: int) -> None:
        v = int(zz[k])
        if v != 0 and br.receive(1) and not (v & bit):
            zz[k] = v + bit if v > 0 else v - bit

    if state["eobrun"] > 0:
        for k in range(ss, se + 1):
            correct(k)
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0xF
        newval = 0
        if s == 0:
            if r < 15:  # EOB run: finish correcting this block, then done
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.receive(r)
                while k <= se:
                    correct(k)
                    k += 1
                return
            # ZRL: r==15 → pass 16 zero-history coefficients
        else:
            if s != 1:
                raise UnsupportedImageError("invalid JPEG AC refinement symbol")
            newval = bit if br.receive(1) else -bit
        while k <= se:  # pass r zero-history coefs, correcting nonzeros
            if int(zz[k]) != 0:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if s and k <= se:
            zz[k] = newval
        k += 1


@_typed
def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential, extended-sequential, OR
    progressive JFIF/JPEG to (H, W, C) — uint8 for 8-bit precision,
    uint16 (0..4095) for 12-bit extended precision (C=3 YCbCr->RGB, or
    C=1 grayscale).

    Multi-scan architecture: every SOS decodes into per-component
    quantized-coefficient planes (zigzag index space); dequantization
    + one vectorized IDCT pass per component happen once at the end.
    Baseline is the degenerate single-scan case of the same machinery;
    12-bit only widens the level shift / clip range / DQT element size
    (T.81 tables B.1, B.4) — the Huffman machinery is bit-width-generic.
    """
    if not sniff_jpeg(payload):
        raise UnsupportedImageError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class, id)
    dac: dict[tuple[int, int], object] = {}  # (class, id) -> (L,U) | Kx
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    prec = 8
    progressive = False
    arith = False
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}  # cid -> (nby, nbx, 64) zigzag space
    geom: dict[int, tuple[int, int, int, int]] = {}  # cid -> (nbx_t, nby_t, hs, vs)
    saw_scan = False

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
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):  # baseline / ext seq /
            # progressive / arithmetic ext seq / arithmetic progressive
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec not in (8, 12):
                raise UnsupportedImageError(f"{prec}-bit JPEG unsupported")
            if prec == 12 and marker == 0xC0:
                raise UnsupportedImageError("baseline SOF0 must be 8-bit")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = samp >> 4, samp & 0xF
                # T.81 B.2.2: sampling factors are 1..4 — a zero (seen
                # in fuzzed streams) would divide the MCU geometry by 0
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise UnsupportedImageError(
                        f"invalid JPEG sampling factor {hs}x{vs}"
                    )
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, hs, vs, _tq in comps:
                # MCU-padded grid (superset of the component's true
                # ceil(cw/8) x ceil(ch/8) grid used by non-interleaved scans)
                coefs[cid] = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                cw = -(-w * hs // hmax)
                ch = -(-h * vs // vmax)
                geom[cid] = (-(-cw // 8), -(-ch // 8), hs, vs)
        elif marker in (0xC3, 0xCB):  # lossless: Huffman SOF3 / arith SOF11
            return _lossless_decode(payload)
        elif marker == 0xDE:  # DHP: hierarchical stream
            return _hierarchical_decode(payload)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc, tb, val = seg[i] >> 4, seg[i] & 0xF, seg[i + 1]
                if tc == 0:
                    dac[(0, tb)] = (val & 0xF, val >> 4)  # (L, U)
                else:
                    dac[(1, tb)] = val  # Kx
                i += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise UnsupportedImageError("JPEG SOS before SOF")
            ns = seg[0]
            scan = [
                (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos += seglen
            segments, pos = _entropy_segments(payload, pos)
            if arith:
                _decode_sos_arith(
                    segments, scan, frame, coefs, geom, restart_interval,
                    dac, ss, se, ah, al, progressive,
                )
            else:
                _decode_sos(
                    segments, scan, frame, huff, coefs, geom,
                    restart_interval, ss, se, ah, al, progressive,
                )
            saw_scan = True
            continue
        pos += seglen

    if frame is None or not saw_scan:
        raise UnsupportedImageError("JPEG missing SOF/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # dequantize + one vectorized IDCT pass per component
    half = float(1 << (prec - 1))  # level shift: 128 (8-bit) / 2048 (12-bit)
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    out_comps = []
    for cid, hs, vs, tq in comps:
        q = qtables.get(tq)
        if q is None:
            raise UnsupportedImageError("JPEG missing quant table")
        zzc = coefs[cid]
        nby, nbx, _ = zzc.shape
        nat = np.zeros_like(zzc)
        nat[:, :, ZIGZAG] = zzc  # zigzag -> natural order
        blocks = (nat.reshape(nby, nbx, 8, 8) * q[None, None]).reshape(-1, 8, 8)
        spatial = _idct_blocks(blocks.astype(np.float64)) + half
        p = (
            spatial.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        # upsample subsampled chroma to full resolution (nearest)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_comps.append(p[:h, :w])

    if len(out_comps) == 1:
        return np.clip(np.round(out_comps[0]), 0, maxv).astype(dtype)[:, :, None]
    if len(out_comps) != 3:
        raise UnsupportedImageError(f"{len(out_comps)}-component JPEG unsupported")
    y, cb, cr = out_comps
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, maxv).astype(dtype)


def _parse_dqt(seg: bytes, qtables: dict) -> None:
    """DQT segment → qtables (8-bit Pq=0 / 16-bit Pq=1 elements).
    Shared by the single-frame and hierarchical decoders so the
    validity checks can't drift."""
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 0xF
        i += 1
        if pq not in (0, 1):
            raise UnsupportedImageError(f"DQT precision {pq} invalid")
        tab = np.zeros(64, dtype=np.int32)
        if pq:  # 16-bit big-endian elements (12-bit frames)
            if i + 128 > len(seg):
                raise UnsupportedImageError("truncated 16-bit DQT")
            tab[ZIGZAG] = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
            i += 128
        else:
            tab[ZIGZAG] = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
            i += 64
        qtables[tq] = tab.reshape(8, 8)


def _parse_dht(seg: bytes, huff: dict) -> None:
    """DHT segment → huff[(class, id)] tables."""
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0xF
        counts = seg[i + 1 : i + 17]
        nsym = sum(counts)
        huff[(tc, th)] = _Huff(counts, seg[i + 17 : i + 17 + nsym])
        i += 17 + nsym


def _decode_sos(
    segments, scan, frame, huff, coefs, geom,
    restart_interval, ss, se, ah, al, progressive,
    differential=False,
) -> None:
    """Decode one scan's entropy segments into the coefficient planes.

    Interleaved (ns>1) scans walk MCUs (hs x vs blocks per component);
    a single-component scan walks that component's true block grid
    (T.81 A.2.2 — NOT the MCU-padded grid). Restart intervals count
    MCUs (or blocks, non-interleaved), resetting DC predictors and the
    EOB run. ``differential`` (hierarchical SOF5/SOF6 frames): DC is
    coded WITHOUT prediction — T.81 F.2.1.3.1 sets PRED = 0 for
    differential frames, so the decoded diff IS the coefficient."""
    h, w, comps = frame
    comp_by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    for cid, _dc, _ac in scan:
        if cid not in comp_by_id:
            raise UnsupportedImageError("JPEG scan references undeclared component")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    pred = {cid: 0 for cid, *_ in scan}
    state = {"eobrun": 0}
    seg_idx = 0
    br = _BitReader(segments[0])
    unit_in_seg = 0

    def maybe_restart():
        nonlocal seg_idx, br, unit_in_seg, pred
        if restart_interval and unit_in_seg == restart_interval:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise UnsupportedImageError("JPEG missing restart segment")
            br = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid, *_ in scan}
            state["eobrun"] = 0
            unit_in_seg = 0

    def decode_block(zz, cid, dc_tab, ac_tab):
        if not progressive:
            if dc_tab is None or ac_tab is None:
                raise UnsupportedImageError("JPEG missing Huffman table")
            _block_sequential(br, zz, dc_tab, ac_tab, pred, cid, differential)
        elif ss == 0:  # DC scan (se must be 0 per spec)
            if ah == 0:
                if dc_tab is None:
                    raise UnsupportedImageError("JPEG missing Huffman table")
                _block_dc_first(br, zz, dc_tab, pred, cid, al, differential)
            else:
                _block_dc_refine(br, zz, al)
        else:  # AC scan
            if ac_tab is None:
                raise UnsupportedImageError("JPEG missing Huffman table")
            if ah == 0:
                _block_ac_first(br, zz, ac_tab, ss, se, al, state)
            else:
                _block_ac_refine(br, zz, ac_tab, ss, se, al, state)

    if len(scan) > 1:  # interleaved: MCU order
        if progressive and ss != 0:
            raise UnsupportedImageError("interleaved progressive AC scan")
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for cid, dc_id, ac_id in scan:
                    hs, vs, _tq = comp_by_id[cid]
                    dc_tab, ac_tab = huff.get((0, dc_id)), huff.get((1, ac_id))
                    for by in range(vs):
                        for bx in range(hs):
                            zz = coefs[cid][my * vs + by, mx * hs + bx]
                            decode_block(zz, cid, dc_tab, ac_tab)
                unit_in_seg += 1
    else:  # non-interleaved: the component's own block grid
        cid, dc_id, ac_id = scan[0]
        nbx_t, nby_t, _hs, _vs = geom[cid]
        dc_tab, ac_tab = huff.get((0, dc_id)), huff.get((1, ac_id))
        for by in range(nby_t):
            for bx in range(nbx_t):
                maybe_restart()
                zz = coefs[cid][by, bx]
                decode_block(zz, cid, dc_tab, ac_tab)
                unit_in_seg += 1


def _decode_sos_arith(
    segments, scan, frame, coefs, geom, restart_interval, dac,
    ss=0, se=63, ah=0, al=0, progressive=False, differential=False,
) -> None:
    """Decode one ARITHMETIC scan into the coefficient planes — the
    QM-coder twin of the Huffman _decode_sos, covering SOF9
    (sequential) and SOF10 (progressive: T.81 Annex G.2 successive
    approximation, the four scan kinds dispatched on (Ss, Ah)). Same
    MCU/block walk and restart discipline; each restart segment gets
    a fresh QMDecoder and a fully reset statistics area + DC
    conditioning state (T.81 F.2.1.3). ``dac`` maps
    (class, table_id) -> conditioning: (L, U) for DC (diff category
    thresholds, default (0, 1)), Kx for AC (low/high spectral split,
    default 5) — T.81 B.2.4.3 defaults."""
    from xetl_spark.operators.jpeg_arith import (
        ArithState,
        QMDecoder,
        decode_ac,
        decode_ac_first,
        decode_ac_refine,
        decode_dc,
        decode_dc_first,
        decode_dc_refine,
    )

    h, w, comps = frame
    comp_by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    for cid, _dc, _ac in scan:
        if cid not in comp_by_id:
            raise UnsupportedImageError("JPEG scan references undeclared component")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ci_of = {cid: i for i, (cid, *_rest) in enumerate(scan)}

    seg_idx = 0
    dec = QMDecoder(segments[0])
    ast = ArithState(len(scan))
    unit_in_seg = 0

    def maybe_restart():
        nonlocal seg_idx, dec, ast, unit_in_seg
        if restart_interval and unit_in_seg == restart_interval:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise UnsupportedImageError("JPEG missing restart segment")
            dec = QMDecoder(segments[seg_idx])
            ast = ArithState(len(scan))
            unit_in_seg = 0

    def decode_block(zz, cid, dc_id, ac_id):
        low, up = dac.get((0, dc_id), (0, 1))
        kx = dac.get((1, ac_id), 5)
        if differential:
            # F.2.1.3.1: differential frames code the DC value itself
            # (PRED stays 0); the diff-category conditioning still
            # adapts, so only the running predictor is pinned to 0
            ast.last_dc[ci_of[cid]] = 0
        try:
            if not progressive:
                zz[0] = decode_dc(dec, ast, ci_of[cid], dc_id, low, up)
                decode_ac(dec, ast, ac_id, kx, zz)
            elif ss == 0 and ah == 0:  # DC first
                zz[0] = decode_dc_first(
                    dec, ast, ci_of[cid], dc_id, low, up, al
                )
            elif ss == 0:  # DC refinement
                if decode_dc_refine(dec, ast):
                    zz[0] |= 1 << al
            elif ah == 0:  # AC first
                decode_ac_first(dec, ast, ac_id, kx, zz, ss, se, al)
            else:  # AC refinement
                decode_ac_refine(dec, ast, ac_id, zz, ss, se, al)
        except ValueError as exc:
            raise UnsupportedImageError(f"corrupt arithmetic scan: {exc}")

    if progressive and ss != 0 and len(scan) > 1:
        raise UnsupportedImageError("interleaved progressive AC scan")
    if progressive and ss == 0 and se != 0:
        # T.81 B.2.3: a progressive DC scan is exactly Ss=Se=0
        raise UnsupportedImageError("malformed progressive DC scan (Se != 0)")
    if len(scan) > 1:  # interleaved MCU order
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for cid, dc_id, ac_id in scan:
                    hs, vs, _tq = comp_by_id[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            zz = coefs[cid][my * vs + by, mx * hs + bx]
                            decode_block(zz, cid, dc_id, ac_id)
                unit_in_seg += 1
    else:  # non-interleaved: the component's own block grid
        cid, dc_id, ac_id = scan[0]
        nbx_t, nby_t, _hs, _vs = geom[cid]
        for by in range(nby_t):
            for bx in range(nbx_t):
                maybe_restart()
                decode_block(coefs[cid][by, bx], cid, dc_id, ac_id)
                unit_in_seg += 1


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


def _encode_dc(wr: _BitWriter, codes: dict, diff: int) -> None:
    t, bits = _magnitude(diff)
    code, ln = codes[t]
    wr.put(code, ln)
    wr.put(bits, t)


def _encode_ac_band(wr: _BitWriter, codes: dict, zz: np.ndarray) -> None:
    """Run-length encode zz[1..63] (baseline F.2 — identical symbol
    semantics to a progressive first AC scan over Ss=1..Se=63, where
    the EOB symbol is the degenerate EOB0 run of one block)."""
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
            code, ln = codes[0xF0]  # ZRL
            wr.put(code, ln)
            run -= 16
        t, bits = _magnitude(v)
        code, ln = codes[(run << 4) | t]
        wr.put(code, ln)
        wr.put(bits, t)
        run = 0
    if last_nz < 63:
        code, ln = codes[0x00]  # EOB
        wr.put(code, ln)


# generic tables for 12-bit encoding (Annex K's example tables only
# cover 8-bit magnitude categories): all 16 DC categories at code
# length 5 (Kraft 16/32, all-ones code free), all 226 possible AC
# run/size symbols (sizes 1..14, plus EOB and ZRL) at code length 8
# (Kraft 226/256, all-ones free) — valid canonical T.81 tables, just
# not entropy-optimal, which only costs compressed size.
_DC_12BIT = (
    bytes([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(16)),
)
_AC_12BIT = (
    bytes([0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0]),
    bytes(
        [0x00, 0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 15)]
    ),
)


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    progressive: bool = False,
    bits: int = 8,
    arithmetic: bool = False,
) -> bytes:
    """Encode (H, W[, C]) uint8 as JFIF: 4:4:4, Annex K Huffman
    tables, quality-scaled Annex K quant tables.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what camera/libjpeg output commonly carries;
    baseline mode only). ``progressive=True`` emits SOF2 with a
    spectral-selection scan script — one interleaved full-precision DC
    scan, then one Ss=1..63 AC scan per component (T.81 Annex G
    without successive approximation: same Huffman symbol semantics as
    baseline, re-ordered into per-band scans, so the pixel result is
    bit-identical to baseline mode at the same quality). Successive-
    approximation ENCODING is out of scope; the decoder's refinement
    path is golden-tested against JVM ImageIO progressive output.
    ``arithmetic=True`` emits SOF9 with the T.81 QM-coder entropy
    layer (operators/jpeg_arith.py) and a DAC segment carrying the
    default conditioning (L=0, U=1, Kx=5) — same DCT/quant pipeline,
    typically ~10-40% smaller files; sequential only."""
    if bits not in (8, 12):
        raise UnsupportedImageError(f"{bits}-bit JPEG encode unsupported")
    if restart_interval and progressive:
        # the progressive scan scripts (Huffman SOF2 and arithmetic
        # SOF10) emit no DRI/RSTn; refuse rather than silently return a
        # stream without the restart segments the caller asked for
        raise UnsupportedImageError(
            "restart_interval is unsupported with progressive encoding"
        )
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    half = float(1 << (bits - 1))
    if nch == 1:
        ycc = [arr[:, :, 0].astype(np.float64) - half]
        qsel = [0]
    elif nch >= 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + half
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + half
        ycc = [y - half, cb - half, cr - half]
        qsel = [0, 1, 1]
    else:
        raise UnsupportedImageError(f"cannot JPEG-encode {nch}-channel image")

    qt = [_quality_scale(_Q_LUMA, quality), _quality_scale(_Q_CHROMA, quality)]
    if bits == 12:
        # scale quantization with the widened sample range (×16 signal
        # → ×4 step keeps relative error comparable while exercising
        # the 16-bit DQT element path)
        qt = [q * 4 for q in qt]
        dc_codes = [_build_codes(*_DC_12BIT)] * 2
        ac_codes = [_build_codes(*_AC_12BIT)] * 2
    else:
        dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
        ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]

    bh, bw = -(-h // 8), -(-w // 8)
    bw8, bh8 = bw * 8, bh * 8
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

    zz_blocks = [qz.reshape(-1, 64)[:, ZIGZAG] for qz in comp_blocks]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ncomp = len(ycc)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qt[: max(qsel) + 1]):
        if bits == 12:  # Pq=1: 16-bit big-endian elements
            body = bytes([0x10 | ti]) + q.reshape(-1)[ZIGZAG].astype(">u2").tobytes()
        else:
            body = bytes([ti]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8))
        out += seg(0xDB, body)
    sof = bytes([bits]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qsel[ci]])
    # 12-bit sequential must use SOF1 (extended); baseline SOF0 is 8-bit-only
    if arithmetic:
        sof_marker = 0xCA if progressive else 0xC9
    else:
        sof_marker = 0xC2 if progressive else (0xC1 if bits == 12 else 0xC0)
    out += seg(sof_marker, sof)
    if arithmetic:
        # DAC: default conditioning per used table id (B.2.4.3)
        dac_body = bytearray()
        for ti in range(max(qsel) + 1):
            dac_body += bytes([0x00 | ti, 0x10])  # DC: L=0, U=1
            dac_body += bytes([0x10 | ti, 5])  # AC: Kx=5
        out += seg(0xCC, bytes(dac_body))

        from xetl_spark.operators.jpeg_arith import (
            ArithState,
            QMEncoder,
            encode_ac,
            encode_ac_first,
            encode_ac_refine,
            encode_dc,
            encode_dc_first,
            encode_dc_refine,
        )

        if progressive:
            # SOF10 scan script with real successive approximation
            # (T.81 Annex G.2), so every scan kind — DC first/refine,
            # AC first/refine — is exercised and the reconstructed
            # coefficients are bit-exact (DC: arithmetic-shift split;
            # AC: magnitude-split + correction bit):
            #   1. interleaved DC first   Ss=0 Se=0  Ah=0 Al=1
            #   2. interleaved DC refine  Ss=0 Se=0  Ah=1 Al=0
            #   3. per comp: AC first     Ss=1 Se=63 Ah=0 Al=1
            #   4. per comp: AC refine    Ss=1 Se=63 Ah=1 Al=0
            sos = bytes([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, (qsel[ci] << 4) | qsel[ci]])
            out += seg(0xDA, sos + bytes([0, 0, 0x01]))  # DC first, Al=1
            enc = QMEncoder()
            ast = ArithState(ncomp)
            for bi in range(bh * bw):
                for ci in range(ncomp):
                    encode_dc_first(
                        enc, ast, ci, qsel[ci], 0, 1,
                        int(zz_blocks[ci][bi, 0]), 1,
                    )
            out += enc.flush()
            out += seg(0xDA, sos + bytes([0, 0, 0x10]))  # DC refine, Ah=1
            enc = QMEncoder()
            ast = ArithState(ncomp)
            for bi in range(bh * bw):
                for ci in range(ncomp):
                    encode_dc_refine(enc, ast, int(zz_blocks[ci][bi, 0]), 0)
            out += enc.flush()
            for ci in range(ncomp):  # 4:4:4: comp grid == MCU grid
                csos = bytes([1, ci + 1, (qsel[ci] << 4) | qsel[ci]])
                out += seg(0xDA, csos + bytes([1, 63, 0x01]))  # AC first
                enc = QMEncoder()
                ast = ArithState(1)
                for bi in range(bh * bw):
                    encode_ac_first(
                        enc, ast, qsel[ci], 5, zz_blocks[ci][bi], 1, 63, 1
                    )
                out += enc.flush()
                out += seg(0xDA, csos + bytes([1, 63, 0x10]))  # AC refine
                enc = QMEncoder()
                ast = ArithState(1)
                for bi in range(bh * bw):
                    encode_ac_refine(
                        enc, ast, qsel[ci], zz_blocks[ci][bi], 1, 63, 0
                    )
                out += enc.flush()
            out += b"\xff\xd9"
            return bytes(out)

        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, (qsel[ci] << 4) | qsel[ci]])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)

        enc = QMEncoder()
        ast = ArithState(ncomp)
        rst = 0
        for bi in range(bh * bw):
            if restart_interval and bi and bi % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc = QMEncoder()
                ast = ArithState(ncomp)
            for ci in range(ncomp):
                zz = zz_blocks[ci][bi]
                encode_dc(enc, ast, ci, qsel[ci], 0, 1, int(zz[0]))
                encode_ac(enc, ast, qsel[ci], 5, zz)
        out += enc.flush()
        out += b"\xff\xd9"
        return bytes(out)
    if bits == 12:
        tables = [(0, 0, _DC_12BIT), (1, 0, _AC_12BIT)]
        if ncomp > 1:
            tables += [(0, 1, _DC_12BIT), (1, 1, _AC_12BIT)]
    else:
        tables = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
        if ncomp > 1:
            tables += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (counts, symbols) in tables:
        out += seg(0xC4, bytes([(tc << 4) | th]) + counts + symbols)

    if progressive:
        # scan 1: interleaved DC, full precision (Ss=Se=0, Ah=Al=0)
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, qsel[ci] << 4])
        sos += bytes([0, 0, 0])
        out += seg(0xDA, sos)
        wr = _BitWriter()
        pred = [0] * ncomp
        for bi in range(bh * bw):
            for ci in range(ncomp):
                dc = int(zz_blocks[ci][bi, 0])
                _encode_dc(wr, dc_codes[qsel[ci]], dc - pred[ci])
                pred[ci] = dc
        out += wr.flush()
        # scans 2..: one Ss=1..63 AC scan per component (non-interleaved;
        # 4:4:4 so the component grid equals the MCU grid)
        for ci in range(ncomp):
            out += seg(0xDA, bytes([1, ci + 1, qsel[ci]]) + bytes([1, 63, 0]))
            wr = _BitWriter()
            for bi in range(bh * bw):
                _encode_ac_band(wr, ac_codes[qsel[ci]], zz_blocks[ci][bi])
            out += wr.flush()
        out += b"\xff\xd9"
        return bytes(out)

    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (qsel[ci] << 4) | qsel[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    entropy = bytearray()
    wr = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for bi in range(bh * bw):
        if restart_interval and bi and bi % restart_interval == 0:
            entropy += wr.flush()
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            wr = _BitWriter()
            pred = [0] * ncomp
        for ci in range(ncomp):
            zz = zz_blocks[ci][bi]
            dc = int(zz[0])
            _encode_dc(wr, dc_codes[qsel[ci]], dc - pred[ci])
            pred[ci] = dc
            _encode_ac_band(wr, ac_codes[qsel[ci]], zz)
    entropy += wr.flush()
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------- lossless (SOF3, Annex H)


def _lossless_predict(samples, r, c, sel, default):
    """T.81 H.1.2: Ra=left, Rb=above, Rc=above-left; first line uses
    Ra-prediction, first column uses Rb, scan start uses the default
    2^(P-1-Pt)."""
    if r == 0:
        if c == 0:
            return default
        return int(samples[r, c - 1])  # first line: predictor 1
    if c == 0:
        return int(samples[r - 1, c])  # first column: predictor 2
    a = int(samples[r, c - 1])
    b = int(samples[r - 1, c])
    cc = int(samples[r - 1, c - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return cc
    if sel == 4:
        return a + b - cc
    if sel == 5:
        return a + ((b - cc) >> 1)
    if sel == 6:
        return b + ((a - cc) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise UnsupportedImageError(f"lossless predictor {sel} unsupported")


def _decode_lossless_samples(
    entropy: bytes,
    comps: list[int],
    h: int,
    w: int,
    tabsel: dict[int, int],
    sel: int,
    pt: int,
    huff: dict,
    dac_cond: dict[int, tuple[int, int]],
    arith: bool,
    *,
    differential: bool,
    prec: int,
) -> dict[int, np.ndarray]:
    """One lossless scan -> {cid: int32 plane}. Non-differential:
    reconstructed samples ``(pred + diff) & 0xFFFF`` with the T.81
    predictor ``sel`` (1..7). Differential (hierarchical SOF7/SOF15,
    T.81 H.2): the prediction is zero — planes hold the coded signed
    differences verbatim for the pyramid combiner to add modulo 2^16.
    Shared by _lossless_decode and _hierarchical_decode so the entropy
    layer (Huffman categories or the Annex H.1.2.2 QM model) cannot
    drift between the standalone and pyramid paths."""
    if differential:
        if sel != 0:
            raise UnsupportedImageError(
                "differential lossless scan must use predictor 0"
            )
    elif not 1 <= sel <= 7:
        raise UnsupportedImageError(f"lossless predictor {sel} unsupported")
    default = 1 << (prec - 1 - pt)
    planes = {cid: np.zeros((h, w), dtype=np.int32) for cid in comps}

    def combine(cid: int, r: int, c: int, diff: int) -> int:
        if differential:
            return diff
        pred = _lossless_predict(planes[cid], r, c, sel, default)
        return (pred + diff) & 0xFFFF

    if arith:
        from xetl_spark.operators.jpeg_arith import (
            LosslessState,
            QMDecoder,
            decode_lossless_diff,
        )

        dec = QMDecoder(entropy)
        states = LosslessState()
        # per-component difference planes: the Annex H conditioning
        # state (Da = left diff, Db = above diff; 0 outside the scan)
        dplanes = {cid: np.zeros((h, w), dtype=np.int32) for cid in comps}
        for r in range(h):
            for c in range(w):
                for cid in comps:  # interleaved: one sample per comp
                    tb = tabsel.get(cid, 0)
                    ll, ul = dac_cond.get(tb, (0, 1))
                    da = int(dplanes[cid][r, c - 1]) if c else 0
                    db = int(dplanes[cid][r - 1, c]) if r else 0
                    try:
                        diff = decode_lossless_diff(
                            dec, states.tbl(tb), da, db, ll, ul
                        )
                    except ValueError as exc:
                        raise UnsupportedImageError(str(exc)) from exc
                    dplanes[cid][r, c] = diff
                    planes[cid][r, c] = combine(cid, r, c, diff)
    else:
        br = _BitReader(entropy)
        tables = {}
        for cid in comps:
            t = huff.get((0, tabsel.get(cid, 0)))
            if t is None:
                raise UnsupportedImageError("lossless JPEG missing Huffman table")
            tables[cid] = t
        for r in range(h):
            for c in range(w):
                for cid in comps:  # interleaved: one sample per component
                    t = _decode_huff(br, tables[cid])
                    if t == 16:
                        diff = 32768
                    elif t > 16:
                        raise UnsupportedImageError("invalid lossless category")
                    else:
                        diff = _extend(br.receive(t), t) if t else 0
                    planes[cid][r, c] = combine(cid, r, c, diff)
    return planes


def _lossless_decode(payload: bytes) -> np.ndarray:
    """Decode a lossless JPEG (SOF3 Huffman or SOF11 arithmetic) to
    (H, W, C) uint8.

    Sample-domain predictive coding of prediction differences — no
    DCT, bit-exact by construction (self round-trip asserted in
    tests; no external lossless encoder exists in this container for
    a golden cross-check). SOF11 (round 11) runs the same predictor
    machinery with the T.81 Annex H.1.2.2 statistical model over the
    QM-coder: each difference is coded in a context conditioned on
    the 5x5 classification of the left (Da) and above (Db) neighbour
    differences (jpeg_arith.decode_lossless_diff); DAC carries the
    classification thresholds (L, U). Components are returned in scan
    order with no color transform (lossless JPEG stores components
    verbatim). Precision 2-8 decodes exactly; 9-16 bit samples are
    rounded to 8-bit (v·255/maxval), matching the PNG 16-bit
    contract. Restart markers and hierarchical mode raise typed
    errors.
    """
    pos = 2
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None
    scan_info = None
    arith = False
    dac_cond: dict[int, tuple[int, int]] = {}
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise UnsupportedImageError("truncated JPEG segment")
        if marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = seg[i + 1 : i + 17]
                nsym = sum(counts)
                huff[(tc, th)] = _Huff(counts, seg[i + 17 : i + 17 + nsym])
                i += 17 + nsym
        elif marker in (0xC3, 0xCB):  # SOF3 (Huffman) / SOF11 (arithmetic)
            arith = marker == 0xCB
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if not 2 <= prec <= 16:
                raise UnsupportedImageError(f"lossless precision {prec} invalid")
            comps = []
            for ci in range(ncomp):
                cid, samp, _tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11 and ncomp > 1:
                    raise UnsupportedImageError(
                        "subsampled lossless JPEG unsupported (1x1 only)"
                    )
                comps.append(cid)
            frame = (prec, h, w, comps)
        elif marker == 0xCC:  # DAC: conditioning (L, U) per table id
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0xF
                if tc == 0:
                    dac_cond[tb] = (seg[i + 1] & 0xF, seg[i + 1] >> 4)
                i += 2
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", seg[:2])
            if ri:
                raise UnsupportedImageError(
                    "lossless JPEG restart intervals unsupported"
                )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise UnsupportedImageError("JPEG SOS before SOF")
            ns = seg[0]
            tabsel = {
                seg[1 + 2 * c]: seg[2 + 2 * c] >> 4 for c in range(ns)
            }
            sel = seg[1 + 2 * ns]  # Ss = predictor selector
            pt = seg[3 + 2 * ns] & 0xF  # Al = point transform
            pos += seglen
            segments, pos = _entropy_segments(payload, pos)
            scan_info = (tabsel, sel, pt, b"".join(segments))
            break
        pos += seglen
    if frame is None or scan_info is None:
        raise UnsupportedImageError("lossless JPEG missing SOF3/SOS")
    prec, h, w, comps = frame
    tabsel, sel, pt, entropy = scan_info
    planes = _decode_lossless_samples(
        entropy, comps, h, w, tabsel, sel, pt, huff, dac_cond, arith,
        differential=False, prec=prec,
    )
    out = np.stack([planes[cid] for cid in comps], axis=2)
    out = (out << pt) & ((1 << prec) - 1)
    if prec <= 8:
        return out.astype(np.uint8)
    maxv = (1 << prec) - 1
    return ((out.astype(np.int64) * 255 + maxv // 2) // maxv).astype(np.uint8)


def jpeg_lossless_encode(
    arr: np.ndarray, predictor: int = 4, arithmetic: bool = False
) -> bytes:
    """Encode (H, W[, C]) uint8 as lossless JPEG (precision 8,
    components stored verbatim — no color transform), with the chosen
    T.81 predictor 1-7. Decode is bit-exact. ``arithmetic=True``
    (round 11) emits SOF11: the same prediction/difference pipeline
    with the T.81 Annex H.1.2.2 QM-coder statistical model — each
    difference coded in a context conditioned on the 5x5 category
    classification of the left (Da) and above (Db) neighbour
    differences, DAC carrying the (L, U) thresholds — typically
    10-30% smaller than the Huffman SOF3 stream."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if not 1 <= predictor <= 7:
        raise UnsupportedImageError(f"lossless predictor {predictor} unsupported")
    planes = [arr[:, :, ci].astype(np.int32) for ci in range(nch)]
    default = 128  # 2^(8-1)
    if arithmetic:
        from xetl_spark.operators.jpeg_arith import (
            LosslessState,
            QMEncoder,
            encode_lossless_diff,
        )

        enc = QMEncoder()
        states = LosslessState()
        dplanes = [np.zeros((h, w), dtype=np.int32) for _ in range(nch)]
        for r in range(h):
            for c in range(w):
                for ci, p in enumerate(planes):
                    pred = _lossless_predict(p, r, c, predictor, default)
                    diff = ((int(p[r, c]) - pred + 32768) & 0xFFFF) - 32768
                    da = int(dplanes[ci][r, c - 1]) if c else 0
                    db = int(dplanes[ci][r - 1, c]) if r else 0
                    encode_lossless_diff(
                        enc, states.tbl(0), da, db, 0, 1, diff
                    )
                    dplanes[ci][r, c] = diff
        entropy = enc.flush()
    else:
        codes = _build_codes(*_DC_LUMA)
        wr = _BitWriter()
        for r in range(h):
            for c in range(w):
                for p in planes:
                    pred = _lossless_predict(p, r, c, predictor, default)
                    diff = int(p[r, c]) - pred
                    # modulo-2^16 wrap into the 16-category window
                    diff = ((diff + 32768) & 0xFFFF) - 32768
                    if diff == 32768 or diff == -32768:
                        code, ln = codes.get(16, (None, None))
                        if code is None:
                            raise UnsupportedImageError(
                                "category-16 diff unsupported"
                            )
                        wr.put(code, ln)
                    else:
                        _encode_dc(wr, codes, diff)
        entropy = wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nch])
    for ci in range(nch):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xCB if arithmetic else 0xC3, sof)
    if arithmetic:
        out += seg(0xCC, bytes([0x00, 0x10]))  # table 0: L=0, U=1
    else:
        counts, symbols = _DC_LUMA
        out += seg(0xC4, bytes([0x00]) + counts + symbols)
    sos = bytes([nch])
    for ci in range(nch):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah/Al=0
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------ hierarchical (DHP, T.81 §16)


def _upsample2(p: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion: double a sample plane
    horizontally (eh) / vertically (ev). Even outputs copy the input;
    odd outputs are the rounded mean of the two neighbours, with the
    last sample replicated at the edge. Integer math on int32 planes."""
    if eh:
        h, w = p.shape
        out = np.empty((h, 2 * w), dtype=p.dtype)
        out[:, 0::2] = p
        nxt = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        out[:, 1::2] = (p + nxt + 1) >> 1
        p = out
    if ev:
        h, w = p.shape
        out = np.empty((2 * h, w), dtype=p.dtype)
        out[0::2, :] = p
        nxt = np.concatenate([p[1:, :], p[-1:, :]], axis=0)
        out[1::2, :] = (p + nxt + 1) >> 1
        p = out
    return p


def _hierarchical_decode(payload: bytes) -> np.ndarray:
    """Decode a hierarchical JPEG (T.81 §16 / Annex J): a DHP header
    followed by a pyramid of frames — one non-differential base frame
    at reduced resolution, then EXP reference expansions and
    differential frames (SOF5/SOF6) whose DCT residuals are added to
    the expanded reference. Tables persist across frames; differential
    frames skip the level shift. Arithmetic pyramids (round 11)
    decode too: SOF9/SOF10 base + SOF13/SOF14 differential frames
    (T.81 F.2.1.3.1: differential DC codes the value itself, PRED
    pinned to 0) with DAC conditioning; lossless frames (SOF3/7/11/15)
    inside a pyramid raise typed errors."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    full = None  # (prec, H, W) from DHP
    refs: dict[int, np.ndarray] = {}  # cid -> int32 sample plane
    restart_interval = 0
    frame = None
    prec = 8
    progressive = False
    differential = False
    arith = False
    dac: dict[tuple[int, int], object] = {}
    coefs: dict[int, np.ndarray] = {}
    geom: dict[int, tuple[int, int, int, int]] = {}
    last_comps = None  # final frame's comps, for chroma upsampling
    mode = None  # 'dct' | 'lossless' — T.81 §16 forbids mixing
    lossless_frame = None  # (prec, h, w, [cid, ...]) awaiting its SOS

    def finish_frame() -> None:
        nonlocal frame, coefs, geom, last_comps
        if frame is None:
            return
        h, w, comps = frame
        maxv = (1 << prec) - 1
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        for cid, hs, vs, tq in comps:
            q = qtables.get(tq)
            if q is None:
                raise UnsupportedImageError("JPEG missing quant table")
            zzc = coefs[cid]
            nby, nbx, _ = zzc.shape
            nat = np.zeros_like(zzc)
            nat[:, :, ZIGZAG] = zzc
            blocks = (nat.reshape(nby, nbx, 8, 8) * q[None, None]).reshape(-1, 8, 8)
            spatial = _idct_blocks(blocks.astype(np.float64))
            p = (
                spatial.reshape(nby, nbx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(nby * 8, nbx * 8)
            )
            cw = -(-w * hs // hmax)
            ch = -(-h * vs // vmax)
            p = np.round(p[:ch, :cw]).astype(np.int64)
            if differential:
                ref = refs.get(cid)
                if ref is None:
                    raise UnsupportedImageError(
                        "differential frame before a reference frame"
                    )
                if ref.shape[0] < ch or ref.shape[1] < cw:
                    raise UnsupportedImageError(
                        "differential frame larger than reference"
                    )
                p = ref[:ch, :cw].astype(np.int64) + p
            else:
                p = p + (1 << (prec - 1))
            refs[cid] = np.clip(p, 0, maxv).astype(np.int32)
        last_comps = comps
        frame = None
        coefs, geom = {}, {}

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
        if marker == 0xDE:  # DHP — full-resolution declaration
            p0, fh, fw = seg[0], *struct.unpack(">HH", seg[1:5])
            # DCT pyramids are 8/12-bit (checked at each SOF);
            # lossless pyramids allow the full 2..16 range
            if not 2 <= p0 <= 16:
                raise UnsupportedImageError(f"{p0}-bit JPEG unsupported")
            full = (p0, fh, fw)
        elif marker == 0xDF:  # EXP — expand reference components
            finish_frame()
            eh, ev = seg[0] >> 4, seg[0] & 0xF
            if eh > 1 or ev > 1:
                raise UnsupportedImageError("EXP expansion beyond 2x invalid")
            for cid in refs:
                refs[cid] = _upsample2(refs[cid], eh, ev)
        elif marker == 0xDB:
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:
            _parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC9, 0xCA, 0xCD, 0xCE):
            if mode == "lossless":
                raise UnsupportedImageError(
                    "mixed DCT/lossless frames in hierarchical stream"
                )
            mode = "dct"
            finish_frame()
            differential = marker in (0xC5, 0xC6, 0xCD, 0xCE)
            progressive = marker in (0xC2, 0xC6, 0xCA, 0xCE)
            arith = marker in (0xC9, 0xCA, 0xCD, 0xCE)
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec not in (8, 12):
                raise UnsupportedImageError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = samp >> 4, samp & 0xF
                # T.81 B.2.2: sampling factors are 1..4 — a zero (seen
                # in fuzzed streams) would divide the MCU geometry by 0
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise UnsupportedImageError(
                        f"invalid JPEG sampling factor {hs}x{vs}"
                    )
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, hs, vs, _tq in comps:
                coefs[cid] = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                cw = -(-w * hs // hmax)
                ch = -(-h * vs // vmax)
                geom[cid] = (-(-cw // 8), -(-ch // 8), hs, vs)
        elif marker in (0xC3, 0xC7, 0xCB, 0xCF):
            # lossless pyramid frames: SOF3/SOF11 base, SOF7/SOF15
            # differential (T.81 §16 + Annex H; spatial residuals,
            # bit-exact end to end)
            if mode == "dct":
                raise UnsupportedImageError(
                    "mixed DCT/lossless frames in hierarchical stream"
                )
            mode = "lossless"
            differential = marker in (0xC7, 0xCF)
            arith = marker in (0xCB, 0xCF)
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if not 2 <= prec <= 16:
                raise UnsupportedImageError(f"lossless precision {prec} invalid")
            cids = []
            for c in range(ncomp):
                cid, samp, _tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11 and ncomp > 1:
                    raise UnsupportedImageError(
                        "subsampled lossless JPEG unsupported (1x1 only)"
                    )
                cids.append(cid)
            lossless_frame = (prec, h, w, cids)
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0xF
                val = seg[i + 1]
                if tc == 0:
                    dac[(0, tb)] = (val & 0xF, val >> 4)  # (L, U)
                else:
                    dac[(1, tb)] = val  # Kx
                i += 2
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if lossless_frame is not None:
                lprec, lh, lw, cids = lossless_frame
                ns = seg[0]
                tabsel = {
                    seg[1 + 2 * c]: seg[2 + 2 * c] >> 4 for c in range(ns)
                }
                sel = seg[1 + 2 * ns]
                pt = seg[3 + 2 * ns] & 0xF
                pos += seglen
                segments, pos = _entropy_segments(payload, pos)
                planes = _decode_lossless_samples(
                    b"".join(segments), cids, lh, lw, tabsel, sel, pt,
                    huff, {tb: v for (tc, tb), v in dac.items() if tc == 0},
                    arith, differential=differential, prec=lprec,
                )
                lmax = (1 << lprec) - 1
                for cid in cids:
                    if differential:
                        ref = refs.get(cid)
                        if ref is None:
                            raise UnsupportedImageError(
                                "differential frame before a reference frame"
                            )
                        if ref.shape[0] < lh or ref.shape[1] < lw:
                            raise UnsupportedImageError(
                                "differential frame larger than reference"
                            )
                        # T.81 J.4: modulo-2^16 addition, no clipping
                        refs[cid] = (
                            (
                                ref[:lh, :lw].astype(np.int64)
                                + (planes[cid].astype(np.int64) << pt)
                            )
                            & 0xFFFF
                        ).astype(np.int32) & lmax
                    else:
                        refs[cid] = (
                            (planes[cid].astype(np.int64) << pt) & lmax
                        ).astype(np.int32)
                last_comps = [(cid, 1, 1, 0) for cid in cids]
                prec = lprec
                lossless_frame = None
                continue
            if frame is None:
                raise UnsupportedImageError("JPEG SOS before SOF")
            ns = seg[0]
            scan = [
                (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos += seglen
            segments, pos = _entropy_segments(payload, pos)
            if arith:
                _decode_sos_arith(
                    segments, scan, frame, coefs, geom, restart_interval,
                    dac, ss, se, ah, al, progressive,
                    differential=differential,
                )
            else:
                _decode_sos(
                    segments, scan, frame, huff, coefs, geom,
                    restart_interval, ss, se, ah, al, progressive,
                    differential=differential,
                )
            continue
        pos += seglen
    finish_frame()

    if full is None or not refs:
        raise UnsupportedImageError("hierarchical JPEG without DHP frame data")
    prec_out, fh, fw = full
    half = float(1 << (prec_out - 1))
    maxv = (1 << prec_out) - 1
    dtype = np.uint8 if prec_out == 8 else np.uint16
    comps = last_comps
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_comps = []
    for cid, hs, vs, _tq in comps:
        p = refs[cid].astype(np.float64)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_comps.append(p[:fh, :fw])
    if mode == "lossless":
        # lossless pyramids store components verbatim (no color
        # transform), matching _lossless_decode's contract
        out = np.stack(out_comps, axis=2).astype(np.int64)
        if prec_out <= 8:
            return np.clip(out, 0, maxv).astype(np.uint8)
        return ((np.clip(out, 0, maxv) * 255 + maxv // 2) // maxv).astype(
            np.uint8
        )
    if len(out_comps) == 1:
        return np.clip(out_comps[0], 0, maxv).astype(dtype)[:, :, None]
    if len(out_comps) != 3:
        raise UnsupportedImageError(f"{len(out_comps)}-component JPEG unsupported")
    y, cb, cr = out_comps
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, maxv).astype(dtype)


def jpeg_encode_hierarchical(
    arr: np.ndarray, levels: int = 2, quality: int = 85,
    arithmetic: bool = False, progressive: bool = False,
) -> bytes:
    """Encode (H, W[, C]) uint8 as a hierarchical JPEG pyramid:
    DHP + one non-differential base frame at 1/2^(levels-1) resolution
    + one EXP + differential frame per remaining level (4:4:4,
    8-bit, sequential). The encoder mirror-decodes each frame exactly
    as _hierarchical_decode does (dequant + IDCT + clip, J.1.1.2
    expansion), so residuals are coded against the decoder's true
    reference. Huffman (SOF0 base + SOF5 differential) uses the
    generic wide-category tables — differential DC diffs exceed the
    Annex K 8-bit table range. ``arithmetic=True`` (round 11) emits
    the QM-coded pyramid instead — SOF9 base + SOF13 differential
    frames with a DAC segment (T.81 F.2.1.3.1: differential DC codes
    the value itself, the running predictor pinned to 0; the
    diff-category conditioning still adapts). ``progressive=True``
    (arithmetic only) uses spectral-selection scan scripts per frame
    — one interleaved DC scan + one Ss=1..63 AC scan per component,
    Al=0 so coefficients are full-precision — producing SOF10 base +
    SOF14 differential frames, pixel-identical to the sequential
    pyramid by construction."""
    if progressive and not arithmetic:
        raise UnsupportedImageError(
            "hierarchical progressive encoding is arithmetic-only"
        )
    if levels < 1:
        raise UnsupportedImageError("hierarchical encode needs >= 1 level")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        qsel = [0]
    elif nch >= 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qsel = [0, 1, 1]
    else:
        raise UnsupportedImageError(f"cannot JPEG-encode {nch}-channel image")
    ncomp = len(planes)
    qt = [_quality_scale(_Q_LUMA, quality), _quality_scale(_Q_CHROMA, quality)]
    dc_codes = _build_codes(*_DC_12BIT)
    ac_codes = _build_codes(*_AC_12BIT)

    # image pyramid: level 0 = full res .. level L-1 = smallest
    def down2(p: np.ndarray) -> np.ndarray:
        ph, pw = p.shape
        pp = np.pad(p, ((0, ph % 2), (0, pw % 2)), mode="edge")
        return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0

    pyramid = [planes]
    for _ in range(levels - 1):
        pyramid.append([down2(p) for p in pyramid[-1]])

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def encode_frame(
        targets: list[np.ndarray], sof_marker: int, level_shift: bool
    ) -> tuple[bytes, list[np.ndarray]]:
        """One 4:4:4 sequential frame over per-component sample planes.
        Returns (frame bytes: SOF+SOS+entropy, mirror-decoded planes)."""
        fh, fw = targets[0].shape
        sof = bytes([8]) + struct.pack(">HH", fh, fw) + bytes([ncomp])
        for ci in range(ncomp):
            sof += bytes([ci + 1, 0x11, qsel[ci]])
        out = bytearray(seg(sof_marker, sof))
        bh, bw = -(-fh // 8), -(-fw // 8)
        zz_blocks = []
        recon = []
        for ci, tgt in enumerate(targets):
            padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
            padded[:fh, :fw] = tgt - (128.0 if level_shift else 0.0)
            padded[fh:, :fw] = padded[fh - 1 : fh, :fw]
            padded[:fh, fw:] = padded[:fh, fw - 1 : fw]
            padded[fh:, fw:] = padded[fh - 1, fw - 1]
            blocks = (
                padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            )
            coefs = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)
            qz = np.round(coefs / qt[qsel[ci]]).astype(np.int64)
            zz_blocks.append(qz.reshape(-1, 64)[:, ZIGZAG])
            # mirror decode: dequant + IDCT (+shift), int-rounded
            spatial = _idct_blocks(qz * qt[qsel[ci]]) + (
                128.0 if level_shift else 0.0
            )
            p = (
                spatial.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8)[:fh, :fw]
            )
            recon.append(np.round(p).astype(np.int64))
        # interleaved SOS header: arithmetic selectors pick the DAC
        # conditioning AND statistics area, so they must match
        # encode_dc/encode_ac's table (qsel); Huffman uses the shared
        # wide-category tables at 0
        sos = bytes([ncomp])
        for ci in range(ncomp):
            tsel = (qsel[ci] << 4) | qsel[ci] if arithmetic else 0x00
            sos += bytes([ci + 1, tsel])
        if arithmetic:
            from xetl_spark.operators.jpeg_arith import (
                ArithState,
                QMEncoder,
                encode_ac,
                encode_ac_first,
                encode_dc,
                encode_dc_first,
            )

            if progressive:
                # spectral-selection script (Al=0, full precision):
                # interleaved DC scan, then one AC scan per component
                out += seg(0xDA, sos + bytes([0, 0, 0]))
                enc = QMEncoder()
                ast = ArithState(ncomp)
                for bi in range(bh * bw):
                    for ci in range(ncomp):
                        if not level_shift:  # differential: PRED = 0
                            ast.last_dc[ci] = 0
                        encode_dc_first(
                            enc, ast, ci, qsel[ci], 0, 1,
                            int(zz_blocks[ci][bi][0]), 0,
                        )
                out += enc.flush()
                for ci in range(ncomp):  # 4:4:4: comp grid == MCU grid
                    csos = bytes([1, ci + 1, (qsel[ci] << 4) | qsel[ci]])
                    out += seg(0xDA, csos + bytes([1, 63, 0]))
                    enc = QMEncoder()
                    ast = ArithState(1)
                    for bi in range(bh * bw):
                        encode_ac_first(
                            enc, ast, qsel[ci], 5, zz_blocks[ci][bi],
                            1, 63, 0,
                        )
                    out += enc.flush()
                return bytes(out), recon
            out += seg(0xDA, sos + bytes([0, 63, 0]))
            enc = QMEncoder()
            ast = ArithState(ncomp)
            for bi in range(bh * bw):
                for ci in range(ncomp):
                    zz = zz_blocks[ci][bi]
                    if not level_shift:  # differential: PRED = 0
                        ast.last_dc[ci] = 0
                    encode_dc(enc, ast, ci, qsel[ci], 0, 1, int(zz[0]))
                    encode_ac(enc, ast, qsel[ci], 5, zz)
            out += enc.flush()
            return bytes(out), recon
        out += seg(0xDA, sos + bytes([0, 63, 0]))
        wr = _BitWriter()
        pred = [0] * ncomp
        for bi in range(bh * bw):
            for ci in range(ncomp):
                zz = zz_blocks[ci][bi]
                dc = int(zz[0])
                if level_shift:  # non-differential: predictive DC
                    _encode_dc(wr, dc_codes, dc - pred[ci])
                    pred[ci] = dc
                else:  # differential frame: PRED = 0 (T.81 F.2.1.3.1)
                    _encode_dc(wr, dc_codes, dc)
                _encode_ac_band(wr, ac_codes, zz)
        out += wr.flush()
        return bytes(out), recon

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qt[: max(qsel) + 1]):
        out += seg(0xDB, bytes([ti]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if arithmetic:
        dac_body = bytearray()
        for ti in range(max(qsel) + 1):
            dac_body += bytes([0x00 | ti, 0x10])  # DC: L=0, U=1
            dac_body += bytes([0x10 | ti, 5])  # AC: Kx=5
        out += seg(0xCC, bytes(dac_body))
    else:
        tables = [(0, 0, _DC_12BIT), (1, 0, _AC_12BIT)]
        if ncomp > 1:
            tables += [(0, 1, _DC_12BIT), (1, 1, _AC_12BIT)]
        for tc, th, (counts, symbols) in tables:
            out += seg(0xC4, bytes([(tc << 4) | th]) + counts + symbols)
    dhp = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        dhp += bytes([ci + 1, 0x11, qsel[ci]])
    out += seg(0xDE, dhp)

    if arithmetic:
        base_sof, diff_sof = (0xCA, 0xCE) if progressive else (0xC9, 0xCD)
    else:
        base_sof, diff_sof = 0xC0, 0xC5
    # base frame: smallest pyramid level, non-differential
    frame_bytes, refs = encode_frame(pyramid[-1], base_sof, level_shift=True)
    refs = [np.clip(p, 0, 255) for p in refs]
    out += frame_bytes
    # refinement frames: EXP + differential residual per level
    for lvl in range(levels - 2, -1, -1):
        out += seg(0xDF, bytes([0x11]))  # expand 2x both directions
        targets = pyramid[lvl]
        th_, tw_ = targets[0].shape
        refs = [_upsample2(p.astype(np.int32), 1, 1)[:th_, :tw_] for p in refs]
        residuals = [t - r for t, r in zip(targets, refs)]
        frame_bytes, rec = encode_frame(residuals, diff_sof, level_shift=False)
        out += frame_bytes
        refs = [np.clip(r + d, 0, 255) for r, d in zip(refs, rec)]
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_hierarchical_lossless(
    arr: np.ndarray, levels: int = 2, predictor: int = 4,
    arithmetic: bool = False,
) -> bytes:
    """Encode (H, W[, C]) uint8 as a LOSSLESS hierarchical JPEG
    pyramid (T.81 §16 + Annex H — the last T.81 frame family):
    DHP + one non-differential lossless base frame (SOF3 Huffman /
    SOF11 arithmetic) at 1/2^(levels-1) resolution + one EXP +
    differential lossless frame (SOF7/SOF15) per remaining level.
    Components are stored verbatim (no color transform). Differential
    frames code ``source - J.1.1.2-expanded reference`` with the
    prediction pinned to zero (scan Ss=0, T.81 H.2), added back
    modulo 2^16 on decode — so the pyramid reconstructs BIT-EXACT
    pixels at every level, unlike the DCT pyramid's residual
    approximation."""
    if levels < 1:
        raise UnsupportedImageError("hierarchical encode needs >= 1 level")
    if not 1 <= predictor <= 7:
        raise UnsupportedImageError(f"lossless predictor {predictor} unsupported")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    planes = [arr[:, :, ci].astype(np.int64) for ci in range(nch)]

    def down2(p: np.ndarray) -> np.ndarray:
        ph, pw = p.shape
        pp = np.pad(p, ((0, ph % 2), (0, pw % 2)), mode="edge")
        return (
            pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2] + 2
        ) >> 2

    pyramid = [planes]
    for _ in range(levels - 1):
        pyramid.append([down2(p) for p in pyramid[-1]])

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def encode_frame(
        targets: list[np.ndarray], differential: bool
    ) -> bytes:
        """One lossless frame: SOF + SOS + entropy. ``targets`` are
        sample planes (base) or signed residual planes (differential,
        coded with prediction 0)."""
        fh, fw = targets[0].shape
        if differential:
            sof_marker = 0xCF if arithmetic else 0xC7
            sel = 0
        else:
            sof_marker = 0xCB if arithmetic else 0xC3
            sel = predictor
        sof = bytes([8]) + struct.pack(">HH", fh, fw) + bytes([nch])
        for ci in range(nch):
            sof += bytes([ci + 1, 0x11, 0])
        out = bytearray(seg(sof_marker, sof))
        sos = bytes([nch])
        for ci in range(nch):
            sos += bytes([ci + 1, 0x00])
        sos += bytes([sel, 0, 0])  # Ss=predictor (0 for differential)
        out += seg(0xDA, sos)

        def diff_at(p: np.ndarray, r: int, c: int) -> int:
            if differential:
                return int(p[r, c])
            pred = _lossless_predict(p, r, c, sel, 128)
            return ((int(p[r, c]) - pred + 32768) & 0xFFFF) - 32768

        if arithmetic:
            from xetl_spark.operators.jpeg_arith import (
                LosslessState,
                QMEncoder,
                encode_lossless_diff,
            )

            enc = QMEncoder()
            states = LosslessState()
            dplanes = [np.zeros((fh, fw), dtype=np.int32) for _ in range(nch)]
            for r in range(fh):
                for c in range(fw):
                    for ci, p in enumerate(targets):
                        d = diff_at(p, r, c)
                        da = int(dplanes[ci][r, c - 1]) if c else 0
                        db = int(dplanes[ci][r - 1, c]) if r else 0
                        encode_lossless_diff(
                            enc, states.tbl(0), da, db, 0, 1, d
                        )
                        dplanes[ci][r, c] = d
            out += enc.flush()
        else:
            codes = _build_codes(*_DC_LUMA)
            wr = _BitWriter()
            for r in range(fh):
                for c in range(fw):
                    for p in targets:
                        _encode_dc(wr, codes, diff_at(p, r, c))
            out += wr.flush()
        return bytes(out)

    out = bytearray(b"\xff\xd8")
    if arithmetic:
        out += seg(0xCC, bytes([0x00, 0x10]))  # table 0: L=0, U=1
    else:
        counts, symbols = _DC_LUMA
        out += seg(0xC4, bytes([0x00]) + counts + symbols)
    dhp = bytes([8]) + struct.pack(">HH", h, w) + bytes([nch])
    for ci in range(nch):
        dhp += bytes([ci + 1, 0x11, 0])
    out += seg(0xDE, dhp)

    # base frame at the smallest level — lossless, so the decoder's
    # reference IS the level plane (no mirror decode needed)
    out += encode_frame(pyramid[-1], differential=False)
    refs = [p.copy() for p in pyramid[-1]]
    for lvl in range(levels - 2, -1, -1):
        out += seg(0xDF, bytes([0x11]))  # expand 2x both directions
        targets = pyramid[lvl]
        th_, tw_ = targets[0].shape
        refs = [
            _upsample2(p.astype(np.int32), 1, 1)[:th_, :tw_].astype(np.int64)
            for p in refs
        ]
        residuals = [t - r for t, r in zip(targets, refs)]
        out += encode_frame(residuals, differential=True)
        refs = targets  # modulo-2^16 addition reconstructs exactly
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_quality_estimate(payload: bytes) -> tuple[int, bool]:
    """Estimate the libjpeg quality setting (1-100) from the stream's
    luma quantization table -> (quality, exact).

    Inverts ``_quality_scale``: the DQT luma table is compared against
    the Annex-K standard table scaled at every quality; an exact match
    (how libjpeg-family encoders write tables) returns (q, True),
    otherwise the minimum-L1 quality returns (q, False) — custom or
    optimized tables still land on the perceptually nearest setting.
    Higher quality wins ties (scaling is flat near the extremes).
    This is the curation-grade compression-quality signal for JPEG
    corpora, the analogue of VP8/VP9's quantizer index — O(header
    bytes), no entropy decode."""
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedImageError("jpeg: no SOI")
    qtables: dict[int, np.ndarray] = {}
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: tables are all declared
            break
        ln = int.from_bytes(payload[i + 2 : i + 4], "big")
        if marker == 0xDB:
            _parse_dqt(payload[i + 4 : i + 2 + ln], qtables)
        i += 2 + ln
    if 0 not in qtables:
        raise UnsupportedImageError("jpeg: no luma quantization table")
    luma = qtables[0].reshape(-1).astype(np.int64)
    ref = _Q_LUMA.reshape(-1).astype(np.int64)
    # 12-bit streams scale the whole table 4x (this encoder's
    # convention); normalize by the best small power-of-two factor
    best_q, best_err = 100, None
    for q in range(100, 0, -1):
        scaled = _quality_scale(ref, q)
        err = int(np.abs(scaled - luma).sum())
        if err == 0:
            return q, True
        if best_err is None or err < best_err:
            best_q, best_err = q, err
    return best_q, False
