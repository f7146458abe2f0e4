"""T.81 Annex D/F arithmetic entropy coding for JPEG (the QM-coder):
the decoder + encoder pair behind SOF9 (extended sequential,
arithmetic, 8/12-bit) support in operators/jpeg.py.

Reference behavior: ITU-T T.81 Annex D (arithmetic coding procedures:
INITENC/CODE/BYTEOUT/FLUSH, INITDEC/DECODE/BYTEIN/RENORMD), Annex F
(sequential DCT conditioning: Tables F.4/F.5 context layouts, Figures
F.5-F.9 encode and F.18-F.24 decode flows), with the statistics-area
layout and procedure structure as popularized by the public libjpeg
implementation (jcarith.c/jdarith.c): 49 DC contexts per conditioning
table (4 zero/sign/magnitude contexts x 5 diff categories + X1..X15
chain at 20 + M bits at +14), 245 AC contexts (3 per k for
EOB/zero/X1, two X2+ areas at 189/217 selected by Kx), one fixed
non-adapting ~0.5 state for AC signs.

Interval geometry (the jcarith/jdarith formulation): the MPS
subinterval sits at the BOTTOM [0, A-Qe) of the current interval and
the LPS at the top, with the standard QM conditional exchange when
A-Qe < Qe. Byte discipline is the same marker-safe FF00 byte
stuffing Huffman scans use (T.81 §B.1.1.5 applies to both entropy
coders), so the existing _entropy_segments destuffer feeds both;
encoder carries resolve through the pending-byte / stacked-0xFF /
deferred-zero bookkeeping before any byte is committed.

Conformance note, stated honestly: the probability-estimation state
table below is the public T.81 Table D.3 / jaricom.c machine
transcribed from reference material. The encoder and decoder share
it, and round-trip tests (tests/test_jpeg.py) pin bit-exact
reconstruction of every quantized coefficient; cross-implementation
streams additionally depend on every table row matching the spec
verbatim, which the structural tests below can only partially verify
— treat third-party arithmetic streams as best-effort and rely on
the typed-error triage if a stream fails to parse.

The reference engine (sebmartin/xETL) contains no codecs at all —
this module exists because record-level decode belongs IN the engine
at 100 TB (xetl/models/task.py delegates all payload work to user
subprocesses).
"""

from __future__ import annotations

# (Qe, NMPS, NLPS, SWITCH) — T.81 Table D.3 probability estimation
# state machine; index 113 is the non-adapting "fixed" ~0.5 state used
# for AC sign decisions.
QM_TABLE: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed ~0.5, never adapts
)

FIXED_STATE = 113

# statistics-area sizes per conditioning table (T.81 Tables F.4/F.5)
DC_STAT_BINS = 64  # 49 used
AC_STAT_BINS = 256  # 245 used


class QMDecoder:
    """T.81 Annex F arithmetic decoder over ONE entropy-coded segment
    whose bytes are already FF00-destuffed (operators/jpeg.py's
    _entropy_segments — arithmetic scans use the same marker-safe
    byte stuffing as Huffman scans). Past the end of data the decoder
    feeds zero bytes, the T.81 convention once a marker is reached.

    Registers follow the public jdarith.c formulation: A is the
    current interval width (renormalized lazily at the START of each
    decision so callers never renorm), C accumulates code bytes
    low-aligned with CT tracking how many fetched bits sit below the
    comparison window, so the boundary compare is ``c < (a-qe)<<ct``.
    Interval geometry: MPS at the bottom [0, a-qe), LPS at the top,
    with the standard conditional exchange when a-qe < qe.
    """

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._n = len(data)
        self._bp = 0
        b0 = self._fetch()
        b1 = self._fetch()
        self._c = (b0 << 8) | b1
        self._ct = 0
        self._a = 0x10000

    def _fetch(self) -> int:
        if self._bp >= self._n:
            return 0  # zero data past the end / at the trailing marker
        b = self._d[self._bp]
        self._bp += 1
        return b

    def decode(self, stats: bytearray, idx: int) -> int:
        # lazy renormalization + data feed (jdarith.c structure)
        a = self._a
        while a < 0x8000:
            self._ct -= 1
            if self._ct < 0:
                self._c = ((self._c << 8) | self._fetch()) & 0xFFFFFFFF
                self._ct += 8
            a <<= 1
        sv = stats[idx]
        qe, nmps, nlps, switch = QM_TABLE[sv & 0x7F]
        mps = sv >> 7
        a -= qe
        temp = a << self._ct
        if self._c < temp:
            # bottom subinterval: nominal MPS. Probability estimation
            # happens ONLY on renormalization (T.81 D.1.5) — a
            # non-renormalizing MPS must leave the state untouched or
            # decoder statistics diverge from the encoder's.
            if a >= 0x8000:
                d = mps
            elif a < qe:
                d = 1 - mps
                if switch:
                    mps = 1 - mps
                stats[idx] = (mps << 7) | nlps
            else:
                d = mps
                stats[idx] = (mps << 7) | nmps
        else:
            self._c -= temp
            if a < qe:
                d = mps
                stats[idx] = (mps << 7) | nmps
            else:
                d = 1 - mps
                if switch:
                    mps = 1 - mps
                stats[idx] = (mps << 7) | nlps
            a = qe
        self._a = a
        return d


class QMEncoder:
    """T.81 Annex D arithmetic encoder producing one FF00-byte-stuffed
    entropy segment — the public jcarith.c formulation: pending-byte +
    stacked-0xFF + deferred-zero bookkeeping so a carry can always be
    resolved before any stuffing decision is committed (the
    Pennebaker–Mitchell spacer-bit invariant guarantees the
    post-carry byte is never 0xFF)."""

    def __init__(self) -> None:
        self._a = 0x10000
        self._c = 0
        self._ct = 11
        self._buffer = -1  # pending byte; -1 = nothing emitted yet
        self._sc = 0  # stacked 0xFF bytes (may still take a carry)
        self._zc = 0  # deferred 0x00 bytes (dropped if trailing)
        self._out = bytearray()

    def encode(self, stats: bytearray, idx: int, val: int) -> None:
        sv = stats[idx]
        qe, nmps, nlps, switch = QM_TABLE[sv & 0x7F]
        mps = sv >> 7
        self._a -= qe
        if val != mps:
            # LPS: top subinterval [a, a+qe) unless exchanged
            if self._a >= qe:
                self._c += self._a
                self._a = qe
            if switch:
                mps = 1 - mps
            stats[idx] = (mps << 7) | nlps
        else:
            # MPS: bottom subinterval [0, a) unless exchanged
            if self._a >= 0x8000:
                return
            if self._a < qe:
                self._c += self._a
                self._a = qe
            stats[idx] = (mps << 7) | nmps
        # renormalization & byte output (D.1.6)
        while True:
            self._a <<= 1
            self._c <<= 1
            self._ct -= 1
            if self._ct == 0:
                self._byteout()
                self._ct = 8
            if self._a >= 0x8000:
                break

    def _byteout(self) -> None:
        temp = self._c >> 19
        if temp > 0xFF:
            # carry: resolve into the pending byte before committing
            if self._buffer >= 0:
                self._out.extend(b"\x00" * self._zc)
                self._zc = 0
                b = self._buffer + 1
                self._out.append(b)
                if b == 0xFF:
                    self._out.append(0x00)
            self._zc += self._sc  # stacked 0xFFs roll over to 0x00s
            self._sc = 0
            self._buffer = temp & 0xFF  # P&M: cannot be 0xFF here
        elif temp == 0xFF:
            self._sc += 1  # stack: may still receive a carry
        else:
            # no further carry can reach buffer/stack: commit them
            if self._buffer == 0:
                self._zc += 1
            elif self._buffer >= 0:
                self._out.extend(b"\x00" * self._zc)
                self._zc = 0
                self._out.append(self._buffer)
            if self._sc:
                self._out.extend(b"\x00" * self._zc)
                self._zc = 0
                self._out.extend(b"\xff\x00" * self._sc)
                self._sc = 0
            self._buffer = temp
        self._c &= 0x7FFFF

    def flush(self) -> bytes:
        """D.1.8: choose the in-interval code point with the most
        trailing zeros, push out the remaining bytes, drop trailing
        zeros (the decoder feeds zeros past the end anyway)."""
        temp = (self._a - 1 + self._c) & 0xFFFF0000
        self._c = temp + 0x8000 if temp < self._c else temp
        self._c <<= self._ct
        if self._c & 0xF8000000:
            # one final carry
            if self._buffer >= 0:
                self._out.extend(b"\x00" * self._zc)
                self._zc = 0
                b = self._buffer + 1
                self._out.append(b)
                if b == 0xFF:
                    self._out.append(0x00)
            self._zc += self._sc
            self._sc = 0
        else:
            if self._buffer == 0:
                self._zc += 1
            elif self._buffer >= 0:
                self._out.extend(b"\x00" * self._zc)
                self._zc = 0
                self._out.append(self._buffer)
            if self._sc:
                self._out.extend(b"\x00" * self._zc)
                self._zc = 0
                self._out.extend(b"\xff\x00" * self._sc)
                self._sc = 0
        if self._c & 0x7FFF800:
            self._out.extend(b"\x00" * self._zc)
            self._zc = 0
            b = (self._c >> 19) & 0xFF
            self._out.append(b)
            if b == 0xFF:
                self._out.append(0x00)
            if self._c & 0x7F800:
                b = (self._c >> 11) & 0xFF
                self._out.append(b)
                if b == 0xFF:
                    self._out.append(0x00)
        out = bytes(self._out)
        self._out = bytearray()
        self._buffer = -1
        return out


# ---------------------------------------------------------------- block codecs


class ArithState:
    """Per-scan statistics areas + predictors (reset at restarts)."""

    def __init__(self, ncomp: int) -> None:
        self.dc_stats: dict[int, bytearray] = {}
        self.ac_stats: dict[int, bytearray] = {}
        self.fixed = bytearray([FIXED_STATE])
        self.last_dc = [0] * ncomp
        self.dc_context = [0] * ncomp

    def dc(self, tbl: int) -> bytearray:
        if tbl not in self.dc_stats:
            self.dc_stats[tbl] = bytearray(DC_STAT_BINS)
        return self.dc_stats[tbl]

    def ac(self, tbl: int) -> bytearray:
        if tbl not in self.ac_stats:
            self.ac_stats[tbl] = bytearray(AC_STAT_BINS)
        return self.ac_stats[tbl]


def decode_dc(dec: QMDecoder, state: ArithState, ci: int, tbl: int,
              dc_l: int, dc_u: int) -> int:
    """T.81 F.2.4.1: decode one DC difference, update the conditioning
    category for the next block; returns the new DC value."""
    st = state.dc(tbl)
    s0 = state.dc_context[ci]
    if dec.decode(st, s0) == 0:
        state.dc_context[ci] = 0
        return state.last_dc[ci]
    sign = dec.decode(st, s0 + 1)
    base = s0 + 2 + sign  # SP / SN
    m = dec.decode(st, base)
    if m != 0:
        # magnitude category chain: X1 at 20 (Table F.4); the chain
        # position where the terminating 0 lands is the M-bit base
        base = 20
        while dec.decode(st, base):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            base += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << dc_l) >> 1:
        state.dc_context[ci] = 0
    elif m > (1 << dc_u) >> 1:
        state.dc_context[ci] = 12 + sign * 4
    else:
        state.dc_context[ci] = 4 + sign * 4
    v = m
    mb = base + 14
    mm = m
    while mm := mm >> 1:
        if dec.decode(st, mb):
            v |= mm
    v += 1
    if sign:
        v = -v
    state.last_dc[ci] += v
    return state.last_dc[ci]


def encode_dc(enc: QMEncoder, state: ArithState, ci: int, tbl: int,
              dc_l: int, dc_u: int, dc: int) -> None:
    """Mirror of decode_dc (T.81 Figures F.4-F.9)."""
    st = state.dc(tbl)
    s0 = state.dc_context[ci]
    v = dc - state.last_dc[ci]
    state.last_dc[ci] = dc
    if v == 0:
        enc.encode(st, s0, 0)
        state.dc_context[ci] = 0
        return
    enc.encode(st, s0, 1)
    if v > 0:
        sign = 0
    else:
        sign = 1
        v = -v
    enc.encode(st, s0 + 1, sign)
    sp = s0 + 2 + sign
    m = 0
    v -= 1
    base = sp
    if v:
        enc.encode(st, sp, 1)
        m = 1
        x = 20
        v2 = v
        while v2 := v2 >> 1:
            enc.encode(st, x, 1)
            m <<= 1
            x += 1
        enc.encode(st, x, 0)
        base = x
    else:
        enc.encode(st, sp, 0)
    if m < (1 << dc_l) >> 1:
        state.dc_context[ci] = 0
    elif m > (1 << dc_u) >> 1:
        state.dc_context[ci] = 12 + sign * 4
    else:
        state.dc_context[ci] = 4 + sign * 4
    mb = base + 14
    mm = m
    while mm := mm >> 1:
        enc.encode(st, mb, 1 if (v & mm) else 0)


def decode_ac(dec: QMDecoder, state: ArithState, tbl: int, kx: int,
              zz) -> None:
    """T.81 F.2.4.2 (via the jdarith.c structure): decode AC
    coefficients 1..63 into the zigzag array ``zz``."""
    st = state.ac(tbl)
    k = 1
    while k <= 63:
        se = 3 * (k - 1)
        if dec.decode(st, se):
            return  # EOB
        while dec.decode(st, se + 1) == 0:
            se += 3
            k += 1
            if k > 63:
                raise ValueError("arithmetic AC run overflow")
        sign = dec.decode(state.fixed, 0)
        sp = se + 2
        m = dec.decode(st, sp)
        base = sp
        if m != 0:
            if dec.decode(st, sp):
                m <<= 1
                x = 189 if k <= kx else 217
                while dec.decode(st, x):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    x += 1
                base = x
        v = m
        mb = base + 14
        mm = m
        while mm := mm >> 1:
            if dec.decode(st, mb):
                v |= mm
        v += 1
        zz[k] = -v if sign else v
        k += 1


def encode_ac(enc: QMEncoder, state: ArithState, tbl: int, kx: int,
              zz) -> None:
    """Mirror of decode_ac (T.81 Figure F.5)."""
    st = state.ac(tbl)
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        se = 3 * (k - 1)
        enc.encode(st, se, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(st, se + 1, 0)
            se += 3
            k += 1
        enc.encode(st, se + 1, 1)
        v = int(zz[k])
        if v > 0:
            sign = 0
        else:
            sign = 1
            v = -v
        enc.encode(state.fixed, 0, sign)
        sp = se + 2
        m = 0
        v -= 1
        base = sp
        if v:
            enc.encode(st, sp, 1)
            m = 1
            v2 = v
            if v2 := v2 >> 1:
                enc.encode(st, sp, 1)
                m <<= 1
                x = 189 if k <= kx else 217
                while v2 := v2 >> 1:
                    enc.encode(st, x, 1)
                    m <<= 1
                    x += 1
                enc.encode(st, x, 0)
                base = x
            else:
                enc.encode(st, sp, 0)
                base = sp
        else:
            enc.encode(st, sp, 0)
        mb = base + 14
        mm = m
        while mm := mm >> 1:
            enc.encode(st, mb, 1 if (v & mm) else 0)
        k += 1
    if ke < 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# ------------------------------------------------ progressive (Annex G.2)
#
# The four successive-approximation scan kinds of SOF10, with the
# jdarith.c/jcarith.c procedure structure over the same statistics
# areas as the sequential flows above. Point transform: DC uses an
# arithmetic right shift by Al (T.81 G.1.2.1); AC divides toward zero
# (abs-then-shift, G.1.2.2). Coefficient arrays are in ZIGZAG index
# space (position k indexes zz directly), matching operators/jpeg.py.


def decode_dc_first(dec: QMDecoder, state: ArithState, ci: int, tbl: int,
                    dc_l: int, dc_u: int, al: int) -> int:
    """G.2: DC first scan (Ss=0, Ah=0) — the sequential DC-difference
    flow in the point-transformed domain; returns the value for
    zz[0] (last_dc << Al)."""
    return decode_dc(dec, state, ci, tbl, dc_l, dc_u) << al


def encode_dc_first(enc: QMEncoder, state: ArithState, ci: int, tbl: int,
                    dc_l: int, dc_u: int, dc: int, al: int) -> None:
    """Mirror of decode_dc_first: arithmetic right shift (rounds
    toward -inf — Python's >> on ints) then the sequential diff flow."""
    encode_dc(enc, state, ci, tbl, dc_l, dc_u, dc >> al)


def decode_dc_refine(dec: QMDecoder, state: ArithState) -> int:
    """G.2: DC refinement (Ss=0, Ah>0) — one fixed-estimate decision
    per block; caller ORs (bit << Al) into zz[0]."""
    return dec.decode(state.fixed, 0)


def encode_dc_refine(enc: QMEncoder, state: ArithState, dc: int,
                     al: int) -> None:
    """Mirror of decode_dc_refine: emit the Al-th bit of zz[0]."""
    enc.encode(state.fixed, 0, (dc >> al) & 1)


def decode_ac_first(dec: QMDecoder, state: ArithState, tbl: int, kx: int,
                    zz, ss: int, se_idx: int, al: int) -> None:
    """G.2: AC first scan (Ss..Se, Ah=0) — the sequential AC flow
    restricted to the band, decoded values stored at scale 2^Al."""
    st = state.ac(tbl)
    k = ss
    while k <= se_idx:
        se = 3 * (k - 1)
        if dec.decode(st, se):
            return  # EOB
        while dec.decode(st, se + 1) == 0:
            se += 3
            k += 1
            if k > se_idx:
                raise ValueError("arithmetic AC run overflow")
        sign = dec.decode(state.fixed, 0)
        sp = se + 2
        m = dec.decode(st, sp)
        base = sp
        if m != 0:
            if dec.decode(st, sp):
                m <<= 1
                x = 189 if k <= kx else 217
                while dec.decode(st, x):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    x += 1
                base = x
        v = m
        mb = base + 14
        mm = m
        while mm := mm >> 1:
            if dec.decode(st, mb):
                v |= mm
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def encode_ac_first(enc: QMEncoder, state: ArithState, tbl: int, kx: int,
                    zz, ss: int, se_idx: int, al: int) -> None:
    """Mirror of decode_ac_first (T.81 Figure G.4). The band's EOB
    index is established in the point-transformed domain."""
    st = state.ac(tbl)
    ke = se_idx
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        se = 3 * (k - 1)
        enc.encode(st, se, 0)  # not EOB
        while (abs(int(zz[k])) >> al) == 0:
            enc.encode(st, se + 1, 0)
            se += 3
            k += 1
        enc.encode(st, se + 1, 1)
        v = int(zz[k])
        if v >= 0:
            sign = 0
            v >>= al
        else:
            sign = 1
            v = (-v) >> al
        enc.encode(state.fixed, 0, sign)
        sp = se + 2
        m = 0
        v -= 1
        base = sp
        if v:
            enc.encode(st, sp, 1)
            m = 1
            v2 = v
            if v2 := v2 >> 1:
                enc.encode(st, sp, 1)
                m <<= 1
                x = 189 if k <= kx else 217
                while v2 := v2 >> 1:
                    enc.encode(st, x, 1)
                    m <<= 1
                    x += 1
                enc.encode(st, x, 0)
                base = x
            else:
                enc.encode(st, sp, 0)
                base = sp
        else:
            enc.encode(st, sp, 0)
        mb = base + 14
        mm = m
        while mm := mm >> 1:
            enc.encode(st, mb, 1 if (v & mm) else 0)
        k += 1
    if ke < se_idx:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def decode_ac_refine(dec: QMDecoder, state: ArithState, tbl: int,
                     zz, ss: int, se_idx: int, al: int) -> None:
    """G.2: AC refinement scan (Ss..Se, Ah = Al+1) — correction bits
    for history-nonzero positions (st+2), newly-significant decisions
    (st+1) with fixed-estimate signs, EOB decisions once past the
    previous-stage EOB index."""
    st = state.ac(tbl)
    p1 = 1 << al
    m1 = -p1
    kex = se_idx
    while kex > 0 and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se_idx:
        se = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, se):
                return  # EOB
        while True:
            coef = int(zz[k])
            if coef != 0:  # history-nonzero: correction bit
                if dec.decode(st, se + 2):
                    zz[k] = coef + (m1 if coef < 0 else p1)
                break
            if dec.decode(st, se + 1):  # newly nonzero
                zz[k] = m1 if dec.decode(state.fixed, 0) else p1
                break
            se += 3
            k += 1
            if k > se_idx:
                raise ValueError("arithmetic AC refinement run overflow")
        k += 1


def encode_ac_refine(enc: QMEncoder, state: ArithState, tbl: int,
                     zz, ss: int, se_idx: int, al: int) -> None:
    """Mirror of decode_ac_refine (T.81 Figure G.10). ``ke`` is this
    scan's EOB index (point transform by Al), ``kex`` the previous
    stage's (point transform by Ah = Al+1)."""
    st = state.ac(tbl)
    ke = se_idx
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex > 0 and (abs(int(zz[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        se = 3 * (k - 1)
        if k > kex:
            enc.encode(st, se, 0)  # not EOB yet
        while True:
            v = int(zz[k])
            mag = (v if v >= 0 else -v) >> al
            if mag:
                if mag >> 1:  # history-nonzero: emit correction bit
                    enc.encode(st, se + 2, mag & 1)
                else:  # newly nonzero: significance + fixed sign
                    enc.encode(st, se + 1, 1)
                    enc.encode(state.fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(st, se + 1, 0)
            se += 3
            k += 1
        k += 1
    if k <= se_idx:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# ------------------------------------- lossless (SOF13, T.81 Annex H.1.2.2)

# Statistics layout for one lossless conditioning table: the DC
# decision structure (zero / sign / SP / SN) replicated over the 5x5
# classification of the two neighbour differences Da (left) and Db
# (above) -> 100 bins, then two magnitude-chain areas (X1..X15 + M2..
# M15 at +14) selected by whether Db falls in a LARGE category -- the
# small-Db chain at 100, the large-Db chain at 129. 158 bins total.
LL_STAT_BINS = 158


def classify_diff(v: int, ll: int, ul: int) -> int:
    """T.81 H.1.2.2.1 5-category classification of a neighbour
    difference, reusing the DC conditioning thresholds (F.1.4.4.1.2):
    0 = zero-ish, 1/2 = small +/-, 3/4 = large +/- -- the same
    category boundaries the sequential DC context update applies to
    its own previous diff, here applied to Da and Db."""
    if v == 0:
        return 0
    a = (v if v > 0 else -v) - 1
    m = (1 << (a.bit_length() - 1)) if a else 0
    if m < (1 << ll) >> 1:
        return 0
    if m > (1 << ul) >> 1:
        return 3 if v > 0 else 4
    return 1 if v > 0 else 2


class LosslessState:
    """Per-scan statistics areas for lossless arithmetic coding; one
    area per conditioning-table id (reset at scan start)."""

    def __init__(self) -> None:
        self.stats: dict[int, bytearray] = {}

    def tbl(self, tbl: int) -> bytearray:
        if tbl not in self.stats:
            self.stats[tbl] = bytearray(LL_STAT_BINS)
        return self.stats[tbl]


def _ll_ctx(da: int, db: int, ll: int, ul: int) -> tuple[int, int]:
    """(decision-context base, magnitude-chain base) for a sample with
    neighbour diffs (Da, Db)."""
    qa, qb = classify_diff(da, ll, ul), classify_diff(db, ll, ul)
    return 4 * (5 * qb + qa), 129 if qb >= 3 else 100


def decode_lossless_diff(dec: QMDecoder, st: bytearray, da: int, db: int,
                         ll: int, ul: int) -> int:
    """Decode one prediction difference conditioned on (Da, Db) — the
    sample-domain twin of decode_dc's decision flow (zero / sign /
    magnitude-category chain / magnitude bits)."""
    s0, xbase = _ll_ctx(da, db, ll, ul)
    if dec.decode(st, s0) == 0:
        return 0
    sign = dec.decode(st, s0 + 1)
    base = s0 + 2 + sign
    m = dec.decode(st, base)
    if m != 0:
        base = xbase
        while dec.decode(st, base):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic lossless magnitude overflow")
            base += 1
    v = m
    mb = base + 14
    mm = m
    while mm := mm >> 1:
        if dec.decode(st, mb):
            v |= mm
    v += 1
    return -v if sign else v


def encode_lossless_diff(enc: QMEncoder, st: bytearray, da: int, db: int,
                         ll: int, ul: int, diff: int) -> None:
    """Mirror of decode_lossless_diff."""
    s0, xbase = _ll_ctx(da, db, ll, ul)
    if diff == 0:
        enc.encode(st, s0, 0)
        return
    enc.encode(st, s0, 1)
    if diff > 0:
        sign, v = 0, diff
    else:
        sign, v = 1, -diff
    enc.encode(st, s0 + 1, sign)
    sp = s0 + 2 + sign
    m = 0
    v -= 1
    base = sp
    if v:
        enc.encode(st, sp, 1)
        m = 1
        x = xbase
        v2 = v
        while v2 := v2 >> 1:
            enc.encode(st, x, 1)
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic lossless magnitude overflow")
            x += 1
        enc.encode(st, x, 0)
        base = x
    else:
        enc.encode(st, sp, 0)
    mb = base + 14
    mm = m
    while mm := mm >> 1:
        enc.encode(st, mb, 1 if (v & mm) else 0)
