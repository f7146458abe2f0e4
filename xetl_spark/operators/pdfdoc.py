"""Pure-Python PDF text extraction, probe, and deterministic builder.

A 100 TB training-data pipeline ingests PDFs constantly; the reference
covers this class of work with subprocess extract tasks (the task
catalog in ``/root/reference/README.md:66-77`` — shell out, transform a
file, write a file).  Here the extractor is a library the Spark layer
calls from Arrow-batched ``mapInPandas`` (see
``multimodal.extract_document_text``), so decode happens on executor
cores next to the data, like every other codec in this package.

Scope — the same "never wrong answers, typed errors" contract as the
JPEG/Avro codecs:

- **Cross-reference**: classic ``xref`` tables with ``/Prev`` update
  chains, PDF 1.5 cross-reference *streams* (``/Type/XRef``, ``W``,
  ``Index``, PNG predictors), hybrid-file ``/XRefStm``, and compressed
  objects in object streams (``/Type/ObjStm``).  A file whose xref is
  damaged falls back to a deterministic full-file object sweep
  (``xref_kind="reconstructed"``) — the triage behavior a bulk
  ingester actually wants.
- **Stream filters**: FlateDecode, LZWDecode (TIFF flavor, honoring
  ``/EarlyChange``), ASCIIHexDecode, ASCII85Decode, RunLengthDecode;
  filter chains and ``/DecodeParms`` predictors (PNG 10-15, TIFF 2).
  Image-only filters (DCT/JPX/JBIG2/CCITT) never appear on text
  content and raise typed errors if they do.
- **Text**: ``BT..ET`` blocks; ``Tj ' " TJ Td TD Tm T* TL Tf``; simple
  fonts decoded via ``/ToUnicode`` CMaps (bfchar/bfrange) or
  ``/Encoding`` (WinAnsi == cp1252, MacRoman, ``/Differences`` glyph
  names from an Adobe-Glyph-List subset), Latin-1 fallback; composite
  (Type0) fonts require a ``/ToUnicode`` CMap.  Inline images
  (``BI..EI``) are skipped.
- **Typed errors** (``PdfFormatError``) for encryption (``/Encrypt``),
  missing/cyclic xref, bad object syntax, and decompression bombs
  (per-stream and per-document output caps).

The builder (``build_pdf``) emits deterministic, spec-clean files in
both classic-xref and xref-stream+ObjStm layouts with a selectable
content filter — the fixture generator for the round-trip oracle
queries and the golden-byte tests.
"""

from __future__ import annotations

import base64
import re
import struct
import zlib
from typing import Callable, NamedTuple

__all__ = [
    "PdfFormatError",
    "sniff_pdf",
    "pdf_text",
    "pdf_page_texts",
    "pdf_probe",
    "build_pdf",
]


class PdfFormatError(ValueError):
    """Typed parse/decode failure — never a silent wrong answer."""


MAX_OBJECTS = 200_000
MAX_PAGES = 20_000
MAX_STREAM_BYTES = 1 << 26  # 64 MiB decompressed, per stream
MAX_TEXT_BYTES = 1 << 24  # 16 MiB extracted text, per document
_MAX_XREF_SECTIONS = 64
_MAX_PARSE_DEPTH = 48

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _as_int(v) -> int:
    """Coerce a parsed PDF value to int, raising PdfFormatError on a
    malformed type (e.g. a /Name or array where a number belongs, as in
    ``/DecodeParms << /Predictor /Ten >>``) instead of the plain
    ValueError/TypeError ``int()`` raises — those escape the typed-error
    triage contract in multimodal.extract_document_text and would kill
    the whole job for one corrupt file."""
    if isinstance(v, bool) or isinstance(v, Name):
        raise PdfFormatError(f"expected integer, got {v!r}")
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v)
    raise PdfFormatError(f"expected integer, got {v!r}")


def sniff_pdf(payload: bytes) -> bool:
    return payload[:1024].find(b"%PDF-") >= 0


# ---------------------------------------------------------------------------
# object model


class Name(str):
    """A PDF name — a str subclass so dict keys stay hashable/printable
    while remaining distinguishable from string objects (bytes)."""

    __slots__ = ()


class Ref(NamedTuple):
    num: int
    gen: int


class Stream(NamedTuple):
    dict: dict
    raw: bytes  # still-filtered bytes; decode via _PdfDoc.stream_data


# ---------------------------------------------------------------------------
# lexer / object parser


def _skip_ws(d: bytes, p: int) -> int:
    n = len(d)
    while p < n:
        c = d[p]
        if c in _WS:
            p += 1
        elif c == 0x25:  # % comment to EOL
            while p < n and d[p] not in b"\r\n":
                p += 1
        else:
            break
    return p


def _read_keyword(d: bytes, p: int) -> tuple[bytes, int]:
    n = len(d)
    s = p
    while p < n and d[p] not in _WS and d[p] not in _DELIM:
        p += 1
    if p == s:
        # single-char operators that are delimiters never reach here;
        # quote operators ' and " are regular chars and do.
        raise PdfFormatError(f"bad PDF token at byte {p}")
    return d[s:p], p


_NAME_HEX = re.compile(rb"#([0-9A-Fa-f]{2})")


def _parse_name(d: bytes, p: int) -> tuple[Name, int]:
    p += 1  # '/'
    n = len(d)
    s = p
    while p < n and d[p] not in _WS and d[p] not in _DELIM:
        p += 1
    raw = _NAME_HEX.sub(lambda m: bytes([int(m.group(1), 16)]), d[s:p])
    return Name(raw.decode("latin-1")), p


_LIT_SPECIAL = re.compile(rb"[\\()\r]")


def _parse_literal_string(d: bytes, p: int) -> tuple[bytes, int]:
    # fast path: no escape / nesting / CR before the closing paren —
    # the overwhelmingly common case in real content streams
    m = _LIT_SPECIAL.search(d, p + 1)
    if m is None:
        raise PdfFormatError("unterminated PDF literal string")
    if d[m.start()] == 0x29:  # ')'
        return d[p + 1 : m.start()], m.start() + 1
    p += 1  # '('
    n = len(d)
    out = bytearray()
    depth = 1
    while p < n:
        c = d[p]
        if c == 0x5C:  # backslash
            p += 1
            if p >= n:
                break
            e = d[p]
            if e in b"nrtbf":
                out.append(b"\n\r\t\b\f"[b"nrtbf".index(e)])
                p += 1
            elif e in b"()\\":
                out.append(e)
                p += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                val = 0
                k = 0
                while k < 3 and p < n and 0x30 <= d[p] <= 0x37:
                    val = val * 8 + (d[p] - 0x30)
                    p += 1
                    k += 1
                out.append(val & 0xFF)
            elif e in b"\r\n":  # line continuation
                p += 1
                if e == 0x0D and p < n and d[p] == 0x0A:
                    p += 1
            else:  # unknown escape: drop the backslash (per spec)
                out.append(e)
                p += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), p + 1
        elif c == 0x0D:  # CR / CRLF inside string → LF
            out.append(0x0A)
            p += 1
            if p < n and d[p] == 0x0A:
                p += 1
            continue
        out.append(c)
        p += 1
    raise PdfFormatError("unterminated PDF literal string")


def _parse_hex_string(d: bytes, p: int) -> tuple[bytes, int]:
    p += 1  # '<'
    n = len(d)
    digits = bytearray()
    while p < n and d[p] != 0x3E:  # '>'
        c = d[p]
        if c not in _WS:
            if not (0x30 <= c <= 0x39 or 0x41 <= c <= 0x46 or 0x61 <= c <= 0x66):
                raise PdfFormatError("bad hex digit in PDF string")
            digits.append(c)
        p += 1
    if p >= n:
        raise PdfFormatError("unterminated PDF hex string")
    if len(digits) % 2:
        digits.append(0x30)
    return bytes.fromhex(digits.decode("ascii")), p + 1


_NUM = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_INT = re.compile(rb"\d+")  # object numbers / generations / offsets


def _parse_object(d: bytes, p: int, depth: int = 0):
    """Parse one PDF object at ``p``; returns (obj, next_pos)."""
    if depth > _MAX_PARSE_DEPTH:
        raise PdfFormatError("PDF object nesting too deep")
    p = _skip_ws(d, p)
    if p >= len(d):
        raise PdfFormatError("unexpected end of PDF data")
    c = d[p]
    if c == 0x3C:  # '<'
        if p + 1 < len(d) and d[p + 1] == 0x3C:
            return _parse_dict(d, p, depth)
        return _parse_hex_string(d, p)
    if c == 0x28:  # '('
        return _parse_literal_string(d, p)
    if c == 0x2F:  # '/'
        return _parse_name(d, p)
    if c == 0x5B:  # '['
        p += 1
        arr = []
        while True:
            p = _skip_ws(d, p)
            if p >= len(d):
                raise PdfFormatError("unterminated PDF array")
            if d[p] == 0x5D:
                return arr, p + 1
            obj, p = _parse_object(d, p, depth + 1)
            arr.append(obj)
    m = _NUM.match(d, p)
    if m:
        txt = m.group()
        p2 = m.end()
        if b"." in txt:
            return float(txt), p2
        val = int(txt)
        # indirect-reference lookahead: INT INT R
        q = _skip_ws(d, p2)
        m2 = _NUM.match(d, q)
        if m2 and b"." not in m2.group() and not m2.group().startswith((b"+", b"-")):
            q2 = _skip_ws(d, m2.end())
            if d[q2 : q2 + 1] == b"R" and (
                q2 + 1 >= len(d) or d[q2 + 1] in _WS or d[q2 + 1] in _DELIM
            ):
                return Ref(val, int(m2.group())), q2 + 1
        return val, p2
    kw, p2 = _read_keyword(d, p)
    if kw == b"true":
        return True, p2
    if kw == b"false":
        return False, p2
    if kw == b"null":
        return None, p2
    raise PdfFormatError(f"unexpected PDF token {kw[:16]!r}")


def _parse_dict(d: bytes, p: int, depth: int = 0) -> tuple[dict, int]:
    p += 2  # '<<'
    out: dict = {}
    while True:
        p = _skip_ws(d, p)
        if p + 1 < len(d) and d[p] == 0x3E and d[p + 1] == 0x3E:
            return out, p + 2
        if p >= len(d):
            raise PdfFormatError("unterminated PDF dictionary")
        if d[p] != 0x2F:
            raise PdfFormatError("PDF dictionary key is not a name")
        key, p = _parse_name(d, p)
        val, p = _parse_object(d, p, depth + 1)
        out[str(key)] = val


# ---------------------------------------------------------------------------
# filters


def _flate(data: bytes) -> bytes:
    try:
        obj = zlib.decompressobj()
        out = obj.decompress(data, MAX_STREAM_BYTES + 1)
    except zlib.error as e:
        raise PdfFormatError(f"bad FlateDecode stream: {e}") from None
    if len(out) > MAX_STREAM_BYTES:
        raise PdfFormatError("FlateDecode output exceeds stream cap")
    return out


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """TIFF-flavor LZW (the PDF flavor, 7.4.4): MSB-first packing,
    Clear=256/EOI=257, code width grows at table size 2^w - EarlyChange.
    Mirrors operators/tiff.py:_lzw_tiff without the strip-size contract
    (PDF streams carry no expected length)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = ((acc << 8) | byte) & 0xFFFFFFFF
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
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise PdfFormatError("LZW code before any output")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfFormatError("LZW code out of range")
            out += entry
            if len(out) > MAX_STREAM_BYTES:
                raise PdfFormatError("LZWDecode output exceeds stream cap")
            prev = entry
            if len(table) == (1 << width) - early_change and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Matching TIFF-flavor LZW encoder (builder/test use)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(CLEAR, width)
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - early_change + 1 and width < 12:
            width += 1
        elif nxt >= 4096 - early_change + 1:
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([b])
    if cur:
        put(table[cur], width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _ascii_hex(data: bytes) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    digits = bytes(c for c in data if c not in _WS)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        raise PdfFormatError("bad ASCIIHexDecode stream") from None


def _ascii85(data: bytes) -> bytes:
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    try:
        return base64.a85decode(bytes(c for c in data if c not in _WS))
    except ValueError as e:
        raise PdfFormatError(f"bad ASCII85Decode stream: {e}") from None


def _runlength(data: bytes) -> bytes:
    out = bytearray()
    p = 0
    n = len(data)
    while p < n:
        l = data[p]
        p += 1
        if l == 128:
            break
        if l < 128:
            if p + l + 1 > n:
                raise PdfFormatError("truncated RunLengthDecode stream")
            out += data[p : p + l + 1]
            p += l + 1
        else:
            if p >= n:
                raise PdfFormatError("truncated RunLengthDecode stream")
            out += bytes([data[p]]) * (257 - l)
            p += 1
        if len(out) > MAX_STREAM_BYTES:
            raise PdfFormatError("RunLengthDecode output exceeds stream cap")
    return bytes(out)


def _undo_predictor(data: bytes, parms: dict) -> bytes:
    pred = _as_int(parms.get("Predictor", 1) or 1)
    if pred <= 1:
        return data
    colors = _as_int(parms.get("Colors", 1) or 1)
    bpc = _as_int(parms.get("BitsPerComponent", 8) or 8)
    columns = _as_int(parms.get("Columns", 1) or 1)
    if bpc != 8:
        raise PdfFormatError(f"predictor BitsPerComponent {bpc} unsupported")
    bpp = max(1, colors)
    rowlen = colors * columns
    if pred == 2:  # TIFF horizontal differencing
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(bpp, rowlen):
                out[r + i] = (out[r + i] + out[r + i - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors: each row is 1 tag byte + rowlen filtered bytes
    stride = rowlen + 1
    if len(data) % stride:
        raise PdfFormatError("predictor row length mismatch")
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(data), stride):
        tag = data[r]
        row = bytearray(data[r + 1 : r + stride])
        if tag == 0:
            pass
        elif tag == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                row[i] = (row[i] + pr) & 0xFF
        else:
            raise PdfFormatError(f"bad PNG predictor tag {tag}")
        out += row
        prev = row
    return bytes(out)


_FILTERS: dict[str, Callable[..., bytes]] = {
    "FlateDecode": lambda d, pm: _undo_predictor(_flate(d), pm),
    "Fl": lambda d, pm: _undo_predictor(_flate(d), pm),
    "LZWDecode": lambda d, pm: _undo_predictor(
        _lzw_decode(d, _as_int(pm.get("EarlyChange", 1) or 1)), pm
    ),
    "LZW": lambda d, pm: _undo_predictor(
        _lzw_decode(d, _as_int(pm.get("EarlyChange", 1) or 1)), pm
    ),
    "ASCIIHexDecode": lambda d, pm: _ascii_hex(d),
    "AHx": lambda d, pm: _ascii_hex(d),
    "ASCII85Decode": lambda d, pm: _ascii85(d),
    "A85": lambda d, pm: _ascii85(d),
    "RunLengthDecode": lambda d, pm: _runlength(d),
    "RL": lambda d, pm: _runlength(d),
}


# ---------------------------------------------------------------------------
# document


class _PdfDoc:
    def __init__(self, payload: bytes, tolerate_encrypted: bool = False):
        self.data = payload
        head = payload[:1024]
        at = head.find(b"%PDF-")
        if at < 0:
            raise PdfFormatError("not a PDF (missing %PDF- header)")
        self.version = head[at + 5 : at + 8].decode("latin-1", "replace")
        self.xref: dict[int, tuple] = {}  # num -> ("f", off) | ("s", stm, idx)
        self.trailer: dict = {}
        self.xref_kind = "table"
        self._cache: dict[int, object] = {}
        self._objstm: dict[int, tuple[bytes, dict[int, int]]] = {}
        self._load_xrefs()
        self.encrypted = "Encrypt" in self.trailer
        if self.encrypted and not tolerate_encrypted:
            raise PdfFormatError("encrypted PDF (unsupported)")

    # -- xref loading

    def _load_xrefs(self) -> None:
        tail = self.data[-2048:]
        at = tail.rfind(b"startxref")
        if at < 0:
            self._reconstruct()
            return
        m = _INT.search(tail, at + 9)
        if not m:
            self._reconstruct()
            return
        try:
            offset = int(m.group())
            seen: set[int] = set()
            kinds: set[str] = set()
            while offset and offset not in seen and len(seen) < _MAX_XREF_SECTIONS:
                seen.add(offset)
                offset = self._load_xref_section(offset, kinds)
            self.xref_kind = "stream" if "stream" in kinds else "table"
        except PdfFormatError:
            self._reconstruct()
            return
        if "Root" not in self.trailer:
            self._reconstruct()

    def _load_xref_section(self, offset: int, kinds: set[str]) -> int:
        d = self.data
        if offset < 0 or offset >= len(d):
            raise PdfFormatError("xref offset out of range")
        p = _skip_ws(d, offset)
        if d[p : p + 4] == b"xref":
            kinds.add("table")
            trailer = self._load_xref_table(p + 4)
        else:
            kinds.add("stream")
            trailer = self._load_xref_stream(p)
        for k, v in trailer.items():
            self.trailer.setdefault(k, v)  # newest section wins
        nxt = trailer.get("Prev")
        # hybrid-reference file: classic table + /XRefStm pointer
        hyb = trailer.get("XRefStm")
        if isinstance(hyb, int):
            try:
                self._load_xref_section(hyb, kinds)
            except PdfFormatError:
                pass
        return int(nxt) if isinstance(nxt, int) else 0

    def _load_xref_table(self, p: int) -> dict:
        d = self.data
        while True:
            p = _skip_ws(d, p)
            if d[p : p + 7] == b"trailer":
                tr, _ = _parse_object(d, p + 7)
                if not isinstance(tr, dict):
                    raise PdfFormatError("PDF trailer is not a dictionary")
                return tr
            m = _INT.match(d, p)
            if not m:
                raise PdfFormatError("bad xref subsection header")
            start = int(m.group())
            p = _skip_ws(d, m.end())
            m = _INT.match(d, p)
            if not m:
                raise PdfFormatError("bad xref subsection header")
            count = int(m.group())
            p = _skip_ws(d, m.end())
            if count > MAX_OBJECTS:
                raise PdfFormatError("xref subsection too large")
            for i in range(count):
                row = d[p : p + 20]
                if len(row) < 18:
                    raise PdfFormatError("truncated xref row")
                try:
                    off = int(row[0:10])
                    kind = row[17:18]
                except ValueError:
                    raise PdfFormatError("bad xref row") from None
                num = start + i
                if kind == b"n":
                    self.xref.setdefault(num, ("f", off))
                elif kind == b"f":
                    self.xref.setdefault(num, ("free",))
                else:
                    raise PdfFormatError("bad xref row type")
                # rows are 20 bytes but some writers emit 19 (lone \n)
                p += 20 if row[18:20] in (b"\r\n", b" \r", b" \n") else 19

    def _load_xref_stream(self, p: int) -> dict:
        d = self.data
        num, gen, body_at = self._object_header(p)
        sd, q = _parse_object(d, body_at)
        if not isinstance(sd, dict) or sd.get("Type") != "XRef":
            raise PdfFormatError("startxref does not point at an xref section")
        stream = self._read_stream(sd, q, resolve_len=False)
        data = self._decode_stream(stream)
        w = sd.get("W")
        if not (isinstance(w, list) and len(w) >= 3):
            raise PdfFormatError("xref stream missing W")
        w1, w2, w3 = (_as_int(x) for x in w[:3])
        rowlen = w1 + w2 + w3
        if rowlen <= 0 or rowlen > 32:
            raise PdfFormatError("bad xref stream W widths")
        index = sd.get("Index") or [0, _as_int(sd.get("Size", 0) or 0)]
        pairs = [
            (_as_int(index[i]), _as_int(index[i + 1])) for i in range(0, len(index) - 1, 2)
        ]
        pos = 0
        for start, count in pairs:
            if count > MAX_OBJECTS:
                raise PdfFormatError("xref stream subsection too large")
            for i in range(count):
                row = data[pos : pos + rowlen]
                if len(row) < rowlen:
                    raise PdfFormatError("truncated xref stream")
                pos += rowlen
                f1 = int.from_bytes(row[:w1], "big") if w1 else 1
                f2 = int.from_bytes(row[w1 : w1 + w2], "big")
                f3 = int.from_bytes(row[w1 + w2 :], "big")
                numi = start + i
                if f1 == 1:
                    self.xref.setdefault(numi, ("f", f2))
                elif f1 == 2:
                    self.xref.setdefault(numi, ("s", f2, f3))
                else:
                    self.xref.setdefault(numi, ("free",))
        return sd

    def _reconstruct(self) -> None:
        """Deterministic salvage: sweep the whole file for `N G obj`
        headers (last occurrence of an object number wins — incremental
        updates append) and take the last trailer/Root found."""
        self.xref_kind = "reconstructed"
        self.xref.clear()
        found: dict[int, int] = {}
        for m in re.finditer(rb"(?:^|[\r\n\x00\t\f ])(\d{1,9})\s+(\d{1,5})\s+obj\b", self.data):
            found[int(m.group(1))] = m.start(0) + (1 if m.group(0)[0:1] in b"\r\n\x00\t\f " else 0)
            if len(found) > MAX_OBJECTS:
                raise PdfFormatError("too many objects in damaged PDF")
        for num, off in found.items():
            self.xref[num] = ("f", off)
        self.trailer = {}
        at = self.data.rfind(b"trailer")
        if at >= 0:
            try:
                tr, _ = _parse_object(self.data, at + 7)
                if isinstance(tr, dict):
                    self.trailer = tr
            except PdfFormatError:
                pass
        if "Root" not in self.trailer:
            # find a Catalog among the recovered objects
            for num in found:
                try:
                    obj = self.get_object(num)
                except PdfFormatError:
                    continue
                o = obj.dict if isinstance(obj, Stream) else obj
                if isinstance(o, dict) and o.get("Type") == "Catalog":
                    self.trailer["Root"] = Ref(num, 0)
                    break
        if "Root" not in self.trailer:
            raise PdfFormatError("PDF has no document catalog")

    # -- objects

    def _object_header(self, p: int) -> tuple[int, int, int]:
        d = self.data
        p = _skip_ws(d, p)
        m = _INT.match(d, p)
        if not m:
            raise PdfFormatError("bad object header")
        num = int(m.group())
        p = _skip_ws(d, m.end())
        m2 = _INT.match(d, p)
        if not m2:
            raise PdfFormatError("bad object header")
        gen = int(m2.group())
        p = _skip_ws(d, m2.end())
        if d[p : p + 3] != b"obj":
            raise PdfFormatError("bad object header (missing obj)")
        return num, gen, p + 3

    def _read_stream(self, sd: dict, p: int, resolve_len: bool = True) -> Stream:
        d = self.data
        p = _skip_ws(d, p)
        if d[p : p + 6] != b"stream":
            raise PdfFormatError("stream dictionary without stream body")
        p += 6
        if d[p : p + 2] == b"\r\n":
            p += 2
        elif d[p : p + 1] in (b"\n", b"\r"):
            p += 1
        length = sd.get("Length")
        if isinstance(length, Ref) and resolve_len:
            length = self.resolve(length)
        if isinstance(length, int) and 0 <= length <= len(d) - p:
            raw = d[p : p + length]
            q = _skip_ws(d, p + length)
            if d[q : q + 9] != b"endstream":
                # Length was wrong; fall through to scan
                raw = None
        else:
            raw = None
        if raw is None:
            end = d.find(b"endstream", p)
            if end < 0:
                raise PdfFormatError("unterminated stream")
            raw = d[p:end]
            # strip the EOL that precedes endstream
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        return Stream(sd, raw)

    def _decode_stream(self, s: Stream) -> bytes:
        filt = self.resolve(s.dict.get("Filter"))
        parms = self.resolve(s.dict.get("DecodeParms") or s.dict.get("DP"))
        if filt is None:
            return s.raw
        if not isinstance(filt, list):
            filt = [filt]
            parms = [parms]
        elif not isinstance(parms, list):
            parms = [parms] * len(filt)
        data = s.raw
        for f, pm in zip(filt, parms):
            pm = self.resolve(pm) or {}
            fn = _FILTERS.get(str(f))
            if fn is None:
                raise PdfFormatError(f"unsupported PDF filter /{f}")
            data = fn(data, pm)
        return data

    def get_object(self, num: int, _depth: int = 0):
        if num in self._cache:
            return self._cache[num]
        if _depth > 8:
            raise PdfFormatError("cyclic object-stream reference")
        ent = self.xref.get(num)
        if ent is None or ent[0] == "free":
            return None
        if ent[0] == "f":
            onum, _gen, body = self._object_header(ent[1])
            if onum != num and self.xref_kind != "reconstructed":
                raise PdfFormatError("xref offset points at wrong object")
            obj, q = _parse_object(self.data, body)
            if isinstance(obj, dict):
                q2 = _skip_ws(self.data, q)
                if self.data[q2 : q2 + 6] == b"stream":
                    obj = self._read_stream(obj, q)
        else:  # ("s", stm_num, idx)
            obj = self._objstm_object(ent[1], ent[2], _depth)
        self._cache[num] = obj
        return obj

    def _objstm_object(self, stm_num: int, idx: int, depth: int):
        pair = self._objstm.get(stm_num)
        if pair is None:
            stm = self.get_object(stm_num, depth + 1)
            if not isinstance(stm, Stream) or stm.dict.get("Type") != "ObjStm":
                raise PdfFormatError("compressed object's container is not ObjStm")
            data = self._decode_stream(stm)
            n = _as_int(self.resolve(stm.dict.get("N")) or 0)
            first = _as_int(self.resolve(stm.dict.get("First")) or 0)
            offsets: dict[int, int] = {}
            p = 0
            for i in range(min(n, MAX_OBJECTS)):
                m = _INT.match(data, _skip_ws(data, p))
                if not m:
                    raise PdfFormatError("bad ObjStm header")
                onum = int(m.group())
                m2 = _INT.match(data, _skip_ws(data, m.end()))
                if not m2:
                    raise PdfFormatError("bad ObjStm header")
                offsets[i] = first + int(m2.group())
                self._objstm_nums = getattr(self, "_objstm_nums", {})
                self._objstm_nums[(stm_num, i)] = onum
                p = m2.end()
            pair = (data, offsets)
            self._objstm[stm_num] = pair
        data, offsets = pair
        if idx not in offsets:
            raise PdfFormatError("ObjStm index out of range")
        obj, _ = _parse_object(data, offsets[idx])
        return obj

    def resolve(self, obj, _depth: int = 0):
        while isinstance(obj, Ref):
            if _depth > 32:
                raise PdfFormatError("cyclic indirect reference")
            obj = self.get_object(obj.num)
            _depth += 1
        return obj


# ---------------------------------------------------------------------------
# page tree + text extraction

_INHERITABLE = ("Resources", "MediaBox", "Rotate", "CropBox")


def _walk_pages(doc: _PdfDoc) -> list[dict]:
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise PdfFormatError("PDF catalog missing")
    top = doc.resolve(root.get("Pages"))
    if not isinstance(top, dict):
        raise PdfFormatError("PDF page tree missing")
    pages: list[dict] = []
    seen: set[int] = set()
    stack: list[tuple[dict, dict]] = [(top, {})]
    while stack:
        node, inher = stack.pop()
        oid = id(node)
        if oid in seen:
            raise PdfFormatError("cyclic PDF page tree")
        seen.add(oid)
        inher = dict(inher)
        for k in _INHERITABLE:
            if k in node:
                inher[k] = node[k]
        typ = node.get("Type")
        if typ == "Page" or ("Kids" not in node and typ != "Pages"):
            merged = dict(inher)
            merged.update(node)
            pages.append(merged)
            if len(pages) > MAX_PAGES:
                raise PdfFormatError("too many PDF pages")
            continue
        kids = doc.resolve(node.get("Kids")) or []
        if not isinstance(kids, list):
            raise PdfFormatError("PDF /Kids is not an array")
        for kid in reversed(kids):
            k = doc.resolve(kid)
            if isinstance(k, dict):
                stack.append((k, inher))
    return pages


# -- glyph names (Adobe Glyph List subset covering Standard/WinAnsi sets)

_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "bullet": "•", "endash": "–",
    "emdash": "—", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "trademark": "™", "fi": "ﬁ",
    "fl": "ﬂ", "florin": "ƒ", "fraction": "⁄",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "perthousand": "‰", "quotedblbase": "„",
    "quotesinglbase": "‚", "Euro": "€", "minus": "−",
    "degree": "°", "plusminus": "±", "mu": "µ",
    "periodcentered": "·", "middot": "·",
    "copyright": "©", "registered": "®", "section": "§",
    "paragraph": "¶", "cent": "¢", "sterling": "£",
    "yen": "¥", "currency": "¤", "brokenbar": "¦",
    "exclamdown": "¡", "questiondown": "¿",
    "guillemotleft": "«", "guillemotright": "»",
    "nbspace": " ", "softhyphen": "­",
}
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _GLYPHS[_c] = _c


def _glyph_char(name: str) -> str:
    if name in _GLYPHS:
        return _GLYPHS[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            pass
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            pass
    return "�"


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """Parse bfchar/bfrange mappings; returns (code→text, code_bytes)."""
    cmap: dict[int, str] = {}
    code_bytes = 0
    p = 0
    n = len(data)
    mode = None
    operands: list = []
    while p < n:
        p = _skip_ws(data, p)
        if p >= n:
            break
        c = data[p]
        if c == 0x3C and data[p + 1 : p + 2] != b"<":
            obj, p = _parse_hex_string(data, p)
            operands.append(obj)
        elif c == 0x5B:
            obj, p = _parse_object(data, p)
            operands.append(obj)
        elif c == 0x2F or c == 0x28 or (0x30 <= c <= 0x39) or c in (0x2B, 0x2D, 0x2E):
            obj, p = _parse_object(data, p)
            operands.append(obj)
        elif c == 0x3C:  # '<<' dict
            obj, p = _parse_object(data, p)
            operands.append(obj)
        else:
            try:
                kw, p = _read_keyword(data, p)
            except PdfFormatError:
                p += 1
                continue
            if kw == b"begincodespacerange":
                mode = "codespace"
                operands = []
            elif kw == b"beginbfchar":
                mode = "bfchar"
                operands = []
            elif kw == b"beginbfrange":
                mode = "bfrange"
                operands = []
            elif kw in (b"endcodespacerange", b"endbfchar", b"endbfrange"):
                if mode == "codespace":
                    for op in operands:
                        if isinstance(op, bytes):
                            code_bytes = max(code_bytes, len(op))
                elif mode == "bfchar":
                    for i in range(0, len(operands) - 1, 2):
                        src, dst = operands[i], operands[i + 1]
                        if isinstance(src, bytes) and isinstance(dst, bytes):
                            code_bytes = max(code_bytes, len(src))
                            cmap[int.from_bytes(src, "big")] = dst.decode(
                                "utf-16-be", "replace"
                            )
                elif mode == "bfrange":
                    for i in range(0, len(operands) - 2, 3):
                        lo, hi, dst = operands[i : i + 3]
                        if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                            continue
                        code_bytes = max(code_bytes, len(lo))
                        lo_i = int.from_bytes(lo, "big")
                        hi_i = min(int.from_bytes(hi, "big"), lo_i + 65535)
                        if isinstance(dst, bytes):
                            base_s = dst.decode("utf-16-be", "replace")
                            for k in range(hi_i - lo_i + 1):
                                if base_s:
                                    cmap[lo_i + k] = base_s[:-1] + chr(
                                        ord(base_s[-1]) + k
                                    )
                        elif isinstance(dst, list):
                            for k, item in enumerate(dst):
                                if isinstance(item, bytes) and lo_i + k <= hi_i:
                                    cmap[lo_i + k] = item.decode(
                                        "utf-16-be", "replace"
                                    )
                mode = None
                operands = []
            elif mode is None:
                operands = []
    return cmap, (code_bytes or 1)


class _FontDec:
    """Byte-string → text decoder for one font resource."""

    def __init__(self, doc: _PdfDoc, font: dict):
        self.cmap: dict[int, str] | None = None
        self.code_bytes = 1
        self.table: list[str] | None = None
        tu = doc.resolve(font.get("ToUnicode"))
        if isinstance(tu, Stream):
            self.cmap, self.code_bytes = _parse_tounicode(doc._decode_stream(tu))
        subtype = font.get("Subtype")
        if subtype == "Type0":
            if self.cmap is None:
                raise PdfFormatError(
                    "composite (Type0) font without /ToUnicode CMap"
                )
            enc = font.get("Encoding")
            if isinstance(enc, str) and not str(enc).startswith("Identity"):
                raise PdfFormatError(f"Type0 /Encoding {enc} unsupported")
            self.code_bytes = max(self.code_bytes, 2)
            return
        enc = doc.resolve(font.get("Encoding"))
        base = "WinAnsiEncoding"
        diffs = None
        if isinstance(enc, str):
            base = str(enc)
        elif isinstance(enc, dict):
            base = str(enc.get("BaseEncoding", base))
            diffs = doc.resolve(enc.get("Differences"))
        codec = {
            "WinAnsiEncoding": "cp1252",
            "MacRomanEncoding": "mac_roman",
        }.get(base, "latin-1")
        table = []
        for i in range(256):
            try:
                table.append(bytes([i]).decode(codec))
            except UnicodeDecodeError:
                table.append("�")
        if isinstance(diffs, list):
            code = 0
            for item in diffs:
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, str):  # Name is a str subclass
                    if 0 <= code < 256:
                        table[code] = _glyph_char(str(item))
                    code += 1
        if self.cmap:  # single-byte ToUnicode overrides the encoding
            for code, s in self.cmap.items():
                if 0 <= code < 256:
                    table[code] = s
        self.table = table
        # C-speed decode: latin-1 maps byte i → chr(i), then one
        # str.translate applies the whole 256-entry table
        self._tr = str.maketrans(
            {chr(i): table[i] for i in range(256) if table[i] != chr(i)}
        )

    def __call__(self, raw: bytes) -> str:
        if self.code_bytes > 1:
            cb = self.code_bytes
            cmap = self.cmap or {}
            return "".join(
                cmap.get(int.from_bytes(raw[i : i + cb], "big"), "�")
                for i in range(0, len(raw) - cb + 1, cb)
            )
        return raw.decode("latin-1").translate(self._tr)


_LATIN1 = lambda raw: raw.decode("latin-1")  # noqa: E731

# TJ kerning adjustment (thousandths of em) at or below which a word
# space is assumed — the common pdftotext heuristic operating point.
_TJ_SPACE = -180


def _extract_text_ops(data: bytes, fonts: dict[str, Callable[[bytes], str]]) -> str:
    lines: list[str] = []
    buf: list[str] = []
    total = 0
    cur: Callable[[bytes], str] = _LATIN1
    operands: list = []
    in_bt = False
    after_bt = False
    p = 0
    n = len(data)

    def newline() -> None:
        lines.append("".join(buf))
        buf.clear()

    def show(raw: bytes) -> None:
        nonlocal total
        if not isinstance(raw, bytes):
            return
        s = cur(raw)
        total += len(s)
        if total > MAX_TEXT_BYTES:
            raise PdfFormatError("extracted text exceeds document cap")
        buf.append(s)

    while p < n:
        p = _skip_ws(data, p)
        if p >= n:
            break
        c = data[p]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or c in (
            0x2B, 0x2D, 0x2E,
        ) or (0x30 <= c <= 0x39):
            try:
                obj, p = _parse_object(data, p)
            except PdfFormatError:
                p += 1
                continue
            operands.append(obj)
            if len(operands) > 64:
                del operands[:-8]
            continue
        if c == 0x27:  # '
            p += 1
            if in_bt:
                newline()
                if operands and isinstance(operands[-1], bytes):
                    show(operands[-1])
            operands = []
            after_bt = False
            continue
        if c == 0x22:  # "
            p += 1
            if in_bt:
                newline()
                if operands and isinstance(operands[-1], bytes):
                    show(operands[-1])
            operands = []
            after_bt = False
            continue
        try:
            kw, p = _read_keyword(data, p)
        except PdfFormatError:
            p += 1
            continue
        op = kw.decode("latin-1")
        if op == "BT":
            in_bt = True
            after_bt = True
        elif op == "ET":
            if buf:
                newline()
            in_bt = False
        elif op == "Tf":
            if len(operands) >= 2 and isinstance(operands[-2], str):
                cur = fonts.get(str(operands[-2]), _LATIN1)
        elif op in ("Td", "TD"):
            if in_bt and not after_bt:
                ty = operands[-1] if operands else 0
                if not isinstance(ty, (int, float)) or ty != 0:
                    newline()
            after_bt = False
        elif op == "T*":
            if in_bt:
                newline()
            after_bt = False
        elif op == "Tm":
            if in_bt and not after_bt:
                newline()
            after_bt = False
        elif op == "Tj":
            if in_bt and operands and isinstance(operands[-1], bytes):
                show(operands[-1])
        elif op == "TJ":
            if in_bt and operands and isinstance(operands[-1], list):
                for item in operands[-1]:
                    if isinstance(item, bytes):
                        show(item)
                    elif isinstance(item, (int, float)) and item <= _TJ_SPACE:
                        buf.append(" ")
        elif op == "BI":
            # inline image: skip to EI delimited by whitespace
            m = re.search(rb"[\x00\t\n\f\r ]EI(?=[\x00\t\n\f\r ]|$)", data[p:])
            if not m:
                raise PdfFormatError("unterminated inline image")
            p += m.end()
        operands = []
    if buf:
        newline()
    return "\n".join(lines)


def pdf_page_texts(payload: bytes) -> list[str]:
    """Extract text per page (list of strings, lines joined with \\n)."""
    doc = _PdfDoc(payload)
    out: list[str] = []
    # font decoders are immutable per font object; _PdfDoc caches
    # resolved objects, so id() is a stable key across pages
    dec_cache: dict[int, _FontDec] = {}
    for page in _walk_pages(doc):
        contents = doc.resolve(page.get("Contents"))
        parts: list[bytes] = []
        if isinstance(contents, Stream):
            parts.append(doc._decode_stream(contents))
        elif isinstance(contents, list):
            for c in contents:
                cs = doc.resolve(c)
                if isinstance(cs, Stream):
                    parts.append(doc._decode_stream(cs))
        res = doc.resolve(page.get("Resources")) or {}
        fdict = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
        fonts: dict[str, Callable[[bytes], str]] = {}
        if isinstance(fdict, dict):
            for fname, fref in fdict.items():
                fobj = doc.resolve(fref)
                if isinstance(fobj, Stream):
                    fobj = fobj.dict
                if isinstance(fobj, dict):
                    dec = dec_cache.get(id(fobj))
                    if dec is None:
                        dec = dec_cache[id(fobj)] = _FontDec(doc, fobj)
                    fonts[str(fname)] = dec
        out.append(_extract_text_ops(b"\n".join(parts), fonts))
    return out


def pdf_text(payload: bytes) -> str:
    """Full document text; pages joined with form-feed (pdftotext
    convention)."""
    return "\f".join(pdf_page_texts(payload))


def pdf_probe(payload: bytes) -> dict:
    """Triage metadata without full extraction: version, page count,
    encryption flag, xref layout, object count, producer."""
    doc = _PdfDoc(payload, tolerate_encrypted=True)
    out = {
        "version": doc.version,
        "encrypted": doc.encrypted,
        "xref_kind": doc.xref_kind,
        "objects": len(doc.xref),
        "pages": None,
        "producer": None,
    }
    if not doc.encrypted:
        out["pages"] = len(_walk_pages(doc))
        info = doc.resolve(doc.trailer.get("Info"))
        if isinstance(info, dict):
            prod = info.get("Producer")
            if isinstance(prod, bytes):
                if prod[:2] == b"\xfe\xff":
                    out["producer"] = prod[2:].decode("utf-16-be", "replace")
                else:
                    out["producer"] = prod.decode("latin-1")
    return out


_CS_COMPS = {"DeviceRGB": 3, "DeviceGray": 1, "DeviceCMYK": 4}


def pdf_images(payload: bytes) -> list[dict]:
    """Embedded-image (figure) extraction — the multimodal side of PDF
    ingestion a VLM training pipeline needs. Walks each page's
    ``/Resources /XObject`` dict for ``/Subtype /Image`` entries.

    Per image: ``kind="raw"`` (decodable filter chain; ``data`` is the
    defiltered sample buffer, length-checked against width x height x
    components), ``kind="jpeg"`` (DCTDecode; ``data`` is the embedded
    JFIF stream, decodable by operators/jpeg.py), ``kind="jpx"`` /
    ``kind="unsupported"`` (payload passed through undecoded for
    downstream routing — triage, not failure). Inline images (BI..EI)
    are out of scope, as in text extraction."""
    doc = _PdfDoc(payload)
    out: list[dict] = []
    seen: set[int] = set()
    for pno, page in enumerate(_walk_pages(doc)):
        res = doc.resolve(page.get("Resources")) or {}
        xo = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
        if not isinstance(xo, dict):
            continue
        for name, ref in xo.items():
            obj = doc.resolve(ref)
            if not isinstance(obj, Stream) or obj.dict.get("Subtype") != "Image":
                continue
            if isinstance(ref, Ref):
                if ref.num in seen:  # shared XObject reused across pages
                    continue
                seen.add(ref.num)
            sd = obj.dict
            w = _as_int(doc.resolve(sd.get("Width")) or 0)
            h = _as_int(doc.resolve(sd.get("Height")) or 0)
            bpc = _as_int(doc.resolve(sd.get("BitsPerComponent")) or 8)
            cs = doc.resolve(sd.get("ColorSpace"))
            if isinstance(cs, list) and cs:
                cs = str(cs[0])
            cs = str(cs) if cs is not None else None
            comps = _CS_COMPS.get(cs or "")
            filt = doc.resolve(sd.get("Filter"))
            filts = [
                str(f)
                for f in (filt if isinstance(filt, list) else [filt])
                if f is not None
            ]
            if filts == ["DCTDecode"] or filts == ["DCT"]:
                kind, data = "jpeg", obj.raw
            elif filts == ["JPXDecode"]:
                kind, data = "jpx", obj.raw
            elif all(f in _FILTERS for f in filts):
                kind = "raw"
                data = doc._decode_stream(obj)
                if comps is not None and bpc == 8 and len(data) < w * h * comps:
                    raise PdfFormatError(
                        f"image {name} sample buffer short: "
                        f"{len(data)} < {w * h * comps}"
                    )
            else:
                kind, data = "unsupported", obj.raw
            out.append(
                {
                    "page": pno,
                    "name": str(name),
                    "width": w,
                    "height": h,
                    "colorspace": cs,
                    "bits": bpc,
                    "kind": kind,
                    "data": data,
                }
            )
    return out


# ---------------------------------------------------------------------------
# builder


def _esc(line: str) -> bytes:
    """Escape a text line into a PDF literal string (WinAnsi bytes)."""
    raw = line.encode("cp1252", "replace")
    out = bytearray()
    for b in raw:
        if b in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([b])
        elif b < 0x20:
            out += b"\\%03o" % b
        else:
            out.append(b)
    return bytes(out)


_ENCODERS: dict[str, tuple[bytes, Callable[[bytes], bytes]]] = {
    "none": (b"", lambda d: d),
    "flate": (b"/Filter /FlateDecode", lambda d: zlib.compress(d, 6)),
    "lzw": (b"/Filter /LZWDecode", _lzw_encode),
    "ahx": (b"/Filter /ASCIIHexDecode", lambda d: d.hex().encode() + b">"),
    "a85": (b"/Filter /ASCII85Decode", lambda d: base64.a85encode(d) + b"~>"),
    "rle": (
        b"/Filter /RunLengthDecode",
        lambda d: b"".join(
            bytes([len(d[i : i + 127]) - 1]) + d[i : i + 127]
            for i in range(0, len(d), 127)
        )
        + b"\x80",
    ),
}


def _content_stream(lines: list[str]) -> bytes:
    body = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
    for i, ln in enumerate(lines):
        if i:
            body.append(b"T*")
        body.append(b"(" + _esc(ln) + b") Tj")
    body.append(b"ET")
    return b" ".join(body)


def build_pdf(
    pages: list[str] | list[list[str]],
    *,
    xref_stream: bool = False,
    content_filter: str = "flate",
    producer: str = "xetl-spark pdfdoc",
    title: str | None = None,
    images: list[tuple[int, "object"]] | None = None,
    image_format: str = "raw",
) -> bytes:
    """Deterministic single-font PDF. ``pages``: one string per page
    (lines split on \\n) or an explicit list of lines per page.
    ``xref_stream=True`` emits the PDF 1.5 layout — cross-reference
    stream (W [1 4 2], PNG up-predictor) with the catalog/pages/font/
    info objects packed into an ObjStm — so both parser paths are
    exercised by the same fixture generator.

    ``images``: optional ``(page_index, uint8 ndarray)`` pairs embedded
    as Image XObjects and drawn via ``Do``. ``image_format="raw"``
    stores Flate-compressed raw samples (pixel-exact round trip);
    ``"jpeg"`` routes through operators/jpeg.py's baseline encoder
    (DCTDecode payload, decodable by any reader)."""
    if content_filter not in _ENCODERS:
        raise ValueError(f"unknown content_filter {content_filter!r}")
    filt_decl, enc = _ENCODERS[content_filter]
    norm_pages: list[list[str]] = [
        p.split("\n") if isinstance(p, str) else list(p) for p in pages
    ]
    if not norm_pages:
        norm_pages = [[""]]

    npages = len(norm_pages)
    # object numbering: 1=Catalog 2=Pages 3=Font 4=Info,
    # then per page i: 5+2i = Page dict, 6+2i = content stream;
    # image XObjects follow after all page objects
    font_obj, info_obj = 3, 4
    page_obj = lambda i: 5 + 2 * i  # noqa: E731
    cont_obj = lambda i: 6 + 2 * i  # noqa: E731
    last_obj = 4 + 2 * npages
    images = images or []
    img_obj = lambda k: 5 + 2 * npages + k  # noqa: E731
    last_obj += len(images)

    def d(**kw) -> bytes:
        return (
            b"<< "
            + b" ".join(k.encode() + b" " + v for k, v in kw.items())
            + b" >>"
        )

    kids = b"[" + b" ".join(b"%d 0 R" % page_obj(i) for i in range(npages)) + b"]"
    objs: dict[int, bytes] = {
        1: d(**{"/Type": b"/Catalog", "/Pages": b"2 0 R"}),
        2: d(**{"/Type": b"/Pages", "/Count": str(npages).encode(), "/Kids": kids}),
        font_obj: d(
            **{
                "/Type": b"/Font",
                "/Subtype": b"/Type1",
                "/BaseFont": b"/Helvetica",
                "/Encoding": b"/WinAnsiEncoding",
            }
        ),
        info_obj: d(
            **(
                {"/Producer": b"(" + _esc(producer) + b")"}
                | ({"/Title": b"(" + _esc(title) + b")"} if title else {})
            )
        ),
    }
    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict_extra, data)
    page_images: dict[int, list[int]] = {}  # page idx -> image ks
    for k, (pidx, arr) in enumerate(images):
        if not (0 <= pidx < npages):
            raise ValueError(f"image page index {pidx} out of range")
        page_images.setdefault(pidx, []).append(k)
        shape = getattr(arr, "shape", ())
        if getattr(arr, "dtype", None) is not None and str(arr.dtype) != "uint8":
            raise ValueError(f"image dtype must be uint8, got {arr.dtype}")
        if len(shape) == 3 and shape[2] == 3:
            cspace, ih, iw = b"/DeviceRGB", shape[0], shape[1]
        elif len(shape) == 2:
            cspace, ih, iw = b"/DeviceGray", shape[0], shape[1]
        else:
            raise ValueError("image must be HxW or HxWx3 uint8")
        if image_format == "jpeg":
            from xetl_spark.operators import jpeg as _jpeg

            data = _jpeg.jpeg_encode(arr, 90)
            ifilt = b"/Filter /DCTDecode"
        elif image_format == "raw":
            data = zlib.compress(bytes(arr.tobytes()), 6)
            ifilt = b"/Filter /FlateDecode"
        else:
            raise ValueError(f"unknown image_format {image_format!r}")
        streams[img_obj(k)] = (
            b"/Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace %s /BitsPerComponent 8 %s" % (iw, ih, cspace, ifilt),
            data,
        )
    for i, lines in enumerate(norm_pages):
        res = b"<< /Font << /F1 %d 0 R >> >>" % font_obj
        content = _content_stream(lines)
        ks = page_images.get(i)
        if ks:
            xobjs = b" ".join(b"/Im%d %d 0 R" % (k, img_obj(k)) for k in ks)
            res = (
                b"<< /Font << /F1 %d 0 R >> /XObject << %s >> >>"
                % (font_obj, xobjs)
            )
            draws = b" ".join(
                b"q 128 0 0 128 72 %d cm /Im%d Do Q" % (500 - 20 * j, k)
                for j, k in enumerate(ks)
            )
            content = content + b" " + draws
        objs[page_obj(i)] = d(
            **{
                "/Type": b"/Page",
                "/Parent": b"2 0 R",
                "/MediaBox": b"[0 0 612 792]",
                "/Resources": res,
                "/Contents": b"%d 0 R" % cont_obj(i),
            }
        )
        streams[cont_obj(i)] = (filt_decl, enc(content))

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if xref_stream else b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    def emit_stream(num: int, extra: bytes, data: bytes, typ: bytes = b"") -> None:
        offsets[num] = len(out)
        head = b"<< %s/Length %d %s >>" % (typ, len(data), extra)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(head)
        out.extend(b"\nstream\n")
        out.extend(data)
        out.extend(b"\nendstream\nendobj\n")

    if not xref_stream:
        for num in sorted(objs):
            emit(num, objs[num])
        for num in sorted(streams):
            extra, data = streams[num]
            emit_stream(num, extra, data)
        xref_at = len(out)
        out.extend(b"xref\n0 %d\n" % (last_obj + 1))
        out.extend(b"0000000000 65535 f \n")
        for num in range(1, last_obj + 1):
            out.extend(b"%010d 00000 n \n" % offsets[num])
        out.extend(b"trailer\n")
        out.extend(
            d(
                **{
                    "/Size": str(last_obj + 1).encode(),
                    "/Root": b"1 0 R",
                    "/Info": b"%d 0 R" % info_obj,
                }
            )
        )
        out.extend(b"\nstartxref\n%d\n%%%%EOF\n" % xref_at)
        return bytes(out)

    # PDF 1.5 layout: plain objects go into one ObjStm; streams stay raw
    objstm_num = last_obj + 1
    xref_num = last_obj + 2
    packed = sorted(objs)
    parts: list[bytes] = []
    offs: list[tuple[int, int]] = []
    pos = 0
    for num in packed:
        body = objs[num]
        offs.append((num, pos))
        parts.append(body)
        pos += len(body) + 1
    header = " ".join(f"{n} {o}" for n, o in offs).encode() + b"\n"
    objstm_payload = header + b"\n".join(parts)
    objstm_data = zlib.compress(objstm_payload, 6)
    for num in sorted(streams):
        extra, data = streams[num]
        emit_stream(num, extra, data)
    emit_stream(
        objstm_num,
        b"/Filter /FlateDecode /N %d /First %d" % (len(packed), len(header)),
        objstm_data,
        typ=b"/Type /ObjStm ",
    )
    xref_at = len(out)
    # xref stream rows: W [1 4 2], entries 0..xref_num
    rows: list[bytes] = []
    for num in range(xref_num + 1):
        if num == 0:
            rows.append(struct.pack(">B I H", 0, 0, 65535))
        elif num in offsets:
            rows.append(struct.pack(">B I H", 1, offsets[num], 0))
        elif num == xref_num:
            rows.append(struct.pack(">B I H", 1, xref_at, 0))
        else:
            rows.append(struct.pack(">B I H", 2, objstm_num, packed.index(num)))
    rowlen = 7
    # PNG up-predictor (tag 2) over the rows, exercising _undo_predictor
    pred_rows = bytearray()
    prev = bytes(rowlen)
    for r in rows:
        pred_rows.append(2)
        pred_rows.extend((r[i] - prev[i]) & 0xFF for i in range(rowlen))
        prev = r
    xref_data = zlib.compress(bytes(pred_rows), 6)
    emit_stream(
        xref_num,
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns %d >> "
        b"/W [1 4 2] /Size %d /Root 1 0 R /Info %d 0 R" % (rowlen, xref_num + 1, info_obj),
        xref_data,
        typ=b"/Type /XRef ",
    )
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
    return bytes(out)
