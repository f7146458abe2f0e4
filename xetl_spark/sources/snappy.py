"""Pure-Python snappy raw-block codec (decompress + spec-valid
all-literal compress) for the Avro ``snappy`` codec.

Snappy is the most common Avro block codec in the wild; the usual
Spark route gets it from snappy-java inside the spark-avro jar, absent
here. The raw block format (github.com/google/snappy/format_description)
is small: a little-endian varint uncompressed-length preamble, then a
tag stream of literals and LZ77 back-references with 1/2/4-byte
offsets.

- ``decompress`` implements the full format (all four tag types,
  overlapping copies) — the read-side interop path for containers
  produced by real snappy writers. Throughput is Python-loop bound
  (compatibility, not a hot path; the engine's own sinks default to
  deflate — see SCALING.md's codec throughput contract).
- ``compress`` emits all-literal elements: zero compression but
  spec-valid output that any snappy reader (snappy-java, python-
  snappy) decodes, so round-trips and cross-system writes work.
  Validated against the JVM's snappy-java in tests.
"""

from __future__ import annotations


class SnappyError(ValueError):
    """Not a well-formed snappy raw block."""


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise SnappyError("truncated length preamble")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 35:
            raise SnappyError("length preamble overflow")


def decompress(buf: bytes) -> bytes:
    """Decode one snappy raw block (length preamble + element stream)."""
    n, pos = _read_uvarint(buf, 0)
    out = bytearray()
    end = len(buf)
    while pos < end:
        tag = buf[pos]
        pos += 1
        ttype = tag & 0x3
        if ttype == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # length in the next 1-4 bytes, little-endian
                nb = ln - 59
                if pos + nb > end:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > end:
                raise SnappyError("truncated literal")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= end:
                raise SnappyError("truncated copy offset")
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > end:
                raise SnappyError("truncated copy offset")
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > end:
                raise SnappyError("truncated copy offset")
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise SnappyError("copy offset out of range")
        src = len(out) - off
        if off >= ln:  # non-overlapping: one slice
            out += out[src : src + ln]
        else:  # overlapping run: byte-by-byte per the spec
            for i in range(ln):
                out.append(out[src + i])
    if len(out) != n:
        raise SnappyError(f"decoded {len(out)} bytes, preamble said {n}")
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Encode ``data`` as literal-only snappy (valid, uncompressed)."""
    out = bytearray()
    n = len(data)
    v = n
    while True:  # uncompressed-length uvarint
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            break
    pos = 0
    while pos < n:
        chunk = min(n - pos, 65536)
        ln = chunk - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 1 << 8:
            out.append(60 << 2)
            out += ln.to_bytes(1, "little")
        elif ln < 1 << 16:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        elif ln < 1 << 24:
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        else:
            out.append(63 << 2)
            out += ln.to_bytes(4, "little")
        out += data[pos : pos + chunk]
        pos += chunk
    return bytes(out)
