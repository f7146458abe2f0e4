"""Pure-Python Avro Object Container File codec + ``xetl_avro`` Spark
Python DataSource.

The reference's capability class includes Avro sources/sinks; the
usual Spark route is the external ``spark-avro`` jar, absent in this
container. Same answer as the media codecs (PNG/WAV/Y4M): implement
the public format (Avro 1.11 spec) in pure Python against the binary
encoding — zigzag varints, length-prefixed bytes/strings, little-
endian IEEE floats, OCF header/blocks/sync-markers, the full Avro 1.11
codec set (null/deflate/bzip2/xz from the stdlib, snappy via the
pure-Python raw-block codec in sources/snappy.py cross-validated
against snappy-java, zstandard via pyarrow's bundled libzstd) — and
expose it through the Spark-4 Python DataSource API so
``spark.read.format("xetl_avro")`` is first-class.

Scope (typed errors beyond it, never wrong answers): record schemas of
primitive fields, nullable via ``[null, T]`` unions,
``timestamp-micros`` logical longs, enums (decoded to their symbol),
fixed, arrays/maps, nested records, and multi-branch unions on the
READ side (decoded to Spark structs; unions follow the spark-avro
conventions — int|long → bigint, float|double → double, otherwise
struct<member0, member1, ...>; the writer stays flat, Spark having no
union type). A zstd frame whose writer omitted the content size
(streaming mode) raises ``UnsupportedAvroError`` rather than guessing
an allocation bound.

Scale shape: the reader is one InputPartition per .avro file (the
natural Avro split is the file/block, both self-delimiting via sync
markers), decoded executor-side — the driver touches only file
listings and the first header for schema inference. The writer runs
inside ``mapInPandas``: each Spark partition emits its own container
file with an independent random sync marker, so a 1000-executor write
is embarrassingly parallel.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from datetime import datetime, timedelta, timezone

MAGIC = b"Obj\x01"
_EPOCH = datetime(1970, 1, 1)


class UnsupportedAvroError(ValueError):
    """Valid Avro, but outside the implemented subset."""


class AvroFormatError(ValueError):
    """Not a well-formed Avro object container file."""


# ---------------------------------------------------------------- decoding


def _typed_decode(fn):
    """Translate schema/structure escapes on hostile bytes (KeyError /
    TypeError from a mutated avro.schema JSON, struct errors) into
    AvroFormatError; Unsupported/Format errors pass through."""
    import functools

    @functools.wraps(fn)
    def wrap(*a, **kw):
        try:
            return fn(*a, **kw)
        except (AvroFormatError, UnsupportedAvroError):
            raise
        except (KeyError, TypeError, AttributeError, IndexError, struct.error, OverflowError) as e:
            raise AvroFormatError(f"malformed container: {type(e).__name__}: {e}") from None

    return wrap




def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    """Zigzag-encoded variable-length long.

    Capped at 10 continuation bytes (the 64-bit zigzag maximum): an
    unbounded loop lets a hostile run of 0xFF bytes build an
    arbitrarily large Python int at quadratic cost before any typed
    error fires — a cheap CPU-DoS on the ingestion path.
    """
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise AvroFormatError("truncated varint")
        if shift > 63:
            raise AvroFormatError("varint exceeds 64-bit range")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise AvroFormatError("truncated bytes")
    return buf[pos : pos + n], pos + n


def _decode_value(buf: bytes, pos: int, sch) -> tuple[object, int]:
    """Decode one value of (sub)schema ``sch`` at ``pos``."""
    if isinstance(sch, list):  # union
        idx, pos = _read_long(buf, pos)
        if idx < 0 or idx >= len(sch):
            raise AvroFormatError("union branch out of range")
        branch = sch[idx]
        if branch == "null":
            return None, pos
        branches = [s for s in sch if s != "null"]
        if len(branches) == 1:  # nullable T
            return _decode_value(buf, pos, branch)
        # multi-branch: the spark-avro conventions — numeric promotions
        # collapse to the wider type; anything else renders as
        # struct<member0, member1, ...> with the taken branch set
        bset = set(b for b in branches if isinstance(b, str))
        if len(bset) == len(branches) and bset in ({"int", "long"}, {"float", "double"}):
            return _decode_value(buf, pos, branch)
        j = branches.index(branch)
        v, pos = _decode_value(buf, pos, branch)
        return {f"member{i}": (v if i == j else None) for i in range(len(branches))}, pos
    if isinstance(sch, dict):
        t = sch["type"]
        if t == "long" and sch.get("logicalType") == "timestamp-micros":
            us, pos = _read_long(buf, pos)
            return _EPOCH + timedelta(microseconds=us), pos
        if t == "int" and sch.get("logicalType") == "date":
            days, pos = _read_long(buf, pos)
            return (_EPOCH + timedelta(days=days)).date(), pos
        if t in ("bytes", "fixed") and sch.get("logicalType") == "decimal":
            from decimal import Decimal

            if t == "bytes":
                raw, pos = _read_bytes(buf, pos)
            else:
                n = sch["size"]
                if pos + n > len(buf):
                    # mirror the plain 'fixed' branch — a truncated
                    # container must fail loudly, not decode a short
                    # byte string into a silently-wrong Decimal
                    raise AvroFormatError("truncated fixed decimal")
                raw, pos = buf[pos : pos + n], pos + n
            unscaled = int.from_bytes(raw, "big", signed=True) if raw else 0
            return Decimal(unscaled).scaleb(-sch.get("scale", 0)), pos
        if t == "enum":
            idx, pos = _read_long(buf, pos)
            syms = sch["symbols"]
            if idx < 0 or idx >= len(syms):
                raise AvroFormatError("enum index out of range")
            return syms[idx], pos
        if t == "fixed":
            n = sch["size"]
            if pos + n > len(buf):
                raise AvroFormatError("truncated fixed")
            return buf[pos : pos + n], pos + n
        if t == "array":
            out = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    v, pos = _decode_value(buf, pos, sch["items"])
                    out.append(v)
        if t == "map":
            out = {}
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    k, pos = _decode_value(buf, pos, "string")
                    v, pos = _decode_value(buf, pos, sch["values"])
                    out[k] = v
        if t == "record":
            # nested record → dict keyed by field name (maps to a Spark
            # struct on read; the writer stays primitive-only)
            out = {}
            for f in sch["fields"]:
                out[f["name"]], pos = _decode_value(buf, pos, f["type"])
            return out, pos
        return _decode_value(buf, pos, t)  # {"type": "long"} wrapper form
    if sch == "null":
        return None, pos
    if sch == "boolean":
        if pos >= len(buf):
            raise AvroFormatError("truncated boolean")
        return buf[pos] == 1, pos + 1
    if sch in ("int", "long"):
        return _read_long(buf, pos)
    if sch == "float":
        if pos + 4 > len(buf):
            raise AvroFormatError("truncated float")
        return struct.unpack("<f", buf[pos : pos + 4])[0], pos + 4
    if sch == "double":
        if pos + 8 > len(buf):
            raise AvroFormatError("truncated double")
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if sch == "bytes":
        return _read_bytes(buf, pos)
    if sch == "string":
        raw, pos = _read_bytes(buf, pos)
        return raw.decode("utf-8"), pos
    raise UnsupportedAvroError(f"type {sch!r}")


def _parse_header(payload: bytes):
    """OCF header → (schema_dict, codec, sync, body_pos). Cheap: never
    touches data blocks, so driver-side schema inference doesn't pay
    for decode."""
    if payload[:4] != MAGIC:
        raise AvroFormatError("bad magic (not an Avro object container)")
    pos = 4
    meta = {}
    while True:
        n, pos = _read_long(payload, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(payload, pos)
        for _ in range(n):
            k, pos = _read_bytes(payload, pos)
            v, pos = _read_bytes(payload, pos)
            meta[k.decode("utf-8")] = v
    sync = payload[pos : pos + 16]
    if len(sync) != 16:
        raise AvroFormatError("truncated sync marker")
    pos += 16
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz", "zstandard"):
        raise UnsupportedAvroError(f"codec {codec!r}")
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise AvroFormatError("missing avro.schema header") from None
    if schema.get("type") != "record":
        raise UnsupportedAvroError("top-level schema must be a record")
    return schema, codec, sync, pos


@_typed_decode
def parse_schema(payload: bytes) -> dict:
    """Header-only parse → the record schema dict."""
    return _parse_header(payload)[0]


@_typed_decode
def parse_container(payload: bytes):
    """Decode a full OCF → (schema_dict, list-of-row-tuples).

    Rows come back as tuples in schema field order. Raises
    AvroFormatError for malformed containers, UnsupportedAvroError for
    valid Avro outside the subset (e.g. snappy codec, nested records).
    """
    schema, codec, sync, pos = _parse_header(payload)
    fields = schema["fields"]

    rows = []
    while pos < len(payload):
        count, pos = _read_long(payload, pos)
        size, pos = _read_long(payload, pos)
        if size < 0 or pos + size > len(payload):
            raise AvroFormatError("block overruns payload")
        block = payload[pos : pos + size]
        pos += size
        if payload[pos : pos + 16] != sync:
            raise AvroFormatError("sync marker mismatch")
        pos += 16
        block = _decompress_block(block, codec)
        bpos = 0
        for _ in range(count):
            row = []
            for f in fields:
                v, bpos = _decode_value(block, bpos, f["type"])
                row.append(v)
            rows.append(tuple(row))
        if bpos != len(block):
            raise AvroFormatError("trailing bytes in block")
    return schema, rows


# ---------------------------------------------------------------- encoding


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else (v << 1) ^ (v >> 63)  # zigzag
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_zigzag(out: io.BytesIO, v: int) -> None:
    _write_long(out, v)


def _encode_value(out: io.BytesIO, v, sch) -> None:
    if isinstance(sch, list):
        branches = [s for s in sch if s != "null"]
        if len(sch) > 2 or len(branches) != 1:
            raise UnsupportedAvroError(f"union {sch} beyond [null, T]")
        if v is None:
            _write_zigzag(out, sch.index("null"))
            return
        _write_zigzag(out, sch.index(branches[0]))
        _encode_value(out, v, branches[0])
        return
    if isinstance(sch, dict):
        t = sch["type"]
        if t == "long" and sch.get("logicalType") == "timestamp-micros":
            if isinstance(v, datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(timezone.utc).replace(tzinfo=None)
                v = (v - _EPOCH) // timedelta(microseconds=1)
            _write_zigzag(out, int(v))
            return
        if t == "int" and sch.get("logicalType") == "date":
            from datetime import date

            if isinstance(v, datetime):
                v = v.date()
            if isinstance(v, date):
                v = (v - _EPOCH.date()).days
            _write_zigzag(out, int(v))
            return
        if t == "bytes" and sch.get("logicalType") == "decimal":
            from decimal import Decimal

            unscaled = int(
                Decimal(str(v)).scaleb(sch.get("scale", 0)).to_integral_value()
            )
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(nbytes, "big", signed=True)
            _write_zigzag(out, len(raw))
            out.write(raw)
            return
        raise UnsupportedAvroError(f"encoder for {sch!r}")
    if sch == "null":
        return
    if sch == "boolean":
        out.write(b"\x01" if v else b"\x00")
        return
    if sch in ("int", "long"):
        _write_zigzag(out, int(v))
        return
    if sch == "float":
        out.write(struct.pack("<f", float(v)))
        return
    if sch == "double":
        out.write(struct.pack("<d", float(v)))
        return
    if sch == "bytes":
        raw = bytes(v)
        _write_zigzag(out, len(raw))
        out.write(raw)
        return
    if sch == "string":
        raw = str(v).encode("utf-8")
        _write_zigzag(out, len(raw))
        out.write(raw)
        return
    raise UnsupportedAvroError(f"encoder for {sch!r}")


def _container_header(schema: dict, codec: str, sync: bytes) -> bytes:
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_zigzag(out, len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        _write_zigzag(out, len(kb))
        out.write(kb)
        _write_zigzag(out, len(v))
        out.write(v)
    _write_zigzag(out, 0)
    out.write(sync)
    return out.getvalue()


# cap on a zstd frame's DECLARED content size: a hostile frame header
# claiming 2^60 bytes must fail typed before any allocation
_ZSTD_MAX_BLOCK = 1 << 30


def _zstd_content_size(b: bytes) -> int | None:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1),
    None when the writer omitted it (streaming mode)."""
    if len(b) < 6 or b[:4] != b"\x28\xb5\x2f\xfd":
        return None
    fhd = b[4]
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    pos = 5
    if not single:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[fhd & 3]  # dictionary id
    try:
        if fcs_flag == 0:
            return b[pos] if single else None
        if fcs_flag == 1:
            return struct.unpack_from("<H", b, pos)[0] + 256
        if fcs_flag == 2:
            return struct.unpack_from("<I", b, pos)[0]
        return struct.unpack_from("<Q", b, pos)[0]
    except (struct.error, IndexError):
        raise AvroFormatError("truncated zstd frame header") from None


def _compress_block(block: bytes, codec: str) -> bytes:
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        return comp.compress(block) + comp.flush()
    if codec == "snappy":
        from xetl_spark.sources import snappy

        # Avro snappy framing: raw snappy block + big-endian CRC32 of
        # the UNCOMPRESSED data (Avro spec, snappy codec)
        return snappy.compress(block) + struct.pack(
            ">I", zlib.crc32(block) & 0xFFFFFFFF
        )
    if codec == "bzip2":
        import bz2

        return bz2.compress(block)
    if codec == "xz":
        import lzma

        return lzma.compress(block, format=lzma.FORMAT_XZ)
    if codec == "zstandard":
        # pyarrow bundles libzstd; its simple-compress API writes the
        # frame content size, which the reader requires (see below)
        import pyarrow as pa

        return bytes(pa.Codec("zstd").compress(block))
    return block


def _decompress_block(block: bytes, codec: str) -> bytes:
    if codec == "deflate":
        try:
            return zlib.decompress(block, wbits=-15)
        except zlib.error as e:
            raise AvroFormatError(f"deflate block: {e}") from None
    if codec == "snappy":
        from xetl_spark.sources import snappy

        if len(block) < 4:
            raise AvroFormatError("snappy block missing CRC suffix")
        body, crc = block[:-4], struct.unpack(">I", block[-4:])[0]
        try:
            out = snappy.decompress(body)
        except snappy.SnappyError as e:
            raise AvroFormatError(f"snappy block: {e}") from None
        if zlib.crc32(out) & 0xFFFFFFFF != crc:
            raise AvroFormatError("snappy block CRC mismatch")
        return out
    if codec == "bzip2":
        import bz2

        try:
            return bz2.decompress(block)
        except (OSError, ValueError) as e:
            raise AvroFormatError(f"bzip2 block: {e}") from None
    if codec == "xz":
        import lzma

        try:
            return lzma.decompress(block, format=lzma.FORMAT_XZ)
        except lzma.LZMAError as e:
            raise AvroFormatError(f"xz block: {e}") from None
    if codec == "zstandard":
        import pyarrow as pa

        size = _zstd_content_size(block)
        if size is None:
            # content size is optional in the frame format but written
            # by every one-shot compressor (zstd-jni, libzstd simple
            # API, pyarrow); a streaming-mode frame without it can't be
            # sized safely here
            raise UnsupportedAvroError(
                "zstd frame without content size (streaming-mode writer)"
            )
        if size > _ZSTD_MAX_BLOCK:
            raise AvroFormatError(f"zstd block claims {size} bytes")
        try:
            return bytes(pa.Codec("zstd").decompress(block, decompressed_size=size))
        except (OSError, ValueError, pa.lib.ArrowException) as e:
            raise AvroFormatError(f"zstd block: {e}") from None
    return block


def _frame_block(n: int, block: bytes, codec: str, sync: bytes) -> bytes:
    """count + size + (possibly compressed) body + sync marker."""
    block = _compress_block(block, codec)
    out = io.BytesIO()
    _write_zigzag(out, n)
    _write_zigzag(out, len(block))
    out.write(block)
    out.write(sync)
    return out.getvalue()


def encode_container(
    schema: dict, rows, codec: str = "deflate", sync: bytes | None = None
) -> bytes:
    """Rows (tuples in field order) + record schema → OCF bytes."""
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz", "zstandard"):
        raise UnsupportedAvroError(f"codec {codec!r}")
    sync = sync or os.urandom(16)
    if len(sync) != 16:
        raise AvroFormatError("sync marker must be 16 bytes")
    out = io.BytesIO()
    out.write(_container_header(schema, codec, sync))

    fields = schema["fields"]
    body = io.BytesIO()
    n = 0
    for row in rows:
        for f, v in zip(fields, row):
            _encode_value(body, v, f["type"])
        n += 1
    block = _compress_block(body.getvalue(), codec)
    if n:
        _write_zigzag(out, n)
        _write_zigzag(out, len(block))
        out.write(block)
        out.write(sync)
    return out.getvalue()


# ------------------------------------------- vectorized flat-schema codec
#
# The generic recursive codec above is the compatibility path (~1 MB/s
# per core — fine for exotic schemas, measured in SCALING.md). Flat
# records of nullable primitives — the overwhelmingly common OCF shape,
# and the only shape write_avro itself emits — go through a vectorized
# fast path instead: encode assembles each block with numpy scatter
# writes (one pass per byte position, no per-value Python), decode runs
# a compiled flat loop into columnar buffers and hands Spark pyarrow
# RecordBatches (no per-row pickling through the DataSource bridge).

_K_LONG, _K_INT, _K_BOOL, _K_FLOAT, _K_DOUBLE = 0, 1, 2, 3, 4
_K_STRING, _K_BYTES, _K_TS, _K_DATE = 5, 6, 7, 8

_KIND_OF = {
    "long": _K_LONG,
    "int": _K_INT,
    "boolean": _K_BOOL,
    "float": _K_FLOAT,
    "double": _K_DOUBLE,
    "string": _K_STRING,
    "bytes": _K_BYTES,
}


def _flat_kinds(schema: dict):
    """(name, kind, nullable) per field if every field is a primitive /
    [null, primitive] (incl. timestamp-micros, date); else None —
    caller falls back to the generic recursive codec."""
    out = []
    for f in schema["fields"]:
        sch = f["type"]
        nullable = False
        if isinstance(sch, list):
            branches = [s for s in sch if s != "null"]
            if len(sch) != 2 or len(branches) != 1:
                return None
            sch, nullable = branches[0], True
        if isinstance(sch, dict):
            if sch["type"] == "long" and sch.get("logicalType") == "timestamp-micros":
                kind = _K_TS
            elif sch["type"] == "int" and sch.get("logicalType") == "date":
                kind = _K_DATE
            else:
                return None
        else:
            kind = _KIND_OF.get(sch)
            if kind is None:
                return None
        out.append((f["name"], kind, nullable))
    return out


def _arrow_type(kind: int):
    import pyarrow as pa

    return {
        _K_LONG: pa.int64(),
        _K_INT: pa.int32(),
        _K_BOOL: pa.bool_(),
        _K_FLOAT: pa.float32(),
        _K_DOUBLE: pa.float64(),
        _K_STRING: pa.string(),
        _K_BYTES: pa.binary(),
        _K_TS: pa.timestamp("us"),
        _K_DATE: pa.date32(),
    }[kind]


def _decode_block_flat(block: bytes, count: int, kinds) -> list[list]:
    """Decode one uncompressed block body into per-field value lists.

    A single flat loop with local-variable dispatch: no recursion, no
    per-value tuple returns, and temporal values stay raw ints (Arrow
    applies the logical type) — ~4× the generic path, still exact."""
    cols: list[list] = [[] for _ in kinds]
    pos = 0
    n = len(block)
    u_d = struct.Struct("<d").unpack_from
    u_f = struct.Struct("<f").unpack_from
    for _ in range(count):
        for ci, (_, kind, nullable) in enumerate(kinds):
            if nullable:
                if pos >= n:
                    raise AvroFormatError("truncated union tag")
                tag = block[pos]
                pos += 1
                if tag == 0:
                    cols[ci].append(None)
                    continue
                if tag != 2:
                    raise AvroFormatError("union branch out of range")
            if kind <= _K_INT or kind >= _K_TS:  # varint long/int/ts/date
                if pos >= n:
                    raise AvroFormatError("truncated varint")
                acc = block[pos]
                pos += 1
                if acc & 0x80:
                    acc &= 0x7F
                    shift = 7
                    while True:
                        if pos >= n:
                            raise AvroFormatError("truncated varint")
                        if shift > 63:
                            raise AvroFormatError("varint exceeds 64-bit range")
                        b = block[pos]
                        pos += 1
                        acc |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                cols[ci].append((acc >> 1) ^ -(acc & 1))
            elif kind == _K_DOUBLE:
                if pos + 8 > n:
                    raise AvroFormatError("truncated double")
                cols[ci].append(u_d(block, pos)[0])
                pos += 8
            elif kind == _K_FLOAT:
                if pos + 4 > n:
                    raise AvroFormatError("truncated float")
                cols[ci].append(u_f(block, pos)[0])
                pos += 4
            elif kind == _K_BOOL:
                if pos >= n:
                    raise AvroFormatError("truncated boolean")
                cols[ci].append(block[pos] == 1)
                pos += 1
            else:  # string / bytes: varint length + payload
                if pos >= n:
                    raise AvroFormatError("truncated varint")
                acc = block[pos]
                pos += 1
                if acc & 0x80:
                    acc &= 0x7F
                    shift = 7
                    while True:
                        if pos >= n:
                            raise AvroFormatError("truncated varint")
                        if shift > 63:
                            raise AvroFormatError("varint exceeds 64-bit range")
                        b = block[pos]
                        pos += 1
                        acc |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                ln = (acc >> 1) ^ -(acc & 1)
                if ln < 0 or pos + ln > n:
                    raise AvroFormatError("truncated bytes")
                raw = block[pos : pos + ln]
                pos += ln
                cols[ci].append(raw.decode("utf-8") if kind == _K_STRING else raw)
    if pos != n:
        raise AvroFormatError("trailing bytes in block")
    return cols


@_typed_decode
def iter_arrow_batches(payload: bytes, kinds=None):
    """Decode an OCF into pyarrow RecordBatches (flat schemas only —
    raises UnsupportedAvroError otherwise; callers that can fall back
    should check _flat_kinds first). One batch per Avro block."""
    import pyarrow as pa

    schema, codec, sync, pos = _parse_header(payload)
    kinds = kinds if kinds is not None else _flat_kinds(schema)
    if kinds is None:
        raise UnsupportedAvroError("non-flat schema has no Arrow fast path")
    arrow_schema = pa.schema([(nm, _arrow_type(k)) for nm, k, _ in kinds])
    while pos < len(payload):
        count, pos = _read_long(payload, pos)
        size, pos = _read_long(payload, pos)
        if count < 0 or size < 0 or pos + size > len(payload):
            raise AvroFormatError("block overruns payload")
        block = payload[pos : pos + size]
        pos += size
        if payload[pos : pos + 16] != sync:
            raise AvroFormatError("sync marker mismatch")
        pos += 16
        block = _decompress_block(block, codec)
        cols = _decode_block_flat(block, count, kinds)
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, type=_arrow_type(k)) for c, (_, k, _) in zip(cols, kinds)],
            schema=arrow_schema,
        )


def _np_varint_scatter(out, starts, z, lens) -> None:
    """Scatter zigzagged uint64 values as varints: one vectorized pass
    per byte position instead of per value."""
    import numpy as np

    for j in range(int(lens.max()) if len(lens) else 0):
        m = lens > j
        b = ((z[m] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        b[lens[m] - 1 > j] |= 0x80
        out[starts[m] + j] = b


def _np_encode_block(pdf, kinds) -> bytes:
    """Vectorized encode of one pandas batch under a flat all-nullable
    schema (write_avro always emits [null, T] fields): compute every
    field's per-row byte length, prefix-sum the layout, then scatter
    tags / varints / fixed-width bytes / string payloads columnwise
    into one preallocated buffer."""
    import numpy as np
    import pandas as pd

    n = len(pdf)
    if n == 0:
        return b""
    prepped = []  # (kind, nulls, payload-specific data, per-row value lens)
    for name, kind, _ in kinds:
        col = pdf[name]
        nulls = col.isna().to_numpy(dtype=bool)
        if kind in (_K_LONG, _K_INT, _K_TS, _K_DATE):
            if kind == _K_TS:
                vals = (
                    pd.to_datetime(col)
                    .astype("datetime64[us]")
                    .astype("int64")
                    .to_numpy()
                )
            elif kind == _K_DATE:
                vals = (
                    pd.to_datetime(col)
                    .to_numpy()
                    .astype("datetime64[D]")
                    .astype("int64")
                )
            else:
                vals = col.where(~nulls, 0).to_numpy(dtype=np.int64)
            vals = np.where(nulls, 0, vals)
            u = vals.astype(np.uint64)
            z = (u << np.uint64(1)) ^ np.where(
                vals < 0, np.uint64(2**64 - 1), np.uint64(0)
            )
            vlens = np.ones(n, dtype=np.int64)
            for k in range(1, 10):
                vlens += z >= np.uint64(1 << (7 * k))
            prepped.append((kind, nulls, z, np.where(nulls, 0, vlens)))
        elif kind in (_K_DOUBLE, _K_FLOAT):
            width = 8 if kind == _K_DOUBLE else 4
            dt = "<f8" if kind == _K_DOUBLE else "<f4"
            vals = col.where(~nulls, 0.0).astype("float64").to_numpy().astype(dt)
            bmat = vals.view(np.uint8).reshape(n, width)
            prepped.append((kind, nulls, bmat, np.where(nulls, 0, width)))
        elif kind == _K_BOOL:
            vals = col.where(~nulls, False).to_numpy(dtype=bool).astype(np.uint8)
            prepped.append((kind, nulls, vals, np.where(nulls, 0, 1)))
        else:  # string / bytes
            enc = [
                b""
                if (v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)))
                else (v.encode("utf-8") if isinstance(v, str) else bytes(v))
                for v in col
            ]
            slens = np.fromiter(map(len, enc), dtype=np.int64, count=n)
            slens = np.where(nulls, 0, slens)
            u = slens.astype(np.uint64)
            z = u << np.uint64(1)  # lengths are non-negative
            plens = np.ones(n, dtype=np.int64)
            for k in range(1, 10):
                plens += z >= np.uint64(1 << (7 * k))
            vlens = np.where(nulls, 0, plens + slens)
            prepped.append((kind, nulls, (z, plens, slens, enc), vlens))

    field_lens = [1 + p[3] for p in prepped]  # +1: union tag byte
    row_lens = np.sum(field_lens, axis=0)
    row_starts = np.concatenate(([0], np.cumsum(row_lens)[:-1]))
    out = np.zeros(int(row_lens.sum()), dtype=np.uint8)

    off = row_starts
    for (kind, nulls, data, vlens), flens in zip(prepped, field_lens):
        out[off] = np.where(nulls, 0, 2)  # zigzag union index: null=0, T=1
        vstarts = off + 1
        live = ~nulls
        if kind in (_K_LONG, _K_INT, _K_TS, _K_DATE):
            _np_varint_scatter(out, vstarts[live], data[live], vlens[live])
        elif kind in (_K_DOUBLE, _K_FLOAT):
            width = 8 if kind == _K_DOUBLE else 4
            for j in range(width):
                out[vstarts[live] + j] = data[live, j]
        elif kind == _K_BOOL:
            out[vstarts[live]] = data[live]
        else:
            z, plens, slens, enc = data
            _np_varint_scatter(out, vstarts[live], z[live], plens[live])
            blob = b"".join(enc)
            if blob:
                cstarts = vstarts + plens
                total = int(slens.sum())
                within = np.arange(total) - np.repeat(
                    np.concatenate(([0], np.cumsum(slens)[:-1])), slens
                )
                out[np.repeat(cstarts, slens) + within] = np.frombuffer(
                    blob, dtype=np.uint8
                )
        off = off + flens
    return out.tobytes()


# ------------------------------------------------------- Spark integration

_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _field_ddl(sch) -> str:
    if isinstance(sch, list):
        branches = [s for s in sch if s != "null"]
        if len(branches) == 1:
            return _field_ddl(branches[0])
        if not branches:
            raise UnsupportedAvroError(f"union {sch}")
        bset = set(b for b in branches if isinstance(b, str))
        if len(bset) == len(branches) and bset in ({"int", "long"}, {"float", "double"}):
            return "bigint" if "long" in bset else "double"
        inner = ", ".join(
            f"member{i}: {_field_ddl(b)}" for i, b in enumerate(branches)
        )
        return f"struct<{inner}>"
    if isinstance(sch, dict):
        if sch["type"] == "long" and sch.get("logicalType") == "timestamp-micros":
            return "timestamp_ntz"
        if sch["type"] == "int" and sch.get("logicalType") == "date":
            return "date"
        if sch["type"] in ("bytes", "fixed") and sch.get("logicalType") == "decimal":
            return f"decimal({sch.get('precision', 38)},{sch.get('scale', 0)})"
        if sch["type"] == "enum":
            return "string"
        if sch["type"] == "fixed":
            return "binary"
        if sch["type"] == "array":
            return f"array<{_field_ddl(sch['items'])}>"
        if sch["type"] == "map":
            return f"map<string,{_field_ddl(sch['values'])}>"
        if sch["type"] == "record":
            inner = ", ".join(
                f"{f['name']}: {_field_ddl(f['type'])}" for f in sch["fields"]
            )
            return f"struct<{inner}>"
        return _field_ddl(sch["type"])
    try:
        return _AVRO_TO_SPARK[sch]
    except KeyError:
        raise UnsupportedAvroError(f"type {sch!r}") from None


def schema_to_ddl(schema: dict) -> str:
    return ", ".join(f"{f['name']} {_field_ddl(f['type'])}" for f in schema["fields"])


def _spark_type_to_avro(dt) -> object:
    """Spark DataType → (nullable-union) Avro schema fragment."""
    from pyspark.sql import types as T

    mapping = {
        T.BooleanType: "boolean",
        T.IntegerType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.BinaryType: "bytes",
        T.StringType: "string",
    }
    for cls, name in mapping.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    raise UnsupportedAvroError(f"no Avro encoding for Spark type {dt}")


def df_avro_schema(df, name: str = "row") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", _spark_type_to_avro(f.dataType)]}
            for f in df.schema.fields
        ],
    }


def write_avro(df, path: str, codec: str = "deflate") -> int:
    """Write ``df`` as one Avro container file per Spark partition under
    ``path`` (shared FS assumed, as for any sink). Executor-side: each
    partition encodes independently with its own sync marker; the
    driver only creates the directory. Returns the row count written.

    Known coercion: a floating-point ``NaN`` is written as Avro
    ``null``. Spark distinguishes NaN from null, but the mapInPandas
    bridge renders BOTH as pandas ``NaN`` in a float64 column, so the
    distinction is unrecoverable here; null is the conservative choice
    (round-tripping null→NaN would invent values). Pipelines that must
    preserve NaN should encode it explicitly (e.g. nanvl/flag column)
    before this sink."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    schema = df_avro_schema(df)

    def emit(batches):
        import socket
        import uuid

        kinds = _flat_kinds(schema)  # always flat for df_avro_schema output
        sync = os.urandom(16)
        n_total = 0
        fname = f"part-{uuid.uuid4().hex}-{socket.gethostname()}.avro"
        with open(os.path.join(path, fname), "wb") as fh:
            fh.write(_container_header(schema, codec, sync))
            # one OCF block per Arrow batch: the vectorized encoder works
            # columnwise and memory stays bounded by the batch size
            for pdf in batches:
                if not len(pdf):
                    continue
                if kinds is not None:
                    block = _np_encode_block(pdf, kinds)
                else:  # exotic type slipped through: generic row path
                    body = io.BytesIO()
                    for t in pdf.itertuples(index=False):
                        for f, v in zip(schema["fields"], t):
                            if (
                                not isinstance(v, (list, dict, bytes, str))
                                and pd.isna(v)
                            ):
                                v = None
                            _encode_value(body, v, f["type"])
                    block = body.getvalue()
                fh.write(_frame_block(len(pdf), block, codec, sync))
                n_total += len(pdf)
        yield pd.DataFrame({"n": [n_total]})

    stats = df.mapInPandas(emit, schema="n long")
    from pyspark.sql import functions as F

    return stats.agg(F.sum("n")).collect()[0][0] or 0


def register_avro_datasource(spark) -> None:
    """Register ``xetl_avro`` for ``spark.read.format("xetl_avro")``.

    One InputPartition per .avro file; schema inferred driver-side from
    the first file's header, rows decoded executor-side."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _AvroFile(InputPartition):
        def __init__(self, path: str):
            self.path = path

    def _list(path: str) -> list[str]:
        if os.path.isdir(path):
            return sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".avro")
            )
        return [path]

    def _union_schema(files: list[str]) -> dict:
        """Schema evolution on read: union fields by NAME across all
        files' headers (first-seen order), so old files null-fill
        columns later files added — the mergeSchema contract parquet
        users expect. Conflicting types for one name are a typed error,
        not a silent coercion. Header-only parses; no block decode."""
        fields: dict[str, object] = {}
        for p in files:
            with open(p, "rb") as fh:
                sch = parse_schema(fh.read())
            for f in sch["fields"]:
                ddl = _field_ddl(f["type"])
                prev = fields.get(f["name"])
                if prev is None:
                    fields[f["name"]] = (f["type"], ddl)
                elif prev[1] != ddl:
                    raise UnsupportedAvroError(
                        f"field {f['name']!r} has conflicting types "
                        f"{prev[1]} vs {ddl} across files"
                    )
        return {
            "type": "record",
            "name": "union",
            "fields": [{"name": n, "type": t} for n, (t, _) in fields.items()],
        }

    class _AvroReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise AvroFormatError("xetl_avro requires a path option")
            union = _union_schema(_list(self.path))
            self.union_names = [f["name"] for f in union["fields"]]
            # flat union ⇒ every file's fields are flat primitives too;
            # those partitions stream pyarrow RecordBatches to Spark
            # (no per-row pickling). Exotic schemas keep the tuple path.
            self.union_kinds = _flat_kinds(union)

        def partitions(self):
            files = _list(self.path)
            if not files:
                raise AvroFormatError(f"no .avro files under {self.path}")
            return [_AvroFile(p) for p in files]

        def read(self, partition):
            with open(partition.path, "rb") as fh:
                payload = fh.read()
            if self.union_kinds is not None:
                yield from self._read_arrow(payload)
                return
            sch, rows = parse_container(payload)
            own = [f["name"] for f in sch["fields"]]
            if own == self.union_names:
                yield from rows
                return
            # project this file's fields into the union order, None-
            # filling columns this file predates
            idx = {n: i for i, n in enumerate(own)}
            slots = [idx.get(n) for n in self.union_names]
            for r in rows:
                yield tuple(None if i is None else r[i] for i in slots)

        def _read_arrow(self, payload: bytes):
            import pyarrow as pa

            own_names = [f["name"] for f in parse_schema(payload)["fields"]]
            kind_of = {nm: k for nm, k, _ in self.union_kinds}
            for batch in iter_arrow_batches(payload):
                if own_names == self.union_names:
                    yield batch
                    continue
                present = set(own_names)
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column(nm)
                        if nm in present
                        else pa.nulls(batch.num_rows, _arrow_type(kind_of[nm]))
                        for nm in self.union_names
                    ],
                    names=self.union_names,
                )

    class AvroDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "xetl_avro"

        def schema(self):
            files = _list(self.options.get("path", ""))
            if not files:
                raise AvroFormatError("no .avro files to infer schema from")
            return schema_to_ddl(_union_schema(files))

        def reader(self, schema):  # noqa: ANN001
            return _AvroReader(self.options)

    spark.dataSource.register(AvroDataSource)
