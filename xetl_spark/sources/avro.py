"""Pure-Python Avro Object Container File codec + ``xetl_avro`` Spark
Python DataSource.

The reference's capability class includes Avro sources/sinks; the
usual Spark route is the external ``spark-avro`` jar, absent in this
container. Same answer as the media codecs (PNG/WAV/Y4M): implement
the public format (Avro 1.11 spec) in pure Python against the binary
encoding — zigzag varints, length-prefixed bytes/strings, little-
endian IEEE floats, OCF header/blocks/sync-markers, null + deflate
codecs — and expose it through the Spark-4 Python DataSource API so
``spark.read.format("xetl_avro")`` is first-class.

Scope (typed errors beyond it, never wrong answers): record schemas of
primitive fields, nullable via ``[null, T]`` unions,
``timestamp-micros`` logical longs, enums (decoded to their symbol),
fixed, arrays/maps, and nested records on the READ side (decoded to
Spark structs; the writer stays flat). Multi-branch unions and
non-null/deflate codecs raise ``UnsupportedAvroError``.

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


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    """Zigzag-encoded variable-length long."""
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise AvroFormatError("truncated varint")
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
    if isinstance(sch, list):  # union — only [null, T] / [T, null]
        branches = [s for s in sch if s != "null"]
        if len(sch) > 2 or len(branches) != 1:
            raise UnsupportedAvroError(f"union {sch} beyond [null, T]")
        idx, pos = _read_long(buf, pos)
        if idx < 0 or idx >= len(sch):
            raise AvroFormatError("union branch out of range")
        if sch[idx] == "null":
            return None, pos
        return _decode_value(buf, pos, sch[idx])
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
    if codec not in ("null", "deflate"):
        raise UnsupportedAvroError(f"codec {codec!r}")
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise AvroFormatError("missing avro.schema header") from None
    if schema.get("type") != "record":
        raise UnsupportedAvroError("top-level schema must be a record")
    return schema, codec, sync, pos


def parse_schema(payload: bytes) -> dict:
    """Header-only parse → the record schema dict."""
    return _parse_header(payload)[0]


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
        if codec == "deflate":
            try:
                block = zlib.decompress(block, wbits=-15)
            except zlib.error as e:
                raise AvroFormatError(f"deflate block: {e}") from None
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


def encode_container(
    schema: dict, rows, codec: str = "deflate", sync: bytes | None = None
) -> bytes:
    """Rows (tuples in field order) + record schema → OCF bytes."""
    if codec not in ("null", "deflate"):
        raise UnsupportedAvroError(f"codec {codec!r}")
    sync = sync or os.urandom(16)
    if len(sync) != 16:
        raise AvroFormatError("sync marker must be 16 bytes")
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

    fields = schema["fields"]
    body = io.BytesIO()
    n = 0
    for row in rows:
        for f, v in zip(fields, row):
            _encode_value(body, v, f["type"])
        n += 1
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        block = comp.compress(block) + comp.flush()
    if n:
        _write_zigzag(out, n)
        _write_zigzag(out, len(block))
        out.write(block)
        out.write(sync)
    return out.getvalue()


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
        if len(branches) != 1:
            raise UnsupportedAvroError(f"union {sch}")
        return _field_ddl(branches[0])
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
    cols = [f.name for f in df.schema.fields]

    def emit(batches):
        import socket
        import uuid

        rows = []
        for pdf in batches:
            for t in pdf.itertuples(index=False):
                rows.append(
                    tuple(
                        None
                        if not isinstance(v, (list, dict, bytes, str))
                        and pd.isna(v)
                        else v
                        for v in t
                    )
                )
        fname = f"part-{uuid.uuid4().hex}-{socket.gethostname()}.avro"
        with open(os.path.join(path, fname), "wb") as fh:
            fh.write(encode_container(schema, rows, codec=codec))
        yield pd.DataFrame({"n": [len(rows)]})

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
            self.union_names = [
                f["name"] for f in _union_schema(_list(self.path))["fields"]
            ]

        def partitions(self):
            files = _list(self.path)
            if not files:
                raise AvroFormatError(f"no .avro files under {self.path}")
            return [_AvroFile(p) for p in files]

        def read(self, partition):
            with open(partition.path, "rb") as fh:
                sch, rows = parse_container(fh.read())
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
