"""Pure-Python Avro OCF codec + xetl_avro DataSource tests: binary
format pinning (hand-built golden bytes), roundtrips across types and
codecs, error paths, and the Spark read/write path."""

import struct

import pytest

from xetl_spark.sources.avro import (
    AvroFormatError,
    UnsupportedAvroError,
    encode_container,
    parse_container,
    parse_schema,
    schema_to_ddl,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "raw", "type": ["null", "bytes"]},
        {
            "name": "ts",
            "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
        },
    ],
}


def _zz(v: int) -> bytes:
    """Reference zigzag varint encoder, written independently of the
    module under test so the golden test pins the wire format."""
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_golden_container_bytes_decode():
    """A container assembled byte-by-byte from the Avro spec (magic,
    meta map, sync, block framing, zigzag values) decodes to exactly
    the intended rows — pins wire-format compliance, not just
    self-consistency."""
    import json

    schema = {
        "type": "record",
        "name": "g",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    sj = json.dumps(schema).encode()
    sync = bytes(range(16))
    body = _zz(-3) + _zz(2) + b"hi" + _zz(150) + _zz(0) + b""
    payload = (
        b"Obj\x01"
        + _zz(2)
        + _zz(11) + b"avro.schema" + _zz(len(sj)) + sj
        + _zz(10) + b"avro.codec" + _zz(4) + b"null"
        + _zz(0)
        + sync
        + _zz(2)  # 2 records in block
        + _zz(len(body))
        + body
        + sync
    )
    sch, rows = parse_container(payload)
    assert sch == schema
    assert rows == [(-3, "hi"), (150, "")]


def test_roundtrip_all_types_and_codecs():
    from datetime import datetime

    rows = [
        (1, "héllo", 3.25, b"\x00\xff", datetime(2024, 3, 1, 12, 30, 15, 123456)),
        (None, None, None, None, None),
        (-(2**40), "", -0.0, b"", datetime(1969, 12, 31, 23, 59, 59, 999999)),
    ]
    for codec in ("null", "deflate"):
        payload = encode_container(SCHEMA, rows, codec=codec)
        sch, back = parse_container(payload)
        assert sch == SCHEMA and back == rows, codec
    assert parse_schema(payload) == SCHEMA
    assert (
        schema_to_ddl(SCHEMA)
        == "i bigint, s string, d double, raw binary, ts timestamp_ntz"
    )


def test_float_and_ieee_bit_exactness():
    schema = {
        "type": "record",
        "name": "f",
        "fields": [{"name": "x", "type": "float"}, {"name": "y", "type": "double"}],
    }
    vals = [(struct.unpack("<f", struct.pack("<f", 0.1))[0], 0.1), (float("inf"), -0.0)]
    _, back = parse_container(encode_container(schema, vals, codec="null"))
    assert back == vals


def test_error_paths():
    with pytest.raises(AvroFormatError):
        parse_container(b"NOTAVRO")
    ok = encode_container(SCHEMA, [(1, "x", 1.0, b"", None)])
    with pytest.raises(AvroFormatError):
        parse_container(ok[:40])  # truncated mid-header/sync
    # corrupt the sync marker of the data block
    bad = ok[:-16] + bytes(16)
    with pytest.raises(AvroFormatError):
        parse_container(bad)
    with pytest.raises(UnsupportedAvroError):
        encode_container(SCHEMA, [], codec="lz4")  # not an Avro 1.11 codec


def test_nested_record_decodes_to_struct():
    """Nested records decode to dicts (→ Spark structs) with the right
    DDL; pins the read-side nesting support the writer doesn't need."""
    import json

    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "geo",
                "type": {
                    "type": "record",
                    "name": "g",
                    "fields": [
                        {"name": "lat", "type": "double"},
                        {"name": "lon", "type": "double"},
                    ],
                },
            },
        ],
    }
    sj = json.dumps(schema).encode()
    sync = bytes(range(16))
    body = _zz(7) + struct.pack("<d", 1.5) + struct.pack("<d", -2.5)
    payload = (
        b"Obj\x01"
        + _zz(1)
        + _zz(11) + b"avro.schema" + _zz(len(sj)) + sj
        + _zz(0)
        + sync
        + _zz(1) + _zz(len(body)) + body + sync
    )
    sch, rows = parse_container(payload)
    assert rows == [(7, {"lat": 1.5, "lon": -2.5})]
    assert schema_to_ddl(sch) == "k bigint, geo struct<lat: double, lon: double>"


def test_spark_write_read_roundtrip(spark, tmp_path):
    """write_avro (per-partition containers, executor-side) →
    xetl_avro DataSource read-back preserves values, NULLs, and
    timestamps; repartitioned input produces multiple files."""
    from pyspark.sql import functions as F

    from xetl_spark.sources.avro import register_avro_datasource, write_avro

    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id")))
        .alias("s"),
        (F.col("id") * 1.5).alias("v"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    ).repartition(4)
    dest = str(tmp_path / "avro_out")
    n = write_avro(df, dest, codec="deflate")
    assert n == 200
    import os

    assert len([f for f in os.listdir(dest) if f.endswith(".avro")]) == 4
    register_avro_datasource(spark)
    back = spark.read.format("xetl_avro").option("path", dest).load()
    a = sorted(
        map(
            tuple,
            df.withColumn("ts", F.col("ts").cast("timestamp_ntz")).collect(),
        )
    )
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_avro_tasks_roundtrip(spark, tmp_path):
    """Declarative write_avro → read_avro stages roundtrip through a
    manifest (the jar-free Avro surface at the YAML layer)."""
    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    src = tmp_path / "src"
    spark.range(50).selectExpr("id", "concat('n', id) AS name").write.parquet(
        str(src)
    )
    job = Job.from_yaml(
        f"""
        name: avro-rt
        data: {tmp_path}
        commands:
          - {{name: rows, task: read_parquet, env: {{PATH: {src}}}}}
          - {{name: sunk, task: write_avro, env: {{PATH: {tmp_path}/av}}}}
          - {{name: back, task: read_avro, env: {{PATH: {tmp_path}/av, DEPENDS_ON: sunk}}}}
        """,
        basedir=str(tmp_path),
    )
    results = run_job(spark, job)
    assert [r.status for r in results] == ["success"] * 3
    back = results[-1].output
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, results[0].output.collect())
    )


def test_avro_schema_evolution_union_by_name(spark, tmp_path):
    """Files with differing schemas read as the by-name union: old
    files null-fill later-added columns; a type conflict on one name
    is a typed error, not a coercion."""
    import os

    from xetl_spark.sources.avro import (
        UnsupportedAvroError,
        encode_container,
        register_avro_datasource,
    )

    dest = tmp_path / "evolve"
    os.makedirs(dest)
    v1 = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": ["null", "long"]}],
    }
    v2 = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "tag", "type": ["null", "string"]},
        ],
    }
    (dest / "a_v1.avro").write_bytes(encode_container(v1, [(1,), (2,)]))
    (dest / "b_v2.avro").write_bytes(encode_container(v2, [(3, "x")]))
    register_avro_datasource(spark)
    back = spark.read.format("xetl_avro").option("path", str(dest)).load()
    assert back.columns == ["id", "tag"]
    assert sorted(map(tuple, back.collect())) == [(1, None), (2, None), (3, "x")]

    bad = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "tag", "type": ["null", "long"]}],  # conflicts
    }
    (dest / "c_bad.avro").write_bytes(encode_container(bad, [(9,)]))
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        spark.read.format("xetl_avro").option("path", str(dest)).load().collect()
    assert "conflicting types" in str(ei.value)


def test_avro_date_logical_type(spark, tmp_path):
    """DATE columns roundtrip via the Avro date logical (int days since
    epoch), including pre-epoch dates and NULLs."""
    from pyspark.sql import functions as F

    from xetl_spark.sources.avro import register_avro_datasource, write_avro

    df = spark.sql(
        """SELECT * FROM VALUES
           (1, DATE '2024-03-01'), (2, DATE '1969-07-20'), (3, CAST(NULL AS DATE))
           AS t(id, d)"""
    )
    dest = str(tmp_path / "dates")
    write_avro(df.coalesce(1), dest)
    register_avro_datasource(spark)
    back = spark.read.format("xetl_avro").option("path", dest).load()
    assert dict(back.dtypes)["d"] == "date"
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_decimal_logical_type(spark, tmp_path):
    """DECIMAL columns roundtrip via the Avro decimal logical (bytes,
    big-endian two's-complement unscaled), exactly — including
    negatives and NULLs."""
    from xetl_spark.sources.avro import register_avro_datasource, write_avro

    df = spark.sql(
        """SELECT * FROM VALUES
           (1, CAST(12345.67 AS DECIMAL(18,2))),
           (2, CAST(-0.01 AS DECIMAL(18,2))),
           (3, CAST(NULL AS DECIMAL(18,2))),
           (4, CAST(99999999999999.99 AS DECIMAL(18,2)))
           AS t(id, amt)"""
    )
    dest = str(tmp_path / "decs")
    write_avro(df.coalesce(1), dest)
    register_avro_datasource(spark)
    back = spark.read.format("xetl_avro").option("path", dest).load()
    assert dict(back.dtypes)["amt"] == "decimal(18,2)"
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_truncated_fixed_decimal_raises():
    """A fixed-type decimal whose buffer ends mid-value must raise
    AvroFormatError like every other branch — not silently decode the
    short slice into a wrong Decimal."""
    from decimal import Decimal

    import pytest

    from xetl_spark.sources.avro import AvroFormatError, _decode_value

    sch = {"type": "fixed", "size": 4, "logicalType": "decimal", "scale": 2}
    buf = (123456).to_bytes(4, "big", signed=True)
    v, pos = _decode_value(buf, 0, sch)
    assert (v, pos) == (Decimal("1234.56"), 4)
    with pytest.raises(AvroFormatError):
        _decode_value(buf[:3], 0, sch)  # truncated mid-fixed


from hypothesis import given, settings
from hypothesis import strategies as st


_field_vals = {
    "long": st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    "double": st.one_of(
        st.none(),
        st.floats(allow_nan=False),  # NaN != NaN breaks equality, not codec
    ),
    "string": st.one_of(st.none(), st.text(max_size=40)),
    "bytes": st.one_of(st.none(), st.binary(max_size=40)),
    "boolean": st.one_of(st.none(), st.booleans()),
}


@st.composite
def _schema_and_rows(draw):
    types = draw(
        st.lists(st.sampled_from(sorted(_field_vals)), min_size=1, max_size=5)
    )
    schema = {
        "type": "record",
        "name": "fz",
        "fields": [
            {"name": f"f{i}", "type": ["null", t]} for i, t in enumerate(types)
        ],
    }
    rows = draw(
        st.lists(
            st.tuples(*[_field_vals[t] for t in types]), min_size=0, max_size=30
        )
    )
    codec = draw(st.sampled_from(["null", "deflate", "snappy"]))
    return schema, rows, codec


@given(_schema_and_rows())
@settings(max_examples=150, deadline=None)
def test_avro_codec_roundtrip_fuzz(case):
    """Any supported schema × random rows (extreme longs, ±0.0/inf
    doubles, unicode, NULLs, empty containers) roundtrips exactly
    through both codecs."""
    schema, rows, codec = case
    payload = encode_container(schema, rows, codec=codec)
    sch, back = parse_container(payload)
    assert sch == schema
    assert back == rows


def test_snappy_codec_roundtrip_and_malformed():
    import os

    import pytest

    from xetl_spark.sources import snappy

    for data in (b"", b"x", b"ab" * 40000, os.urandom(70000)):
        assert snappy.decompress(snappy.compress(data)) == data
    # hand-built stream with an overlapping copy (RLE idiom):
    # literal 'ab' then copy(len=6, off=2) -> 'abababab'
    stream = bytes([8]) + bytes([1 << 2]) + b"ab" + bytes([((6 - 4) << 2) | 1, 2])
    assert snappy.decompress(stream) == b"abababab"
    with pytest.raises(snappy.SnappyError):
        snappy.decompress(bytes([8, 1 << 2]) + b"ab")  # truncated
    with pytest.raises(snappy.SnappyError):
        snappy.decompress(bytes([4, (2 << 2) | 1, 9]))  # offset past start


def test_snappy_matches_jvm_snappy_java(spark):
    """Cross-validate against the real implementation on Spark's
    classpath: snappy-java's compressed bytes decode through our
    decompressor, and our literal-only output decodes through
    snappy-java."""
    import os

    from xetl_spark.sources import snappy

    jvm = spark._jvm
    for data in (b"", b"hello", b"ab" * 5000, os.urandom(40000), b"\x00" * 99999):
        jcomp = bytes(jvm.org.xerial.snappy.Snappy.compress(bytearray(data)))
        assert snappy.decompress(jcomp) == data
        assert bytes(
            jvm.org.xerial.snappy.Snappy.uncompress(bytearray(snappy.compress(data)))
        ) == data


def test_avro_snappy_codec_real_interop(spark, tmp_path):
    """An Avro container whose block is compressed by REAL snappy
    (snappy-java) + big-endian CRC32 suffix — the wire format other
    systems emit — decodes through both the generic and Arrow paths,
    and write_avro(codec='snappy') round-trips through the DataSource."""
    import struct
    import zlib

    from pyspark.sql import functions as F

    from xetl_spark.sources import avro as A

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    rows = [(i, f"v{i}" * 3) for i in range(500)]
    raw = A.encode_container(schema, rows, codec="null")
    _, codec_, sync, pos = A._parse_header(raw)
    # body of the single null-codec block
    count, p2 = A._read_long(raw, pos)
    size, p2 = A._read_long(raw, p2)
    body = raw[p2 : p2 + size]
    jvm = spark._jvm
    jcomp = bytes(jvm.org.xerial.snappy.Snappy.compress(bytearray(body)))
    block = jcomp + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    out = bytearray(A._container_header(schema, "snappy", sync))
    b = A.io.BytesIO()
    A._write_zigzag(b, count)
    A._write_zigzag(b, len(block))
    out += b.getvalue() + block + sync
    payload = bytes(out)
    _, back = A.parse_container(payload)
    assert back == rows
    arrow_rows = [
        (d["x"], d["s"]) for bt in A.iter_arrow_batches(payload) for d in bt.to_pylist()
    ]
    assert arrow_rows == rows

    df = spark.range(100).select(
        F.col("id").alias("x"), F.concat(F.lit("s"), F.col("id")).alias("s")
    )
    dest = str(tmp_path / "sn")
    assert A.write_avro(df, dest, codec="snappy") == 100
    A.register_avro_datasource(spark)
    got = spark.read.format("xetl_avro").option("path", dest).load()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


@given(_schema_and_rows())
@settings(max_examples=100, deadline=None)
def test_vectorized_codec_matches_generic(case):
    """Differential fuzz for the numpy fast path: _np_encode_block's
    bytes must decode identically through BOTH the generic recursive
    decoder and the flat Arrow decoder, for any flat schema × random
    rows (extreme longs, ±inf doubles, unicode, NULLs, empty)."""
    import pandas as pd

    from xetl_spark.sources.avro import (
        _container_header,
        _flat_kinds,
        _frame_block,
        _np_encode_block,
        iter_arrow_batches,
        parse_container,
    )

    schema, rows, codec = case
    kinds = _flat_kinds(schema)
    assert kinds is not None
    names = [f["name"] for f in schema["fields"]]
    pdf = pd.DataFrame(rows, columns=names, dtype=object)
    block = _np_encode_block(pdf, kinds)
    sync = b"\x07" * 16
    payload = _container_header(schema, codec, sync) + (
        _frame_block(len(pdf), block, codec, sync) if len(pdf) else b""
    )
    _, back = parse_container(payload)
    assert back == rows
    arrow_rows = []
    for b in iter_arrow_batches(payload):
        arrow_rows.extend(tuple(d[nm] for nm in names) for d in b.to_pylist())
    assert arrow_rows == rows


def test_streaming_foreachbatch_avro_sink(spark, tmp_path):
    """A streaming query archives micro-batches to Avro via
    foreachBatch(write_avro); the drained archive reads back equal to
    the batch content — streaming sink + jar-free codec composed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xetl_spark.sources.avro import register_avro_datasource, write_avro
    from xetl_spark.sources.replay import register_replay_datasource

    src = str(tmp_path / "src.parquet")
    pq.write_table(
        pa.table({"i": list(range(600)), "s": [f"v{i}" for i in range(600)]}), src
    )
    register_replay_datasource(spark)
    dest = str(tmp_path / "avro_archive")

    q = (
        spark.readStream.format("xetl_replay")
        .option("path", src)
        .option("rows_per_batch", 100)
        .load()
        .writeStream.foreachBatch(lambda df, epoch: write_avro(df, dest))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    register_avro_datasource(spark)
    back = spark.read.format("xetl_avro").option("path", dest).load()
    assert sorted(map(tuple, back.collect())) == [
        (i, f"v{i}") for i in range(600)
    ]


def test_new_codecs_roundtrip():
    """bzip2 / xz / zstandard container codecs (Avro 1.11 codec set,
    decompressors from the stdlib + pyarrow's bundled libzstd)."""
    rows = [(i, f"s{i}", i * 1.5, b"\x00" + bytes([i]), None) for i in range(50)]
    for codec in ("bzip2", "xz", "zstandard"):
        payload = encode_container(SCHEMA, rows, codec=codec)
        sch, got = parse_container(payload)
        assert got == rows, codec


def test_zstd_block_hostile_inputs():
    from xetl_spark.sources.avro import _decompress_block

    # truncated/garbage frame → typed error
    with pytest.raises(AvroFormatError):
        _decompress_block(b"\x28\xb5\x2f\xfdgarbage", "zstandard")
    # absurd declared content size fails before allocation
    import pyarrow as pa

    frame = bytearray(bytes(pa.Codec("zstd").compress(b"x" * 100)))
    # FHD at byte 4: force 8-byte FCS flag and splice a huge size in
    with pytest.raises((AvroFormatError, UnsupportedAvroError)):
        _decompress_block(bytes(frame[:4]) + b"\xc0" + (1 << 50).to_bytes(8, "little"), "zstandard")


def test_multibranch_union_struct_rendering():
    """Unions beyond [null, T] follow the spark-avro conventions:
    int|long → bigint, float|double → double, anything else →
    struct<member0, member1, ...> holding the taken branch."""
    import json

    schema = {
        "type": "record",
        "name": "u",
        "fields": [
            {"name": "n", "type": ["int", "long"]},
            {"name": "v", "type": ["null", "string", "long"]},
        ],
    }
    assert schema_to_ddl(schema) == (
        "n bigint, v struct<member0: string, member1: bigint>"
    )
    sj = json.dumps(schema).encode()
    sync = bytes(range(16))

    def _zz2(v):
        out = bytearray()
        u = (v << 1) ^ (v >> 63)
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    # row1: n takes branch 1 (long 7), v takes branch 1 (string "hi")
    body = _zz2(1) + _zz2(7) + _zz2(1) + _zz2(2) + b"hi"
    # row2: n takes branch 0 (int 3), v takes branch 2 (long 9)
    body += _zz2(0) + _zz2(3) + _zz2(2) + _zz2(9)
    # row3: v null
    body += _zz2(1) + _zz2(5) + _zz2(0)
    payload = (
        b"Obj\x01"
        + _zz2(1)
        + _zz2(11) + b"avro.schema" + _zz2(len(sj)) + sj
        + _zz2(0)
        + sync
        + _zz2(3) + _zz2(len(body)) + body + sync
    )
    sch, rows = parse_container(payload)
    assert rows == [
        (7, {"member0": "hi", "member1": None}),
        (3, {"member0": None, "member1": 9}),
        (5, None),
    ]
