"""EXIF APP1/TIFF codec (operators/exif.py): synthetic round-trips in
both byte orders, real camera-file golden values, and robustness on
truncated/garbage segments."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from xetl_spark.operators import exif, jpeg

FIELDS = {
    "make": "maker3",
    "model": "cam-42",
    "orientation": 6,
    "datetime": "2024:05:06 07:08:09",
    "software": "xetl",
    "iso": 200,
    "exposure_time": "1/125",
    "f_number": "28/10",
    "pixel_x": 16,
    "pixel_y": 16,
    "datetime_original": "2024:05:06 07:08:08",
    "focal_length": "50/1",
}

REAL_DIR = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_both_byte_orders(bo):
    img = np.full((16, 16, 3), 99, np.uint8)
    payload = exif.insert_app1(jpeg.jpeg_encode(img, 90), exif.exif_build(FIELDS, bo))
    assert exif.exif_parse(payload) == FIELDS
    # the APP1 insert must not disturb the image stream
    assert np.array_equal(
        jpeg.jpeg_decode(payload), jpeg.jpeg_decode(jpeg.jpeg_encode(img, 90))
    )


def test_no_exif_returns_empty():
    img = np.full((8, 8, 3), 7, np.uint8)
    assert exif.exif_parse(jpeg.jpeg_encode(img, 90)) == {}
    assert exif.exif_parse(b"\xff\xd8\xff\xd9") == {}
    assert exif.exif_parse(b"not a jpeg at all") == {}


def test_truncated_app1_degrades_not_crashes():
    """Triage must survive arbitrary wire bytes: every prefix of a
    valid payload parses to a (possibly partial) dict, never raises."""
    img = np.full((8, 8, 3), 50, np.uint8)
    payload = exif.insert_app1(jpeg.jpeg_encode(img, 90), exif.exif_build(FIELDS))
    for cut in range(0, min(len(payload), 400), 7):
        out = exif.exif_parse(payload[:cut])
        assert isinstance(out, dict)


def test_ifd_pointer_cycle_degrades_not_crashes():
    """A crafted Exif sub-IFD pointer that points back at IFD0 must
    terminate (visited-offset guard), not RecursionError the stage."""
    import struct

    tiff = (
        b"II"
        + struct.pack("<HL", 42, 8)  # magic, ifd0 @ 8
        + struct.pack("<H", 1)  # one entry
        + struct.pack("<HHL", 0x8769, 4, 1)  # Exif sub-IFD pointer, LONG
        + struct.pack("<L", 8)  # ...pointing back at IFD0: a cycle
        + struct.pack("<L", 0)  # next-IFD terminator
    )
    seg = b"Exif\x00\x00" + tiff
    payload = b"\xff\xd8\xff\xe1" + struct.pack(">H", 2 + len(seg)) + seg + b"\xff\xd9"
    assert exif.exif_parse(payload) == {}  # terminates, partial/empty dict


@pytest.mark.skipif(
    not glob.glob(f"{REAL_DIR}/**/*.jpg", recursive=True),
    reason="Spark-bundled sample JPEGs not present",
)
def test_real_camera_exif_golden():
    """Independent-encoder validation: the NIKON COOLPIX P4 fixture
    shipped with Spark parses to its known camera metadata."""
    path = f"{REAL_DIR}/multi-channel/chr30.4.184.jpg"
    got = exif.exif_parse(open(path, "rb").read())
    assert got["make"] == "NIKON"
    assert got["model"] == "COOLPIX P4"
    assert got["orientation"] == 1
    assert got["datetime_original"] == "2007:05:19 09:15:25"
    assert got["iso"] == 100
    assert got["f_number"] == "68/10"
    assert got["focal_length"] == "157/10"
    assert (got["pixel_x"], got["pixel_y"]) == (471, 337)
    # every bundled file yields at least orientation
    for p in glob.glob(f"{REAL_DIR}/**/*.jpg", recursive=True):
        assert exif.exif_parse(open(p, "rb").read()).get("orientation") == 1


def test_extract_exif_operator(spark):
    """The Spark-side operator: payload column in, typed metadata out,
    NULL fields for EXIF-less payloads."""
    import pandas as pd

    from xetl_spark.operators.multimodal import extract_exif

    img = np.full((8, 8, 3), 10, np.uint8)
    base = jpeg.jpeg_encode(img, 90)
    with_meta = exif.insert_app1(base, exif.exif_build({"make": "m1", "iso": 400}))
    pdf = pd.DataFrame({"doc_id": [1, 2], "media": [with_meta, base]})
    df = spark.createDataFrame(pdf)
    rows = {r.id: r for r in extract_exif(df, "media", "doc_id").collect()}
    assert rows[1].make == "m1" and rows[1].iso == 400
    assert rows[2].make is None and rows[2].iso is None


def test_strip_metadata_removes_all_app_and_com_segments():
    """strip_metadata: Exif/COM dropped, APP0 kept, structural
    segments byte-identical, pixels unchanged across baseline /
    progressive / arithmetic / lossless streams."""
    import struct

    import numpy as np

    from xetl_spark.operators import exif, jpeg

    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    base = jpeg.jpeg_encode(img, 90)
    tagged = exif.insert_app1(
        base, exif.exif_build({"make": "Cam", "model": "X1", "iso": 400})
    )
    stripped = exif.strip_metadata(tagged)
    assert exif.exif_parse(stripped) == {}
    assert stripped == base  # exact round-trip to the untagged stream
    com = base[:2] + b"\xff\xfe" + struct.pack(">H", 7) + b"hello" + base[2:]
    assert exif.strip_metadata(com) == base
    for enc in (
        jpeg.jpeg_encode(img, 85, progressive=True),
        jpeg.jpeg_encode(img, 85, arithmetic=True),
        jpeg.jpeg_lossless_encode(img, predictor=4),
    ):
        t = exif.insert_app1(enc, exif.exif_build({"make": "Z"}))
        s = exif.strip_metadata(t)
        assert exif.exif_parse(s) == {}
        assert np.array_equal(jpeg.jpeg_decode(s), jpeg.jpeg_decode(enc))
    with pytest.raises(ValueError, match="SOI"):
        exif.strip_metadata(b"not a jpeg")


def test_strip_exif_builtin_task(spark, tmp_path):
    import numpy as np

    from xetl_spark.operators import exif as exif_mod
    from xetl_spark.operators import jpeg
    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    img = np.full((6, 6, 3), 55, np.uint8)
    tagged = exif_mod.insert_app1(
        jpeg.jpeg_encode(img, 90), exif_mod.exif_build({"make": "Leaky"})
    )
    src = tmp_path / "imgs"
    spark.createDataFrame(
        [(1, bytearray(tagged))], "doc_id long, media binary"
    ).write.parquet(str(src))
    job = Job(
        name="scrub",
        data=str(tmp_path),
        commands=[
            {"name": "imgs", "task": "read_parquet", "env": {"PATH": str(src)}},
            {"name": "clean", "task": "strip_exif", "env": {}},
        ],
    )
    results = run_job(spark, job)
    assert all(r.status == "success" for r in results)
    out = bytes(results[-1].output.collect()[0].media)
    assert exif_mod.exif_parse(out) == {}


def test_strip_metadata_any_png_webp_dispatch():
    """Format-dispatching scrub: PNG text/metadata chunks and WebP
    EXIF/XMP chunks (incl. VP8X flag bits) dropped, pixels identical;
    unknown containers are a typed failure, not a silent pass."""
    import struct
    import zlib

    import numpy as np

    from xetl_spark.operators import exif, imaging
    from xetl_spark.operators.webp import webp_decode, webp_encode

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    png = imaging.png_encode(img)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    tainted = png[:33] + chunk(b"tEXt", b"Author\x00Someone") + png[33:]
    clean = exif.strip_metadata_any(tainted)
    assert b"Someone" not in clean
    assert np.array_equal(imaging.png_decode(clean), imaging.png_decode(png))

    wp = webp_encode(img)
    body = wp[8:] + b"EXIF" + struct.pack("<I", 6) + b"gps!!\x00"
    tainted_wp = b"RIFF" + struct.pack("<I", len(body)) + body
    clean_wp = exif.strip_metadata_any(tainted_wp)
    assert b"EXIF" not in clean_wp[12:]
    assert np.array_equal(webp_decode(clean_wp), webp_decode(wp))

    with pytest.raises(ValueError, match="unrecognized"):
        exif.strip_metadata_any(b"GIF89a not handled")


def test_strip_metadata_keeps_app14_adobe():
    """APP14 (Adobe) carries the color-transform flag libjpeg-family
    decoders use to pick YCbCr/RGB/YCCK — scrubbing it could change
    decoded pixels elsewhere, so it survives the scrub while EXIF
    (APP1) and COM are still dropped."""
    import struct

    import numpy as np

    from xetl_spark.operators import exif, jpeg

    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    base = jpeg.jpeg_encode(img, 90)
    adobe = b"Adobe\x00d\x00\x00\x00\x00\x00\x01"  # transform=1 (YCbCr)
    app14 = b"\xff\xee" + struct.pack(">H", 2 + len(adobe)) + adobe
    tagged = exif.insert_app1(
        base[:2] + app14 + base[2:],
        exif.exif_build({"make": "Cam", "iso": 200}),
    )
    stripped = exif.strip_metadata(tagged)
    assert exif.exif_parse(stripped) == {}
    assert app14 in stripped  # Adobe marker preserved verbatim
    assert np.array_equal(jpeg.jpeg_decode(stripped), jpeg.jpeg_decode(base))
