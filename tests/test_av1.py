"""AV1 OBU walk + sequence-header leading fields: layout matrix,
leb128 edges, the documented parse boundaries, IVF/WebM integration,
hostile bytes."""

from __future__ import annotations

import pytest

from xetl_spark.operators.av1 import (
    Av1FormatError,
    av1_sequence_build,
    av1_sequence_probe,
    obu_walk,
)


def test_sequence_matrix():
    # reduced still picture (the AVIF shape)
    p = av1_sequence_probe(
        av1_sequence_build(1200, 800, profile=1, level=12,
                           still_picture=True, reduced=True,
                           extra_obus=[(6, b"\x00" * 40), (5, b"\x01" * 6)])
    )
    assert (p["width"], p["height"]) == (1200, 800)
    assert p["profile"] == 1 and p["level"] == 12
    assert p["still_picture"] and p["reduced_still_picture_header"]
    assert p["obu_counts"] == {
        "temporal_delimiter": 1, "sequence_header": 1, "frame": 1,
        "metadata": 1,
    }
    # general layout: level > 7 carries a tier bit, <= 7 does not
    assert av1_sequence_probe(av1_sequence_build(1920, 1080, level=9))[
        "level"
    ] == 9
    assert av1_sequence_probe(av1_sequence_build(64, 64, level=4))[
        "width"
    ] == 64
    # 1-pixel dimension edge (wbits floor)
    p1 = av1_sequence_probe(av1_sequence_build(1, 1, reduced=True, level=0))
    assert (p1["width"], p1["height"]) == (1, 1)


def test_parse_boundaries_and_hostile():
    base = av1_sequence_build(64, 48)
    for bad in (b"", b"\x80", base[:3],
                b"\x0a\x8f\xff\xff\xff\xff\xff\xff\xff\xff"):
        with pytest.raises(Av1FormatError):
            av1_sequence_probe(bad)
    # timing-info-present streams are a NAMED typed boundary: flip the
    # first post-reduced bit of a general-layout header to 1
    seq = list(obu_walk(base))
    hdr_start = seq[1][2]
    b = bytearray(base)
    # general layout bits: profile(3) still(1) reduced(1) timing(1)
    b[hdr_start] |= 1 << 2  # set timing_info_present
    with pytest.raises(Av1FormatError, match="timing_info"):
        av1_sequence_probe(bytes(b))
    # no-size final OBU extends to end (low-overhead mode)
    head = bytes([(1 << 3) | 0x00])  # sequence header, has_size=0
    body = base[seq[1][2] : seq[1][3]]
    p = av1_sequence_probe(head + body)
    assert (p["width"], p["height"]) == (64, 48)
    with pytest.raises(Av1FormatError):
        av1_sequence_build(8, 8, profile=3)


def test_ivf_and_webm_surface_av1():
    from xetl_spark.operators.mediaprobe import ivf_build, ivf_probe
    from xetl_spark.operators.webm import webm_build, webm_probe

    s = av1_sequence_build(640, 360, profile=2, level=8)
    p = ivf_probe(ivf_build([s, b"\x12\x00"], "AV01", 640, 360))
    assert p["av1_header"]["profile"] == 2
    w = webm_probe(
        webm_build(
            [{"number": 1, "type": "video", "codec": "V_AV1",
              "width": 640, "height": 360}],
            [(1, 0, True, s)],
        )
    )
    assert w["av1_header"]["width"] == 640
    assert w["vp8_header"] is None and w["vp9_header"] is None


def test_avif_item_layout():
    """AVIF/HEIF: meta-box item walk (pitm/iinf v2-3 infe/iloc width
    nibbles + multi-extent reassembly/ispe), the primary av01 item fed
    through the sequence probe; hostile bytes typed."""
    from xetl_spark.operators.av1 import avif_build, avif_probe

    p = avif_probe(avif_build(800, 600, profile=1, level=12))
    assert p["container"] == "avif" and (p["width"], p["height"]) == (800, 600)
    assert p["av1"]["profile"] == 1 and p["av1"]["level"] == 12
    assert p["av1"]["still_picture"] and p["av1"]["reduced_still_picture_header"]
    p2 = avif_probe(
        avif_build(64, 48, split_extents=True,
                   extra_items=[("Exif", b"\x00" * 20)])
    )
    assert (p2["av1"]["width"], p2["av1"]["height"]) == (64, 48)
    assert p2["item_types"] == {1: "av01", 2: "Exif"}
    base = avif_build(32, 24)
    for bad in (b"", base[:20], base[:-5], b"\x00" * 40):
        with pytest.raises(Av1FormatError):
            avif_probe(bad)


def test_probe_media_and_quality_avif(spark):
    import pandas as pd

    from xetl_spark.operators.av1 import avif_build
    from xetl_spark.operators.multimodal import media_quality, probe_media

    payload = avif_build(320, 240, profile=0, level=8)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [payload]}))
    row = probe_media(df).collect()[0]
    assert row.container == "avif" and (row.width, row.height) == (320, 240)
    q = media_quality(df).collect()[0]
    assert q.container == "avif" and q.codec == "av1"
    assert q.quality is None  # quantizer past the documented boundary


def test_avif_iloc_v1_v2_index_size():
    """iloc versions 1/2 repurpose the low nibble of the base_size
    byte as index_size: each extent then carries an extent_index field
    before offset/length (r13 advice fix — previously the reads
    shifted and extents misparsed)."""
    from xetl_spark.operators.av1 import avif_build, avif_probe

    for ver, idx_sz in ((1, 4), (2, 4), (1, 8), (2, 0)):
        p = avif_probe(
            avif_build(
                128, 96, split_extents=True,
                extra_items=[("Exif", b"\x01" * 16)],
                iloc_version=ver, index_size=idx_sz,
            )
        )
        assert p["container"] == "avif", (ver, idx_sz)
        assert (p["width"], p["height"]) == (128, 96), (ver, idx_sz)
        assert p["av1"] is not None, (ver, idx_sz)
        assert (p["av1"]["width"], p["av1"]["height"]) == (128, 96)
        assert p["item_types"] == {1: "av01", 2: "Exif"}
