"""WebM/Matroska EBML probe: vint edge cases, structure roundtrips,
unknown-size segments, the VP8 keyframe quality surfacing, the
probe_media dispatch, and hostile bytes."""

from __future__ import annotations

import struct

import pytest

from xetl_spark.operators.vp8 import vp8_header_build
from xetl_spark.operators.webm import (
    SEGMENT,
    WebmFormatError,
    _enc_vint_size,
    _vint,
    webm_build,
    webm_probe,
)


def test_vint_roundtrip_edges():
    """Size vints roundtrip at every length boundary; the all-ones
    payload decodes as unknown size; >8-byte vints are rejected."""
    for v in (0, 1, 126, 127, 128, 16382, 16383, 16384, (1 << 49) - 2):
        enc = _enc_vint_size(v)
        got, pos = _vint(enc, 0, strip_marker=True)
        assert got == v and pos == len(enc), v
    got, _ = _vint(b"\xff", 0, strip_marker=True)
    assert got == -1  # unknown size sentinel
    with pytest.raises(WebmFormatError):
        _vint(b"\x00\xff", 0, strip_marker=True)
    with pytest.raises(WebmFormatError):
        _vint(b"\x81", 1, strip_marker=True)  # beyond buffer


def test_webm_structure_roundtrip():
    vp8_key = vp8_header_build(320, 240, y_ac_qi=44, filter_level=10)
    blocks = [
        (1, 0, True, vp8_key),
        (2, 0, True, b"opus0"),
        (1, 33, False, b"\x01" * 30),
        (2, 20, True, b"opus1"),
        (1, 66, False, b"\x01" * 25),
        (1, 100, True, b"\x00" * 10),
    ]
    payload = webm_build(
        [
            {"number": 1, "type": "video", "codec": "V_VP8",
             "width": 320, "height": 240},
            {"number": 2, "type": "audio", "codec": "A_OPUS",
             "sample_rate": 48000.0, "channels": 2},
        ],
        blocks,
        duration_ms=133.0,
    )
    p = webm_probe(payload)
    assert p["container"] == "webm" and p["duration_ms"] == 133
    assert p["tracks"][1]["codec"] == "V_VP8"
    assert (p["tracks"][1]["width"], p["tracks"][1]["height"]) == (320, 240)
    assert p["tracks"][2]["sample_rate"] == 48000.0
    assert p["n_clusters"] == 2 and p["n_blocks"] == 6
    assert p["frames_per_track"] == {1: 4, 2: 2}
    # first VIDEO keyframe's VP8 header is parsed; later ones ignored
    assert p["vp8_header"]["quant"]["y_ac_qi"] == 44
    # matroska doctype passes through
    mkv = webm_build(
        [{"number": 1, "type": "video", "codec": "V_MPEG4/ISO/AVC",
          "width": 8, "height": 6}],
        [(1, 0, True, b"x")],
        doctype="matroska",
    )
    pm = webm_probe(mkv)
    assert pm["container"] == "matroska" and pm["vp8_header"] is None


def test_webm_unknown_size_segment():
    """Streamed WebM: the Segment's size vint is all-ones (unknown) —
    the element extends to end of payload and still parses."""
    payload = webm_build(
        [{"number": 1, "type": "video", "codec": "V_VP9",
          "width": 16, "height": 12}],
        [(1, 0, True, b"\x00" * 9), (1, 40, False, b"\x01" * 5)],
    )
    # rewrite the Segment's size to the 1-byte unknown marker 0xFF.
    seg_id = SEGMENT.to_bytes(4, "big")
    i = payload.find(seg_id)
    assert i >= 0
    # original size vint starts right after the 4-byte ID
    _size, after = _vint(payload, i + 4, strip_marker=True)
    streamed = payload[: i + 4] + b"\xff" + payload[after:]
    p = webm_probe(streamed)
    assert p["tracks"][1]["codec"] == "V_VP9" and p["n_blocks"] == 2


def test_webm_hostile_bytes():
    payload = webm_build(
        [{"number": 1, "type": "video", "codec": "V_VP8",
          "width": 8, "height": 6}],
        [(1, 0, True, vp8_header_build(8, 6))],
    )
    for bad in (b"", b"\x1aE\xdf", payload[:25], payload[:-3],
                b"\x00" * 30):
        with pytest.raises(WebmFormatError):
            webm_probe(bad)
    # block timecode outside the cluster's 16-bit relative range
    with pytest.raises(WebmFormatError, match="timecode"):
        webm_build(
            [{"number": 1, "type": "video", "codec": "V_VP8",
              "width": 8, "height": 6}],
            [(1, 0, True, b"x"), (1, 40000, False, b"y")],
            blocks_per_cluster=2,
        )


def test_probe_media_webm(spark):
    import pandas as pd

    from xetl_spark.operators.multimodal import probe_media

    payload = webm_build(
        [
            {"number": 1, "type": "video", "codec": "V_VP8",
             "width": 96, "height": 54},
            {"number": 2, "type": "audio", "codec": "A_OPUS",
             "sample_rate": 24000.0, "channels": 1},
        ],
        [(1, 0, True, b"k"), (2, 0, True, b"a"), (1, 40, False, b"d")],
        duration_ms=80.0,
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [payload]}))
    row = probe_media(df).collect()[0]
    assert row.container == "webm"
    assert (row.width, row.height) == (96, 54)
    assert (row.sample_rate, row.channels) == (24000, 1)
    assert row.duration_ms == 80 and row.n_frames == 3


def test_webm_single_byte_track_127():
    """The legal single-byte vint encoding 0xFF for block track number
    127 decodes as the value 127, not the unknown-size sentinel (r13
    advice fix: all-ones means 'unknown' only for element sizes)."""
    import struct as _st

    from xetl_spark.operators import webm as W

    vp8_key = vp8_header_build(160, 120, y_ac_qi=30, filter_level=5)
    ebml = W._elem(
        W.EBML_HEADER, W._elem(W.DOCTYPE, b"webm")
    )
    tr = W._uint_elem(W.TRACK_NUMBER, 127)
    tr += W._uint_elem(W.TRACK_TYPE, 1)
    tr += W._elem(W.CODEC_ID, b"V_VP8")
    tr += W._elem(
        W.VIDEO,
        W._uint_elem(W.PIXEL_WIDTH, 160) + W._uint_elem(W.PIXEL_HEIGHT, 120),
    )
    tracks_el = W._elem(W.TRACKS, W._elem(W.TRACK_ENTRY, tr))
    info = W._elem(W.INFO, W._uint_elem(W.TIMECODE_SCALE, 1_000_000))
    # hand-built SimpleBlock: single-byte 0xFF track vint (= 127)
    blk = b"\xff" + _st.pack(">h", 0) + bytes([0x80]) + vp8_key
    cluster = W._elem(
        W.CLUSTER,
        W._uint_elem(W.CLUSTER_TIMECODE, 0) + W._elem(W.SIMPLE_BLOCK, blk),
    )
    payload = ebml + W._elem(W.SEGMENT, info + tracks_el + cluster)
    p = webm_probe(payload)
    assert p["frames_per_track"] == {127: 1}
    assert -1 not in p["frames_per_track"]
    # the keyframe was attributed to the video track: VP8 header probed
    assert p["vp8_header"] is not None
    assert (p["vp8_header"]["width"], p["vp8_header"]["height"]) == (160, 120)
