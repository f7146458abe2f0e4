"""VP8 bitstream analysis: RFC 6386 boolean-coder roundtrips
(hypothesis-fuzzed), full frame-header field coverage, the WebP
lossy deep-probe, hostile bytes, and the documented pixel-decode
boundary."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xetl_spark.operators.vp8 import (
    BoolDecoder,
    BoolEncoder,
    Vp8FormatError,
    vp8_header_build,
    vp8_header_probe,
    vp8_quality_estimate,
)
from xetl_spark.operators.webp import (
    UnsupportedImageError,
    webp_decode,
    webp_lossy_header,
    webp_probe,
    webp_wrap_vp8,
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 254), st.integers(0, 1)),
        min_size=1,
        max_size=600,
    )
)
def test_bool_coder_roundtrip(seq):
    """encode -> flush -> decode recovers every (prob, bit) pair,
    including carry propagation through runs of 0xFF output bytes."""
    e = BoolEncoder()
    for p, b in seq:
        e.write(p, b)
    d = BoolDecoder(e.flush())
    assert [d.read(p) for p, _ in seq] == [b for _, b in seq]


def test_bool_coder_carry_chain():
    """A long all-ones high-probability run forces the encoder's
    carry to walk back across emitted 0xFF bytes."""
    seq = [(254, 1)] * 500 + [(1, 0)] * 10 + [(128, 1)] * 64
    e = BoolEncoder()
    for p, b in seq:
        e.write(p, b)
    d = BoolDecoder(e.flush())
    assert [d.read(p) for p, _ in seq] == [b for _, b in seq]


def test_header_field_matrix():
    """Every §9.2-9.8 field surfaces: dims, segmentation with mixed
    present/absent per-segment deltas, filter config, 1/2/4/8 token
    partitions with size accounting, all five quantizer deltas."""
    h = vp8_header_build(
        1022, 766,
        y_ac_qi=127,
        quant_deltas={
            "y_dc_delta": 7, "y2_dc_delta": -8, "y2_ac_delta": 1,
            "uv_dc_delta": -1, "uv_ac_delta": 15,
        },
        filter_level=63, sharpness=7, simple_filter=True,
        segments=[0, -64, 63, None],
        n_token_partitions=8, token_data=b"q" * 1001,
    )
    info = vp8_header_probe(h)
    assert (info["width"], info["height"]) == (1022, 766)
    assert info["quant"] == {
        "y_ac_qi": 127, "y_dc_delta": 7, "y2_dc_delta": -8,
        "y2_ac_delta": 1, "uv_dc_delta": -1, "uv_ac_delta": 15,
    }
    assert info["loop_filter"]["type"] == "simple"
    assert info["loop_filter"]["level"] == 63
    assert info["loop_filter"]["sharpness"] == 7
    seg = info["segmentation"]
    # segment delta 0 is transmitted as an explicit present flag
    assert seg["quantizer_deltas"] == [0, -64, 63, None]
    assert info["n_token_partitions"] == 8
    assert len(info["token_partition_sizes"]) == 8
    assert sum(info["token_partition_sizes"]) == 1001
    assert vp8_quality_estimate(info) == 0
    lo = vp8_header_probe(vp8_header_build(8, 8, y_ac_qi=0))
    assert vp8_quality_estimate(lo) == 100
    assert not lo["segmentation"]["enabled"]
    assert lo["token_partition_sizes"] == [0]


def test_webp_lossy_deep_probe_and_decode_boundary():
    """webp_lossy_header finds the VP8 chunk in a still WebP and
    parses its header; pixel decode stays a typed boundary; the
    container probe agrees on dimensions and variant."""
    w = webp_wrap_vp8(vp8_header_build(48, 32, y_ac_qi=90, filter_level=12))
    h = webp_lossy_header(w)
    assert (h["width"], h["height"], h["quant"]["y_ac_qi"]) == (48, 32, 90)
    p = webp_probe(w)
    assert p["variant"] == "vp8" and (p["width"], p["height"]) == (48, 32)
    with pytest.raises(UnsupportedImageError):
        webp_decode(w)
    with pytest.raises(UnsupportedImageError):
        webp_lossy_header(b"RIFF\x04\x00\x00\x00WEBP")  # no VP8 chunk


def test_header_hostile_bytes():
    base = vp8_header_build(64, 48, segments=[1, 2, 3, 4],
                            n_token_partitions=4, token_data=b"t" * 40)
    for bad in (
        b"",
        base[:5],
        base[:9],
        b"\x00" * 12,                       # interframe tag, no sync
        base[:3] + b"\x9d\x01\x2b" + base[6:],  # bad sync
        bytes([base[0] | 1]) + base[1:],    # keyframe bit flipped
    ):
        with pytest.raises(UnsupportedImageError):
            vp8_header_probe(bad)
    # first-partition size pointing past the payload
    tag = base[0] | (base[1] << 8) | (base[2] << 16)
    huge = (60000 << 5) | (tag & 0x1F)
    with pytest.raises(UnsupportedImageError):
        vp8_header_probe(huge.to_bytes(3, "little") + base[3:])
    # builder guards
    with pytest.raises(Vp8FormatError):
        vp8_header_build(8, 8, y_ac_qi=128)
    with pytest.raises(Vp8FormatError):
        vp8_header_build(8, 8, n_token_partitions=3)
