"""VP9 uncompressed-header analysis: field matrix across profiles/
bit depths/color configs, show_existing short-circuit, quality
mapping, IVF/WebM integration, and hostile bits."""

from __future__ import annotations

import pytest

from xetl_spark.operators.vp9 import (
    Vp9FormatError,
    vp9_header_build,
    vp9_header_probe,
    vp9_quality_estimate,
)


def test_header_field_matrix():
    h = vp9_header_build(
        1280, 720, profile=0, base_q_idx=120,
        quant_deltas={"delta_q_y_dc": 3, "delta_q_uv_ac": -7},
        filter_level=31, sharpness=5, render_size=(640, 360),
    )
    p = vp9_header_probe(h)
    assert (p["width"], p["height"]) == (1280, 720)
    assert (p["render_width"], p["render_height"]) == (640, 360)
    assert p["quant"] == {
        "base_q_idx": 120, "delta_q_y_dc": 3,
        "delta_q_uv_dc": 0, "delta_q_uv_ac": -7,
    }
    assert p["loop_filter"] == {"level": 31, "sharpness": 5,
                                "delta_enabled": False}
    assert p["bit_depth"] == 8 and p["subsampling"] == (1, 1)
    assert not p["lossless"]
    assert vp9_quality_estimate(p) == round(100 - 120 * 100 / 255)

    # profile 2 (10-bit), bt2020, lossless quantizer
    p2 = vp9_header_probe(
        vp9_header_build(64, 64, profile=2, bit_depth=10,
                         base_q_idx=0, color_space="bt2020")
    )
    assert p2["bit_depth"] == 10 and p2["lossless"]
    assert p2["color_space"] == "bt2020"
    # profile 3 (12-bit)
    p3 = vp9_header_probe(
        vp9_header_build(32, 32, profile=3, bit_depth=12)
    )
    assert p3["profile"] == 3 and p3["bit_depth"] == 12
    # RGB in profile 1 is 4:4:4
    p4 = vp9_header_probe(vp9_header_build(32, 32, profile=1, color_space="rgb"))
    assert p4["color_space"] == "rgb" and p4["subsampling"] == (0, 0)
    # error-resilient path skips the frame-context fields
    assert vp9_header_probe(vp9_header_build(16, 16, error_resilient=True))[
        "error_resilient"
    ]
    # trailing payload bytes don't disturb the parsed header
    pt = vp9_header_probe(vp9_header_build(16, 16, tail=b"\xaa" * 50))
    assert (pt["width"], pt["height"]) == (16, 16)


def test_ivf_and_webm_surface_vp9():
    from xetl_spark.operators.mediaprobe import ivf_build, ivf_probe
    from xetl_spark.operators.webm import webm_build, webm_probe

    key = vp9_header_build(640, 360, base_q_idx=200)
    p = ivf_probe(ivf_build([key, b"\x01" * 8], "VP90", 640, 360))
    assert p["vp9_header"]["quant"]["base_q_idx"] == 200
    w = webm_probe(
        webm_build(
            [{"number": 1, "type": "video", "codec": "V_VP9",
              "width": 640, "height": 360}],
            [(1, 0, True, key), (1, 40, False, b"\x01" * 6)],
        )
    )
    assert w["vp9_header"]["quant"]["base_q_idx"] == 200
    assert w["vp8_header"] is None
    # interframe-first stream: slot present but None
    inter = ivf_probe(ivf_build([b"\x84" + b"\x00" * 9], "VP90", 8, 8))
    assert inter["vp9_header"] is None


def test_hostile_bits():
    base = vp9_header_build(64, 48)
    for bad in (b"", b"\x00" * 10, base[:4]):
        with pytest.raises(Vp9FormatError):
            vp9_header_probe(bad)
    # builder guards
    with pytest.raises(Vp9FormatError):
        vp9_header_build(8, 8, profile=1, bit_depth=10)
    with pytest.raises(Vp9FormatError):
        vp9_header_build(8, 8, base_q_idx=256)
    # show_existing_frame short-circuit
    from xetl_spark.operators.vp9 import _MsbWriter

    w = _MsbWriter()
    w.bits(2, 2)   # marker
    w.bits(0, 1)   # profile low
    w.bits(0, 1)   # profile high
    w.bits(1, 1)   # show_existing_frame
    w.bits(5, 3)   # frame_to_show
    p = vp9_header_probe(w.done())
    assert p["show_existing_frame"] and p["frame_to_show"] == 5
