"""GIF (LZW) and BMP codecs: synthetic round-trips, JVM ImageIO golden
cross-validation (ImageIO writes real GIF/BMP files), probe contract,
and the probe_media / decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from xetl_spark.operators import gif, imaging as im

rng = np.random.default_rng(77)


def _quantized(shape, ncolors=7):
    """Random image with few distinct colors (GIF fixtures need <=256)."""
    palette = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, shape[:2])
    return palette[idx]


def test_gif_roundtrip_single_frame():
    a = _quantized((13, 17, 3))
    got = gif.gif_decode(gif.gif_encode([a]))
    assert np.array_equal(got, a)


def test_gif_roundtrip_stresses_lzw_width_growth():
    """>64 distinct colors force the code width past its initial size
    mid-stream; a wide image forces many table entries."""
    a = _quantized((40, 90, 3), ncolors=200)
    assert np.array_equal(gif.gif_decode(gif.gif_encode([a])), a)


def test_gif_probe_multiframe_without_decode():
    frames = [_quantized((9, 11, 3)) for _ in range(5)]
    payload = gif.gif_encode(frames, delays_cs=[10, 20, 30, 40, 50])
    p = gif.gif_probe(payload)
    assert p["n_frames"] == 5
    assert (p["width"], p["height"]) == (11, 9)
    assert p["duration_ms"] == 1500
    assert p["version"] == "89a"
    # first frame still decodes from the animated payload
    assert np.array_equal(gif.gif_decode(payload), frames[0])


def test_gif_matches_jvm_imageio(spark, tmp_path):
    """Golden: the JVM ImageIO GIF writer's real LZW output (with its
    own palette ordering) decodes bit-exact — GIF is lossless for
    <=256-color input."""
    a = _quantized((23, 31, 3), ncolors=30)
    src = str(tmp_path / "a.png")
    with open(src, "wb") as fh:
        fh.write(im.png_encode(a))
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(src))
    out = str(tmp_path / "a.gif")
    assert jvm.javax.imageio.ImageIO.write(img, "gif", jvm.java.io.File(out))
    payload = open(out, "rb").read()
    got = gif.gif_decode(payload)
    assert got.shape[2] in (3, 4)
    assert np.array_equal(got[:, :, :3], a)
    p = gif.gif_probe(payload)
    assert (p["width"], p["height"], p["n_frames"]) == (31, 23, 1)


def test_gif_transparency_yields_alpha():
    a = _quantized((6, 6, 3), ncolors=3)
    payload = bytearray(gif.gif_encode([a], delays_cs=[0]))
    # set the GCE transparency flag on index 0 (byte layout per encoder:
    # 21 F9 04 <packed> <delay u16> <tidx> 00)
    i = payload.index(bytes([0x21, 0xF9, 4]))
    payload[i + 3] |= 1  # transparent color flag
    payload[i + 6] = 0  # transparent index: palette slot 0
    got = gif.gif_decode(bytes(payload))
    assert got.shape[2] == 4
    assert set(np.unique(got[:, :, 3])) <= {0, 255}


def test_gif_malformed_raises():
    with pytest.raises(gif.GifFormatError):
        gif.gif_decode(b"GIF89a" + b"\x00" * 8)  # no frame
    with pytest.raises(gif.GifFormatError):
        gif.gif_decode(b"NOTAGIF")
    a = _quantized((5, 5, 3))
    payload = gif.gif_encode([a])
    with pytest.raises(gif.GifFormatError):
        gif.gif_decode(payload[: len(payload) // 2])


def test_bmp_roundtrip_and_jvm_golden(spark, tmp_path):
    a = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    assert np.array_equal(im.bmp_decode(im.bmp_encode(a)), a)
    # golden: JVM ImageIO's BMP writer output decodes bit-exact
    src = str(tmp_path / "b.png")
    with open(src, "wb") as fh:
        fh.write(im.png_encode(a))
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(src))
    out = str(tmp_path / "b.bmp")
    assert jvm.javax.imageio.ImageIO.write(img, "bmp", jvm.java.io.File(out))
    assert np.array_equal(im.bmp_decode(open(out, "rb").read()), a)


def test_dispatch_gif_bmp():
    a = _quantized((8, 8, 3))
    assert im.sniff_format(gif.gif_encode([a])) == "gif"
    assert im.sniff_format(im.bmp_encode(a)) == "bmp"
    assert np.array_equal(im.decode_image(gif.gif_encode([a])), a)
    assert np.array_equal(im.decode_image(im.bmp_encode(a)), a)


def test_gif_decode_frames_compositing():
    """gif_decode_frames: sub-rect placement, transparent-index
    passthrough, disposal 2 (restore background) and 3 (restore
    previous), delays in ms."""
    import numpy as np

    base = np.zeros((6, 8, 3), np.uint8)
    patch = np.full((2, 3, 3), 200, np.uint8)
    tcol = (1, 2, 3)
    patch2 = patch.copy()
    patch2[0, 0] = tcol
    g = gif.gif_encode(
        [base, patch, patch2], delays_cs=[1, 2, 3],
        offsets=[(0, 0), (2, 2), (4, 2)], disposals=[0, 2, 0],
        transparent_color=tcol,
    )
    frames, delays = gif.gif_decode_frames(g)
    assert delays == [10, 20, 30]
    assert (frames[0][:, :, :3] == 0).all() and (frames[0][:, :, 3] == 255).all()
    assert np.array_equal(frames[1][2:4, 2:5, :3], patch)
    # disposal 2 restored frame-2's rect before frame 3 (at left=4)
    assert (frames[2][2:4, 2:4, :3] == 0).all()
    assert frames[2][2, 4, 0] == 0  # transparent pixel -> restored bg
    assert (frames[2][2, 5, :3] == 200).all()

    g3 = gif.gif_encode(
        [base, patch, patch], delays_cs=[1, 1, 1],
        offsets=[(0, 0), (2, 2), (0, 0)], disposals=[0, 3, 0],
    )
    f3, _ = gif.gif_decode_frames(g3)
    assert np.array_equal(f3[1][2:4, 2:5, :3], patch)
    assert np.array_equal(f3[2][0:2, 0:3, :3], patch)  # frame 3 at origin
    assert (f3[2][2:4, 2:5, :3] == 0).all()  # frame 2 undone

    # full-frame animation: every composited frame IS the source frame
    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, (5, 3), np.uint8)
    fr = [pal[rng.randint(0, 5, (6, 8))] for _ in range(3)]
    frames, _ = gif.gif_decode_frames(gif.gif_encode(fr, delays_cs=[5, 5, 5]))
    for got, exp in zip(frames, fr):
        assert np.array_equal(got[:, :, :3], exp)


def test_probe_media_gif_bmp(spark):
    import pandas as pd

    from xetl_spark.operators.multimodal import probe_media

    frames = [_quantized((10, 12, 3)) for _ in range(3)]
    payloads = {
        1: gif.gif_encode(frames, delays_cs=[5, 5, 5]),
        2: im.bmp_encode(_quantized((21, 33, 3))),
    }
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "media": [payloads[k] for k in payloads]}
    )
    rows = {
        r.id: r
        for r in probe_media(spark.createDataFrame(pdf), "media", "doc_id").collect()
    }
    assert rows[1].container == "gif" and rows[1].n_frames == 3
    assert (rows[1].width, rows[1].height, rows[1].duration_ms) == (12, 10, 150)
    assert rows[2].container == "bmp" and (rows[2].width, rows[2].height) == (33, 21)
