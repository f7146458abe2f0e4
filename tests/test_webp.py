"""WebP (VP8L lossless) codec: roundtrips across every encoder path,
hand-built streams for decode-only features (meta-prefix groups), an
independent wire-format golden, container probes (VP8 lossy / VP8X),
and hostile-byte triage."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xetl_spark.operators.imaging import (
    UnsupportedImageError,
    decode_image,
    sniff_format,
)
from xetl_spark.operators.webp import (
    _BitWriter,
    _encode_image_stream,
    _package_merge,
    webp_decode,
    webp_encode,
    webp_probe,
)


def _expect_rgba(img: np.ndarray) -> np.ndarray:
    if img.shape[2] == 4:
        return img
    h, w = img.shape[:2]
    return np.dstack([img, np.full((h, w), 255, np.uint8)])


def _images():
    rng = np.random.RandomState(42)
    yield rng.randint(0, 256, (7, 11, 3), np.uint8)  # noise
    yield rng.randint(0, 256, (5, 9, 4), np.uint8)  # noise + alpha
    two = np.zeros((6, 10, 3), np.uint8)
    two[:, 5:] = (200, 30, 90)
    yield two  # two-tone (palette-able, LZ77-able)
    gy = np.linspace(0, 255, 8)[:, None] + np.linspace(0, 99, 13)[None, :]
    yield np.stack([(gy % 256)] * 3, axis=2).astype(np.uint8)  # gradient
    yield np.tile(rng.randint(0, 256, (1, 17, 4), np.uint8), (9, 1, 1))
    yield np.zeros((1, 1, 3), np.uint8)  # minimal
    yield rng.randint(0, 256, (1, 40, 3), np.uint8)  # single row
    yield rng.randint(0, 256, (40, 1, 4), np.uint8)  # single column


@pytest.mark.parametrize(
    "opts",
    [
        {},
        {"use_lz77": False},
        {"subtract_green": True},
        {"cache_bits": 4},
        {"cache_bits": 8, "use_lz77": False},
        {"cache_bits": 11},
    ],
    ids=lambda o: "+".join(f"{k}={v}" for k, v in o.items()) or "plain",
)
def test_roundtrip_matrix(opts):
    for img in _images():
        dec = webp_decode(webp_encode(img, **opts))
        assert np.array_equal(dec, _expect_rgba(img))


def test_roundtrip_palette():
    rng = np.random.RandomState(3)
    # palette sizes straddling every bundling width: 2 (8px/byte),
    # 3-4 (4px/byte), 5-16 (2px/byte), 17+ (unbundled)
    for ncolors in (1, 2, 3, 4, 5, 16, 17, 40, 256):
        pal = rng.randint(0, 256, (ncolors, 3), np.uint8)
        img = pal[rng.randint(0, ncolors, (9, 13))]
        dec = webp_decode(webp_encode(img, palette=True))
        assert np.array_equal(dec, _expect_rgba(img)), ncolors
    big = rng.randint(0, 256, (20, 20, 3), np.uint8)  # >256 colors likely
    if len(np.unique(big.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(UnsupportedImageError):
            webp_encode(big, palette=True)


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_predictor_modes(mode):
    rng = np.random.RandomState(mode)
    for img in (
        rng.randint(0, 256, (6, 9, 3), np.uint8),
        rng.randint(0, 256, (17, 20, 4), np.uint8),  # multiple 16px blocks
        np.tile(np.arange(25, dtype=np.uint8)[None, :, None], (4, 1, 3)),
    ):
        dec = webp_decode(webp_encode(img, predictor=mode))
        assert np.array_equal(dec, _expect_rgba(img))


def test_roundtrip_color_transform():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (8, 18, 3), np.uint8)
    for deltas in ((0, 0, 0), (3, -5, 17), (-128, 127, 1), (127, -128, -1)):
        dec = webp_decode(webp_encode(img, color_deltas=deltas))
        assert np.array_equal(dec, _expect_rgba(img))


def test_one_transform_at_a_time():
    img = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(UnsupportedImageError):
        webp_encode(img, palette=True, subtract_green=True)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
    opt=st.sampled_from(
        ["plain", "sg", "cache", "pal", "pred7", "pred11", "pred13", "color"]
    ),
)
def test_roundtrip_fuzz(h, w, ch, seed, opt):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, ch), np.uint8)
    kw = {
        "plain": {},
        "sg": {"subtract_green": True},
        "cache": {"cache_bits": 6},
        "pal": {"palette": True},
        "pred7": {"predictor": 7},
        "pred11": {"predictor": 11},
        "pred13": {"predictor": 13},
        "color": {"color_deltas": (11, -22, 33)},
    }[opt]
    assert np.array_equal(
        webp_decode(webp_encode(img, **kw)), _expect_rgba(img)
    )


def test_meta_prefix_groups_decode():
    """Decode-only path: an entropy image routes the two 4x4 blocks of
    an 8x4 image to different prefix-code groups. Hand-built stream —
    the encoder never emits meta-prefix codes."""
    bw = _BitWriter()
    w, h = 8, 4
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-prefix present
    bw.write(0, 3)  # meta_bits = 2 -> 4x4 blocks -> entropy image 2x1
    # entropy pixels: meta_index = (r << 8) | g -> indices 0 and 1
    _encode_image_stream(
        bw,
        np.array([0xFF000000, 0xFF000100], np.uint32),
        2, 0, False, level0=False,
    )

    def simple1(sym):  # 1-symbol simple code (0 bits on the wire)
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)

    def simple2(a, b):  # 2-symbol simple code (1 bit per symbol)
        bw.write(1, 1)
        bw.write(1, 1)
        bw.write(1, 1)
        bw.write(a, 8)
        bw.write(b, 8)

    # group 0: green in {100 -> bit 0, 200 -> bit 1}; r/b/a fixed
    simple2(100, 200)
    simple1(10)  # red
    simple1(20)  # blue
    simple1(255)  # alpha
    simple1(0)  # distance (unused)
    # group 1: everything fixed
    simple1(50)
    simple1(60)
    simple1(70)
    simple1(255)
    simple1(0)
    # pixels, row-major: x<4 -> group 0 (green alternates), x>=4 -> group 1
    for _y in range(h):
        for x in range(4):
            bw.write(x & 1, 1)
    payload = b"\x2f" + bw.done()
    if len(payload) & 1:
        payload += b"\x00"
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff

    dec = webp_decode(data)
    assert dec.shape == (4, 8, 4)
    left_even = dec[:, 0:4:2]
    left_odd = dec[:, 1:4:2]
    assert (left_even == np.array([10, 100, 20, 255], np.uint8)).all()
    assert (left_odd == np.array([10, 200, 20, 255], np.uint8)).all()
    assert (dec[:, 4:] == np.array([60, 50, 70, 255], np.uint8)).all()


def test_wire_format_golden_1x1():
    """Pin the exact bytes of a 1x1 encode against an independent
    bit-builder so encoder and decoder can't co-drift off-spec."""
    enc = webp_encode(np.array([[[255, 0, 0]]], np.uint8))

    bits: list[int] = []

    def put(value, n):
        bits.extend((value >> i) & 1 for i in range(n))

    put(0, 14)  # width - 1
    put(0, 14)  # height - 1
    put(0, 1)  # no alpha
    put(0, 3)  # version
    put(0, 1)  # no transforms
    put(0, 1)  # no color cache
    put(0, 1)  # no meta-prefix
    for sym, wide in ((0, False), (255, True), (0, False), (255, True),
                      (0, False)):  # green, red, blue, alpha, distance
        put(1, 1)  # simple
        put(0, 1)  # one symbol
        put(1 if wide else 0, 1)
        put(sym, 8 if wide else 1)
    # all trees are single-symbol -> zero pixel bits
    raw = bytearray()
    for i in range(0, len(bits), 8):
        raw.append(sum(b << j for j, b in enumerate(bits[i : i + 8])))
    payload = b"\x2f" + bytes(raw)
    if len(payload) & 1:
        payload += b"\x00"
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    assert enc == b"RIFF" + struct.pack("<I", len(riff)) + riff
    assert np.array_equal(
        webp_decode(enc), np.array([[[255, 0, 0, 255]]], np.uint8)
    )


def test_package_merge_kraft_and_optimality():
    rng = np.random.RandomState(5)
    for _ in range(60):
        n = rng.randint(2, 300)
        freqs = [int(f) for f in rng.randint(0, 50, n)]
        if sum(1 for f in freqs if f) < 2:
            freqs[0] = freqs[1] = 1
        for max_len in (7, 15):
            if sum(1 for f in freqs if f) > (1 << max_len):
                continue
            lengths = _package_merge(freqs, max_len)
            nz = [ln for ln in lengths if ln]
            assert max(nz) <= max_len
            assert sum(2 ** (max_len - ln) for ln in nz) == 2**max_len
    # unlimited-depth case matches textbook huffman cost on a known input
    lengths = _package_merge([1, 1, 2, 4], 15)
    assert sorted(lengths) == [1, 2, 3, 3]


def test_probe_vp8_lossy_header():
    # minimal lossy container: frame tag + sync code + dims, no coeffs
    frame = bytes([0x10, 0x00, 0x00]) + b"\x9d\x01\x2a" + struct.pack(
        "<HH", 320, 240
    )
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(frame)) + frame
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    info = webp_probe(data)
    assert (info["variant"], info["width"], info["height"]) == ("vp8", 320, 240)
    with pytest.raises(UnsupportedImageError, match="lossy"):
        webp_decode(data)


def test_probe_vp8x_wrapped_lossless_still_decodes():
    inner = webp_encode(np.full((3, 5, 4), 9, np.uint8))
    vp8l_chunk = inner[12:]  # VP8L tag + size + payload
    vp8x = bytes([0x10, 0, 0, 0]) + (4).to_bytes(3, "little") + (2).to_bytes(
        3, "little"
    )
    body = b"WEBP" + b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    info = webp_probe(data)
    assert info["variant"] == "vp8l" and info["extended"]
    assert (info["width"], info["height"]) == (5, 3)  # VP8X canvas dims
    assert info["alpha"]
    assert webp_decode(data).shape == (3, 5, 4)


def test_sniff_and_decode_image_dispatch():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    enc = webp_encode(img)
    assert sniff_format(enc) == "webp"
    assert np.array_equal(decode_image(enc)[:, :, :3], img)


def test_hostile_bytes_are_typed():
    enc = webp_encode(np.zeros((4, 6, 3), np.uint8), cache_bits=3)
    for cut in (3, 11, 13, 20, len(enc) - 1):
        with pytest.raises(UnsupportedImageError):
            webp_decode(enc[:cut] + b"\x00")
    for blob in (b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"\x2f" * 30):
        with pytest.raises(UnsupportedImageError):
            webp_probe(blob)
    bad_sig = bytearray(enc)
    bad_sig[20] = 0x30  # corrupt the VP8L signature byte
    with pytest.raises(UnsupportedImageError):
        webp_decode(bytes(bad_sig))
    rng = np.random.RandomState(1)
    for _ in range(40):  # random tail corruption never escapes untyped
        blob = bytearray(enc)
        i = rng.randint(21, len(blob))
        blob[i] = rng.randint(0, 256)
        try:
            webp_decode(bytes(blob))
        except UnsupportedImageError:
            pass


def test_animation_roundtrip_and_probe():
    """ANIM/ANMF: probe walks frames without decoding; decode renders
    the FIRST frame onto the canvas over the background color (the
    gif_decode first-frame contract)."""
    from xetl_spark.operators.webp import webp_encode_anim

    rng = np.random.RandomState(8)
    f1 = rng.randint(0, 256, (6, 8, 4), np.uint8)
    f2 = rng.randint(0, 256, (4, 6, 4), np.uint8)
    anim = webp_encode_anim(
        [f1, f2], [40, 60], offsets=[(0, 0), (2, 2)], loop=3,
        bgcolor=(10, 20, 30, 255),
    )
    info = webp_probe(anim)
    assert info["animation"] and info["extended"]
    assert (info["n_frames"], info["duration_ms"], info["loop_count"]) == (2, 100, 3)
    assert info["bgcolor"] == (10, 20, 30, 255)
    assert (info["width"], info["height"]) == (8, 6)
    assert np.array_equal(webp_decode(anim), f1)  # frame 1 fills canvas

    # smaller first frame at an offset -> background shows around it
    anim2 = webp_encode_anim(
        [f2, f1], [10, 10], offsets=[(2, 2), (0, 0)], bgcolor=(9, 8, 7, 6)
    )
    dec = webp_decode(anim2)
    assert dec.shape == (6, 8, 4)
    assert np.array_equal(dec[2:6, 2:8], f2)
    assert tuple(dec[0, 0]) == (9, 8, 7, 6)

    with pytest.raises(UnsupportedImageError):
        webp_encode_anim([f1], offsets=[(1, 0)])  # odd offset
    with pytest.raises(UnsupportedImageError):
        webp_encode_anim([])


def test_probe_media_webp(spark):
    import pandas as pd

    from xetl_spark.operators.multimodal import probe_media
    from xetl_spark.operators.webp import webp_encode_anim

    frames = [np.zeros((4, 6, 3), np.uint8), np.ones((4, 6, 3), np.uint8)]
    payloads = {
        1: webp_encode(frames[0]),
        2: webp_encode_anim(frames, [25, 25]),
    }
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "media": [payloads[k] for k in payloads]}
    )
    rows = {
        r.id: r
        for r in probe_media(spark.createDataFrame(pdf), "media", "doc_id").collect()
    }
    assert rows[1].container == "webp" and rows[1].n_frames == 1
    assert (rows[1].width, rows[1].height) == (6, 4)
    assert rows[2].container == "webp" and rows[2].n_frames == 2
    assert rows[2].duration_ms == 50


def test_decode_frames_compositing():
    """webp_decode_frames: alpha-blend vs no-blend, dispose-to-
    background, per-frame durations, still-image degenerate case."""
    from xetl_spark.operators.webp import webp_decode_frames, webp_encode_anim

    f1 = np.full((4, 6, 4), 100, np.uint8)
    f1[:, :, 3] = 255
    f2 = np.zeros((2, 2, 4), np.uint8)
    f2[:, :] = (9, 9, 9, 0)  # fully transparent patch
    f3 = np.full((2, 2, 4), (7, 8, 9, 255), np.uint8)
    anim = webp_encode_anim(
        [f1, f2, f3], [10, 20, 30], offsets=[(0, 0), (2, 2), (0, 0)],
        flags=[0, 0, 2], bgcolor=(0, 0, 0, 255),
    )
    frames, durs = webp_decode_frames(anim)
    assert durs == [10, 20, 30]
    assert (frames[0][:, :, :3] == 100).all()
    # transparent patch alpha-blends to nothing: canvas unchanged
    assert np.array_equal(frames[1], frames[0])
    # frame 3 is no-blend: its rectangle overwrites incl. alpha
    assert tuple(frames[2][0, 0]) == (7, 8, 9, 255)
    assert (frames[2][2:, :, :3] == 100).all()

    # dispose-to-background clears the rect for the NEXT frame
    anim2 = webp_encode_anim(
        [f1, f3, f2], [5, 5, 5], offsets=[(0, 0), (2, 2), (0, 0)],
        flags=[0, 3, 0], bgcolor=(1, 2, 3, 255),  # no-blend + dispose
    )
    fr2, _ = webp_decode_frames(anim2)
    assert tuple(fr2[1][2, 2]) == (7, 8, 9, 255)
    assert tuple(fr2[2][2, 2]) == (1, 2, 3, 255)  # restored to bg

    still, sd = webp_decode_frames(webp_encode(f1))
    assert sd == [0] and np.array_equal(still[0], f1)


def test_sample_frames_animated_containers(spark):
    """multimodal.sample_frames real-decode path over animated WebP
    and GIF: composited frames, true cumulative timestamps, every_ms
    cadence — the training-pipeline fan-out for animated images."""
    import pandas as pd

    from xetl_spark.operators import gif, imaging
    from xetl_spark.operators.multimodal import sample_frames
    from xetl_spark.operators.webp import webp_encode_anim

    wfs = [np.full((4, 5, 3), 10 * (i + 1), np.uint8) for i in range(4)]
    gfs = [np.full((3, 4, 3), 20 * (i + 1), np.uint8) for i in range(3)]
    payloads = {
        1: webp_encode_anim(wfs, [100] * 4),
        2: gif.gif_encode(gfs, delays_cs=[10] * 3),  # 100 ms each
    }
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "media": [payloads[k] for k in payloads]}
    )
    out = sample_frames(
        spark.createDataFrame(pdf), "media", "doc_id",
        every_ms=150, max_frames=4, decode_stub=False,
    ).collect()
    got = {(r.id, r.frame_idx): r for r in out}
    # frames start at t=0,100,200,300; every_ms=150 -> emit 0, 2, 3
    assert sorted(k for k in got if k[0] == 1) == [(1, 0), (1, 2), (1, 3)]
    assert got[(1, 2)].frame_ts_ms == 200
    px = imaging.png_decode(bytes(got[(1, 2)].frame))
    assert (px[:, :, 0] == 30).all()
    # gif: frames at 0,100,200 -> emit 0, 2
    assert sorted(k for k in got if k[0] == 2) == [(2, 0), (2, 2)]
    assert (imaging.png_decode(bytes(got[(2, 2)].frame))[:, :, 1] == 60).all()


def test_grayscale_input_and_dimension_guards():
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    dec = webp_decode(webp_encode(g))
    assert np.array_equal(dec[:, :, 0], g)
    assert np.array_equal(dec[:, :, 1], g)
    with pytest.raises(UnsupportedImageError):
        webp_encode(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(UnsupportedImageError):
        webp_encode(np.zeros((4, (1 << 14) + 1, 3), np.uint8))


def test_probe_variant_all_lossy_animation():
    """An animated WebP whose every ANMF frame carries a lossy 'VP8 '
    payload (no VP8L anywhere) must probe as variant 'vp8', not
    'vp8l' — the frame tuple's flags byte is always an int and must
    not be mistaken for the VP8L payload slot."""
    def chunk(tag, body):
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    vp8_payload = b"\x00" * 10  # probe keys off the tag, not the bits
    anmf = (
        b"\x00\x00\x00"  # fx
        + b"\x00\x00\x00"  # fy
        + b"\x07\x00\x00"  # frame width - 1
        + b"\x05\x00\x00"  # frame height - 1
        + b"\x28\x00\x00"  # duration 40 ms
        + b"\x00"  # flags: blend, dispose-none
        + chunk(b"VP8 ", vp8_payload)
    )
    body = (
        chunk(
            b"VP8X",
            b"\x02" + b"\x00" * 3 + b"\x07\x00\x00" + b"\x05\x00\x00",
        )
        + chunk(b"ANIM", b"\xff\xff\xff\xff\x00\x00")
        + chunk(b"ANMF", anmf)
        + chunk(b"ANMF", anmf)
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    info = webp_probe(payload)
    assert info["variant"] == "vp8"
    assert info["animation"] and info["n_frames"] == 2
    with pytest.raises(UnsupportedImageError):
        webp_decode(payload)
    # a VP8L frame anywhere flips the variant back to decodable
    anmf_l = anmf[:16] + chunk(b"VP8L", b"\x2f" + b"\x00" * 8)
    body2 = body + chunk(b"ANMF", anmf_l)
    payload2 = b"RIFF" + struct.pack("<I", 4 + len(body2)) + b"WEBP" + body2
    assert webp_probe(payload2)["variant"] == "vp8l"


def test_alpha_plane_roundtrip_matrix():
    """ALPH encode/decode across every filter (none/horizontal/
    vertical/gradient) x compression (raw / headerless VP8L stream);
    container-level extraction via webp_alpha_plane with the VP8X
    alpha flag and a VP8 frame header present."""
    from xetl_spark.operators.webp import (
        alph_decode,
        alph_encode,
        webp_alpha_plane,
        webp_build_lossy_alpha,
        webp_lossy_header,
    )

    rng = np.random.RandomState(5)
    for method in range(4):
        for comp in (0, 1):
            a = rng.randint(0, 256, (9, 13), np.uint8)
            assert np.array_equal(
                alph_decode(alph_encode(a, method, comp), 13, 9), a
            ), (method, comp)
    # gradient filter on a smooth ramp (the case it was designed for)
    y, x = np.mgrid[0:12, 0:20]
    ramp = ((x * 7 + y * 3) % 256).astype(np.uint8)
    payload = webp_build_lossy_alpha(ramp, method=3, compression=1, y_ac_qi=55)
    assert np.array_equal(webp_alpha_plane(payload), ramp)
    info = webp_probe(payload)
    assert info["alpha"] and info["variant"] == "vp8"
    assert webp_lossy_header(payload)["quant"]["y_ac_qi"] == 55
    # a lossless webp has no ALPH chunk -> typed error
    solid = webp_encode(np.full((4, 4, 3), 9, np.uint8))
    with pytest.raises(UnsupportedImageError, match="no ALPH"):
        webp_alpha_plane(solid)
    with pytest.raises(UnsupportedImageError):
        alph_decode(b"", 4, 4)
    with pytest.raises(UnsupportedImageError, match="truncated"):
        alph_decode(b"\x00" + b"x" * 5, 4, 4)  # raw plane too short
