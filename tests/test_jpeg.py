"""Pure-numpy baseline JPEG codec (operators/jpeg.py).

Validation strategy mirrors the PNG/WAV/Y4M codecs — pin the codec at
pixel level, then the operator surface — plus a differential oracle no
other codec here has: the Spark distribution bundles real camera JPEGs
and the JVM `image` data source (Java ImageIO) decodes them, so the
decoder is checked against an independent production decoder on
real-world 4:2:0 files, not just its own encoder.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from xetl_spark.operators import jpeg
from xetl_spark.operators.imaging import UnsupportedImageError, decode_image, sniff_format

rng = np.random.default_rng(7)

REAL_JPEG_DIR = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


def _gradient(h=48, w=64):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 3) % 200, (yy * 4) % 200, ((xx + yy) * 2) % 200], axis=2
    ).astype(np.uint8)


def test_roundtrip_smooth_high_quality():
    img = _gradient()
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=95))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 25


def test_roundtrip_quality_monotone():
    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    errs = []
    for q in (30, 60, 90):
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(noise, quality=q))
        errs.append(np.abs(dec.astype(int) - noise.astype(int)).mean())
    assert errs[0] > errs[1] > errs[2]  # higher quality, lower error


def test_uniform_blocks_exact_at_q100():
    """Per-8x8-block uniform images carry only DC coefficients; with
    unit quant tables (quality 100) the round-trip is bit-exact — the
    invariant q_multimodal_jpeg's SQL oracle relies on."""
    arr = np.zeros((16, 24, 3), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                40 * by + 25 * bx,
                200 - 30 * bx,
                17 + 60 * by,
            )
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(arr, quality=100))
    assert np.array_equal(dec, arr)


def test_grayscale_single_component():
    g = (np.arange(40)[None, :] * 5 % 256 * np.ones((24, 1))).astype(np.uint8)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(g, quality=92))
    assert dec.shape == (24, 40, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 3


def test_odd_dimensions_edge_padding():
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=95))
    assert dec.shape == (13, 17, 3)


def test_restart_markers_equal_plain():
    """RSTn segmentation must not change decoded pixels: the encoder's
    DRI output decodes identically to the unsegmented stream."""
    img = _gradient(24, 32)
    plain = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=90))
    restarted = jpeg.jpeg_decode(
        jpeg.jpeg_encode(img, quality=90, restart_interval=2)
    )
    assert np.array_equal(plain, restarted)


def test_restart_with_progressive_rejected():
    """Progressive scan scripts emit no DRI/RSTn — a caller requesting
    restart segments must get a typed error, not a stream without them
    (both entropy coders)."""
    img = _gradient(16, 16)
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_encode(img, quality=90, progressive=True, restart_interval=2)
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_encode(
            img, quality=90, progressive=True, arithmetic=True, restart_interval=2
        )


def test_truncated_stream_typed_error():
    payload = jpeg.jpeg_encode(_gradient(16, 16), quality=90)
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_decode(payload[: len(payload) // 2])
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_decode(b"\x00\x01not a jpeg")


def test_decode_image_dispatches_jpeg():
    img = _gradient(16, 16)
    payload = jpeg.jpeg_encode(img, quality=95)
    assert sniff_format(payload) == "jpeg"
    assert decode_image(payload).shape == (16, 16, 3)


@pytest.mark.skipif(
    not glob.glob(f"{REAL_JPEG_DIR}/**/*.jpg", recursive=True),
    reason="Spark-bundled sample JPEGs not present",
)
def test_real_world_jpegs_match_imageio(spark):
    """Differential oracle: every baseline JPEG shipped with the Spark
    distribution decodes within tight tolerance of the JVM's ImageIO
    decoder (Spark `image` data source). These are real encoder
    outputs — 4:2:0 subsampled camera files — so this pins Huffman
    decode, dequantization, IDCT, chroma upsampling, and the YCbCr
    matrix against an independent implementation."""
    checked = 0
    for path in sorted(glob.glob(f"{REAL_JPEG_DIR}/**/*.jpg", recursive=True)):
        payload = open(path, "rb").read()
        try:
            mine = jpeg.jpeg_decode(payload)
        except UnsupportedImageError:
            continue  # progressive — out of scope by contract
        row = (
            spark.read.format("image").load(path).select("image.*").collect()[0]
        )
        ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        if row.nChannels == 3:
            ref = ref[:, :, ::-1]  # Spark image source is BGR
        assert mine.shape == ref.shape
        err = np.abs(mine.astype(int) - ref.astype(int))
        # mean within a fraction of a level; p99 a few levels (ImageIO
        # uses smooth chroma upsampling, we use nearest)
        assert err.mean() < 3.0, path
        assert np.percentile(err, 99) <= 12, path
        checked += 1
    assert checked >= 4  # the distribution ships several baseline files


@pytest.mark.skipif(
    not glob.glob(f"{REAL_JPEG_DIR}/**/*.jpg", recursive=True),
    reason="Spark-bundled sample JPEGs not present",
)
def test_progressive_jpegs_match_imageio(spark, tmp_path):
    """Progressive (SOF2) golden round-trip: re-encode each bundled
    baseline JPEG as progressive with the JVM's ImageIO writer (the
    classic jpeg_simple_progression scan script — interleaved DC with
    successive approximation, per-component spectral-selection AC
    scans, AC refinement passes) and require our decoder to match the
    JVM's decode of the SAME progressive file within the baseline
    test's tolerances (nearest vs smooth chroma upsampling)."""
    jvm = spark._jvm
    checked = 0
    for path in sorted(glob.glob(f"{REAL_JPEG_DIR}/**/*.jpg", recursive=True)):
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        out = str(tmp_path / f"prog_{checked}.jpg")
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(jvm.java.io.File(out))
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        ios.close()
        writer.dispose()

        payload = open(out, "rb").read()
        sof = _sof_marker(payload)
        assert sof == 2, f"JVM did not emit SOF2 for {path}"
        mine = jpeg.jpeg_decode(payload)
        row = spark.read.format("image").load(out).select("image.*").collect()[0]
        ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        if row.nChannels == 3:
            ref = ref[:, :, ::-1]  # Spark image source is BGR
        assert mine.shape == ref.shape
        err = np.abs(mine.astype(int) - ref.astype(int))
        assert err.mean() < 3.0, path
        assert np.percentile(err, 99) <= 12, path
        checked += 1
    assert checked >= 4


def _sof_marker(data: bytes) -> int | None:
    i = 2
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xC0 <= data[i + 1] <= 0xCF and data[i + 1] not in (
            0xC4, 0xC8, 0xCC,
        ):
            return data[i + 1] - 0xC0
        i += 1
    return None


def test_progressive_encode_decodes_bit_identical_to_baseline():
    """The pure-Python progressive mode (spectral-selection scan
    script) carries exactly the same quantized coefficients as
    baseline mode, so decode must be bit-identical — any disagreement
    means the multi-scan bookkeeping (DC scan, per-component AC band
    scans, EOB-run handling) corrupted a coefficient."""
    rng = np.random.default_rng(7)
    img = (np.cumsum(rng.integers(-3, 4, (40, 56, 3)), axis=1) % 256).astype(
        np.uint8
    )
    prog = jpeg.jpeg_encode(img, quality=90, progressive=True)
    assert _sof_marker(prog) == 2
    assert np.array_equal(
        jpeg.jpeg_decode(prog), jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=90))
    )
    # uniform blocks at q100: DC-only, unit tables → exact round-trip
    u = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(
        jpeg.jpeg_decode(jpeg.jpeg_encode(u, quality=100, progressive=True)), u
    )
    # single-component (grayscale) progressive
    g = (np.arange(24 * 24) % 256).astype(np.uint8).reshape(24, 24)
    assert np.array_equal(
        jpeg.jpeg_decode(jpeg.jpeg_encode(g, quality=85, progressive=True)),
        jpeg.jpeg_decode(jpeg.jpeg_encode(g, quality=85)),
    )


def test_arithmetic_progressive_sof10_roundtrip():
    """SOF10 (arithmetic progressive — round 10) decodes pixel-
    identically to its SOF9 sequential-arithmetic, SOF2 Huffman-
    progressive, and baseline twins: the 4-scan successive-
    approximation script (DC first Al=1 / DC refine / AC first Al=1 /
    AC refine per component) reconstructs every quantized coefficient
    bit-exactly. Color + grayscale, odd sizes, 8- and 12-bit."""
    import numpy as np

    rng = np.random.default_rng(10)
    for shape, bits in [
        ((40, 56, 3), 8), ((33, 29), 8), ((24, 24, 3), 12), ((16, 9), 12),
    ]:
        maxv = (1 << bits) - 1
        img = rng.integers(0, maxv + 1, shape).astype(
            np.uint8 if bits == 8 else np.uint16
        )
        pb = jpeg.jpeg_encode(
            img, quality=85, bits=bits, arithmetic=True, progressive=True
        )
        assert b"\xff\xca" in pb  # really SOF10
        ncomp = 1 if len(shape) == 2 else 3
        assert pb.count(b"\xff\xda") == 2 + 2 * ncomp  # the scan script
        got = jpeg.jpeg_decode(pb)
        for twin in (
            jpeg.jpeg_encode(img, quality=85, bits=bits, arithmetic=True),
            jpeg.jpeg_encode(img, quality=85, bits=bits, progressive=True),
            jpeg.jpeg_encode(img, quality=85, bits=bits),
        ):
            assert np.array_equal(got, jpeg.jpeg_decode(twin)), (shape, bits)
    # DC-exact closed-form case (the driver-oracle pattern)
    flat = np.full((11, 13), 3000, dtype=np.uint16)
    out = jpeg.jpeg_decode(
        jpeg.jpeg_encode(
            flat, quality=100, bits=12, arithmetic=True, progressive=True
        )
    )
    assert (out[:, :, 0] == flat).all()


def test_sof10_malformed_dc_scan_typed_error():
    """A progressive-arithmetic stream whose 'DC' scan claims
    Se=63 (a baseline SOS inside a SOF10 frame — the hand-patched
    fuzz shape) fails with the typed error, not junk output."""
    img = _gradient(16, 16)
    payload = bytearray(jpeg.jpeg_encode(img, quality=90, arithmetic=True))
    i = payload.find(b"\xff\xc9")
    assert i > 0
    payload[i + 1] = 0xCA  # SOF9 -> SOF10; SOS still Ss=0..Se=63
    with pytest.raises(UnsupportedImageError, match="progressive DC scan"):
        jpeg.jpeg_decode(bytes(payload))


def test_qm_coder_roundtrip_random_decisions():
    """The QM arithmetic coder round-trips arbitrary decision streams
    bit-exactly across skew levels, and the decoder consumes the
    FF00-destuffed byte stream (the _entropy_segments contract)."""
    import random

    from xetl_spark.operators.jpeg_arith import QMDecoder, QMEncoder

    def destuff(data):
        out = bytearray()
        i = 0
        while i < len(data):
            out.append(data[i])
            i += 2 if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0 else 1
        return bytes(out)

    rng = random.Random(41)
    total_in = total_out = 0
    for _ in range(40):
        n = rng.randint(1, 2500)
        p = rng.random()
        bits = [(rng.randrange(8), 1 if rng.random() < p else 0) for _ in range(n)]
        enc = QMEncoder()
        st_e = bytearray(8)
        for ctx, b in bits:
            enc.encode(st_e, ctx, b)
        data = enc.flush()
        dec = QMDecoder(destuff(data))
        st_d = bytearray(8)
        assert [(ctx, dec.decode(st_d, ctx)) for ctx, _ in bits] == bits
        total_in += n
        total_out += len(data) * 8
    assert total_out < total_in  # adapts: beats 1 bit/decision overall
    # heavy skew compresses hard (the whole point of the QM coder)
    skew = [(0, 1 if rng.random() < 0.02 else 0) for _ in range(20000)]
    enc = QMEncoder()
    st_e = bytearray(1)
    for ctx, b in skew:
        enc.encode(st_e, ctx, b)
    data = enc.flush()
    assert len(data) * 8 < 0.25 * len(skew)
    dec = QMDecoder(destuff(data))
    st_d = bytearray(1)
    assert [(0, dec.decode(st_d, 0)) for _ in skew] == skew


def test_qm_state_table_structure():
    """Structural invariants of the 113-state probability machine:
    indices in range, switch exactly on the fast-attack MPS-exchange
    states, Qe values in (0, 0x8000), the fixed state self-looping."""
    from xetl_spark.operators.jpeg_arith import FIXED_STATE, QM_TABLE

    assert len(QM_TABLE) == 114
    for i, (qe, nmps, nlps, sw) in enumerate(QM_TABLE):
        assert 0 < qe < 0x8000, i
        assert 0 <= nmps <= FIXED_STATE and 0 <= nlps <= FIXED_STATE, i
        assert sw in (0, 1)
        if sw:
            assert qe >= 0x5000, i  # switch only near p=0.5
    qe, nmps, nlps, sw = QM_TABLE[FIXED_STATE]
    assert (nmps, nlps, sw) == (FIXED_STATE, FIXED_STATE, 0)


def test_arithmetic_block_codec_roundtrip():
    """DC/AC conditioning round-trips random coefficient blocks
    bit-exactly, including 12-bit-range magnitudes and long zero
    runs."""
    import random

    from xetl_spark.operators.jpeg_arith import (
        ArithState,
        QMDecoder,
        QMEncoder,
        decode_ac,
        decode_dc,
        encode_ac,
        encode_dc,
    )

    def destuff(data):
        out = bytearray()
        i = 0
        while i < len(data):
            out.append(data[i])
            i += 2 if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0 else 1
        return bytes(out)

    rng = random.Random(17)
    for _ in range(10):
        blocks = []
        for _b in range(rng.randint(1, 50)):
            zz = [0] * 64
            zz[0] = rng.randint(-2048, 2048)
            for k in range(1, 64):
                r = rng.random()
                zz[k] = (
                    0 if r < 0.6 else rng.randint(-15, 15) if r < 0.9 else rng.randint(-1023, 1023)
                )
            blocks.append(zz)
        enc = QMEncoder()
        es = ArithState(1)
        for zz in blocks:
            encode_dc(enc, es, 0, 0, 0, 1, zz[0])
            encode_ac(enc, es, 0, 5, zz)
        dec = QMDecoder(destuff(enc.flush()))
        ds = ArithState(1)
        got = []
        for _zz in blocks:
            zz2 = [0] * 64
            zz2[0] = decode_dc(dec, ds, 0, 0, 0, 1)
            decode_ac(dec, ds, 0, 5, zz2)
            got.append(zz2)
        assert got == blocks


def test_arithmetic_jpeg_matches_huffman_twin():
    """SOF9 files decode pixel-identically to the Huffman encoding of
    the same image (same DCT/quant pipeline, different entropy layer)
    and come out smaller; 8-bit and 12-bit, color and grayscale, odd
    dimensions, restart intervals."""
    import numpy as np

    rng = np.random.default_rng(5)
    cases = [((40, 56, 3), 8), ((33, 29), 8), ((24, 24, 3), 12), ((16, 9), 12)]
    for shape, bits in cases:
        maxv = (1 << bits) - 1
        h, w = shape[:2]
        base = ((np.mgrid[0:h, 0:w][0] * 3 + np.mgrid[0:h, 0:w][1] * 5) % (maxv + 1)).astype(np.float64)
        img = (
            np.stack([base, base * 0.5, maxv - base], axis=2)
            if len(shape) == 3
            else base
        )
        img = np.clip(img + rng.normal(0, maxv * 0.02, shape), 0, maxv).astype(
            np.uint8 if bits == 8 else np.uint16
        )
        hb = jpeg.jpeg_encode(img, quality=85, bits=bits)
        ab = jpeg.jpeg_encode(img, quality=85, bits=bits, arithmetic=True)
        assert np.array_equal(jpeg.jpeg_decode(ab), jpeg.jpeg_decode(hb))
        assert len(ab) < len(hb)  # the arithmetic win is the point
    # restart markers: per-segment coder + statistics reset
    img = (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8)
    a_rst = jpeg.jpeg_encode(img, quality=70, arithmetic=True, restart_interval=4)
    h_rst = jpeg.jpeg_encode(img, quality=70, restart_interval=4)
    assert np.array_equal(jpeg.jpeg_decode(a_rst), jpeg.jpeg_decode(h_rst))
    # integer-exact DC-only case (the oracle pattern)
    flat = np.full((11, 13), 3000, dtype=np.uint16)
    out = jpeg.jpeg_decode(jpeg.jpeg_encode(flat, quality=100, bits=12, arithmetic=True))
    assert (out[:, :, 0] == flat).all()


def test_quality_scaling_bounds():
    q1 = jpeg._quality_scale(jpeg._Q_LUMA, 1)
    q100 = jpeg._quality_scale(jpeg._Q_LUMA, 100)
    assert q100.min() == q100.max() == 1  # quality 100 → unit tables
    assert q1.max() == 255 and q1.min() >= 1


def test_lossless_sof3_roundtrip_all_predictors():
    """Lossless JPEG (SOF3): encode/decode must be bit-exact for every
    T.81 predictor, channel count, and degenerate shapes (no external
    lossless encoder exists in this container — exactness IS the
    spec contract being pinned)."""
    rng = np.random.default_rng(11)
    for shape in [(13, 9, 3), (8, 8, 1), (1, 5, 3), (5, 1, 1)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        for pred in range(1, 8):
            got = jpeg.jpeg_decode(jpeg.jpeg_lossless_encode(a, predictor=pred))
            assert np.array_equal(got, a), (shape, pred)


def test_lossless_sof3_smooth_image_compresses():
    """Predictive coding must beat raw size on smooth content (the
    point of the predictors) while staying exact."""
    g = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
    img = np.stack([g, g[::-1], g.T], axis=2)
    payload = jpeg.jpeg_lossless_encode(img, predictor=4)
    assert np.array_equal(jpeg.jpeg_decode(payload), img)
    assert len(payload) < img.size  # < 1 byte/sample on smooth content


def test_lossless_sof11_arithmetic_roundtrip():
    """Arithmetic lossless JPEG (SOF11, round 11 — T.81 Annex H.1.2.2
    QM-coder with (Da, Db) 5x5 conditioning): bit-exact for every
    predictor, channel count, and degenerate shape, and the stream
    really is SOF11 + DAC (no DHT)."""
    rng = np.random.default_rng(11)
    for shape in [(13, 9, 3), (8, 8, 1), (1, 5, 3), (5, 1, 1), (24, 17)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        for pred in range(1, 8):
            payload = jpeg.jpeg_lossless_encode(
                a, predictor=pred, arithmetic=True
            )
            assert b"\xff\xcb" in payload and b"\xff\xcc" in payload
            assert b"\xff\xc4" not in payload[: payload.find(b"\xff\xda")]
            got = jpeg.jpeg_decode(payload)
            want = a[:, :, None] if a.ndim == 2 else a
            assert np.array_equal(got, want), (shape, pred)


def test_lossless_sof11_beats_huffman_on_smooth_content():
    """The adaptive QM-coder should out-compress the static Huffman
    lossless tables on smooth content while staying exact."""
    g = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
    img = np.stack([g, g[::-1], g.T], axis=2)
    hb = jpeg.jpeg_lossless_encode(img, predictor=4)
    ab = jpeg.jpeg_lossless_encode(img, predictor=4, arithmetic=True)
    assert np.array_equal(jpeg.jpeg_decode(ab), img)
    assert len(ab) < len(hb)


def test_hierarchical_arithmetic_sof13_sof14_pixel_parity():
    """Arithmetic hierarchical pyramids (round 11): SOF9 base + SOF13
    differential (sequential) and SOF10 base + SOF14 differential
    (progressive spectral-selection) decode pixel-identically to the
    Huffman SOF0+SOF5 pyramid — all three code the same quantized
    coefficients; only the entropy layer differs."""
    rng = np.random.default_rng(5)
    for shape, levels in [((40, 56, 3), 2), ((33, 29), 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        hb = jpeg.jpeg_encode_hierarchical(img, levels=levels, quality=85)
        sb = jpeg.jpeg_encode_hierarchical(
            img, levels=levels, quality=85, arithmetic=True
        )
        pb = jpeg.jpeg_encode_hierarchical(
            img, levels=levels, quality=85, arithmetic=True, progressive=True
        )
        assert b"\xff\xc9" in sb and b"\xff\xcd" in sb  # SOF9 + SOF13
        assert b"\xff\xca" in pb and b"\xff\xce" in pb  # SOF10 + SOF14
        ref = jpeg.jpeg_decode(hb)
        assert np.array_equal(jpeg.jpeg_decode(sb), ref), (shape, levels)
        assert np.array_equal(jpeg.jpeg_decode(pb), ref), (shape, levels)
    # Huffman progressive pyramids are not a supported combination
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_encode_hierarchical(
            rng.integers(0, 256, (8, 8), dtype=np.uint8), progressive=True
        )


def test_lossless_sof3_fuzz_typed_errors():
    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    payload = jpeg.jpeg_lossless_encode(a)
    for cut in range(10, len(payload), 13):
        try:
            jpeg.jpeg_decode(payload[:cut])
        except jpeg.UnsupportedImageError:
            pass


def test_probe_media_lossless_jpeg_dims(spark):
    import pandas as pd

    from xetl_spark.operators.multimodal import probe_media

    a = np.random.default_rng(4).integers(0, 256, (21, 34, 3), dtype=np.uint8)
    pdf = pd.DataFrame({"doc_id": [1], "media": [jpeg.jpeg_lossless_encode(a)]})
    (r,) = probe_media(spark.createDataFrame(pdf), "media", "doc_id").collect()
    assert r.container == "jpeg" and (r.width, r.height) == (34, 21)


def test_12bit_sequential_roundtrip():
    """12-bit extended-sequential (SOF1): uint16 output in 0..4095,
    relative reconstruction error comparable to the 8-bit path at the
    same quality."""
    import numpy as np

    from xetl_spark.operators import jpeg

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:40, 0:56]
    base = (yy * 50.0 + xx * 30.0)[:, :, None]
    img = np.clip(base + rng.normal(0, 40, (40, 56, 3)), 0, 4095).astype(np.uint16)
    enc = jpeg.jpeg_encode(img, quality=95, bits=12)
    dec = jpeg.jpeg_decode(enc)
    assert dec.dtype == np.uint16 and dec.shape == (40, 56, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() < 4096 * 0.03 and err.mean() < 4096 * 0.01
    # SOF1 + 16-bit DQT actually on the wire
    assert enc.find(b"\xff\xc1") > 0 and enc[enc.find(b"\xff\xdb") + 4] & 0x10


def test_12bit_progressive_matches_sequential():
    import numpy as np

    from xetl_spark.operators import jpeg

    rng = np.random.default_rng(7)
    img = np.clip(
        np.mgrid[0:24, 0:24][0][:, :, None] * 150.0
        + rng.normal(0, 30, (24, 24, 3)),
        0, 4095,
    ).astype(np.uint16)
    seq = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=92, bits=12))
    prog = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=92, bits=12, progressive=True))
    assert np.array_equal(seq, prog)


def test_12bit_grayscale_and_guards():
    import numpy as np
    import pytest

    from xetl_spark.operators import jpeg
    from xetl_spark.operators.imaging import UnsupportedImageError

    g = (np.mgrid[0:16, 0:16][0] * 250).astype(np.uint16)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(g, quality=98, bits=12))
    assert dec.dtype == np.uint16 and dec.shape == (16, 16, 1)
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_encode(g, bits=10)
    # hand-build a 12-bit SOF0: baseline must be 8-bit per T.81
    enc = bytearray(jpeg.jpeg_encode((g >> 4).astype(np.uint8), quality=90))
    i = enc.find(b"\xff\xc0")
    enc[i + 4] = 12
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_decode(bytes(enc))


def test_hierarchical_roundtrip_quality_parity():
    """3-level hierarchical pyramid reconstructs with error comparable
    to single-frame baseline at the same quality (the pyramid codes
    true decoder residuals, so precision is not lost across levels)."""
    import numpy as np

    from xetl_spark.operators import jpeg

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:33, 0:47]
    img = np.clip(
        np.stack([yy * 3 + xx, 255 - xx * 2, (yy + xx) * 2], axis=2)
        + rng.normal(0, 8, (33, 47, 3)),
        0, 255,
    ).astype(np.uint8)
    enc = jpeg.jpeg_encode_hierarchical(img, levels=3, quality=90)
    dec = jpeg.jpeg_decode(enc)
    assert dec.shape == (33, 47, 3) and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    base = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=90))
    berr = np.abs(base.astype(int) - img.astype(int))
    assert err.mean() <= berr.mean() * 1.25 + 1.0
    # hierarchical structure actually on the wire
    for marker in (b"\xff\xde", b"\xff\xdf", b"\xff\xc5"):
        assert enc.find(marker) > 0


def test_hierarchical_grayscale_and_single_level():
    import numpy as np

    from xetl_spark.operators import jpeg

    g = (np.mgrid[0:20, 0:28][0] * 9).astype(np.uint8)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode_hierarchical(g, levels=2, quality=95))
    assert dec.shape == (20, 28, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 6
    # levels=1 degenerates to DHP + one non-differential frame
    one = jpeg.jpeg_encode_hierarchical(g, levels=1, quality=95)
    assert np.array_equal(
        jpeg.jpeg_decode(one), jpeg.jpeg_decode(jpeg.jpeg_encode(g, quality=95))
    ) or np.abs(
        jpeg.jpeg_decode(one).astype(int)
        - jpeg.jpeg_decode(jpeg.jpeg_encode(g, quality=95)).astype(int)
    ).max() <= 1


def test_hierarchical_error_paths():
    import numpy as np
    import pytest

    from xetl_spark.operators import jpeg
    from xetl_spark.operators.imaging import UnsupportedImageError

    g = (np.mgrid[0:16, 0:16][0] * 15).astype(np.uint8)
    enc = bytearray(jpeg.jpeg_encode_hierarchical(g, levels=2, quality=90))
    # differential frame without a preceding reference: strip the base
    # frame by renaming its SOF0 to a COM marker the walker skips
    i = enc.find(b"\xff\xc0")
    enc2 = bytes(enc[:i]) + b"\xff\xfe" + bytes(enc[i + 2 :])
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_decode(enc2)
    # EXP expansion nibble > 1 is invalid per T.81
    j = bytes(enc).find(b"\xff\xdf")
    enc3 = bytearray(enc)
    enc3[j + 4] = 0x22
    with pytest.raises(UnsupportedImageError):
        jpeg.jpeg_decode(bytes(enc3))


def test_hierarchical_lossless_pyramid_bit_exact():
    """SOF7/SOF15 (the last T.81 frame family): lossless pyramids
    reconstruct bit-exact pixels across levels, channels, predictors,
    and both entropy coders."""
    import numpy as np

    from xetl_spark.operators.jpeg import (
        jpeg_decode,
        jpeg_encode_hierarchical_lossless,
    )

    rng = np.random.RandomState(17)
    for h, w, nch in ((9, 13, 1), (16, 16, 3), (33, 21, 3)):
        img = rng.randint(0, 256, (h, w, nch), np.uint8)
        for levels in (1, 2, 3):
            for arith in (False, True):
                enc = jpeg_encode_hierarchical_lossless(
                    img, levels=levels, predictor=4, arithmetic=arith
                )
                dec = jpeg_decode(enc).reshape(h, w, -1)
                assert np.array_equal(dec, img), (h, w, nch, levels, arith)
    # every predictor drives the base frame correctly
    img = rng.randint(0, 256, (12, 15, 3), np.uint8)
    for pred in range(1, 8):
        enc = jpeg_encode_hierarchical_lossless(img, levels=2, predictor=pred)
        assert np.array_equal(jpeg_decode(enc).reshape(12, 15, 3), img), pred


def test_hierarchical_mixed_mode_rejected():
    """A pyramid mixing DCT and lossless frames is a T.81 violation
    and must raise the typed error, not mis-decode."""
    import numpy as np
    import pytest as _pytest

    from xetl_spark.operators.imaging import UnsupportedImageError
    from xetl_spark.operators.jpeg import (
        jpeg_decode,
        jpeg_encode_hierarchical,
        jpeg_encode_hierarchical_lossless,
    )

    img = np.full((8, 8, 3), 77, np.uint8)
    lossless = jpeg_encode_hierarchical_lossless(img, levels=2)
    dct = jpeg_encode_hierarchical(img, levels=2)
    # graft the DCT stream's first SOF0 frame header into the lossless
    # stream right before EOI: frame markers after a lossless frame
    sof0 = dct[dct.index(b"\xff\xc0") :][:20]
    hacked = lossless[:-2] + sof0
    with _pytest.raises(UnsupportedImageError, match="mixed"):
        jpeg_decode(hacked)
