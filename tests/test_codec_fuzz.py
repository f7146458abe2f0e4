"""Hostile-input fuzz for every pure-Python codec: random bytes,
bit-flipped valid payloads, and truncations must raise the codec's
typed error (or decode successfully) — never escape as IndexError /
struct.error / RecursionError, which would fail a whole Spark stage
on one bad document."""

from __future__ import annotations

import numpy as np
import pytest

from xetl_spark.operators import gif, imaging as im, mediaprobe as mp
from xetl_spark.operators.archive import ArchiveFormatError, iter_members
from xetl_spark.operators.exif import exif_parse
from xetl_spark.operators.tiff import TiffFormatError, tiff_decode, tiff_probe
from xetl_spark.sources import snappy, warc
from xetl_spark.sources.avro import AvroFormatError, UnsupportedAvroError, parse_container

rng = np.random.default_rng(2026)


def _mutations(payload: bytes, n_flip: int = 40, n_trunc: int = 25):
    yield payload
    for _ in range(n_flip):
        b = bytearray(payload)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
        yield bytes(b)
    for _ in range(n_trunc):
        yield payload[: rng.integers(0, len(payload))]
    for ln in (0, 1, 7, 64, 500):
        yield bytes(rng.integers(0, 256, ln, dtype=np.uint8).tolist())


def _check(decode, payload_gen, allowed):
    for p in payload_gen:
        try:
            decode(p)
        except allowed:
            pass  # typed rejection is the contract
        # any other exception type propagates and fails the test


def test_fuzz_gif():
    a = rng.integers(0, 8, (9, 11), dtype=np.uint8)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    payload = gif.gif_encode([pal[a]], delays_cs=[5])
    _check(gif.gif_decode, _mutations(payload), (gif.GifFormatError,))
    _check(gif.gif_probe, _mutations(payload), (gif.GifFormatError,))


def test_fuzz_tiff():
    a = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    from xetl_spark.operators.tiff import tiff_build

    payload = tiff_build(a)
    _check(tiff_decode, _mutations(payload), (TiffFormatError,))
    _check(tiff_probe, _mutations(payload), (TiffFormatError,))


def test_fuzz_bmp_png():
    a = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    _check(im.bmp_decode, _mutations(im.bmp_encode(a)), (im.UnsupportedImageError,))
    # PNG mutations can corrupt the zlib stream too
    import zlib

    _check(
        im.png_decode,
        _mutations(im.png_encode(a)),
        (im.UnsupportedImageError, zlib.error),
    )


def test_fuzz_snappy():
    payload = snappy.compress(bytes(rng.integers(0, 256, 300, dtype=np.uint8).tolist()))
    _check(snappy.decompress, _mutations(payload), (snappy.SnappyError,))


def test_fuzz_avro():
    from xetl_spark.sources.avro import encode_container

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    payload = encode_container(schema, [(i, f"v{i}") for i in range(30)], codec="null")
    _check(
        parse_container,
        _mutations(payload),
        (AvroFormatError, UnsupportedAvroError, UnicodeDecodeError, ValueError),
    )


def test_fuzz_warc():
    payload = warc.warc_build(
        [
            {
                "target_uri": "http://x/1",
                "record_id": "<urn:uuid:1>",
                "http": (200, "text/plain", b"hello"),
            }
        ]
    )
    _check(
        lambda p: list(warc.parse_warc(p)),
        _mutations(payload),
        (warc.WarcFormatError, OSError, EOFError),  # gzip magic flips → BadGzipFile
    )


def test_fuzz_archive():
    from xetl_spark.operators.archive import build_tar, build_zip

    for payload in (build_tar([("a.txt", b"alpha")], compress=True), build_zip([("b", b"x")])):
        _check(
            lambda p: list(iter_members(p)),
            _mutations(payload),
            (ArchiveFormatError, OSError, EOFError, ValueError),  # tarfile/zipfile/gzip typed errors
        )


def test_fuzz_media_probes():
    payloads = [
        mp.mp3_build(5, 128, 44100, 2),
        mp.h264_sps_build(16, 9),
        mp.mp4_build(64, 48, 1000),
        mp.flac_build(44100, 2, 44100),
        mp.ogg_build("opus", 2, 48000, 4800),
        mp.flac_build_frames(44100, 2, [4096, 192]),
    ]
    probes = [
        mp.mp3_probe,
        mp.h264_sps_probe,
        mp.mp4_probe,
        mp.flac_probe,
        mp.ogg_probe,
        mp.flac_frame_walk,
    ]
    allowed = (
        mp.Mp3FormatError,
        mp.H264FormatError,
        mp.Mp4FormatError,
        mp.FlacFormatError,
        mp.OggFormatError,
    )
    for payload, probe in zip(payloads, probes):
        _check(probe, _mutations(payload), allowed)


def test_fuzz_exif():
    # exif_parse's contract is dict-or-empty, never raise
    img = np.full((8, 8, 3), 7, np.uint8)
    from xetl_spark.operators import jpeg
    from xetl_spark.operators.exif import exif_build, insert_app1

    payload = insert_app1(
        jpeg.jpeg_encode(img, 90), exif_build({"make": "m", "orientation": 1})
    )
    for p in _mutations(payload):
        assert isinstance(exif_parse(p), dict)


def test_fuzz_jpeg():
    from xetl_spark.operators import jpeg

    a = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    for payload in (
        jpeg.jpeg_encode(a, 90),
        jpeg.jpeg_lossless_encode(a),
        jpeg.jpeg_encode(a, 90, bits=12) if a.dtype == np.uint8 else None,
        jpeg.jpeg_encode_hierarchical(a, levels=2, quality=90),
        # arithmetic scans: corrupt QM streams must coast/raise typed,
        # never hang or escape (the decoder feeds zeros past markers;
        # magnitude overflows surface as UnsupportedImageError)
        jpeg.jpeg_encode(a, 90, arithmetic=True),
        jpeg.jpeg_encode(a, 90, bits=12, arithmetic=True),
    ):
        if payload is None:
            continue
        _check(jpeg.jpeg_decode, _mutations(payload), (im.UnsupportedImageError,))


def test_flac_coded_number_roundtrip_property():
    """FLAC extended-UTF-8 frame numbers: encode/decode roundtrip over
    the 7-bit fast path and boundary values of each width class."""
    from xetl_spark.operators.mediaprobe import _flac_coded_number

    # decoder-only: values < 0x80 are 1 byte; craft wider codings by hand
    for v in (0, 1, 0x7F):
        assert _flac_coded_number(bytes([v]), 0) == (v, 1)
    # 2-byte class: 110xxxxx 10xxxxxx
    assert _flac_coded_number(bytes([0xC2, 0x80]), 0) == (0x80, 2)
    # malformed continuations return None, never raise
    assert _flac_coded_number(bytes([0xC2, 0xC0]), 0) is None
    assert _flac_coded_number(bytes([0xFF]), 0) is None
    assert _flac_coded_number(b"", 0) is None


def test_avro_varint_cap_property():
    """Hostile unbounded-continuation varints fail typed at the 64-bit
    cap instead of building huge Python ints (r6 advice item)."""
    import pytest

    from xetl_spark.sources.avro import AvroFormatError, _read_long

    # a legal max-width varint still decodes
    legal = bytes([0xFF] * 9 + [0x01])
    v, pos = _read_long(legal, 0)
    assert pos == 10
    with pytest.raises(AvroFormatError):
        _read_long(bytes([0xFF] * 11 + [0x01]), 0)
    with pytest.raises(AvroFormatError):
        _read_long(bytes([0x80] * 200), 0)


def test_jpeg_upsample2_matches_spec_reference():
    """J.1.1.2 expansion vs a scalar reference implementation on random
    planes (both directions, odd and even sizes)."""
    from xetl_spark.operators.jpeg import _upsample2

    rng2 = np.random.default_rng(11)
    for h, w in ((1, 1), (3, 5), (8, 8), (7, 12)):
        p = rng2.integers(0, 256, (h, w)).astype(np.int32)
        up = _upsample2(p, 1, 1)
        assert up.shape == (2 * h, 2 * w)
        for y in range(2 * h):
            for x in range(2 * w):
                ry, rx = y // 2, x // 2
                ry2 = min(ry + 1, h - 1) if y % 2 else ry
                rx2 = min(rx + 1, w - 1) if x % 2 else rx
                # horizontal first, then vertical (matches _upsample2)
                a = (int(p[ry, rx]) + int(p[ry, rx2]) + 1) // 2 if x % 2 else int(p[ry, rx])
                b = (int(p[ry2, rx]) + int(p[ry2, rx2]) + 1) // 2 if x % 2 else int(p[ry2, rx])
                want = (a + b + 1) // 2 if y % 2 else a
                assert up[y, x] == want, (y, x)


def test_fuzz_document_formats():
    """PDF/DOCX/EPUB/XLSX extractors under bit flips and truncation:
    typed format errors only (zipfile internals surface BadZipFile /
    zlib.error — wrapped; anything else would fail a Spark stage)."""
    from xetl_spark.operators import docx as docmod
    from xetl_spark.operators import pdfdoc

    pdf = pdfdoc.build_pdf(
        ["fuzz body text\nline two", "page 2"], xref_stream=True
    )
    _check(pdfdoc.pdf_text, _mutations(pdf), (pdfdoc.PdfFormatError,))
    _check(pdfdoc.pdf_probe, _mutations(pdf), (pdfdoc.PdfFormatError,))
    _check(pdfdoc.pdf_images, _mutations(pdf), (pdfdoc.PdfFormatError,))
    dx = docmod.build_docx(["alpha", "beta\tgamma"])
    _check(docmod.docx_text, _mutations(dx), (docmod.DocxFormatError,))
    eb = docmod.build_epub([("t", "chapter body")])
    _check(docmod.epub_text, _mutations(eb), (docmod.EpubFormatError,))
    xl = docmod.build_xlsx([["a", 1], [2.5, "b"]])
    _check(docmod.xlsx_cells, _mutations(xl), (docmod.XlsxFormatError,))


def test_fuzz_webp():
    from xetl_spark.operators.webp import webp_decode, webp_encode, webp_probe

    img = rng.integers(0, 256, (7, 9, 4), dtype=np.uint8)
    for payload in (
        webp_encode(img),
        webp_encode(img, palette=False, cache_bits=5),
        webp_encode(img[:, :, :3], predictor=7),
    ):
        _check(webp_decode, _mutations(payload), (im.UnsupportedImageError,))
        _check(webp_probe, _mutations(payload), (im.UnsupportedImageError,))


def test_fuzz_flac():
    from xetl_spark.operators.flac import FlacDecodeError, flac_decode, flac_encode

    pcm = rng.integers(-3000, 3000, (2000, 2)).astype(np.int32)
    for mode in ("verbatim", "fixed2"):
        payload = flac_encode(pcm, 16000, mode=mode, blocksize=512)
        _check(flac_decode, _mutations(payload), (FlacDecodeError,))


def test_fuzz_subtitles_and_scrub():
    from xetl_spark.operators.exif import strip_metadata_any
    from xetl_spark.operators.jpeg import jpeg_encode
    from xetl_spark.operators.subtitles import SubtitleFormatError, parse_subtitles

    srt = "1\n00:00:01,000 --> 00:00:02,000\nhello\n\n2\n00:00:03,000 --> 00:00:04,000\nworld\n"
    for p in _mutations(srt.encode()):
        try:
            parse_subtitles(p.decode("utf-8", "replace"))
        except SubtitleFormatError:
            pass
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    payload = jpeg_encode(img, 85)
    _check(
        strip_metadata_any, _mutations(payload), (ValueError,)
    )  # UnsupportedImageError subclasses ValueError; scrub raises ValueError


def test_fuzz_mp4_samples():
    payload = mp.mp4_build_tracks(
        [
            {
                "handler": "vide", "codec": "mp4v", "timescale": 600,
                "samples": [bytes(range(10 + i)) for i in range(6)],
                "deltas": [20] * 6, "ctts": [0, 10, 0, 10, 0, 10],
                "sync": [1, 4], "width": 8, "height": 6,
            },
            {
                "handler": "soun", "codec": "mp4a", "timescale": 8000,
                "samples": [bytes(range(4 + i)) for i in range(4)],
                "deltas": [256] * 4,
            },
        ]
    )
    _check(mp.mp4_samples, _mutations(payload), (mp.Mp4FormatError,))
    _check(mp.mp4_probe, _mutations(payload), (mp.Mp4FormatError,))


def test_fuzz_vp8_header():
    from xetl_spark.operators.vp8 import vp8_header_build, vp8_header_probe
    from xetl_spark.operators.webp import webp_lossy_header, webp_wrap_vp8

    raw = vp8_header_build(
        40, 30, y_ac_qi=77, segments=[3, None, -9, 12],
        n_token_partitions=4, token_data=bytes(range(64)),
        quant_deltas={"uv_ac_delta": -3},
    )
    _check(vp8_header_probe, _mutations(raw), (im.UnsupportedImageError,))
    _check(
        webp_lossy_header,
        _mutations(webp_wrap_vp8(raw)),
        (im.UnsupportedImageError,),
    )


def test_fuzz_mp4_audio_decode():
    """decode_audio over a mutated G.711/FLAC MP4 must degrade to the
    typed audio/container errors, never a raw struct/index escape."""
    from xetl_spark.operators.audio import UnsupportedAudioError, decode_audio

    raw = bytes((i * 7) % 256 for i in range(800))
    payload = mp.mp4_build_tracks(
        [{"handler": "soun", "codec": "ulaw", "timescale": 8000,
          "samples": [raw[i * 200 : (i + 1) * 200] for i in range(4)],
          "deltas": [200] * 4, "channels": 1}]
    )
    _check(
        decode_audio,
        _mutations(payload),
        (UnsupportedAudioError, mp.Mp4FormatError),
    )


def test_fuzz_webp_alpha():
    from xetl_spark.operators.webp import webp_alpha_plane, webp_build_lossy_alpha

    a = rng.integers(0, 256, (8, 10), dtype=np.uint8)
    payload = webp_build_lossy_alpha(a, method=2, compression=1, y_ac_qi=30)
    _check(webp_alpha_plane, _mutations(payload), (im.UnsupportedImageError,))


def test_fuzz_ivf():
    from xetl_spark.operators.vp8 import vp8_header_build

    ivf = mp.ivf_build(
        [vp8_header_build(16, 12, y_ac_qi=33), bytes(range(40))],
        "VP80", 16, 12,
    )
    _check(mp.ivf_probe, _mutations(ivf), (mp.IvfFormatError,))


def test_fuzz_mp4_fragmented():
    payload = mp.mp4_build_fragmented(
        [
            {"handler": "vide", "codec": "avc1", "timescale": 600,
             "width": 8, "height": 6,
             "fragments": [
                 {"samples": [bytes(range(12)), bytes(range(7))],
                  "durations": [40, 40], "ctts": [0, 5], "sync": {1}},
                 {"samples": [bytes(range(9))], "durations": [40]},
             ]},
        ]
    )
    _check(mp.mp4_samples, _mutations(payload), (mp.Mp4FormatError,))


def test_fuzz_webm():
    from xetl_spark.operators.vp8 import vp8_header_build
    from xetl_spark.operators.webm import WebmFormatError, webm_build, webm_probe

    payload = webm_build(
        [
            {"number": 1, "type": "video", "codec": "V_VP8",
             "width": 16, "height": 12},
            {"number": 2, "type": "audio", "codec": "A_OPUS",
             "sample_rate": 16000.0, "channels": 1},
        ],
        [(1, 0, True, vp8_header_build(16, 12)), (2, 0, True, b"au"),
         (1, 40, False, bytes(range(20)))],
        duration_ms=80.0,
    )
    _check(webm_probe, _mutations(payload), (WebmFormatError,))


def test_fuzz_vp9_header():
    from xetl_spark.operators.vp9 import vp9_header_build, vp9_header_probe

    payload = vp9_header_build(
        320, 180, profile=2, bit_depth=10, base_q_idx=99,
        quant_deltas={"delta_q_uv_dc": 5}, filter_level=20,
        render_size=(160, 90), tail=bytes(range(40)),
    )
    _check(vp9_header_probe, _mutations(payload), (im.UnsupportedImageError,))


def test_fuzz_av1():
    from xetl_spark.operators.av1 import av1_sequence_build, av1_sequence_probe

    payload = av1_sequence_build(
        320, 180, profile=1, level=10, still_picture=True, reduced=True,
        extra_obus=[(6, bytes(range(30)))],
    )
    _check(av1_sequence_probe, _mutations(payload), (im.UnsupportedImageError,))


def test_fuzz_avif():
    from xetl_spark.operators.av1 import avif_build, avif_probe

    payload = avif_build(
        96, 64, profile=1, level=10, split_extents=True,
        extra_items=[("Exif", bytes(range(24)))],
    )
    _check(avif_probe, _mutations(payload), (im.UnsupportedImageError,))
