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
    ):
        if payload is None:
            continue
        _check(jpeg.jpeg_decode, _mutations(payload), (im.UnsupportedImageError,))
