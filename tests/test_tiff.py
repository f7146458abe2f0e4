"""TIFF decoder (operators/tiff.py): synthetic strip/PackBits cases +
JVM ImageIO golden files (uncompressed and PackBits, gray and RGB)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xetl_spark.operators import imaging as im
from xetl_spark.operators.tiff import TiffFormatError, tiff_decode, _packbits

rng = np.random.default_rng(55)


def _build_tiff(arr: np.ndarray, rows_per_strip: int = 4, bom: str = "II") -> bytes:
    """Minimal independent strip-layout TIFF writer for fixtures."""
    e = "<" if bom == "II" else ">"
    h, w, nch = arr.shape
    strips = []
    for y0 in range(0, h, rows_per_strip):
        strips.append(arr[y0 : y0 + rows_per_strip].tobytes())
    hdr_end = 8
    data_pos = hdr_end
    offsets = []
    for s in strips:
        offsets.append(data_pos)
        data_pos += len(s)
    bits_off = data_pos
    if nch > 1:
        data_pos += 2 * nch
    ifd_off = data_pos

    def entry(tag, typ, cnt, val):
        return struct.pack(e + "HHL", tag, typ, cnt) + val

    def short_val(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    def long_val(v):
        return struct.pack(e + "L", v)

    entries = [
        entry(256, 4, 1, long_val(w)),
        entry(257, 4, 1, long_val(h)),
        entry(
            258,
            3,
            nch,
            short_val(8) if nch == 1 else long_val(bits_off),
        ),
        entry(259, 3, 1, short_val(1)),
        entry(262, 3, 1, short_val(1 if nch == 1 else 2)),
        entry(277, 3, 1, short_val(nch)),
        entry(278, 4, 1, long_val(rows_per_strip)),
    ]
    if len(strips) == 1:
        entries.append(entry(273, 4, 1, long_val(offsets[0])))
        entries.append(entry(279, 4, 1, long_val(len(strips[0]))))
    else:
        off_tbl = ifd_off + 2 + 12 * 9 + 4
        cnt_tbl = off_tbl + 4 * len(strips)
        entries.append(entry(273, 4, len(strips), long_val(off_tbl)))
        entries.append(entry(279, 4, len(strips), long_val(cnt_tbl)))
    entries.sort(key=lambda b: struct.unpack_from(e + "H", b)[0])
    out = bytearray()
    out += (b"II" if bom == "II" else b"MM") + struct.pack(e + "HL", 42, ifd_off)
    for s in strips:
        out += s
    if nch > 1:
        out += struct.pack(e + "H" * nch, *([8] * nch))
    out += struct.pack(e + "H", len(entries))
    for b in entries:
        out += b
    out += struct.pack(e + "L", 0)
    if len(strips) > 1:
        out += b"".join(struct.pack(e + "L", o) for o in offsets)
        out += b"".join(struct.pack(e + "L", len(s)) for s in strips)
    return bytes(out)


@pytest.mark.parametrize("bom", ["II", "MM"])
@pytest.mark.parametrize("shape", [(9, 7, 1), (8, 5, 3)])
def test_tiff_synthetic_strips(bom, shape):
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(tiff_decode(_build_tiff(a, rows_per_strip=3, bom=bom)), a)


def test_packbits_spec_cases():
    # literal, repeat, no-op from the TIFF 6.0 example set
    assert _packbits(bytes([2, 1, 2, 3]), 3) == bytes([1, 2, 3])
    assert _packbits(bytes([254, 7]), 3) == bytes([7, 7, 7])
    assert _packbits(bytes([128, 0, 9]), 1) == bytes([9])
    with pytest.raises(TiffFormatError):
        _packbits(bytes([4, 1]), 5)  # truncated literal


def test_tiff_matches_jvm_imageio(spark, tmp_path):
    """Golden: ImageIO TIFF writer output (no-compression, PackBits,
    and LZW+predictor) decodes bit-exact for gray and RGB."""
    jvm = spark._jvm
    for shape in [(21, 17, 3), (12, 30, 1)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        src = str(tmp_path / f"t{shape[2]}.png")
        with open(src, "wb") as fh:
            fh.write(im.png_encode(a))
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(src))
        for comp in (None, "PackBits", "LZW"):
            writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
                "tiff"
            ).next()
            param = writer.getDefaultWriteParam()
            if comp:
                param.setCompressionMode(
                    jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
                )
                param.setCompressionType(comp)
            out = str(tmp_path / f"t{shape[2]}_{comp}.tiff")
            ios = jvm.javax.imageio.ImageIO.createImageOutputStream(
                jvm.java.io.File(out)
            )
            writer.setOutput(ios)
            writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
            ios.close()
            writer.dispose()
            got = tiff_decode(open(out, "rb").read())
            assert got.shape == a.shape, (shape, comp, got.shape)
            assert np.array_equal(got, a), (shape, comp)


def test_tiff_unsupported_raises():
    a = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = bytearray(_build_tiff(a))
    with pytest.raises(TiffFormatError):
        tiff_decode(b"NOTTIFF")
    with pytest.raises(TiffFormatError):
        tiff_decode(bytes(payload[:20]))  # truncated strip/IFD
