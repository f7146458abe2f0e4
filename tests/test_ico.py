"""ICO (favicon) codec: DIB and PNG entries, palette + AND-mask
transparency, best-entry selection, sniff/dispatch, hostile bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xetl_spark.operators.ico import (
    ico_build,
    ico_decode,
    ico_probe,
    sniff_ico,
)
from xetl_spark.operators.imaging import (
    UnsupportedImageError,
    decode_image,
    sniff_format,
)

rng = np.random.RandomState(6)


def test_dib_and_png_entry_roundtrips():
    img = rng.randint(1, 256, (16, 16, 4), np.uint8)  # nonzero alpha
    img3 = rng.randint(0, 256, (9, 13, 3), np.uint8)
    # best entry = largest area (16x16 over 9x13)
    assert np.array_equal(ico_decode(ico_build([img3, img])), img)
    dec3 = ico_decode(ico_build([img3]))
    assert np.array_equal(dec3[:, :, :3], img3) and (dec3[:, :, 3] == 255).all()
    assert np.array_equal(ico_decode(ico_build([img], as_png=True)), img)
    # all-zero alpha plane means alpha-unused: AND mask (opaque) rules
    flat = np.zeros((4, 4, 4), np.uint8)
    flat[:, :, :3] = 77
    decf = ico_decode(ico_build([flat]))
    assert (decf[:, :, 3] == 255).all() and (decf[:, :, 0] == 77).all()


def test_probe_and_sniff_dispatch():
    img = rng.randint(0, 256, (8, 8, 3), np.uint8)
    ic = ico_build([img, img], as_png=True)
    p = ico_probe(ic)
    assert p["n_entries"] == 2 and all(e["png"] for e in p["entries"])
    assert sniff_format(ic) == "ico"
    assert np.array_equal(decode_image(ic)[:, :, :3], img)
    assert not sniff_ico(b"\x00\x00\x01\x00garbage")
    assert sniff_format(b"\x00\x00\x01\x00garbage") is None


def test_paletted_dib_with_and_mask():
    """Hand-built 8-bit paletted DIB: palette lookup (BGR->RGB) and a
    transparent AND-mask bit at the display bottom-left."""
    w = h = 4
    pal = bytes([10, 20, 30, 0, 200, 100, 50, 0])  # two BGRX entries
    xor = bytes([0, 1, 0, 1]) * h  # stride is exactly 4 here
    and_mask = bytes([0b10000000, 0, 0, 0]) + bytes(4 * (h - 1))
    hdr = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 8, 0, 0, 0, 0, 2, 0)
    dib = hdr + pal + xor + and_mask
    ico = (
        struct.pack("<HHH", 0, 1, 1)
        + bytes([w, h, 2, 0])
        + struct.pack("<HH", 1, 8)
        + struct.pack("<II", len(dib), 22)
        + dib
    )
    d = ico_decode(ico)
    assert tuple(d[0, 0, :3]) == (30, 20, 10)
    assert tuple(d[0, 1, :3]) == (50, 100, 200)
    # rows are stored bottom-up: mask row 0 is the display bottom row
    assert d[h - 1, 0, 3] == 0 and d[0, 0, 3] == 255


def test_hostile_bytes_are_typed():
    img = rng.randint(0, 256, (6, 6, 3), np.uint8)
    ic = ico_build([img])
    for cut in (3, 10, 25, len(ic) - 5):
        with pytest.raises(UnsupportedImageError):
            ico_decode(ic[:cut])
    for _ in range(40):
        blob = bytearray(ic)
        blob[rng.randint(4, len(blob))] = rng.randint(0, 256)
        try:
            ico_decode(bytes(blob))
        except UnsupportedImageError:
            pass
    with pytest.raises(UnsupportedImageError):
        ico_build([np.zeros((300, 4, 3), np.uint8)])  # >256 px
