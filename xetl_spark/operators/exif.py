"""EXIF metadata codec — APP1/TIFF parsing per the EXIF 2.3 / TIFF 6.0
public specs, pure Python.

A multimodal training pipeline's first pass over an image corpus is
metadata triage (orientation for correct decode, capture time for
dedup/ordering, camera model for bias audits) — all of it lives in the
JPEG APP1 segment as a little TIFF file: byte-order mark (II/MM), IFD
tables of (tag, type, count, value-or-offset) entries, with sub-IFD
pointers for the Exif and GPS blocks. Both byte orders are handled;
unknown tags are skipped; values larger than 4 bytes are fetched from
their offsets with bounds checks (a truncated segment degrades to the
fields that fit, never a crash — triage must survive arbitrary wire
bytes).

The builder emits a minimal well-formed IFD0(+ExifIFD) for the
supported tag set, used to synthesize closed-form fixtures for the
hash-verified registry query (q_multimodal_exif) — and round-trips
through the parser in both byte orders.
"""

from __future__ import annotations

import struct

# canonical name -> (ifd, tag, type)  — types: 2 ASCII, 3 SHORT, 4 LONG, 5 RATIONAL
TAGS = {
    "image_description": ("ifd0", 0x010E, 2),
    "make": ("ifd0", 0x010F, 2),
    "model": ("ifd0", 0x0110, 2),
    "orientation": ("ifd0", 0x0112, 3),
    "software": ("ifd0", 0x0131, 2),
    "datetime": ("ifd0", 0x0132, 2),
    "exposure_time": ("exif", 0x829A, 5),
    "f_number": ("exif", 0x829D, 5),
    "iso": ("exif", 0x8827, 3),
    "datetime_original": ("exif", 0x9003, 2),
    "pixel_x": ("exif", 0xA002, 4),
    "pixel_y": ("exif", 0xA003, 4),
    "focal_length": ("exif", 0x920A, 5),
}
_BY_TAG = {(ifd, tag): (name, typ) for name, (ifd, tag, typ) in TAGS.items()}
_EXIF_PTR = 0x8769
_GPS_PTR = 0x8825
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def find_app1_exif(payload: bytes) -> bytes | None:
    """Return the TIFF body of the first APP1 Exif segment, or None."""
    i = 2
    n = len(payload)
    while i < n - 4:
        if payload[i] != 0xFF:
            i += 1
            continue
        m = payload[i + 1]
        if m == 0xDA or m == 0xD9:  # entropy data starts / end
            return None
        if 0xD0 <= m <= 0xD7 or m in (0xD8, 0x01):
            i += 2
            continue
        ln = int.from_bytes(payload[i + 2 : i + 4], "big")
        if m == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
            return payload[i + 10 : i + 2 + ln]
        i += 2 + ln
    return None


def _read_ifd(
    tiff: bytes,
    off: int,
    e: str,
    out: dict,
    ifd_name: str,
    seen: set | None = None,
) -> None:
    # a crafted/corrupt Exif sub-IFD pointer can form a cycle (e.g.
    # point back at its own IFD); track visited offsets so a hostile
    # payload degrades to partial fields, never RecursionError
    if seen is None:
        seen = set()
    if off in seen or off + 2 > len(tiff):
        return
    seen.add(off)
    (count,) = struct.unpack_from(e + "H", tiff, off)
    for k in range(count):
        ent = off + 2 + 12 * k
        if ent + 12 > len(tiff):
            return
        tag, typ, cnt = struct.unpack_from(e + "HHL", tiff, ent)
        size = _TYPE_SIZE.get(typ, 0) * cnt
        if size == 0:
            continue
        if size <= 4:
            voff = ent + 8
        else:
            (voff,) = struct.unpack_from(e + "L", tiff, ent + 8)
        if voff + size > len(tiff):
            continue  # truncated value: keep what else fits
        if tag == _EXIF_PTR and typ == 4:
            (sub,) = struct.unpack_from(e + "L", tiff, ent + 8)
            _read_ifd(tiff, sub, e, out, "exif", seen)
            continue
        if tag == _GPS_PTR:
            continue  # GPS block out of v1 scope
        known = _BY_TAG.get((ifd_name, tag))
        if known is None:
            continue
        name, _typ = known
        if typ == 2:
            out[name] = tiff[voff : voff + cnt].split(b"\x00", 1)[0].decode(
                "ascii", "replace"
            )
        elif typ in (3, 4, 9):
            fmt = {3: "H", 4: "L", 9: "l"}[typ]
            vals = struct.unpack_from(e + fmt * cnt, tiff, voff)
            out[name] = vals[0] if cnt == 1 else list(vals)
        elif typ in (5, 10):
            fmt = "LL" if typ == 5 else "ll"
            num, den = struct.unpack_from(e + fmt, tiff, voff)
            out[name] = f"{num}/{den}"


def exif_parse(payload: bytes) -> dict:
    """Extract the supported EXIF fields from a JPEG payload. Returns
    {} when there is no APP1 Exif segment or it is unparseable."""
    tiff = find_app1_exif(payload)
    if tiff is None or len(tiff) < 8:
        return {}
    bom = tiff[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        return {}
    magic, ifd0 = struct.unpack_from(e + "HL", tiff, 2)
    if magic != 42:
        return {}
    out: dict = {}
    try:
        _read_ifd(tiff, ifd0, e, out, "ifd0")
    except (struct.error, ValueError, OverflowError):
        pass  # hostile/corrupt structure: keep the fields parsed so far
    return out


def exif_build(fields: dict, byte_order: str = "II") -> bytes:
    """Build an APP1 Exif TIFF body (``Exif\\0\\0`` prefix included)
    for the supported tag set. Unknown field names raise KeyError."""
    e = "<" if byte_order == "II" else ">"
    ifd0 = []
    exif = []
    for name, value in fields.items():
        ifd, tag, typ = TAGS[name]
        (ifd0 if ifd == "ifd0" else exif).append((tag, typ, value))

    def encode_entries(entries, base_off):
        """entries sorted by tag (TIFF 6.0 requirement); returns
        (packed_entries, overflow_bytes) with offsets relative to the
        TIFF start, where overflow begins at base_off."""
        packed = b""
        overflow = b""
        for tag, typ, value in sorted(entries):
            if typ == 2:
                raw = value.encode("ascii") + b"\x00"
                cnt = len(raw)
            elif typ == 3:
                raw = struct.pack(e + "H", value)
                cnt = 1
            elif typ == 4:
                raw = struct.pack(e + "L", value)
                cnt = 1
            elif typ == 5:
                num, den = (int(x) for x in str(value).split("/"))
                raw = struct.pack(e + "LL", num, den)
                cnt = 1
            else:
                raise KeyError(f"unsupported type {typ}")
            if len(raw) <= 4:
                vfield = raw.ljust(4, b"\x00")
            else:
                vfield = struct.pack(e + "L", base_off + len(overflow))
                overflow += raw
            packed += struct.pack(e + "HHL", tag, typ, cnt) + vfield
        return packed, overflow

    # layout: header(8) | IFD0 | IFD0 overflow | ExifIFD | Exif overflow
    n0 = len(ifd0) + (1 if exif else 0)
    ifd0_start = 8
    ifd0_len = 2 + 12 * n0 + 4
    # two-pass: sizes of overflow depend only on values
    _, ov0_probe = encode_entries(ifd0, 0)
    exif_start = ifd0_start + ifd0_len + len(ov0_probe)
    if exif:
        ifd0_all = ifd0 + [(_EXIF_PTR, 4, exif_start)]
    else:
        ifd0_all = list(ifd0)
    packed0, ov0 = encode_entries(ifd0_all, ifd0_start + ifd0_len)
    tiff = struct.pack(e + "2sHL", b"II" if e == "<" else b"MM", 42, ifd0_start)
    tiff += struct.pack(e + "H", n0) + packed0 + struct.pack(e + "L", 0) + ov0
    if exif:
        nE = len(exif)
        exif_len = 2 + 12 * nE + 4
        packedE, ovE = encode_entries(exif, exif_start + exif_len)
        tiff += struct.pack(e + "H", nE) + packedE + struct.pack(e + "L", 0) + ovE
    return b"Exif\x00\x00" + tiff


def insert_app1(jpeg_bytes: bytes, app1_body: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (+APP0 if present)."""
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    pos = 2
    if jpeg_bytes[2:4] == b"\xff\xe0":
        ln = int.from_bytes(jpeg_bytes[4:6], "big")
        pos = 4 + ln - 2 + 2
    return jpeg_bytes[:pos] + seg + jpeg_bytes[pos:]


def strip_metadata(jpeg_bytes: bytes) -> bytes:
    """Remove privacy-bearing metadata segments from a JPEG: every
    APPn except APP0/JFIF (APP1 Exif incl. GPS, APP1 XMP, APP13
    IPTC/Photoshop, APP2 ICC, ...) and COM comments. The image-side
    analog of the text `redact` task — entropy-coded data and every
    structural segment (DQT/DHT/SOF/SOS/DRI/DAC) pass through
    byte-identical, so decoded pixels cannot change.

    Walks marker segments up to the first SOS, then copies the rest
    verbatim (scan data may contain 0xFFxx byte pairs that are not
    markers; only the pre-scan header region carries metadata)."""
    if jpeg_bytes[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    out = bytearray(b"\xff\xd8")
    pos = 2
    n = len(jpeg_bytes)
    while pos + 1 < n:
        if jpeg_bytes[pos] != 0xFF:
            raise ValueError("malformed JPEG header segment")
        marker = jpeg_bytes[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            out += jpeg_bytes[pos : pos + 2]
            pos += 2
            continue
        if marker == 0xD9:  # EOI in header region (degenerate file)
            out += jpeg_bytes[pos:]
            return bytes(out)
        ln = int.from_bytes(jpeg_bytes[pos + 2 : pos + 4], "big")
        seg = jpeg_bytes[pos : pos + 2 + ln]
        if marker == 0xDA:  # SOS: copy the rest of the stream verbatim
            out += jpeg_bytes[pos:]
            return bytes(out)
        drop = marker == 0xFE or (  # COM
            # APP1..APP15 minus APP14 (Adobe): the APP14 color-transform
            # flag steers YCbCr/RGB/YCCK interpretation in libjpeg-family
            # decoders, so scrubbing it could change decoded pixels.
            0xE1 <= marker <= 0xEF
            and marker != 0xEE
        )
        if not drop:
            out += seg
        pos += 2 + ln
    return bytes(out)


def strip_metadata_any(payload: bytes) -> bytes:
    """Format-dispatching metadata scrub: JPEG (strip_metadata), PNG
    (drop ancillary text/metadata chunks — tEXt/zTXt/iTXt/eXIf/tIME;
    pixel-affecting chunks incl. tRNS/gAMA/PLTE pass through), WebP
    (drop EXIF/XMP chunks and clear their VP8X flags). Unknown
    formats raise ValueError — a scrub that silently passes
    unscrubbed bytes is worse than a failure."""
    if payload[:2] == b"\xff\xd8":
        return strip_metadata(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        drop = {b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"}
        out = bytearray(payload[:8])
        pos = 8
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos : pos + 4], "big")
            ctype = payload[pos + 4 : pos + 8]
            chunk = payload[pos : pos + 12 + ln]
            if ctype not in drop:
                out += chunk
            pos += 12 + ln
            if ctype == b"IEND":
                break
        return bytes(out)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        body = bytearray(b"WEBP")
        pos = 12
        while pos + 8 <= len(payload):
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            tag = payload[pos : pos + 4]
            chunk = payload[pos : pos + 8 + size + (size & 1)]
            if tag not in (b"EXIF", b"XMP "):
                if tag == b"VP8X" and size >= 1:
                    chunk = bytearray(chunk)
                    chunk[8] &= ~0x0C  # clear EXIF (0x08) + XMP (0x04)
                    chunk = bytes(chunk)
                body += chunk
            pos += 8 + size + (size & 1)
        return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)
    raise ValueError("unrecognized image container for metadata scrub")
