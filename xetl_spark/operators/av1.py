"""AV1 OBU-level analysis — container/stream triage for the third
web video codec (IVF 'AV01' streams, WebM 'V_AV1' tracks, AVIF's
payload), from the public AV1 Bitstream & Decoding Process spec.

Parsed with full confidence:
- the OBU framing walk (§5.3): forbidden bit, 4-bit type, extension
  and has-size flags, leb128 sizes — every OBU's type + byte extent;
- the sequence header's leading fields (§5.5): seq_profile,
  still_picture, reduced_still_picture_header, level, and the frame
  dimension fields (frame_width/height_bits_minus_1 + sized widths) —
  for BOTH the reduced still-picture layout (the AVIF shape) and the
  general layout without timing/decoder-model info.

Deliberately NOT parsed: sequence headers carrying timing_info /
decoder_model / initial_display_delay (rare outside broadcast
profiles — typed error naming the field), and everything after the
dimension fields (the enable_* flag run and color_config), because a
mis-ordered flag walk would roundtrip our own fixtures while
misreading real streams — the same transcribe-don't-recall boundary
as VP8's tables (CODECS.md). Dims/profile/level/still-picture are the
triage fields a media sweep routes on; bit depth stays None.

Frame reconstruction is out of scope entirely (AV1 entropy coding +
prediction is a full codec)."""

from __future__ import annotations

from xetl_spark.operators.imaging import UnsupportedImageError


class Av1FormatError(UnsupportedImageError):
    """Payload is not an AV1 OBU stream this parser reads."""


OBU_TYPES = {
    1: "sequence_header",
    2: "temporal_delimiter",
    3: "frame_header",
    4: "tile_group",
    5: "metadata",
    6: "frame",
    7: "redundant_frame_header",
    8: "tile_list",
    15: "padding",
}


def _leb128(buf: bytes, pos: int) -> tuple[int, int]:
    value = 0
    for i in range(8):
        if pos + i >= len(buf):
            raise Av1FormatError("av1: leb128 truncated")
        b = buf[pos + i]
        value |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return value, pos + i + 1
    raise Av1FormatError("av1: leb128 too long")


def obu_walk(payload: bytes):
    """Yield (type_name, type_id, body_start, body_end) per OBU."""
    pos = 0
    n = len(payload)
    while pos < n:
        hdr = payload[pos]
        if hdr & 0x80:
            raise Av1FormatError("av1: forbidden bit set in OBU header")
        otype = (hdr >> 3) & 0xF
        ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        pos += 1
        if ext:
            if pos >= n:
                raise Av1FormatError("av1: extension header truncated")
            pos += 1
        if has_size:
            size, pos = _leb128(payload, pos)
        else:
            size = n - pos  # last OBU extends to end (low-overhead mode)
        if pos + size > n:
            raise Av1FormatError("av1: OBU overruns payload")
        yield OBU_TYPES.get(otype, f"reserved_{otype}"), otype, pos, pos + size
        pos += size


class _MsbReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            i = self.pos >> 3
            if i >= len(self.d):
                raise Av1FormatError("av1: sequence header truncated")
            v = (v << 1) | ((self.d[i] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def av1_sequence_probe(payload: bytes) -> dict:
    """Walk an AV1 OBU stream, count OBUs per type, and parse the
    first sequence header's leading fields -> profile, level,
    still_picture, reduced header flag, and max frame dimensions."""
    counts: dict[str, int] = {}
    seq = None
    for name, _tid, b0, b1 in obu_walk(payload):
        counts[name] = counts.get(name, 0) + 1
        if name == "sequence_header" and seq is None:
            seq = payload[b0:b1]
    if seq is None:
        raise Av1FormatError("av1: no sequence header OBU")
    r = _MsbReader(seq)
    profile = r.bits(3)
    if profile > 2:
        raise Av1FormatError("av1: reserved seq_profile")
    still = r.bits(1)
    reduced = r.bits(1)
    if reduced:
        level = r.bits(5)
    else:
        if r.bits(1):  # timing_info_present_flag
            raise Av1FormatError(
                "av1: timing_info present (broadcast profile not parsed)"
            )
        if r.bits(1):  # initial_display_delay_present_flag
            raise Av1FormatError("av1: initial_display_delay not parsed")
        op_cnt = r.bits(5) + 1
        level = None
        for i in range(op_cnt):
            r.bits(12)  # operating_point_idc
            lvl = r.bits(5)
            if i == 0:
                level = lvl
            if lvl > 7:
                r.bits(1)  # seq_tier
    wbits = r.bits(4) + 1
    hbits = r.bits(4) + 1
    width = r.bits(wbits) + 1
    height = r.bits(hbits) + 1
    return {
        "codec": "av1",
        "profile": profile,
        "level": level,
        "still_picture": bool(still),
        "reduced_still_picture_header": bool(reduced),
        "width": width,
        "height": height,
        "obu_counts": counts,
    }


def av1_sequence_build(
    width: int,
    height: int,
    *,
    profile: int = 0,
    level: int = 8,
    still_picture: bool = False,
    reduced: bool = False,
    extra_obus: list[tuple[int, bytes]] | None = None,
) -> bytes:
    """Emit a minimal AV1 OBU stream: temporal delimiter + sequence
    header (leading fields only — a triage fixture, not a decodable
    frame) + optional (type, body) extra OBUs."""
    if not 0 <= profile <= 2:
        raise Av1FormatError("av1: profile 0..2")

    class W:
        def __init__(self) -> None:
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def bits(self, v: int, n: int) -> None:
            for i in reversed(range(n)):
                self.acc = (self.acc << 1) | ((v >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.buf.append(self.acc)
                    self.acc, self.n = 0, 0

        def done(self) -> bytes:
            if self.n:
                self.buf.append(self.acc << (8 - self.n))
            return bytes(self.buf)

    w = W()
    w.bits(profile, 3)
    w.bits(1 if still_picture else 0, 1)
    w.bits(1 if reduced else 0, 1)
    if reduced:
        w.bits(level, 5)
    else:
        w.bits(0, 1)  # no timing info
        w.bits(0, 1)  # no initial display delay
        w.bits(0, 5)  # one operating point
        w.bits(0, 12)
        w.bits(level, 5)
        if level > 7:
            w.bits(0, 1)
    wbits = max(1, (width - 1).bit_length())
    hbits = max(1, (height - 1).bit_length())
    w.bits(wbits - 1, 4)
    w.bits(hbits - 1, 4)
    w.bits(width - 1, wbits)
    w.bits(height - 1, hbits)
    seq = w.done()

    def obu(otype: int, body: bytes) -> bytes:
        head = bytes([(otype << 3) | 0x02])  # has_size, no extension
        size = bytearray()
        v = len(body)
        while True:
            b = v & 0x7F
            v >>= 7
            size.append(b | (0x80 if v else 0))
            if not v:
                break
        return head + bytes(size) + body

    out = obu(2, b"") + obu(1, seq)
    for otype, body in extra_obus or []:
        out += obu(otype, body)
    return out


# ------------------------------------------------------------- AVIF
#
# AVIF = AV1 still images in the HEIF/ISO-BMFF ITEM layout (not the
# track layout mp4_samples walks): meta[hdlr('pict'), pitm, iinf[infe],
# iloc, iprp[ipco[ispe,...] + ipma]] + mdat. The primary item's iloc
# extents point at the AV1 OBU payload; ispe carries the declared
# dimensions. Parsing is the same box arithmetic as the MP4 sample
# tables — ISO 14496-12 §8.11 — and fully verifiable against our own
# writer.


def avif_probe(payload: bytes) -> dict:
    """Parse an AVIF/HEIF image: brand, primary item id, item table
    (type, iloc extents), ispe dimensions, and the primary av01
    item's sequence-header fields via av1_sequence_probe."""
    from xetl_spark.operators.mediaprobe import Mp4FormatError, _walk_boxes

    n = len(payload)
    if n < 12 or payload[4:8] != b"ftyp":
        raise Av1FormatError("avif: no ftyp box")
    brand = payload[8:12].decode("ascii", "replace")
    meta = None
    try:
        for btype, b0, b1 in _walk_boxes(payload, 0, n):
            if btype == b"meta":
                meta = (b0 + 4, b1)  # FullBox: skip version/flags
                break
    except Mp4FormatError as e:
        raise Av1FormatError(f"avif: {e}") from None
    if meta is None:
        raise Av1FormatError("avif: no meta box")
    primary = None
    items: dict[int, dict] = {}
    width = height = None
    try:
        for btype, b0, b1 in _walk_boxes(payload, *meta):
            if btype == b"pitm":
                ver = payload[b0]
                primary = (
                    int.from_bytes(payload[b0 + 4 : b0 + 8], "big")
                    if ver
                    else int.from_bytes(payload[b0 + 4 : b0 + 6], "big")
                )
            elif btype == b"iinf":
                # FullBox + entry_count (16-bit for version 0)
                ver = payload[b0]
                ec_w = 4 if ver else 2
                for ctype, c0, c1 in _walk_boxes(payload, b0 + 4 + ec_w, b1):
                    if ctype != b"infe":
                        continue
                    iver = payload[c0]
                    if iver < 2:
                        raise Av1FormatError("avif: infe version < 2")
                    item_id = (
                        int.from_bytes(payload[c0 + 4 : c0 + 8], "big")
                        if iver == 3
                        else int.from_bytes(payload[c0 + 4 : c0 + 6], "big")
                    )
                    off = c0 + (8 if iver == 3 else 6) + 2  # + protection
                    items.setdefault(item_id, {})["type"] = payload[
                        off : off + 4
                    ].decode("ascii", "replace")
            elif btype == b"iloc":
                ver = payload[b0]
                sizes = payload[b0 + 4]
                offset_size, length_size = sizes >> 4, sizes & 0xF
                base_size = payload[b0 + 5] >> 4
                # versions 1/2 repurpose the low nibble as index_size:
                # each extent then carries an extent_index field
                index_size = (payload[b0 + 5] & 0xF) if ver in (1, 2) else 0
                p = b0 + 6
                if ver < 2:
                    count = int.from_bytes(payload[p : p + 2], "big")
                    p += 2
                else:
                    count = int.from_bytes(payload[p : p + 4], "big")
                    p += 4
                if count > 10_000:
                    raise Av1FormatError("avif: iloc declares too many items")
                for _ in range(count):
                    if ver < 2:
                        item_id = int.from_bytes(payload[p : p + 2], "big")
                        p += 2
                    else:
                        item_id = int.from_bytes(payload[p : p + 4], "big")
                        p += 4
                    if ver in (1, 2):
                        p += 2  # construction_method
                    p += 2  # data_reference_index
                    base = int.from_bytes(payload[p : p + base_size], "big")
                    p += base_size
                    ext_count = int.from_bytes(payload[p : p + 2], "big")
                    p += 2
                    extents = []
                    for _e in range(ext_count):
                        p += index_size  # extent_index (v1/2) — unused
                        off = int.from_bytes(payload[p : p + offset_size], "big")
                        p += offset_size
                        ln = int.from_bytes(payload[p : p + length_size], "big")
                        p += length_size
                        extents.append((base + off, ln))
                    items.setdefault(item_id, {})["extents"] = extents
            elif btype == b"iprp":
                for ctype, c0, c1 in _walk_boxes(payload, b0, b1):
                    if ctype != b"ipco":
                        continue
                    for ptype, p0, p1 in _walk_boxes(payload, c0, c1):
                        if ptype == b"ispe" and p1 - p0 >= 12:
                            width = int.from_bytes(payload[p0 + 4 : p0 + 8], "big")
                            height = int.from_bytes(payload[p0 + 8 : p0 + 12], "big")
    except Mp4FormatError as e:
        raise Av1FormatError(f"avif: {e}") from None
    if primary is None or primary not in items:
        raise Av1FormatError("avif: no primary item")
    item = items[primary]
    if "extents" not in item or not item["extents"]:
        raise Av1FormatError("avif: primary item has no iloc extents")
    data = bytearray()
    for off, ln in item["extents"]:
        if off + ln > n:
            raise Av1FormatError("avif: iloc extent beyond file end")
        data += payload[off : off + ln]
    out = {
        "container": "avif",
        "brand": brand,
        "primary_item": primary,
        "item_types": {k: v.get("type") for k, v in items.items()},
        "width": width,
        "height": height,
        "av1": None,
    }
    if item.get("type") == "av01":
        out["av1"] = av1_sequence_probe(bytes(data))
    return out


def avif_build(
    width: int,
    height: int,
    *,
    profile: int = 0,
    level: int = 8,
    extra_items: list[tuple[str, bytes]] | None = None,
    split_extents: bool = False,
    iloc_version: int = 0,
    index_size: int = 0,
) -> bytes:
    """Minimal spec-shaped AVIF writer: ftyp(avif) + meta[hdlr pict,
    pitm, iinf/infe, iloc, iprp[ipco[ispe]+ipma]] + mdat holding the
    primary av01 item (a reduced-still-picture sequence header from
    av1_sequence_build) and any ``extra_items``. ``split_extents``
    stores the primary payload as two iloc extents (exercising extent
    reassembly). ``iloc_version`` 1/2 adds construction_method and
    (when ``index_size`` > 0) a per-extent extent_index field."""
    if index_size and iloc_version not in (1, 2):
        raise ValueError("index_size requires iloc version 1 or 2")

    def box(btype: bytes, body: bytes) -> bytes:
        import struct as _st

        return _st.pack(">I", 8 + len(body)) + btype + body

    def full(btype: bytes, body: bytes, version: int = 0) -> bytes:
        return box(btype, bytes([version, 0, 0, 0]) + body)

    av1_payload = av1_sequence_build(
        width, height, profile=profile, level=level,
        still_picture=True, reduced=True,
    )
    payloads = [("av01", av1_payload)] + list(extra_items or [])
    ftyp = box(b"ftyp", b"avif" + b"\x00\x00\x00\x00" + b"avifmif1miaf")
    hdlr = full(
        b"hdlr", b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"xetl\x00"
    )
    pitm = full(b"pitm", (1).to_bytes(2, "big"))
    infes = b""
    for i, (itype, _data) in enumerate(payloads, start=1):
        infes += full(
            b"infe",
            (i).to_bytes(2, "big") + b"\x00\x00" + itype.encode("ascii")
            + b"item\x00",
            version=2,
        )
    iinf = full(b"iinf", len(payloads).to_bytes(2, "big") + infes)
    ispe = full(
        b"ispe", width.to_bytes(4, "big") + height.to_bytes(4, "big")
    )
    ipma = full(
        b"ipma",
        (1).to_bytes(4, "big") + (1).to_bytes(2, "big") + bytes([1, 0x81]),
    )
    iprp = box(b"iprp", box(b"ipco", ispe) + ipma)

    # iloc offsets are absolute: lay out mdat after computing sizes
    # (iloc size depends only on item/extent counts — build twice)
    mdat_body = b"".join(d for _t, d in payloads)
    mdat_base = 0  # placeholder; pass 2 rewrites with the real base
    id_w = 4 if iloc_version == 2 else 2
    for _pass in range(2):
        # 4-byte offsets/lengths, base_size 0, index_size per arg
        iloc_body = bytes([0x44, index_size & 0xF])
        iloc_body += len(payloads).to_bytes(2 if iloc_version < 2 else 4,
                                            "big")
        pos_in_mdat = 0
        for i, (_t, data) in enumerate(payloads, start=1):
            iloc_body += (i).to_bytes(id_w, "big")
            if iloc_version in (1, 2):
                iloc_body += (0).to_bytes(2, "big")  # construction_method
            iloc_body += (0).to_bytes(2, "big")  # data_reference_index
            if split_extents and i == 1 and len(data) > 4:
                cut = len(data) // 2
                exts = [(pos_in_mdat, cut), (pos_in_mdat + cut, len(data) - cut)]
            else:
                exts = [(pos_in_mdat, len(data))]
            iloc_body += len(exts).to_bytes(2, "big")
            for ei, (off, ln) in enumerate(exts, start=1):
                if index_size:
                    iloc_body += ei.to_bytes(index_size, "big")
                iloc_body += (mdat_base + off).to_bytes(4, "big")  # noqa: F821
                iloc_body += ln.to_bytes(4, "big")
            pos_in_mdat += len(data)
        iloc = full(b"iloc", iloc_body, version=iloc_version)
        meta = full(b"meta", hdlr + pitm + iinf + iloc + iprp)
        mdat_base = len(ftyp) + len(meta) + 8
    return ftyp + meta + box(b"mdat", mdat_body)
