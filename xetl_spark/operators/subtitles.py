"""Subtitle-format parsing: SRT and WebVTT into timed text cues —
the transcript leg of an ASR / video training-data pipeline (subtitle
sidecars are the cheapest alignment supervision a video corpus has).

Pure-regex cue extraction, lenient the way real-world files are:
CRLF or LF, optional SRT indices, WebVTT NOTE/STYLE/REGION blocks,
cue-settings after the timestamp line, hour-less VTT timestamps, and
inline markup (``<i>``, ``<c.class>``, ``<00:00:01.000>`` karaoke
tags, ``{\\an8}`` ASS leftovers) stripped from the text.

Reference parity: subtitle wrangling in the reference's world is a
sed/awk subprocess task (reference README.md:54-77); here it is a
typed operator returning one row per cue.

Scale note: one document parses per Arrow-batch row; output is the
1→N cue expansion (bounded by the document's own cue count).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


class SubtitleFormatError(ValueError):
    """Payload is not a subtitle format this parser handles."""


_SRT_TS = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)
# WebVTT allows MM:SS.mmm (no hour field)
_VTT_TS = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)
_TAG = re.compile(r"<[^>]*>|\{\\[^}]*\}")


def _ms(h: str | None, m: str, s: str, ms: str) -> int:
    return (
        int(h or 0) * 3_600_000 + int(m) * 60_000 + int(s) * 1000 + int(ms)
    )


def _clean(lines: list[str]) -> str:
    text = " ".join(" ".join(lines).split())
    return _TAG.sub("", text).strip()


def parse_srt(text: str) -> list[tuple[int, int, int, str]]:
    """SRT -> [(cue_idx, start_ms, end_ms, text), ...]. cue_idx is the
    0-based POSITION (declared indices are unreliable in the wild and
    only used if present to skip the line)."""
    cues = []
    for block in re.split(r"(?:\r?\n){2,}", text.strip()):
        lines = [ln.strip() for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        ts_line = 0
        if lines and lines[0].isdigit():  # optional numeric index line
            ts_line = 1
        if ts_line >= len(lines):
            continue
        m = _SRT_TS.search(lines[ts_line])
        if not m:
            raise SubtitleFormatError(f"SRT cue without timestamps: {lines[0]!r}")
        g = m.groups()
        body = _clean(lines[ts_line + 1 :])
        cues.append((len(cues), _ms(*g[:4]), _ms(*g[4:]), body))
    if not cues:
        raise SubtitleFormatError("no SRT cues")
    return cues


def parse_vtt(text: str) -> list[tuple[int, int, int, str]]:
    """WebVTT -> [(cue_idx, start_ms, end_ms, text), ...]. NOTE /
    STYLE / REGION blocks and cue settings are skipped; inline markup
    stripped."""
    body = text.lstrip("﻿")
    if not body.lstrip().startswith("WEBVTT"):
        raise SubtitleFormatError("missing WEBVTT header")
    cues = []
    blocks = re.split(r"(?:\r?\n){2,}", body.strip())
    for block in blocks[0:]:
        lines = [ln.strip() for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        head = lines[0].split()[0] if lines[0] else ""
        if head in ("WEBVTT", "NOTE", "STYLE", "REGION"):
            continue
        ts_line = 0
        if "-->" not in lines[0]:  # optional cue identifier line
            ts_line = 1
        if ts_line >= len(lines):
            continue
        m = _VTT_TS.search(lines[ts_line])
        if not m:
            raise SubtitleFormatError(
                f"VTT cue without timestamps: {lines[ts_line]!r}"
            )
        g = m.groups()
        cues.append(
            (
                len(cues),
                _ms(g[0], g[1], g[2], g[3]),
                _ms(g[4], g[5], g[6], g[7]),
                _clean(lines[ts_line + 1 :]),
            )
        )
    if not cues:
        raise SubtitleFormatError("no WebVTT cues")
    return cues


_ASS_TS = re.compile(r"^(\d+):(\d{2}):(\d{2})\.(\d{2})$")


def parse_ass(text: str) -> list[tuple[int, int, int, str]]:
    """ASS/SSA ``[Events]`` Dialogue lines ->
    [(cue_idx, start_ms, end_ms, text), ...]. The Format: line defines
    the field order (Start/End/Text positions honored); override tags
    ``{\\...}`` and ``\\N`` line breaks are stripped; timestamps are
    h:mm:ss.cc (centiseconds)."""
    fields = ["layer", "start", "end", "style", "name", "marginl",
              "marginr", "marginv", "effect", "text"]
    in_events = False
    cues = []
    for line in text.splitlines():
        line = line.strip()
        low = line.lower()
        if low.startswith("["):
            in_events = low.startswith("[events]")
            continue
        if not in_events or not line:
            continue
        if low.startswith("format:"):
            fields = [f.strip().lower() for f in line[7:].split(",")]
            continue
        if not low.startswith("dialogue:"):
            continue
        parts = line[9:].split(",", len(fields) - 1)
        if len(parts) < len(fields):
            raise SubtitleFormatError(f"short Dialogue line: {line!r}")
        row = dict(zip(fields, (p.strip() for p in parts)))
        times = []
        for key in ("start", "end"):
            m = _ASS_TS.match(row.get(key, ""))
            if not m:
                raise SubtitleFormatError(f"bad ASS timestamp: {row.get(key)!r}")
            h, mnt, s, cs = m.groups()
            times.append(_ms(h, mnt, s, cs + "0"))
        body = re.sub(r"\{[^}]*\}", "", row.get("text", ""))
        body = " ".join(body.replace("\\N", " ").replace("\\n", " ").split())
        cues.append((len(cues), times[0], times[1], body))
    if not cues:
        raise SubtitleFormatError("no ASS Dialogue cues")
    return cues


def _sniff(text: str) -> str:
    stripped = text.lstrip("﻿").lstrip()
    if stripped.startswith("WEBVTT"):
        return "vtt"
    if stripped[:1] == "[" and "[events]" in text.lower():
        return "ass"
    return "srt"


def parse_subtitles(text: str, fmt: str = "auto") -> list[tuple[int, int, int, str]]:
    """Dispatch on declared ``fmt`` ('srt' | 'vtt' | 'ass') or sniff
    ('auto': a WEBVTT header wins, then an ASS section header, else
    SRT)."""
    if fmt == "auto":
        fmt = _sniff(text)
    if fmt == "vtt":
        return parse_vtt(text)
    if fmt == "srt":
        return parse_srt(text)
    if fmt == "ass":
        return parse_ass(text)
    raise SubtitleFormatError(f"unknown subtitle format {fmt!r}")


def extract_subtitles(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    fmt: str = "auto",
) -> DataFrame:
    """(id, subtitle document) -> one row per cue:
    (id, cue_idx, start_ms, end_ms, text, fmt). Malformed documents
    surface per-row in ``err`` instead of failing the job — the
    one-bad-file contract the document extractors follow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = str(row[text_col])
                kind = _sniff(raw) if fmt == "auto" else fmt
                try:
                    for idx, start, end, text in parse_subtitles(raw, kind):
                        rows.append(
                            (row[id_col], idx, start, end, text, kind, None)
                        )
                except SubtitleFormatError as e:
                    rows.append((row[id_col], None, None, None, None, kind, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "cue_idx", "start_ms", "end_ms", "text", "fmt", "err",
                ],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        run,
        schema=(
            f"id {id_type}, cue_idx int, start_ms long, end_ms long, "
            "text string, fmt string, err string"
        ),
    )
