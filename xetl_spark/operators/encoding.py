"""Text encoding repair + Unicode normalization — the corpus-cleaning
stage every web-scale pipeline runs before tokenization (ftfy / CCNet
/ C4 all normalize encodings first; reference parity: xETL delegates
record-level cleanup to user tasks, this is the engine-native
equivalent on the same declarative surface).

Two kinds of column transforms:

- Pure-Catalyst (whole-stage codegen, JVM-side): control-character
  stripping, whitespace canonicalization, typographic-punctuation
  folding. These stay in the scan's codegen span.
- Arrow-batched pandas UDFs for what the JVM expression library
  genuinely cannot express: Unicode NFC/NFKC normalization
  (``pyspark.sql.functions`` has no normalizer) and mojibake repair
  (byte-level re-decoding). Both are vectorized per Arrow batch —
  never row-at-a-time Python UDFs — and are pure functions of their
  input, so they pipeline map-side with zero shuffle at any scale.

Mojibake repair is the ftfy core heuristic re-derived from first
principles: text that was UTF-8 encoded but decoded as Latin-1/cp1252
shows as ``Ã©``-style digraphs; re-encoding with the wrong
codec and re-decoding as UTF-8 inverts the corruption exactly. The
fix is applied ONLY when (a) the text matches a mojibake signature,
(b) the byte round-trip is lossless, and (c) the result strictly
shrinks — a genuine UTF-8-as-single-byte read always maps each
multi-byte sequence to one char, so well-formed text (which fails (a)
or (c)) passes through byte-identical, making the repair idempotent.
Up to ``max_rounds`` passes unwind double/triple-encoding.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "nfc_text",
    "nfkc_text",
    "clean_text",
    "fold_punctuation",
    "fix_mojibake_str",
    "fix_mojibake",
    "normalized_text_column",
    "normalize_corpus",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Pure-Catalyst transforms (JVM codegen, no Python)
# ---------------------------------------------------------------------------

# C0 controls except \t\n\r, plus DEL. C1 controls (U+0080-U+009F) are
# NOT stripped here: they are the working material of mojibake repair
# (high bytes read as Latin-1) and must survive until fix_mojibake has
# run — normalize_corpus orders the passes accordingly.
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def clean_text(text: Column | str) -> Column:
    """Strip C0 control characters (keeping tab/newline/CR), normalize
    CRLF/CR to LF, collapse runs of spaces and tabs to one space, and
    trim trailing whitespace per line and at both ends. Newlines are
    preserved — paragraph structure is load-bearing for line/
    boilerplate dedup downstream. Whole-stage codegen end to end."""
    c = _col(text)
    c = F.regexp_replace(c, r"\r\n?", "\n")
    c = F.regexp_replace(c, _CONTROL_RE, "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" +\n", "\n")
    return F.trim(c)


# 1:1 punctuation folds: quote/dash variants, NBSP + Unicode space
# variants -> ASCII. Parallel strings for translate() (codegen);
# lengths MUST match or translate() starts deleting characters.
_FOLD_FROM = (
    "‘’‚‛"  # single-quote variants
    "“”„‟"  # double-quote variants
    "‐‑‒–—―"  # hyphen/dash variants
    "       "  # space variants
    "       　"
)
_FOLD_TO = "''''" + '""""' + "------" + " " * 15
assert len(_FOLD_FROM) == len(_FOLD_TO)

# Zero-width characters: ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP, soft hyphen.
_ZERO_WIDTH_RE = "[​‌‍﻿­]"


def fold_punctuation(text: Column | str) -> Column:
    """Fold typographic punctuation to ASCII: quote and dash variants,
    ellipsis, NBSP and the Unicode space variants; strip zero-width
    characters. ``translate`` for the 1:1 mappings (codegen), regexp
    for the 1:many. NFKC does strictly more than this; this is the
    targeted subset C4-style cleaners apply without touching
    legitimate non-Latin text."""
    c = _col(text)
    c = F.translate(c, _FOLD_FROM, _FOLD_TO)
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, _ZERO_WIDTH_RE, "")
    return c


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDFs (no JVM equivalent exists)
# ---------------------------------------------------------------------------


def _normalize_udf(form: str):
    # pandas_udf construction needs an active session (return-type
    # parse), so UDFs are built lazily at call time — the repo-wide
    # convention for importable operator modules (see bpe.py, pca.py).
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return pandas_udf(_norm, "string")


def nfc_text(text: Column | str) -> Column:
    """Unicode NFC (canonical composition). Arrow-batched
    ``Series.str.normalize`` — Spark SQL has no normalizer expression,
    so this is the one genuinely Python-bound step of the family.
    (DuckDB's ``nfc_normalize`` computes the same form, which is what
    makes the q_text_nfc_normalize oracle an exact hash match.)"""
    return _normalize_udf("NFC")(_col(text))


def nfkc_text(text: Column | str) -> Column:
    """Unicode NFKC (compatibility composition: ligatures, fullwidth
    forms, superscripts folded to their plain equivalents)."""
    return _normalize_udf("NFKC")(_col(text))


# Mojibake signature: a UTF-8 lead byte (0xC2-0xF4) read as a single-
# byte codec, followed by a continuation byte (0x80-0xBF) read the
# same way. Decoded as Latin-1 the continuation range is U+0080-U+00BF
# verbatim; decoded as cp1252 the 0x80-0x9F slice maps to the
# typographic block below (the five unmapped cp1252 bytes 81 8D 8F 90
# 9D pass through as C1 controls, covered by the Latin-1 range).
# Matching the signature is only the cheap gate; correctness comes
# from the lossless round-trip + strict-shrink checks in the fixer.
_LEAD = "Â-ßà-ïð-ô"
_CONT = (
    "-¿"
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
_MOJIBAKE_RE = re.compile(f"[{_LEAD}][{_CONT}]")


# "Sloppy cp1252" reverse map (the decoder real pipelines hit: cp1252
# where the five unmapped bytes 81 8D 8F 90 9D pass through as their
# C1 control chars). Built from the stdlib decoding table so the char
# -> byte map is exactly the inverse of what such a reader produced:
# cp1252's typographic block AND bare C1 controls both encode back to
# their original byte — a strict superset of both latin-1 and cp1252,
# so one recode pass handles mixed corruption (e.g. '€' + '\\x9d' in
# one string, which neither stdlib codec can encode alone).
_SLOPPY_CP1252: dict[int, str] = {}
for _b in range(0x80, 0xA0):
    try:
        _c = bytes([_b]).decode("cp1252")
        if ord(_c) != _b:
            _SLOPPY_CP1252[ord(_c)] = chr(_b)
    except UnicodeDecodeError:
        pass  # unmapped byte: its C1 control char IS chr(byte) already
del _b, _c


def _recode(s: str) -> str | None:
    # translate the 27 typographic chars back to their cp1252 byte
    # values (C-speed), then latin-1 encode: chars <= 0xFF are their
    # own byte, anything else (no single-byte preimage) fails -> None.
    try:
        return s.translate(_SLOPPY_CP1252).encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return None


def fix_mojibake_str(s: str | None, max_rounds: int = 3) -> str | None:
    """Repair UTF-8-decoded-as-Latin-1/cp1252 text (pure function,
    usable outside Spark; the UDF below maps it per Arrow batch).

    Per round: if the mojibake signature is present, re-encode with
    the sloppy-cp1252 map (see ``_SLOPPY_CP1252``) and decode as
    UTF-8; if that succeeds and strictly shrinks the string, accept,
    else stop.
    A genuine UTF-8-as-single-byte read always shrinks (each
    multi-byte sequence collapses to one char), so clean text —
    including text this function just produced — is returned
    byte-identical: the repair is idempotent and conservative (mixed
    corruption that doesn't round-trip losslessly is left alone
    rather than half-fixed)."""
    if not s:
        return s
    for _ in range(max_rounds):
        if not _MOJIBAKE_RE.search(s):
            return s
        fixed = _recode(s)
        if fixed is None or len(fixed) >= len(s):
            return s
        s = fixed
    return s


def fix_mojibake(text: Column | str) -> Column:
    """Column form of :func:`fix_mojibake_str` (Arrow-batched)."""

    def _fix(s: pd.Series) -> pd.Series:
        return s.map(fix_mojibake_str)

    return pandas_udf(_fix, "string")(_col(text))


# ---------------------------------------------------------------------------
# Composed corpus pass
# ---------------------------------------------------------------------------


def normalized_text_column(
    text: Column | str,
    *,
    form: str = "NFC",
    repair_encoding: bool = True,
    fold_punct: bool = False,
) -> Column:
    """The full normalization pipeline as one Column expression:
    mojibake repair → Unicode normalization → control/whitespace
    cleanup (→ optional punctuation folding). Order matters: repair
    must see the raw bytes-as-chars before NFC recomposes them
    (composition can merge a stray combining mark into the mojibake
    digraph and break the byte round-trip), and cleanup runs last so
    repaired sequences get whitespace-canonicalized too."""
    if form not in ("NFC", "NFKC", "none"):
        raise ValueError(f"form must be NFC, NFKC or none, got {form!r}")
    c = _col(text)
    if repair_encoding:
        c = fix_mojibake(c)
    if form == "NFC":
        c = nfc_text(c)
    elif form == "NFKC":
        c = nfkc_text(c)
    c = clean_text(c)
    if fold_punct:
        c = fold_punctuation(c)
    return c


def normalize_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    form: str = "NFC",
    repair_encoding: bool = True,
    fold_punct: bool = False,
) -> DataFrame:
    """One-pass corpus normalization (see ``normalized_text_column``
    for the pass order), emitting (doc, text, changed). The whole pass
    is one map stage (a single Python stage fused between two codegen
    spans) — zero shuffles at any corpus size; at 100 TB it pipelines
    with the scan and the downstream dedup/filter stages."""
    c = normalized_text_column(
        text_col,
        form=form,
        repair_encoding=repair_encoding,
        fold_punct=fold_punct,
    )
    return df.select(
        F.col(id_col).alias("doc"),
        c.alias("text"),
        F.col(text_col).alias("__orig"),
    ).select(
        "doc",
        "text",
        (~F.col("text").eqNullSafe(F.col("__orig"))).alias("changed"),
    )
