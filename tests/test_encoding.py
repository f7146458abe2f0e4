"""Encoding repair + Unicode normalization (operators/encoding.py).

The mojibake fixer's contract: exact inverse of a sloppy-cp1252
wrong-codec read on text that is not itself mojibake-shaped, and
byte-identical pass-through on clean text (idempotence). Registered
query oracles (q_text_fix_mojibake / q_text_nfc_normalize /
q_text_clean_punct) pin the Spark-side behavior against DuckDB; these
tests pin the pure-Python core and the Spark plumbing.
"""

import unicodedata

import pytest
from pyspark.sql import functions as F

from xetl_spark.operators.encoding import (
    clean_text,
    fix_mojibake,
    fix_mojibake_str,
    fold_punctuation,
    nfc_text,
    nfkc_text,
    normalize_corpus,
)


def sloppy_decode(b: bytes) -> str:
    """What a cp1252 reader with C1 pass-through shows for raw bytes —
    the corruption model the fixer inverts."""
    out = []
    for x in b:
        try:
            out.append(bytes([x]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(x))
    return "".join(out)


CLEAN_SAMPLES = [
    "plain ascii text",
    "héllo wörld — “quoted” …",
    "€ price – naïve résumé",
    "日本語テキスト",
    "mixed Ω≈ç√ text",
    "emoji 🎉 test",
    "",
]


def test_fix_mojibake_unit_cases():
    assert fix_mojibake_str("cafÃ©") == "café"  # latin-1 read
    assert fix_mojibake_str("â€™") == "’"  # cp1252 read
    assert fix_mojibake_str("naÃ¯ve â€“ rÃ©sumÃ©") == "naïve – résumé"
    assert fix_mojibake_str("Ãƒâ€°") == "É"  # double-encoded
    assert fix_mojibake_str(None) is None
    assert fix_mojibake_str("") == ""


@pytest.mark.parametrize("s", CLEAN_SAMPLES)
def test_fix_mojibake_round_trip_and_idempotence(s):
    c1 = sloppy_decode(s.encode("utf-8"))
    c2 = sloppy_decode(c1.encode("utf-8"))
    assert fix_mojibake_str(c1) == s
    assert fix_mojibake_str(c2) == s  # double-encoding unwinds
    assert fix_mojibake_str(s) == s  # clean text untouched


def test_fix_mojibake_mixed_c1_and_typographic():
    # '€' needs the cp1252 byte 0x80 while '\x9d' is an unmapped C1
    # control: neither stdlib codec alone can re-encode a string with
    # both, the sloppy map handles it (ftfy's sloppy-windows-1252).
    s = "€ and ”"  # U+201D utf-8 = E2 80 9D -> sloppy shows 'â€' + '\x9d'
    c = sloppy_decode(s.encode("utf-8"))
    assert "\x9d" in c
    assert fix_mojibake_str(c) == s


def test_fix_mojibake_conservative_on_lossy_corruption():
    # A char with no single-byte preimage (Ω) mixed into mojibake:
    # the round trip is not lossless, so the fixer must leave the
    # whole string alone rather than half-fix it.
    s = "cafÃ© Ω"
    assert fix_mojibake_str(s) == s


def test_fix_mojibake_property_random_round_trip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # Alphabet mixing ASCII, Latin-1 accents, typographic chars, CJK.
    alphabet = st.sampled_from(
        list("abc é ü ñ — “ ” € … 日 本 語 x y z .")
    )

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def prop(s):
        # Contract holds for strings that are themselves a fixpoint
        # (text that already looks like decodable mojibake is
        # indistinguishable from one more encoding layer, by design).
        if fix_mojibake_str(s) != s:
            return
        c = sloppy_decode(s.encode("utf-8"))
        assert fix_mojibake_str(c) == s
        # idempotence of the fixer itself
        f = fix_mojibake_str(c)
        assert fix_mojibake_str(f) == f

    prop()


def test_clean_text_and_fold(spark):
    df = spark.createDataFrame(
        [(1, "a\t\t b\r\nc\x07d  e \n f "), (2, "‘q’ “w” – — … x​")],
        "id long, t string",
    )
    out = {
        r.id: r.c
        for r in df.select(
            "id", fold_punctuation(clean_text("t")).alias("c")
        ).collect()
    }
    assert out[1] == "a b\ncd e\n f"
    assert out[2] == "'q' \"w\" - - ... x"


def test_nfc_nfkc_against_unicodedata(spark):
    samples = [
        "café mañana Ångström",
        "ﬁne ① ＨＩ",  # ligature, circled 1, fullwidth HI
        "already composed é ñ Å",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "id long, t string")
    got = {
        r.id: (r.nfc, r.nfkc)
        for r in df.select(
            "id", nfc_text("t").alias("nfc"), nfkc_text("t").alias("nfkc")
        ).collect()
    }
    for i, s in enumerate(samples):
        assert got[i][0] == unicodedata.normalize("NFC", s)
        assert got[i][1] == unicodedata.normalize("NFKC", s)


def test_normalize_corpus_flags_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "cafÃ© \t x"), (2, "clean text"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc: r for r in normalize_corpus(df, "text", "doc_id").collect()}
    assert rows[1].text == "café x" and rows[1].changed
    assert rows[2].text == "clean text" and not rows[2].changed
    assert rows[3].text is None and not rows[3].changed


def test_normalize_text_task_registered():
    from xetl_spark.plans.registry import BUILTINS

    spec, fn = BUILTINS.get("normalize_text")
    assert spec.env["FORM"].default == "NFC"
    assert spec.env["FIX_ENCODING"].type == "bool"


def test_column_expression_rejects_bad_form():
    from xetl_spark.operators.encoding import normalized_text_column

    with pytest.raises(ValueError, match="NFC"):
        normalized_text_column("t", form="NFD")


def test_fix_mojibake_fuzz_arbitrary_unicode():
    """Arbitrary Unicode garbage (surrogate-free): the fixer must
    never raise, never grow the string, and reach a fixpoint within
    its round budget + 1 (conservative: anything it can't losslessly
    shrink passes through untouched)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x2FFFF
            ),
            max_size=60,
        )
    )
    def prop(s):
        out = fix_mojibake_str(s)
        assert out is not None
        assert len(out) <= len(s)
        again = fix_mojibake_str(out)
        # one extra application may unwind a 4th encoding layer past
        # max_rounds; it must itself then be stable
        assert fix_mojibake_str(again) == fix_mojibake_str(fix_mojibake_str(again))

    prop()
