"""Document-format ingestion queries: PDF / DOCX / EPUB → text.

Fixtures are REAL container bytes built executor-side by the
deterministic builders (operators/pdfdoc.py, operators/docx.py) from
the ``documents`` table, then decoded by the REAL extractors — the
oracle sees only the original text, so a hash match certifies the full
build → serialize → sniff → parse → extract round-trip on actual
compressed payloads (Flate/LZW/A85/AHx/RLE content streams, classic
and xref-stream+ObjStm layouts, zip containers).

Scale shape: both build and extract are per-row map work inside one
Arrow-batched ``mapInPandas`` — no shuffle, no driver participation;
at 100 TB this is embarrassingly parallel scan-side work, exactly how
a real corpus would route PDFs (CODECS.md documents the measured
per-core throughput contract)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.operators.util import ensure_parallelism
from xetl_spark.queries import load, query

_PDF_FILTERS = ("flate", "lzw", "ahx", "a85", "rle")
_WORDS_PER_LINE = 8
_LINES_PER_PAGE = 25
_DOCX_WORDS_PER_PARA = 12
_EPUB_LINES_PER_CH = 3


def _wrap(text: str, per_line: int = _WORDS_PER_LINE) -> list[str]:
    words = text.split(" ")
    return [
        " ".join(words[i : i + per_line]) for i in range(0, len(words), per_line)
    ]


def _pdf_pages(text: str) -> list[str]:
    lines = _wrap(text)
    return [
        "\n".join(lines[j : j + _LINES_PER_PAGE])
        for j in range(0, len(lines), _LINES_PER_PAGE)
    ]


def _doc_fixture_df(
    spark: SparkSession,
    sf_dir: str,
    lo: int,
    hi: int,
    kind: str,
    extractor=None,
    extractor_schema: str | None = None,
) -> DataFrame:
    """(doc_id, payload) with payload = built container bytes.

    ``extractor``: optional ``payload bytes -> value`` applied to each
    built container INSIDE the same Arrow stage (output schema
    ``extractor_schema``, one ``value`` column plus doc_id). Chaining a
    second ``mapInPandas`` for the extract instead costs a second
    JVM→Python→JVM boundary crossing PER TASK in the same stage —
    measured 1.3-2.5s vs 0.43s for the 200-doc PDF battery at sf0.1
    (r14 optimization round, guide §4.1: the per-row codec work here is
    ~0.1ms, so the round-trip dominates). The build→bytes→parse
    round-trip is unchanged: the extractor sees exactly the serialized
    container bytes."""
    (docs,) = load(spark, sf_dir, "documents")
    # a small local parquet arrives as ONE partition, which would run
    # the whole container-build + parse battery on a single core while
    # 31 idle (r14: q_ingest_pdf_text 1.66 -> ~0.3s); on a real cluster
    # the scan is already split and this is a no-op
    src = ensure_parallelism(
        docs.select("doc_id", "text").where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ),
        max_partitions=16,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xetl_spark.operators import docx as docmod
        from xetl_spark.operators import pdfdoc

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                did = int(row["doc_id"])
                text = str(row["text"])
                if kind == "pdf":
                    payload = pdfdoc.build_pdf(
                        _pdf_pages(text),
                        xref_stream=bool(did % 2),
                        content_filter=_PDF_FILTERS[did % len(_PDF_FILTERS)],
                    )
                elif kind == "docx":
                    words = text.split(" ")
                    paras = [
                        " ".join(words[i : i + _DOCX_WORDS_PER_PARA])
                        for i in range(0, len(words), _DOCX_WORDS_PER_PARA)
                    ]
                    payload = docmod.build_docx(paras)
                elif kind == "epub":
                    lines = _wrap(text)
                    chapters = [
                        ("", "\n".join(lines[j : j + _EPUB_LINES_PER_CH]))
                        for j in range(0, len(lines), _EPUB_LINES_PER_CH)
                    ]
                    payload = docmod.build_epub(chapters, title=f"doc-{did}")
                else:  # mixed triage matrix (+ deliberate corrupt rows)
                    if did % 17 == 0:
                        payload = b"\x00garbage not a document\x00"
                    elif did % 3 == 0:
                        payload = pdfdoc.build_pdf(
                            _pdf_pages(text), xref_stream=bool(did % 2)
                        )
                    elif did % 3 == 1:
                        words = text.split(" ")
                        payload = docmod.build_docx(
                            [
                                " ".join(words[i : i + _DOCX_WORDS_PER_PARA])
                                for i in range(
                                    0, len(words), _DOCX_WORDS_PER_PARA
                                )
                            ]
                        )
                    else:
                        lines = _wrap(text)
                        payload = docmod.build_epub(
                            [
                                ("", "\n".join(lines[j : j + _EPUB_LINES_PER_CH]))
                                for j in range(
                                    0, len(lines), _EPUB_LINES_PER_CH
                                )
                            ]
                        )
                if extractor is not None:
                    rows.append((did, extractor(payload)))
                else:
                    rows.append((did, payload))
            cols = ["doc_id", "value" if extractor is not None else "payload"]
            yield pd.DataFrame(rows, columns=cols)

    if extractor is not None:
        return src.mapInPandas(gen, schema=extractor_schema)
    return src.mapInPandas(gen, schema="doc_id long, payload binary")


@query(
    "q_ingest_pdf_text",
    oracle="""
    SELECT doc_id, text AS extracted
    FROM documents WHERE doc_id < 200
    """,
)
def q_ingest_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF round-trip: build real PDFs from documents.text (layout and
    content filter vary per doc — classic xref vs 1.5 xref-stream +
    ObjStm, Flate/LZW/ASCII85/ASCIIHex/RunLength), extract with the
    pure-spec parser (operators/pdfdoc.py), normalize page/line breaks
    back to spaces. Hash-match against the untouched source text pins
    every byte of both the writer and the reader."""
    from xetl_spark.operators import pdfdoc

    texts = _doc_fixture_df(
        spark, sf_dir, 0, 200, "pdf",
        extractor=pdfdoc.pdf_text,
        extractor_schema="doc_id long, value string",
    )
    return texts.select(
        "doc_id", F.translate("value", "\f\n", "  ").alias("extracted")
    )


@query(
    "q_ingest_docx_text",
    oracle="""
    SELECT doc_id, text AS extracted
    FROM documents WHERE doc_id >= 200 AND doc_id < 400
    """,
)
def q_ingest_docx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX round-trip: WordprocessingML built and re-extracted
    (operators/docx.py), paragraph breaks normalized back to spaces."""
    from xetl_spark.operators import docx as docmod

    texts = _doc_fixture_df(
        spark, sf_dir, 200, 400, "docx",
        extractor=docmod.docx_text,
        extractor_schema="doc_id long, value string",
    )
    return texts.select(
        "doc_id", F.translate("value", "\n", " ").alias("extracted")
    )


@query(
    "q_ingest_epub_text",
    oracle="""
    SELECT doc_id, text AS extracted
    FROM documents WHERE doc_id >= 250 AND doc_id < 450
    """,
)
def q_ingest_epub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB round-trip: OCF container + OPF spine + XHTML chapters
    built and re-extracted via the deterministic tag-stripper; chapter
    and line breaks normalized back to spaces."""
    from xetl_spark.operators import docx as docmod

    texts = _doc_fixture_df(
        spark, sf_dir, 250, 450, "epub",
        extractor=docmod.epub_text,
        extractor_schema="doc_id long, value string",
    )
    return texts.select(
        "doc_id", F.translate("value", "\f\n", "  ").alias("extracted")
    )


@query(
    "q_multimodal_pdf_probe",
    oracle=f"""
    WITH n AS (
      SELECT doc_id,
             CAST(ceil(len(string_split(text, ' ')) / {_WORDS_PER_LINE}.0)
                  AS BIGINT) AS nlines
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 1 THEN '1.5' ELSE '1.4' END AS version,
           CAST(ceil(nlines / {_LINES_PER_PAGE}.0) AS INT) AS pages,
           CAST(CASE WHEN doc_id % 2 = 1
                     THEN 7 + 2 * ceil(nlines / {_LINES_PER_PAGE}.0)
                     ELSE 5 + 2 * ceil(nlines / {_LINES_PER_PAGE}.0)
                END AS INT) AS objects,
           CASE WHEN doc_id % 2 = 1 THEN 'stream' ELSE 'table' END AS xref_kind,
           FALSE AS encrypted
    FROM n
    """,
)
def q_multimodal_pdf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF triage probe matrix: version / page count / object count /
    xref layout / encryption flag, verified against the closed form of
    the builder's layout (page count from the word-wrap arithmetic the
    oracle recomputes in SQL; object count = 5+2p classic, 7+2p for
    the xref-stream layout's extra ObjStm+XRef objects)."""
    fixtures = _doc_fixture_df(spark, sf_dir, 0, 300, "pdf")

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xetl_spark.operators import pdfdoc

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = pdfdoc.pdf_probe(bytes(r["payload"]))
                rows.append(
                    (
                        int(r["doc_id"]),
                        p["version"],
                        p["pages"],
                        p["objects"],
                        p["xref_kind"],
                        p["encrypted"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "version", "pages", "objects", "xref_kind",
                    "encrypted",
                ],
            )

    return fixtures.mapInPandas(
        probe,
        schema=(
            "doc_id long, version string, pages int, objects int, "
            "xref_kind string, encrypted boolean"
        ),
    )


@query(
    "q_ingest_doc_matrix",
    oracle=f"""
    WITH n AS (
      SELECT doc_id,
             CAST(ceil(len(string_split(text, ' ')) / {_WORDS_PER_LINE}.0)
                  AS BIGINT) AS nlines,
             CAST(ceil(len(string_split(text, ' ')) / {_DOCX_WORDS_PER_PARA}.0)
                  AS BIGINT) AS nparas
      FROM documents WHERE doc_id < 240
    )
    SELECT doc_id,
           CASE WHEN doc_id % 17 = 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN 'pdf'
                WHEN doc_id % 3 = 1 THEN 'docx'
                ELSE 'epub' END AS fmt,
           CASE WHEN doc_id % 17 = 0 THEN NULL
                WHEN doc_id % 3 = 0
                  THEN CAST(ceil(nlines / {_LINES_PER_PAGE}.0) AS INT)
                WHEN doc_id % 3 = 1 THEN CAST(nparas AS INT)
                ELSE CAST(ceil(nlines / {_EPUB_LINES_PER_CH}.0) AS INT)
           END AS pages,
           doc_id % 17 = 0 AS has_err
    FROM n
    """,
)
def q_ingest_doc_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-corpus triage through the sniffing wrapper
    (multimodal.extract_document_text): PDFs, DOCX, EPUBs and
    deliberately corrupt payloads in one binary column; per-row typed
    errors surface in ``err`` instead of failing the job — the
    one-bad-file-in-100TB contract, hash-pinned including the NULL
    pattern."""
    from xetl_spark.operators import multimodal

    fixtures = _doc_fixture_df(spark, sf_dir, 0, 240, "mixed")
    out = multimodal.extract_document_text(
        fixtures, media_col="payload", id_col="doc_id"
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "fmt",
        "pages",
        F.col("err").isNotNull().alias("has_err"),
    )


@query(
    "q_ingest_xlsx_cells",
    oracle="""
    SELECT doc_id,
           CAST((i - 1) // 4 + 1 AS INT) AS cell_row,
           chr(65 + CAST((i - 1) % 4 AS INT)) AS cell_col,
           CASE WHEN (i - 1) % 7 = 3 THEN NULL ELSE w END AS text,
           CASE WHEN (i - 1) % 7 = 3 THEN CAST(length(w) AS DOUBLE) END AS num
    FROM (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS i
      FROM documents WHERE doc_id < 150
    )
    """,
)
def q_ingest_xlsx_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLSX round-trip: build a real SpreadsheetML workbook per doc
    (words in rows of 4 cells; every 7th-offset cell written as a
    NUMERIC cell holding the word length — exercising shared-string,
    dedup, and numeric cell types), re-extract with xlsx_cells, explode
    to one row per cell. The oracle recomputes the whole grid in SQL
    from the untouched source text."""
    (docs,) = load(spark, sf_dir, "documents")
    src = ensure_parallelism(
        docs.select("doc_id", "text").where(F.col("doc_id") < 150),
        max_partitions=16,
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xetl_spark.operators import docx as docmod

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                did = int(r["doc_id"])
                words = str(r["text"]).split(" ")
                grid = []
                for base in range(0, len(words), 4):
                    grid.append(
                        [
                            len(w) if i % 7 == 3 else w
                            for i, w in enumerate(
                                words[base : base + 4], start=base
                            )
                        ]
                    )
                blob = docmod.build_xlsx(grid)
                for _sheet, rr, cc, text, num in docmod.xlsx_cells(blob):
                    rows.append((did, rr, cc, text, num))
            yield pd.DataFrame(
                rows, columns=["doc_id", "cell_row", "cell_col", "text", "num"]
            )

    return src.mapInPandas(
        roundtrip,
        schema="doc_id long, cell_row int, cell_col string, text string, num double",
    )


@query(
    "q_multimodal_pdf_figures",
    oracle="""
    SELECT doc_id,
           16 AS width, 16 AS height, 'raw' AS kind,
           256 * (doc_id % 200) + 1920 AS sum_r,
           256 * ((doc_id * 7) % 200) + 1920 AS sum_g,
           256 * ((doc_id * 13) % 200) + 1920 AS sum_b
    FROM documents WHERE doc_id < 160
    """,
)
def q_multimodal_pdf_figures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF figure extraction (the VLM-corpus path): embed a
    deterministic 16x16 RGB image per document as a Flate raw-sample
    XObject (R = id%200+x, G = id*7%200+y, B = id*13%200+(x+y)%16 —
    the _synth_images closed form), alongside real page text, in
    alternating classic/xref-stream layouts; extract with pdf_images
    and report integer-exact channel sums the oracle recomputes in
    closed form (sum over x,y of id-term + coordinate term =
    256*term + 1920)."""
    (docs,) = load(spark, sf_dir, "documents")
    src = ensure_parallelism(
        docs.select("doc_id", "text").where(F.col("doc_id") < 160),
        max_partitions=16,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from xetl_spark.operators import pdfdoc

        x = np.arange(16)[None, :]
        y = np.arange(16)[:, None]
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                did = int(r["doc_id"])
                arr = np.stack(
                    [
                        np.broadcast_to(did % 200 + x, (16, 16)),
                        np.broadcast_to(did * 7 % 200 + y, (16, 16)),
                        (did * 13 % 200 + (x + y) % 16),
                    ],
                    axis=2,
                ).astype(np.uint8)
                blob = pdfdoc.build_pdf(
                    _pdf_pages(str(r["text"])),
                    xref_stream=bool(did % 2),
                    images=[(0, arr)],
                    image_format="raw",
                )
                (img,) = pdfdoc.pdf_images(blob)
                px = np.frombuffer(img["data"], np.uint8).reshape(16, 16, 3)
                sums = px.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (
                        did,
                        img["width"],
                        img["height"],
                        img["kind"],
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "kind", "sum_r", "sum_g",
                    "sum_b",
                ],
            )

    return src.mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, kind string, "
            "sum_r long, sum_g long, sum_b long"
        ),
    )
