"""DOM-aware main-content extraction (operators/html.py): block
segmentation, jusText-style classification, the simplified context
pass, chrome/role ancestry, tag-soup leniency, and the Spark surface."""

from __future__ import annotations

import numpy as np  # noqa: F401  (parity with sibling test modules)
import pytest

from xetl_spark.operators.html import (
    classify_blocks,
    extract_main_content,
    segment_blocks,
)

SW = {"the", "and", "of", "to", "a"}
GOOD_PARA = (
    "The quick brown fox and the lazy dog went to a market of the old town "
    "and the weather was one of the best days of the year, and everyone "
    "agreed that the town was a lovely place to spend a day of rest there."
)


def test_segmentation_and_link_chars():
    blocks = segment_blocks(
        '<body><nav><a href="/">Home</a> <a href="/b">Blog</a></nav>'
        f"<p>{GOOD_PARA}</p>"
        "<p>Plain <a href='/x'>linked</a> tail</p></body>"
    )
    assert [b["chrome"] for b in blocks] == [True, False, False]
    assert blocks[0]["link_chars"] == len("HomeBlog")
    assert blocks[2]["link_chars"] == len("linked")
    assert blocks[1]["text"].startswith("The quick brown fox")


def test_head_script_style_title_dropped():
    blocks = segment_blocks(
        "<head><title>My Title</title><style>p{}</style>"
        "<script>var x='<p>not a block</p>';</script></head>"
        f"<body><p>{GOOD_PARA}</p></body>"
    )
    assert len(blocks) == 1
    assert "Title" not in blocks[0]["text"]


def test_classification_rules():
    mk = lambda text, link=0, chrome=False: {
        "text": text, "link_chars": link, "chrome": chrome,
    }
    blocks = [
        mk("Home Blog Contact", link=15),  # link density -> bad
        mk(GOOD_PARA),  # long + stopword dense -> good
        mk("Short note."),  # short, no links -> context
        mk(GOOD_PARA),  # good
        mk("© 2026 The Site"),  # copyright -> bad
        mk("lorem ipsum dolor sit amet " * 20),  # long, no stopwords -> bad
        mk("anything at all", chrome=True),  # chrome ancestor -> bad
    ]
    labels = classify_blocks(blocks, SW)
    assert labels == ["bad", "good", "good", "good", "bad", "bad", "bad"]


def test_context_pass_short_and_neargood():
    mk = lambda text, link=0: {"text": text, "link_chars": link, "chrome": False}
    near = "the and of to a " * 8  # stopword-dense but <= length_high
    # short between good+good -> good; short at page edge -> bad
    labels = classify_blocks(
        [mk("edge short"), mk(GOOD_PARA), mk("mid short"), mk(GOOD_PARA)], SW
    )
    assert labels == ["bad", "good", "good", "good"]
    # neargood needs only ONE good neighbour
    labels = classify_blocks([mk(near), mk(GOOD_PARA)], SW)
    assert labels == ["good", "good"]
    labels = classify_blocks([mk(near), mk("x " * 60)], SW)
    assert labels == ["bad", "bad"]


def test_role_attributes_and_tag_soup():
    blocks = segment_blocks(
        '<div role="contentinfo">footer text here</div>'
        f"<p>{GOOD_PARA}"  # unclosed <p>
        "<div>trailing</div>"
    )
    assert blocks[0]["chrome"] is True
    assert any(b["text"].startswith("The quick") for b in blocks)
    # nested unclosed chrome unwinds without going negative
    blocks = segment_blocks("<nav><div><p>x</p></nav><p>outside ok</p>")
    assert blocks[-1]["chrome"] is False


def test_empty_and_hostile_inputs():
    assert segment_blocks("") == []
    assert segment_blocks("just bare text") == [
        {"text": "just bare text", "link_chars": 0, "chrome": False}
    ]
    # random angle-bracket soup parses without raising
    segment_blocks("<<<>>><a<b><p att=''''><//nav>&bogus;&#xZZ;")
    with pytest.raises(ValueError, match="stopword"):
        extract_main_content(None, "html", lang="zz")


def test_extract_main_content_spark(spark):
    import pandas as pd

    page = (
        '<body><nav><a href="/">Home</a> <a href="/b">B</a></nav>'
        f"<p>{GOOD_PARA}</p><p>Short note.</p><p>{GOOD_PARA}</p>"
        "<footer>© site</footer></body>"
    )
    pdf = pd.DataFrame({"doc_id": [1, 2], "html": [page, "<p>no sw</p>"]})
    rows = {
        r.id: r
        for r in extract_main_content(
            spark.createDataFrame(pdf), "html", "doc_id"
        ).collect()
    }
    assert rows[1].n_good == 3  # two paras + context-promoted short note
    assert "Short note." in rows[1].main_text
    assert "Home" not in rows[1].main_text and "©" not in rows[1].main_text
    assert rows[2].n_good == 0 and rows[2].main_text == ""


def test_extract_main_builtin_task(spark, tmp_path):
    """The `extract_main` builtin drives the operator from a YAML job."""
    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    page = (
        '<body><nav><a href="/">Home</a> <a href="/b">B</a></nav>'
        f"<p>{GOOD_PARA}</p>"
        "<footer>© site</footer></body>"
    )
    src = tmp_path / "pages"
    spark.createDataFrame(
        [(1, page)], "doc_id long, html string"
    ).write.parquet(str(src))
    job = Job(
        name="mc",
        data=str(tmp_path),
        commands=[
            {"name": "pages", "task": "read_parquet", "env": {"PATH": str(src)}},
            {"name": "main", "task": "extract_main", "env": {}},
        ],
    )
    results = run_job(spark, job)
    assert all(r.status == "success" for r in results)
    row = results[-1].output.collect()[0]
    assert row.n_good == 1 and row.main_text.startswith("The quick")
