"""DOM-aware main-content extraction from HTML — the jusText-class
boilerplate stage (Pomikálek 2011, the published heuristic behind
the CCNet/RefinedWeb/FineWeb "extract main content" step).

`text.html_to_text` is the markup→text normalization pass (pure
Catalyst tag strip) and `text.remove_boilerplate` is the CORPUS-level
C4 line-frequency filter; this module fills the gap both defer: a
per-DOCUMENT, DOM-aware classifier that segments a page into blocks
(stdlib ``html.parser`` — lenient on real-world tag soup) and keeps
only content-like ones. Signals per block, as published:

- link density (chars inside <a> / chars), threshold 0.2;
- stopword density against the language's function words;
- length bands (length_low=70 / length_high=200 chars);
- semantic ancestors: blocks inside <nav>/<header>/<footer>/<aside>
  (or the HTML5 role attributes) are boilerplate outright — the
  Arc90-readability signal jusText predates.

The context pass is the documented simplified variant: short /
near-good blocks become good when a neighbouring classified block is
good (near-good needs one good neighbour, short needs both), else
bad. Deterministic by construction — the driver oracle restates the
rules in SQL over closed-form fixtures.

Reference parity: the reference pipes pages through subprocess text
tools (reference README.md:54-77); here extraction is a typed
operator over the documents table.

Scale note: one page parses per Arrow-batch row inside its partition;
the stopword table is a per-executor constant (a dozen words), never
a broadcast join. Nothing touches the driver.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

from xetl_spark.operators.text import _LANG_STOPWORDS

# tags that delimit blocks (block-level content containers)
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "blockquote", "pre", "section", "article", "main", "figure",
    "figcaption", "dd", "dt", "table", "ul", "ol", "tr", "body",
    "header", "footer", "nav", "aside", "form",
}
# semantic ancestors that mark everything inside as boilerplate
_CHROME_TAGS = {"nav", "header", "footer", "aside", "form"}
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "title"}
# void elements never get close tags; don't push them on the stack
_VOID_TAGS = {
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


class _BlockParser(HTMLParser):
    """Segment HTML into text blocks with per-block link-char counts
    and a chrome (nav/header/footer/aside) ancestry flag."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._anchor_depth = 0
        self._skip_depth = 0
        self._chrome_depth = 0
        self._stack: list[str] = []

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "link_chars": min(self._link_chars, len(text)),
                    "chrome": self._chrome_depth > 0,
                }
            )
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        role = dict(attrs).get("role", "")
        if tag in _CHROME_TAGS or role in (
            "navigation", "banner", "contentinfo", "complementary",
        ):
            self._chrome_depth += 1
            self._stack.append(f"!{tag}")
        else:
            self._stack.append(tag)
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        # unwind the stack leniently (tag soup: close the nearest match)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].lstrip("!") == tag:
                for popped in self._stack[i:]:
                    if popped.startswith("!"):
                        self._chrome_depth = max(0, self._chrome_depth - 1)
                del self._stack[i:]
                break

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._anchor_depth:
            self._link_chars += len("".join(data.split()))

    def close(self) -> None:  # final implicit block
        super().close()
        self._flush()


def segment_blocks(html: str) -> list[dict]:
    """Parse one page -> [{text, link_chars, chrome}, ...]."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def classify_blocks(
    blocks: list[dict],
    stopwords: set[str],
    *,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
) -> list[str]:
    """jusText-style labels ('good'/'bad') per block: the published
    context-free pass, then the simplified context pass (near-good
    needs ONE good classified neighbour; short needs BOTH)."""
    raw: list[str] = []
    for b in blocks:
        text = b["text"]
        n = len(text)
        words = [w.strip(".,;:!?()[]\"'").lower() for w in text.split()]
        words = [w for w in words if w]
        sw = sum(1 for w in words if w in stopwords)
        density = sw / len(words) if words else 0.0
        link_density = b["link_chars"] / n if n else 1.0
        if b["chrome"]:
            raw.append("bad")
        elif link_density > max_link_density:
            raw.append("bad")
        elif "©" in text or "&copy" in text:
            raw.append("bad")
        elif n < length_low:
            raw.append("bad" if b["link_chars"] > 0 else "short")
        elif density >= stopwords_high:
            raw.append("good" if n > length_high else "neargood")
        elif density >= stopwords_low:
            raw.append("neargood")
        else:
            raw.append("bad")

    # context pass over the classified (good/bad) neighbourhood
    classified = [i for i, c in enumerate(raw) if c in ("good", "bad")]

    def neighbour(i: int, step: int) -> str:
        js = [j for j in classified if (j > i if step > 0 else j < i)]
        if not js:
            return "bad"  # page edges count as boilerplate
        return raw[min(js) if step > 0 else max(js)]

    out = []
    for i, c in enumerate(raw):
        if c == "good" or c == "bad":
            out.append(c)
        elif c == "neargood":
            out.append(
                "good"
                if neighbour(i, -1) == "good" or neighbour(i, 1) == "good"
                else "bad"
            )
        else:  # short
            out.append(
                "good"
                if neighbour(i, -1) == "good" and neighbour(i, 1) == "good"
                else "bad"
            )
    return out


def extract_main_content(
    df: DataFrame,
    html_col: str,
    id_col: str = "doc_id",
    lang: str = "en",
    **params,
) -> DataFrame:
    """(id, html) -> (id, main_text, n_blocks, n_good): DOM-aware
    main-content extraction, one page per Arrow-batch row. ``params``
    forward to classify_blocks (thresholds)."""
    if lang not in _LANG_STOPWORDS:
        raise ValueError(f"no stopword table for language {lang!r}")
    stopwords = set(_LANG_STOPWORDS[lang])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blocks = segment_blocks(str(row[html_col]))
                labels = classify_blocks(blocks, stopwords, **params)
                good = [
                    b["text"] for b, c in zip(blocks, labels) if c == "good"
                ]
                rows.append(
                    (
                        row[id_col],
                        "\n".join(good),
                        len(blocks),
                        len(good),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "main_text", "n_blocks", "n_good"]
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, html_col).mapInPandas(
        run,
        schema=f"id {id_type}, main_text string, n_blocks int, n_good int",
    )
