"""WARC reader (sources/warc.py) + html_to_text extraction: record
framing round-trips (plain + per-record-gzip), HTTP response
splitting, malformed-stream errors, DataSource read, and the Catalyst
HTML→text chain."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from xetl_spark.sources import warc


def _fixture_records():
    return [
        {
            "warc_type": "warcinfo",
            "record_id": "<urn:uuid:info>",
            "body": b"software: xetl\r\n",
            "content_type": "application/warc-fields",
        },
        {
            "target_uri": "http://example.com/a",
            "record_id": "<urn:uuid:a>",
            "http": (200, "text/html; charset=utf-8", b"<p>hi</p>"),
        },
        {
            "target_uri": "http://example.com/b",
            "record_id": "<urn:uuid:b>",
            "http": (404, "text/plain", b"gone"),
        },
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(compress):
    payload = warc.warc_build(_fixture_records(), compress=compress)
    recs = list(warc.parse_warc(payload))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[0]["body"] == b"software: xetl\r\n"
    assert recs[1]["http_status"] == 200
    assert recs[1]["http_content_type"] == "text/html; charset=utf-8"
    assert recs[1]["body"] == b"<p>hi</p>"
    assert recs[2]["http_status"] == 404
    assert recs[2]["target_uri"] == "http://example.com/b"


def test_warc_gzip_members_are_independent():
    """Each record its own gzip member (crawler layout): decompressing
    the whole file still yields every record."""
    payload = warc.warc_build(_fixture_records(), compress=True)
    # three independent members → three gzip magics
    assert payload.count(b"\x1f\x8b\x08") >= 3
    assert len(list(warc.parse_warc(payload))) == 3
    # a single-member gzip of the plain stream also parses
    plain = warc.warc_build(_fixture_records(), compress=False)
    assert len(list(warc.parse_warc(gzip.compress(plain)))) == 3


def test_warc_malformed_raises():
    with pytest.raises(warc.WarcFormatError):
        list(warc.parse_warc(b"NOT A WARC\r\n\r\n"))
    ok = warc.warc_build(_fixture_records())
    with pytest.raises(warc.WarcFormatError):
        list(warc.parse_warc(ok[: len(ok) - 30]))  # truncated block


def test_warc_datasource(spark, tmp_path):
    import os

    d = str(tmp_path / "crawl")
    os.makedirs(d)
    with open(os.path.join(d, "seg-0.warc.gz"), "wb") as fh:
        fh.write(warc.warc_build(_fixture_records(), compress=True))
    with open(os.path.join(d, "seg-1.warc"), "wb") as fh:
        fh.write(warc.warc_build(_fixture_records()[1:]))
    warc.register_warc_datasource(spark)
    df = spark.read.format("xetl_warc").option("path", d).load()
    rows = df.collect()
    assert len(rows) == 5  # 3 + 2, one partition per file
    resp = df.filter(F.col("warc_type") == "response")
    assert resp.filter(F.col("http_status") == 404).count() == 2


def test_html_to_text_extraction(spark):
    from xetl_spark.operators.text import html_to_text

    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        ("<script>var x = '<p>not text</p>';</script>real", "real"),
        ("<style>p {color: red}</style>styled", "styled"),
        ("<!-- hidden -->shown", "shown"),
        ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; c&nbsp;d", 'a & b <tag> "q" \'s\' c d'),
        ("&amp;lt;", "&lt;"),  # no double-decode
        ("  spaced\n\nout  ", "spaced out"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    got = {r.i: r.t for r in df.select("i", html_to_text("html").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_warc_pipeline_tasks(spark, tmp_path):
    """Declarative read_warc → html_to_text stages through a YAML
    manifest (the crawl-ingestion surface at the orchestration layer)."""
    import os

    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    d = tmp_path / "crawl"
    os.makedirs(d)
    recs = [
        {
            "target_uri": f"http://x.test/{i}",
            "record_id": f"<urn:uuid:{i}>",
            "http": (200, "text/html", f"<p>body {i} &amp; more</p>".encode()),
        }
        for i in range(4)
    ]
    with open(d / "seg.warc.gz", "wb") as fh:
        fh.write(warc.warc_build(recs, compress=True))
    job = Job.from_yaml(
        f"""
        name: crawl-ingest
        data: {tmp_path}
        commands:
          - {{name: raw, task: read_warc, env: {{PATH: {d}}}}}
          - {{name: html, task: sql, env: {{QUERY: "SELECT target_uri, http_status, decode(body, 'utf-8') AS page FROM raw WHERE warc_type = 'response'", INPUT: raw}}}}
          - {{name: text, task: html_to_text, env: {{COLUMN: page, INPUT: html}}}}
        """,
        basedir=str(tmp_path),
    )
    results = run_job(spark, job)
    assert [r.status for r in results] == ["success"] * 3
    rows = {r.target_uri: r.text for r in results[-1].output.collect()}
    assert rows["http://x.test/2"] == "body 2 & more"


def test_archive_task(spark, tmp_path):
    from xetl_spark.operators.archive import build_tar
    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    src = tmp_path / "shards"
    df = spark.createDataFrame(
        [(1, build_tar([("a.txt", b"alpha"), ("b.txt", b"beta")]))],
        "doc_id long, archive binary",
    )
    df.write.parquet(str(src))
    job = Job.from_yaml(
        f"""
        name: shard-explode
        data: {tmp_path}
        commands:
          - {{name: shards, task: read_parquet, env: {{PATH: {src}}}}}
          - {{name: members, task: explode_archive, env: {{INPUT: shards}}}}
        """,
        basedir=str(tmp_path),
    )
    results = run_job(spark, job)
    assert [r.status for r in results] == ["success"] * 2
    got = sorted(
        (r.member_name, bytes(r.member_bytes)) for r in results[-1].output.collect()
    )
    assert got == [("a.txt", b"alpha"), ("b.txt", b"beta")]


def test_write_warc_roundtrip(spark, tmp_path):
    """Distributed WARC sink → DataSource read-back preserves URIs,
    statuses, and bodies; repartitioned input produces multiple
    shards."""
    import os

    from pyspark.sql import functions as F

    from xetl_spark.sources.warc import register_warc_datasource, write_warc

    df = spark.range(40).select(
        F.concat(F.lit("http://t/"), F.col("id")).alias("target_uri"),
        F.encode(F.concat(F.lit("<p>page "), F.col("id"), F.lit("</p>")), "utf-8").alias("body"),
        F.when(F.col("id") % 5 == 0, 404).otherwise(200).alias("status"),
    ).repartition(3)
    dest = str(tmp_path / "crawl_out")
    assert write_warc(df, dest, status_col="status") == 40
    assert len(os.listdir(dest)) == 3
    register_warc_datasource(spark)
    back = spark.read.format("xetl_warc").option("path", dest).load()
    rows = {r.target_uri: r for r in back.collect()}
    assert len(rows) == 40
    assert rows["http://t/5"].http_status == 404
    assert bytes(rows["http://t/7"].body) == b"<p>page 7</p>"
    assert rows["http://t/7"].warc_type == "response"


def test_html_to_text_differential_vs_stdlib_parser(spark):
    """Differential vs an independent reference (stdlib HTMLParser):
    for generated HTML within the operator's documented entity subset,
    the Catalyst regexp chain must extract the same whitespace-
    normalized text as a real parser."""
    import random
    import re
    from html.parser import HTMLParser

    class RefExtract(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self.skip:
                self.skip -= 1

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    def ref(html):
        p = RefExtract()
        p.feed(html)
        return re.sub(r"\s+", " ", " ".join(p.parts)).strip()

    rng_ = random.Random(9)
    words = ["alpha", "beta", "gamma", "x1", "42", "foo&amp;bar", "a&lt;b"]
    tags = ["p", "div", "span", "li", "h1", "em"]
    cases = []
    for i in range(40):
        parts = ["<html><body>"]
        for _ in range(rng_.randint(1, 8)):
            t = rng_.choice(tags)
            body = " ".join(rng_.choices(words, k=rng_.randint(1, 5)))
            parts.append(f"<{t} class='c{rng_.randint(0,9)}'>{body}</{t}>")
            if rng_.random() < 0.3:
                parts.append("<script>var x = '<p>no</p>';</script>")
            if rng_.random() < 0.2:
                parts.append("<!-- comment -->")
            if rng_.random() < 0.2:
                parts.append("<style>p {color: red}</style>")
        parts.append("</body></html>")
        cases.append((i, "".join(parts)))
    from xetl_spark.operators.text import html_to_text

    df = spark.createDataFrame(cases, "i long, html string")
    got = {r.i: r.t for r in df.select("i", html_to_text("html").alias("t")).collect()}
    for i, html in cases:
        assert got[i] == ref(html), (i, html, got[i], ref(html))
