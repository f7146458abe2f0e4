"""SRT/WebVTT cue parsing (operators/subtitles.py): goldens, lenient
real-world forms, typed errors, and the Spark/task surfaces."""

from __future__ import annotations

import pytest

from xetl_spark.operators.subtitles import (
    SubtitleFormatError,
    extract_subtitles,
    parse_srt,
    parse_subtitles,
    parse_vtt,
)


def test_srt_golden_and_leniency():
    srt = (
        "1\r\n00:00:01,000 --> 00:00:03,500\r\nHello <i>world</i>\r\n"
        "second line\r\n\r\n"
        "2\r\n00:00:04,000 --> 00:00:06,000\r\n{\\an8}Top text\r\n\r\n"
        # index line missing entirely (common in the wild)
        "01:00:00,250 --> 01:00:02,750\nNo index cue\n"
    )
    cues = parse_srt(srt)
    assert cues == [
        (0, 1000, 3500, "Hello world second line"),
        (1, 4000, 6000, "Top text"),
        (2, 3600250, 3602750, "No index cue"),
    ]


def test_vtt_golden_and_blocks():
    vtt = (
        "﻿WEBVTT - demo\n\n"
        "NOTE a comment\nspanning lines\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "intro\n00:01.000 --> 00:03.000 align:start position:10%\n"
        "<c.yellow>Styled</c> cue\n\n"
        "01:00:04.000 --> 01:00:06.000\nSecond <00:00:05.000>karaoke cue\n"
    )
    cues = parse_vtt(vtt)
    assert cues == [
        (0, 1000, 3000, "Styled cue"),
        (1, 3604000, 3606000, "Second karaoke cue"),
    ]


def test_auto_dispatch_and_typed_errors():
    assert parse_subtitles("WEBVTT\n\n00:01.000 --> 00:02.000\nx")[0][3] == "x"
    assert parse_subtitles("00:00:01,000 --> 00:00:02,000\ny")[0][3] == "y"
    with pytest.raises(SubtitleFormatError, match="WEBVTT"):
        parse_vtt("not a vtt")
    with pytest.raises(SubtitleFormatError, match="no SRT cues"):
        parse_srt("   ")
    with pytest.raises(SubtitleFormatError, match="timestamps"):
        parse_srt("1\nnot a timestamp line\ntext")
    with pytest.raises(SubtitleFormatError, match="unknown"):
        parse_subtitles("x", fmt="microdvd")


def test_extract_subtitles_spark_and_err_rows(spark):
    import pandas as pd

    good = "1\n00:00:01,000 --> 00:00:02,000\nhello\n"
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": [good, "garbage"]})
    rows = extract_subtitles(
        spark.createDataFrame(pdf), "text", "doc_id"
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert by_id[1][0].text == "hello" and by_id[1][0].err is None
    assert by_id[2][0].err is not None and by_id[2][0].text is None


def test_subtitles_builtin_task(spark, tmp_path):
    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    src = tmp_path / "subs"
    spark.createDataFrame(
        [(7, "WEBVTT\n\n00:01.000 --> 00:02.500\nfrom the task")],
        "doc_id long, text string",
    ).write.parquet(str(src))
    job = Job(
        name="subs",
        data=str(tmp_path),
        commands=[
            {"name": "docs", "task": "read_parquet", "env": {"PATH": str(src)}},
            {"name": "cues", "task": "subtitles", "env": {}},
        ],
    )
    results = run_job(spark, job)
    assert all(r.status == "success" for r in results)
    row = results[-1].output.collect()[0]
    assert (row.start_ms, row.end_ms, row.fmt) == (1000, 2500, "vtt")
    assert row.text == "from the task"


def test_ass_dialogue_parsing():
    from xetl_spark.operators.subtitles import parse_ass

    ass = """[Script Info]
Title: demo

[V4+ Styles]
Format: Name, Fontname
Style: Default,Arial

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:01.50,0:00:03.25,Default,,0,0,0,,{\\an8}Top line\\Nsecond part
Dialogue: 0,1:02:03.04,1:02:04.00,Default,,0,0,0,,Plain, with a comma
"""
    cues = parse_ass(ass)
    assert cues == [
        (0, 1500, 3250, "Top line second part"),
        (1, 3723040, 3724000, "Plain, with a comma"),
    ]
    # auto-sniff routes it
    assert parse_subtitles(ass)[1][3] == "Plain, with a comma"
    with pytest.raises(SubtitleFormatError, match="no ASS"):
        parse_ass("[Events]\nFormat: Start, End, Text\n")
    with pytest.raises(SubtitleFormatError, match="timestamp"):
        parse_ass("[Events]\nDialogue: 0,bad,0:00:01.00,s,,0,0,0,,x")
