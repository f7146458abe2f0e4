"""Archive explosion (operators/archive.py): tar / tar.gz / zip
member extraction, WebDataset-style grouping, zip-bomb guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xetl_spark.operators.archive import (
    ArchiveFormatError,
    build_tar,
    build_zip,
    explode_archive,
    iter_members,
)

MEMBERS = [
    ("000/sample.txt", b"a caption"),
    ("000/sample.jpg", b"\xff\xd8fakejpeg"),
    ("001/sample.txt", b"another"),
]


@pytest.mark.parametrize(
    "payload",
    [build_tar(MEMBERS), build_tar(MEMBERS, compress=True), build_zip(MEMBERS)],
    ids=["tar", "tar.gz", "zip"],
)
def test_iter_members_all_formats(payload):
    assert list(iter_members(payload)) == MEMBERS


def test_iter_members_rejects_garbage():
    with pytest.raises(ArchiveFormatError):
        list(iter_members(b"definitely not an archive"))


def test_explode_archive_operator(spark):
    df = spark.createDataFrame(
        [(1, build_tar(MEMBERS, compress=True)), (2, build_zip(MEMBERS[:1]))],
        "doc_id long, archive binary",
    )
    rows = explode_archive(df, "archive", "doc_id").collect()
    assert len(rows) == 4
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append((r.member_name, bytes(r.member_bytes)))
    assert by_id[1] == MEMBERS
    assert by_id[2] == MEMBERS[:1]
    assert all(r.member_size == len(bytes(r.member_bytes)) for r in rows)


def test_explode_archive_webdataset_grouping(spark):
    """The WebDataset idiom: group members by key prefix to pair
    modality files of one sample."""
    df = spark.createDataFrame(
        [(1, build_tar(MEMBERS))], "doc_id long, archive binary"
    )
    grouped = (
        explode_archive(df, "archive", "doc_id")
        .withColumn("key", F.regexp_extract("member_name", r"^(\d+)/", 1))
        .groupBy("id", "key")
        .agg(F.sort_array(F.collect_list("member_name")).alias("files"))
    )
    got = {r.key: r.files for r in grouped.collect()}
    assert got["000"] == ["000/sample.jpg", "000/sample.txt"]
    assert got["001"] == ["001/sample.txt"]


def test_zip_bomb_guard(spark):
    big = [("huge.bin", b"\x00" * 10000)]
    df = spark.createDataFrame(
        [(1, build_zip(big))], "doc_id long, archive binary"
    )
    with pytest.raises(Exception, match="max_member_bytes"):
        explode_archive(df, "archive", "doc_id", max_member_bytes=1000).collect()
