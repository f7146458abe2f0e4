"""Archive explosion: tar / tar.gz / zip payloads in a binary column →
one row per member file.

Training corpora ship as tarballs and zips (e.g. image-text shards in
the WebDataset convention: sample.jpg + sample.txt + sample.json per
prefix inside a tar). This operator runs entirely executor-side in
Arrow-batched mapInPandas over stdlib tarfile/zipfile — each archive
is decoded inside its partition, nothing touches the driver, and a
shard-per-archive layout parallelizes exactly like the corpus does.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame

from xetl_spark.operators.util import ensure_parallelism


class ArchiveFormatError(ValueError):
    """Payload is not a tar/zip archive this operator reads."""


def _sniff(payload: bytes) -> str:
    if payload[:2] == b"\x1f\x8b":
        return "gzip"
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip"
    if len(payload) >= 263 and payload[257:262] == b"ustar":
        return "tar"
    raise ArchiveFormatError("unrecognized archive payload")


def iter_members(payload: bytes, max_member_bytes: int | None = None):
    """Yield (name, bytes) per regular-file member, in archive order.
    Corrupt archives raise ArchiveFormatError (stdlib tarfile/zipfile/
    gzip/zlib errors are translated), never a stage-killing escape."""
    import zlib

    try:
        yield from _iter_members_inner(payload, max_member_bytes)
    except ArchiveFormatError:
        raise
    except (
        tarfile.TarError,
        zipfile.BadZipFile,
        zlib.error,
        EOFError,
        OSError,
        IndexError,
        ValueError,
        NotImplementedError,  # tarfile: exotic/corrupt member types
    ) as e:
        raise ArchiveFormatError(f"corrupt archive: {type(e).__name__}: {e}") from None


def _iter_members_inner(payload: bytes, max_member_bytes: int | None = None):
    kind = _sniff(payload)
    if kind == "gzip":
        payload = gzip.decompress(payload)
        kind = _sniff(payload)
    if kind == "zip":
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if max_member_bytes is not None and info.file_size > max_member_bytes:
                    raise ArchiveFormatError(
                        f"member {info.filename!r} exceeds max_member_bytes"
                    )
                yield info.filename, zf.read(info)
        return
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
        for info in tf:
            if not info.isreg():
                continue
            if max_member_bytes is not None and info.size > max_member_bytes:
                raise ArchiveFormatError(
                    f"member {info.name!r} exceeds max_member_bytes"
                )
            fh = tf.extractfile(info)
            yield info.name, fh.read() if fh else b""


def explode_archive(
    df: DataFrame,
    bytes_col: str = "archive",
    id_col: str = "doc_id",
    max_member_bytes: int | None = None,
) -> DataFrame:
    """(id, archive bytes) → one row per member: (id, member_name,
    member_bytes, member_size). ``max_member_bytes`` is the zip-bomb
    guard: a member whose DECLARED size exceeds it fails the task with
    a typed error before extraction."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rid = row[id_col]
                for name, data in iter_members(
                    bytes(row[bytes_col]), max_member_bytes
                ):
                    rows.append((rid, name, data, len(data)))
            yield pd.DataFrame(
                rows, columns=["id", "member_name", "member_bytes", "member_size"]
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, bytes_col).mapInPandas(
        run,
        schema=(
            f"id {id_type}, member_name string, member_bytes binary, "
            "member_size long"
        ),
    )


def build_tar(members: list[tuple[str, bytes]], compress: bool = False) -> bytes:
    """Fixture writer: members → tar (optionally gzipped) bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0  # deterministic fixtures
            tf.addfile(info, io.BytesIO(data))
    out = buf.getvalue()
    return gzip.compress(out, mtime=0) if compress else out


def build_zip(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()
