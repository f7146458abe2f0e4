"""WARC (Web ARChive, ISO 28500) reader + ``xetl_warc`` Spark Python
DataSource — the Common Crawl ingestion path of a training-data
pipeline.

Implemented from the public WARC 1.0/1.1 format: records are a
``WARC/1.x`` version line, CRLF header lines, a blank line, exactly
``Content-Length`` block bytes, then CRLF CRLF. ``response`` records
carry an HTTP/1.x message in the block; the reader splits status /
headers / body so downstream text extraction starts from the payload.
``.warc.gz`` files are handled via stdlib gzip (multi-member streams —
the per-record-member layout crawlers emit — decompress transparently
as a concatenation).

Scale shape: same as the Avro source — one InputPartition per
``.warc``/``.warc.gz`` file, parsed executor-side; the driver touches
only the file listing. A 1000-executor read of a Common Crawl segment
is one partition per archive file, which is exactly how the corpus is
sharded upstream.
"""

from __future__ import annotations

import gzip
import os


class WarcFormatError(ValueError):
    """Not a well-formed WARC record stream."""


_SCHEMA = (
    "warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, http_status int, "
    "http_content_type string, body binary"
)


def parse_warc(payload: bytes):
    """Yield one dict per WARC record (headers lower-cased, HTTP
    responses split into status/headers/body). Tolerates trailing
    garbage only if it is whitespace."""
    if payload[:2] == b"\x1f\x8b":
        import zlib

        try:
            payload = gzip.decompress(payload)  # multi-member safe
        except (OSError, EOFError, zlib.error) as e:
            raise WarcFormatError(f"corrupt gzip stream: {e}") from None
    pos = 0
    n = len(payload)
    while pos < n:
        while pos < n and payload[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        eol = payload.find(b"\n", pos)
        if eol < 0 or not payload[pos:eol].strip().startswith(b"WARC/"):
            raise WarcFormatError(f"expected WARC version line at byte {pos}")
        version = payload[pos:eol].strip().decode("ascii", "replace")
        pos = eol + 1
        headers: dict[str, str] = {}
        while True:
            eol = payload.find(b"\n", pos)
            if eol < 0:
                raise WarcFormatError("truncated record headers")
            line = payload[pos:eol].rstrip(b"\r")
            pos = eol + 1
            if not line:
                break
            if b":" not in line:
                raise WarcFormatError(f"malformed header line {line!r}")
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcFormatError("record missing Content-Length") from None
        if pos + length > n:
            raise WarcFormatError("record block overruns payload")
        block = payload[pos : pos + length]
        pos += length
        rec = {
            "version": version,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "warc_date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "body": block,
        }
        if rec["warc_type"] == "response" and block[:5] in (b"HTTP/",):
            split = block.find(b"\r\n\r\n")
            if split < 0:
                split = block.find(b"\n\n")
                head, body = (block[:split], block[split + 2 :]) if split >= 0 else (
                    block,
                    b"",
                )
            else:
                head, body = block[:split], block[split + 4 :]
            lines = head.split(b"\n")
            status_parts = lines[0].split()
            if len(status_parts) >= 2 and status_parts[1].isdigit():
                rec["http_status"] = int(status_parts[1])
            for hl in lines[1:]:
                hl = hl.rstrip(b"\r")
                if hl.lower().startswith(b"content-type:"):
                    rec["http_content_type"] = (
                        hl.split(b":", 1)[1].strip().decode("utf-8", "replace")
                    )
            rec["body"] = body
        yield rec


def warc_build(records: list[dict], compress: bool = False) -> bytes:
    """Fixture writer: records = dicts with warc_type, target_uri,
    record_id, warc_date, and either ``body`` bytes or ``http`` =
    (status, content_type, body) for response records. With
    ``compress``, each record becomes its own gzip member (the crawler
    layout)."""
    out = bytearray()
    for r in records:
        if "http" in r:
            status, ctype, body = r["http"]
            block = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            wtype = r.get("warc_type", "response")
            btype = "application/http; msgtype=response"
        else:
            block = r["body"]
            wtype = r.get("warc_type", "resource")
            btype = r.get("content_type", "application/octet-stream")
        rec = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n"
            f"WARC-Date: {r.get('warc_date', '2026-01-01T00:00:00Z')}\r\n"
            + (
                f"WARC-Target-URI: {r['target_uri']}\r\n"
                if r.get("target_uri")
                else ""
            )
            + f"Content-Type: {btype}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode() + block + b"\r\n\r\n"
        out += gzip.compress(bytes(rec)) if compress else rec
    return bytes(out)


def register_warc_datasource(spark) -> None:
    """Register ``xetl_warc`` for ``spark.read.format("xetl_warc")``.

    One InputPartition per .warc/.warc.gz file, parsed executor-side;
    rows are (warc_type, record_id, warc_date, target_uri,
    content_type, http_status, http_content_type, body)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _WarcFile(InputPartition):
        def __init__(self, path: str):
            self.path = path

    def _list(path: str) -> list[str]:
        if os.path.isdir(path):
            return sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith((".warc", ".warc.gz"))
            )
        return [path]

    class _WarcReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise WarcFormatError("xetl_warc requires a path option")

        def partitions(self):
            files = _list(self.path)
            if not files:
                raise WarcFormatError(f"no .warc files under {self.path}")
            return [_WarcFile(p) for p in files]

        def read(self, partition):
            with open(partition.path, "rb") as fh:
                for rec in parse_warc(fh.read()):
                    yield (
                        rec["warc_type"],
                        rec["record_id"],
                        rec["warc_date"],
                        rec["target_uri"],
                        rec["content_type"],
                        rec["http_status"],
                        rec["http_content_type"],
                        rec["body"],
                    )

    class WarcDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "xetl_warc"

        def schema(self):
            return _SCHEMA

        def reader(self, schema):  # noqa: ANN001
            return _WarcReader(self.options)

    spark.dataSource.register(WarcDataSource)


def write_warc(
    df,
    path: str,
    uri_col: str = "target_uri",
    body_col: str = "body",
    status_col: str | None = None,
    content_type: str = "text/html",
    compress: bool = True,
) -> int:
    """Write (uri, body[, status]) rows as WARC response records, one
    ``.warc.gz`` shard per Spark partition (each record its own gzip
    member — the crawler layout). Executor-side via mapInPandas, same
    scale shape as write_avro: a 1000-executor write is one shard per
    partition. Returns the record count written."""
    import os

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    cols = [uri_col, body_col] + ([status_col] if status_col else [])

    def emit(batches):
        import socket
        import uuid

        recs = []
        for pdf in batches:
            for _, row in pdf.iterrows():
                body = row[body_col]
                body = body.encode("utf-8") if isinstance(body, str) else bytes(body)
                recs.append(
                    {
                        "target_uri": str(row[uri_col]),
                        "record_id": f"<urn:uuid:{uuid.uuid4()}>",
                        "http": (
                            int(row[status_col]) if status_col else 200,
                            content_type,
                            body,
                        ),
                    }
                )
        fname = f"seg-{uuid.uuid4().hex}-{socket.gethostname()}.warc.gz"
        with open(os.path.join(path, fname), "wb") as fh:
            fh.write(warc_build(recs, compress=compress))
        yield pd.DataFrame({"n": [len(recs)]})

    stats = df.select(*cols).mapInPandas(emit, schema="n long")
    from pyspark.sql import functions as F

    return stats.agg(F.sum("n")).collect()[0][0] or 0
