"""URL ingest — parity with the reference `download` task
(reference: tests/fixtures/tasks/download/manifest.yml, README.md:53-64).

Driver-side fetch of the (single) URL payload to a scratch location,
then a distributed ``spark.read`` of the fetched file. For many-URL
ingestion at scale use ``fetch_urls_distributed``: URLs become rows and
the fetch itself runs in executors via mapInPandas, so no payload ever
passes through the driver.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from xetl_spark.sources.io import read_any


def ingest_url(
    spark: SparkSession,
    url: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Fetch one URL and load it as a DataFrame."""
    dest_dir = tempfile.mkdtemp(prefix="xetl_url_")
    dest = os.path.join(dest_dir, os.path.basename(url) or "payload")
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as out:  # noqa: S310
        shutil.copyfileobj(resp, out)
    return read_any(spark, dest, fmt=fmt, schema=schema, **options)


FETCH_SCHEMA = "url string, status int, byte_len long, body binary"


def fetch_urls_distributed(urls_df: DataFrame, url_col: str = "url") -> DataFrame:
    """Executor-side fetch of a DataFrame of URLs (the 100 TB path:
    partition the URL list, fetch in parallel, nothing on the driver).

    Arrow-batched mapInPandas; failures surface as status=-1 rows rather
    than task aborts so one dead link can't kill a 10^6-URL ingest.
    """
    import pandas as pd

    def fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for u in pdf[url_col]:
                try:
                    with urllib.request.urlopen(u, timeout=30) as resp:  # noqa: S310
                        body = resp.read()
                        rows.append((u, int(getattr(resp, "status", 200)), len(body), body))
                except Exception:
                    rows.append((u, -1, 0, b""))
            yield pd.DataFrame(rows, columns=["url", "status", "byte_len", "body"])

    return urls_df.mapInPandas(fetch, schema=FETCH_SCHEMA)


def register_url_datasource(spark: SparkSession) -> None:
    """Register the ``xetl_url`` Python data source (Spark 4 DataSource
    API) so URL ingest is a first-class ``spark.read.format("xetl_url")``
    — one InputPartition per URL, fetched executor-side, composing with
    the whole reader stack (schema, options, downstream pushdown).

    Usage:
        register_url_datasource(spark)
        df = (spark.read.format("xetl_url")
              .option("urls", "https://a/x.txt,https://b/y.txt").load())
    """
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _UrlPartition(InputPartition):
        def __init__(self, url: str):
            self.url = url

    class _UrlReader(DataSourceReader):
        def __init__(self, options):
            raw = options.get("urls", "")
            self.urls = [u.strip() for u in raw.replace("\n", ",").split(",") if u.strip()]
            self.timeout = int(options.get("timeout", 30))

        def partitions(self):
            # one partition per URL: fetch parallelism == URL count,
            # scheduled across executors like any other scan split
            return [_UrlPartition(u) for u in self.urls]

        def read(self, partition):
            u = partition.url
            try:
                with urllib.request.urlopen(u, timeout=self.timeout) as resp:  # noqa: S310
                    body = resp.read()
                    status = int(getattr(resp, "status", 200) or 200)
            except Exception:
                body, status = b"", -1
            yield (u, status, len(body), body)

    class UrlDataSource(DataSource):
        """url string, status int, byte_len long, body binary — same
        row contract as fetch_urls_distributed."""

        @classmethod
        def name(cls) -> str:
            return "xetl_url"

        def schema(self) -> str:
            return FETCH_SCHEMA

        def reader(self, schema):  # noqa: ANN001
            return _UrlReader(self.options)

    spark.dataSource.register(UrlDataSource)
