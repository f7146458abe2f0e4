"""Source/sink inventory: parquet scan, CSV/JSON/text roundtrips,
partitioned sinks, binary payloads.

Roundtrip queries materialize a temp copy in the requested format and
read it back — exercising the writer AND reader — then the oracle
checks against the original parquet (lossless roundtrip contract).
Temp dirs live under /tmp and are per-(format, sf) to be rerun-safe.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xetl_spark.queries import load, query


def _tmp(tag: str, sf_dir: str) -> str:
    safe = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"xetl_scan_{tag}_{safe}")


@query(
    "q_scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, round(l_extendedprice, 2) AS price
    FROM lineitem WHERE l_partkey % 10 = 0
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar parquet scan with filter + projection pushdown (plan
    shows PushedFilters and a 3-column ReadSchema — asserted in tests)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_partkey") % 10 == 0).select(
        "l_orderkey", "l_partkey", F.round("l_extendedprice", 2).alias("price")
    )


@query(
    "q_scan_csv_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS price
    FROM orders
    """,
)
def q_scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + scan (header, explicit schema, delimiter) — lossless
    for the projected columns, verified against the parquet original."""
    (orders,) = load(spark, sf_dir, "orders")
    out = _tmp("csv", sf_dir)
    proj = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    proj.write.mode("overwrite").option("header", True).option("sep", "|").csv(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).option("sep", "|").csv(out)


@query(
    "q_scan_json_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS bal
    FROM customer
    """,
)
def q_scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink + scan with explicit schema (no inference job)."""
    (cust,) = load(spark, sf_dir, "customer")
    out = _tmp("json", sf_dir)
    proj = cust.select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    )
    proj.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("bal", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(out)


@query(
    "q_scan_text",
    oracle="""
    SELECT text AS line, length(text) AS line_len FROM documents
    """,
)
def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink + scan (documents are single-line)."""
    (docs,) = load(spark, sf_dir, "documents")
    out = _tmp("text", sf_dir)
    docs.select(F.col("text").alias("value")).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    return lines.select(
        F.col("value").alias("line"), F.length("value").alias("line_len")
    )


@query(
    "q_sink_partitioned",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink (splitter parity: one input →
    many partitioned outputs), then a partition-pruned read-back."""
    (orders,) = load(spark, sf_dir, "orders")
    out = _tmp("part", sf_dir)
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "q_scan_pruned_manifest",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id BETWEEN 120 AND 260
    """,
)
def q_scan_pruned_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max data skipping (sources/manifest.py): lay the table out
    range-partitioned on the key (repartitionByRange + sort — the
    layout a large fact table should have), build a per-file min/max
    manifest from parquet FOOTERS only, and prune the file list before
    Spark plans the scan — the Iceberg/Delta metadata pattern without
    a table format. Hash-verified against the unpruned predicate; the
    files-actually-skipped assertion lives in
    tests/test_cdc_and_storage.py."""
    from xetl_spark.sources.manifest import pruned_read

    (docs,) = load(spark, sf_dir, "documents")
    out = _tmp("manifest", sf_dir)
    (
        docs.select("doc_id", "lang", "n_chars")
        .repartitionByRange(8, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    return pruned_read(spark, out, "doc_id", 120, 260)


@query(
    "q_scan_deletion_vectors",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 7 <> 0
    """,
)
def q_scan_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style positional deletion vectors (operators/cdc.py):
    write an immutable multi-file parquet table, soft-delete rows by
    recording their (_metadata.file_path, _metadata.row_index)
    coordinates in a tiny DV table, and read alive rows back as one
    broadcast LEFT ANTI join — no data-file rewrite. Hash-verified
    against the logical predicate the DV encodes."""
    from xetl_spark.operators.cdc import apply_deletion_vectors, read_with_position

    (docs,) = load(spark, sf_dir, "documents")
    out = _tmp("dv", sf_dir)
    (
        docs.select("doc_id", "lang", "n_chars")
        .repartition(6)
        .write.mode("overwrite")
        .parquet(out)
    )
    base = read_with_position(spark, out)
    dv = base.filter(F.col("doc_id") % 7 == 0).select(
        F.col("__file").alias("file"), F.col("__pos").alias("pos")
    )
    return apply_deletion_vectors(base, dv)


@query(
    "q_scan_binary",
    oracle="""
    SELECT doc_id, strlen(text) AS byte_len, sha256(text) AS digest
    FROM documents
    """,
)
def q_scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column: bytes + digest (multimodal base pattern;
    binaryFile-source reads are unit-tested separately)."""
    (docs,) = load(spark, sf_dir, "documents")
    raw = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(raw).cast("long").alias("byte_len"),
        F.sha2(raw, 256).alias("digest"),
    )


@query(
    "q_scan_orc_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS bal
    FROM supplier
    """,
)
def q_scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (columnar alternative to parquet)."""
    (supplier,) = load(spark, sf_dir, "supplier")
    out = _tmp("orc", sf_dir)
    proj = supplier.select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("bal")
    )
    proj.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@query("q_ingest_url", oracle=None)
def q_ingest_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL ingest parity (reference `download` task): driver-side fetch →
    distributed parse. Offline here: file:// URI of the local parquet
    acts as the URL; HTTP handlers are unit-tested with a local server.
    """
    from xetl_spark.sources.url import ingest_url

    return ingest_url(spark, f"file://{sf_dir}/region.parquet", fmt="parquet")


@query(
    "q_ingest_url_datasource",
    oracle="""
    SELECT CAST('file' AS VARCHAR) AS scheme, 200 AS status,
           count(*) AS n_urls
    FROM region
    """,
)
def q_ingest_url_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed URL ingest via the Spark-4 Python DataSource API
    (format 'xetl_url'): one scan partition per URL, fetched executor-
    side — the scale path for the reference `download` task. Offline
    here: each region row's parquet file uses a file:// URL (5 URLs,
    one per region-keyed copy)."""
    from xetl_spark.sources.url import register_url_datasource

    register_url_datasource(spark)
    urls = ",".join(f"file://{sf_dir}/region.parquet" for _ in range(5))
    df = spark.read.format("xetl_url").option("urls", urls).load()
    return df.select(
        F.split(F.col("url"), ":").getItem(0).alias("scheme"), "status"
    ).groupBy("scheme", "status").agg(F.count("*").alias("n_urls"))


@query(
    "q_scan_xml_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def q_scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + scan (Spark 4 built-in xml source, rowTag framing) —
    lossless roundtrip of the nation table verified against the parquet
    original."""
    (nation,) = load(spark, sf_dir, "nation")
    out = _tmp("xml", sf_dir)
    proj = nation.select("n_nationkey", "n_name", "n_regionkey")
    proj.write.mode("overwrite").format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).save(out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    )
    return (
        spark.read.schema(schema).format("xml").option("rowTag", "nation").load(out)
    )


@query(
    "q_scan_merge_schema",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS extra
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS extra
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q_scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches with different
    schemas (the second adds a column) unioned by a mergeSchema=true
    scan — rows from the old batch surface NULL for the new column.
    The append-only evolution path a long-lived 100 TB table needs
    (no rewrite of historical files)."""
    (orders,) = load(spark, sf_dir, "orders")
    out = _tmp("mergeschema", sf_dir)
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey"
    ).write.mode("overwrite").parquet(f"{out}/b1")
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("extra")
    ).write.mode("overwrite").parquet(f"{out}/b2")
    return spark.read.option("mergeSchema", True).parquet(f"{out}/b1", f"{out}/b2")


@query(
    "q_lineage_flagship",
    oracle="""
    SELECT * FROM (VALUES
      ('n_name',      'nation',   'n_name'),
      ('revenue',     'lineitem', 'l_discount'),
      ('revenue',     'lineitem', 'l_extendedprice'))
    AS t(column_name, source_table, source_column)
    """,
)
def q_lineage_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column provenance of the flagship star join as DATA: extract
    lineage from the analyzed plan (plans/lineage.py — zero execution)
    and emit one row per (output column, source table, source column).
    Hash-verified against the literal expected provenance, which pins
    lineage-extraction stability itself into the correctness gate.
    count(*)-style columns have no attribute inputs and are excluded
    (n_lineitems derives from no source column)."""
    from xetl_spark.plans.lineage import column_lineage
    from xetl_spark.queries.relational import q_join_revenue_by_nation

    lin = column_lineage(q_join_revenue_by_nation(spark, sf_dir))
    rows = sorted(
        (col, src.rsplit("/", 1)[-1].removesuffix(".parquet"), c)
        for col, srcs in lin.items()
        for src, c in srcs
    )
    return spark.createDataFrame(
        rows, "column_name string, source_table string, source_column string"
    )


@query(
    "q_scan_avro_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price,
           epoch_us(o_orderdate) AS od_us
    FROM orders
    """,
)
def q_scan_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro sink + scan without the spark-avro jar: pure-Python Object
    Container File codec (sources/avro.py — zigzag varints, deflate
    blocks, sync markers per the Avro 1.11 spec) writing one container
    per Spark partition inside mapInPandas, read back through the
    ``xetl_avro`` Python DataSource (one InputPartition per file,
    executor-side decode). Lossless for the projected columns,
    verified against the parquet original."""
    from xetl_spark.sources.avro import register_avro_datasource, write_avro

    (orders,) = load(spark, sf_dir, "orders")
    out = _tmp("avro", sf_dir)
    proj = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
        "o_orderdate",
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)  # rerun-safe
    write_avro(proj, out, codec="deflate")
    register_avro_datasource(spark)
    back = spark.read.format("xetl_avro").option("path", out).load()
    return back.select(
        "o_orderkey",
        "o_orderstatus",
        "price",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )


@query(
    "q_scan_avro_snappy",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS bal
    FROM customer
    """,
)
def q_scan_avro_snappy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro roundtrip under the SNAPPY block codec (sources/snappy.py
    pure-Python raw-block implementation, cross-validated against
    snappy-java; Avro framing = snappy body + big-endian CRC32 of the
    uncompressed block). Write-side emits spec-valid literal-only
    snappy; read-side decodes real LZ77 back-references too."""
    from xetl_spark.sources.avro import register_avro_datasource, write_avro

    (customer,) = load(spark, sf_dir, "customer")
    out = _tmp("avro_snappy", sf_dir)
    proj = customer.select(
        "c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 2).alias("bal")
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)  # rerun-safe
    write_avro(proj, out, codec="snappy")
    register_avro_datasource(spark)
    return spark.read.format("xetl_avro").option("path", out).load()


@query(
    "q_ingest_warc_html",
    oracle="""
    SELECT doc_id,
           'http://example.com/page/' || doc_id AS url,
           200 AS http_status,
           'Doc ' || doc_id || ' alpha ' || doc_id || ' & beta gamma '
             || (doc_id % 7) AS text
    FROM documents WHERE doc_id < 100
    """,
)
def q_ingest_warc_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl-shaped ingestion: a .warc.gz archive (one gzip
    member per record, the crawler layout) read through the
    ``xetl_warc`` Python DataSource (sources/warc.py — WARC/1.0 record
    framing + HTTP response splitting), then HTML→text extraction as a
    pure Catalyst regexp chain (operators/text.py html_to_text: strips
    script/style/comments/tags, decodes entities, collapses
    whitespace). Every extracted string recomputed closed-form by the
    SQL oracle."""
    import gzip as _gzip

    from xetl_spark.operators.text import html_to_text
    from xetl_spark.sources.warc import register_warc_datasource, warc_build

    (docs,) = load(spark, sf_dir, "documents")
    out = _tmp("warc", sf_dir)
    import shutil

    shutil.rmtree(out, ignore_errors=True)  # rerun-safe
    os.makedirs(out, exist_ok=True)
    records = []
    for did in range(100):
        html = (
            f"<html><head><title>Doc {did}</title><style>p "
            "{margin:0}</style></head><body>"
            f"<p>alpha {did} &amp; beta</p><script>var x=1;</script>"
            f"<!-- nav --><p>gamma {did % 7}</p></body></html>"
        ).encode()
        records.append(
            {
                "target_uri": f"http://example.com/page/{did}",
                "record_id": f"<urn:uuid:{did}>",
                "http": (200, "text/html", html),
            }
        )
    with open(os.path.join(out, "crawl-00000.warc.gz"), "wb") as fh:
        fh.write(warc_build(records, compress=True))
    register_warc_datasource(spark)
    resp = (
        spark.read.format("xetl_warc")
        .option("path", out)
        .load()
        .filter(F.col("warc_type") == "response")
    )
    return resp.select(
        F.regexp_extract("target_uri", r"/page/(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        "http_status",
        html_to_text(F.decode(F.col("body"), "utf-8")).alias("text"),
    ).join(docs.select("doc_id"), "doc_id")  # keep oracle's doc universe


@query(
    "q_ingest_tar_webdataset",
    oracle="""
    SELECT doc_id, doc_id || '/sample.txt' AS member_name,
           strlen('caption ' || doc_id) AS member_size,
           sha256('caption ' || doc_id) AS digest
    FROM documents WHERE doc_id < 150
    UNION ALL
    SELECT doc_id, doc_id || '/meta.json',
           strlen('{"id":' || doc_id || '}'),
           sha256('{"id":' || doc_id || '}')
    FROM documents WHERE doc_id < 150
    """,
)
def q_ingest_tar_webdataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard ingestion: synthesize one tar.gz per
    document (caption + JSON sidecar members with closed-form
    contents), explode members executor-side via
    operators/archive.py (stdlib tarfile inside Arrow-batched
    mapInPandas — the driver never touches archive bytes), and emit
    per-member size + sha256. Every field recomputed by the oracle."""
    from collections.abc import Iterator as _It

    import pandas as pd

    from xetl_spark.operators.archive import build_tar, explode_archive

    (docs,) = load(spark, sf_dir, "documents")
    ids = docs.select("doc_id").where(F.col("doc_id") < 150)

    def gen(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                shard = build_tar(
                    [
                        (f"{did}/sample.txt", f"caption {did}".encode()),
                        (f"{did}/meta.json", f'{{"id":{did}}}'.encode()),
                    ],
                    compress=True,
                )
                rows.append((did, shard))
            yield pd.DataFrame(rows, columns=["doc_id", "archive"])

    shards = ids.mapInPandas(gen, schema="doc_id long, archive binary")
    members = explode_archive(shards, "archive", "doc_id")
    return members.select(
        F.col("id").alias("doc_id"),
        "member_name",
        "member_size",
        F.sha2("member_bytes", 256).alias("digest"),
    )


@query(
    "q_scan_avro_zstd",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS bal
    FROM supplier
    """,
)
def q_scan_avro_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro roundtrip under the ZSTANDARD block codec (pyarrow's
    bundled libzstd; reader sizes the output from the zstd frame
    header's declared content size, RFC 8878 §3.1.1, with a typed
    error on streaming-mode frames and a 1 GiB claim cap against
    hostile headers). Closes the r6 'zstd Avro codec' residual —
    the full Avro 1.11 codec set now roundtrips."""
    from xetl_spark.sources.avro import register_avro_datasource, write_avro

    (supplier,) = load(spark, sf_dir, "supplier")
    out = _tmp("avro_zstd", sf_dir)
    proj = supplier.select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("bal")
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)  # rerun-safe
    write_avro(proj, out, codec="zstandard")
    register_avro_datasource(spark)
    return spark.read.format("xetl_avro").option("path", out).load()
