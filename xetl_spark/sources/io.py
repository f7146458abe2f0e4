"""Uniform batch read/write across formats.

Spark-first: these are thin, typed dispatchers over ``spark.read`` /
``DataFrameWriter`` — Catalyst keeps pushdown/pruning because nothing
is materialized in between. They exist so pipeline specs (plans/) can
name formats declaratively, mirroring the reference's file-based tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_READ_FORMATS = {"parquet", "csv", "json", "text", "orc", "binaryFile"}
_WRITE_FORMATS = {"parquet", "csv", "json", "text", "orc"}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported read format {fmt!r}; one of {sorted(_READ_FORMATS)}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str,
    quarantine_path: str | None = None,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE scan that splits parseable rows from malformed ones.

    A 100 TB ingest must not abort for a handful of corrupt records
    (FAILFAST), nor silently drop them (DROPMALFORMED); this reads with
    an explicit schema + a corrupt-record capture column and returns
    ``(good, bad)`` — bad rows as their raw source text, optionally
    also appended to ``quarantine_path`` for replay after an upstream
    fix.

    Requires an explicit schema: schema inference would both cost an
    extra full scan and erase the notion of "malformed". The scan is
    cached before splitting — Spark disallows filtering on the
    internal corrupt-record column of a live scan (the raw text exists
    only while the row is being parsed), and the two output branches
    would otherwise scan the source twice.
    """
    if fmt not in ("csv", "json"):
        raise ValueError("quarantine reads support csv/json")
    corrupt = "_corrupt_record"
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = T.StructType(list(schema.fields) + [T.StructField(corrupt, T.StringType())])
    df = (
        spark.read.format(fmt)
        .schema(full)
        .options(
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=corrupt,
            **options,
        )
        .load(path)
        .cache()
    )
    good = df.filter(df[corrupt].isNull()).drop(corrupt)
    bad = df.filter(df[corrupt].isNotNull()).select(df[corrupt].alias("raw"))
    if quarantine_path:
        bad.write.mode("append").text(quarantine_path)
    return good, bad


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in _WRITE_FORMATS:
        raise ValueError(f"unsupported write format {fmt!r}; one of {sorted(_WRITE_FORMATS)}")
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    writer.save(path)
