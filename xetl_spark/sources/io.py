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
