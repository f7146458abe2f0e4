"""Functions with no DuckDB equivalent — verified against literal
expected values instead of the oracle (still part of the declared
scalar-function surface)."""

import datetime as dt

from pyspark.sql import functions as F


def test_spark_only_string_functions(spark):
    df = spark.createDataFrame([("hello world", "TX")], "s string, st string")
    row = df.select(
        F.initcap("s").alias("ic"),
        F.soundex(F.lit("Robert")).alias("sx"),
        F.overlay(F.lit("SPARK_SQL"), F.lit("CORE"), 7).alias("ov"),
        F.format_number(F.lit(1234567.891), 2).alias("fn"),
        F.locate("world", F.col("s")).alias("loc"),
        F.find_in_set(F.lit("b"), F.lit("a,b,c")).alias("fis"),
        F.sentences(F.lit("Hi there. Bye now.")).alias("sent"),
    ).collect()[0]
    assert row.ic == "Hello World"
    assert row.sx == "R163"
    assert row.ov == "SPARK_CORE"
    assert row.fn == "1,234,567.89"
    assert row.loc == 7
    assert row.fis == 2
    assert row.sent == [["Hi", "there"], ["Bye", "now"]]


def test_spark_only_date_functions(spark):
    df = spark.createDataFrame([(dt.date(2024, 1, 15),)], "d date")
    row = df.select(
        F.months_between(F.lit("2024-03-15").cast("date"), F.col("d")).alias("mb"),
        F.months_between(F.lit("2024-03-01").cast("date"), F.col("d")).alias("mb2"),
        F.next_day(F.col("d"), "Mon").alias("nd"),
        F.trunc(F.col("d"), "year").alias("ty"),
        F.date_format(F.col("d"), "EEEE").alias("dow_name"),
    ).collect()[0]
    assert row.mb == 2.0
    assert abs(row.mb2 - (1 + 17 / 31)) < 1e-8  # day-fraction semantics
    assert row.nd == dt.date(2024, 1, 22)
    assert row.ty == dt.date(2024, 1, 1)
    assert row.dow_name == "Monday"


def test_bround_bankers_rounding(spark):
    df = spark.range(1).select(
        F.bround(F.lit(2.5), 0).alias("a"),
        F.bround(F.lit(3.5), 0).alias("b"),
        F.round(F.lit(2.5), 0).alias("c"),
    )
    row = df.collect()[0]
    assert row.a == 2.0  # half-even
    assert row.b == 4.0
    assert row.c == 3.0  # half-up


def test_uuid_and_rand_shapes(spark):
    rows = spark.range(5).select(
        F.expr("uuid()").alias("u"), F.rand(seed=1).alias("r")
    ).collect()
    assert len({r.u for r in rows}) == 5  # unique
    assert all(len(r.u) == 36 for r in rows)
    assert all(0.0 <= r.r < 1.0 for r in rows)


def test_json_tuple_and_schema_of_json(spark):
    df = spark.createDataFrame([('{"k": 7, "s": "x"}',)], "props string")
    row = df.select(
        F.json_tuple(F.col("props"), "k", "s").alias("k", "s"),
    ).collect()[0]
    assert (row.k, row.s) == ("7", "x")
    schema = spark.range(1).select(
        F.schema_of_json(F.lit('{"k": 1, "arr": [1.5]}')).alias("s")
    ).collect()[0].s
    assert "k" in schema and "arr" in schema and "ARRAY" in schema.upper()


def test_arrays_zip_slice_flatten(spark):
    df = spark.createDataFrame([([1, 2, 3], ["a", "b", "c"])], "xs array<int>, ys array<string>")
    row = df.select(
        F.arrays_zip("xs", "ys").alias("z"),
        F.slice("xs", 2, 2).alias("sl"),
        F.flatten(F.array(F.col("xs"), F.array(F.lit(9)))).alias("fl"),
    ).collect()[0]
    assert [(e.xs, e.ys) for e in row.z] == [(1, "a"), (2, "b"), (3, "c")]
    assert row.sl == [2, 3]
    assert row.fl == [1, 2, 3, 9]
