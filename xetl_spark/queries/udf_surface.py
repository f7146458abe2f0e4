"""Remaining UDF/UDAF/UDTF surface (SURVEY §2-B UDF table): scalar
Python UDF, SQL-registered UDF, grouped-agg pandas UDAF, co-grouped
applyInPandas, and a UDTF — each against a pure-SQL oracle so the
Python path is verified bit-for-bit against the JVM path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.queries import load, query


@query(
    "q_udf_scalar_python",
    oracle="""
    SELECT s_suppkey, concat(upper(s_name), '#', CAST(s_nationkey AS VARCHAR)) AS tag
    FROM supplier
    """,
)
def q_udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — supported but deliberately exercised
    on the smallest table only (supplier): the engine's guidance is
    pandas UDFs for anything hot (see q_udf_pandas_scalar)."""

    @F.udf("string")
    def tag(name: str, nk: int) -> str:
        return f"{name.upper()}#{nk}"

    (supplier,) = load(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey", tag(F.col("s_name"), F.col("s_nationkey")).alias("tag")
    )


@query(
    "q_udf_sql_registered",
    oracle="""
    SELECT p_partkey, round(p_retailprice * 0.93, 4) AS sale_price FROM part
    """,
)
def q_udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.udf.register: a pandas UDF callable from SQL text."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sale_price(p: pd.Series) -> pd.Series:
        return (p * 0.93).round(4)

    spark.udf.register("xetl_sale_price", sale_price)
    load(spark, sf_dir, "part")
    return spark.sql(
        "SELECT p_partkey, xetl_sale_price(p_retailprice) AS sale_price FROM part"
    )


@query(
    "q_udaf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF (Arrow batch in, scalar out)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, disc: pd.Series, qty: pd.Series) -> float:
        return float((price * (1 - disc)).sum() / qty.sum())

    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_quantity")),
            4,
        ).alias("weighted_avg_price")
    )


@query(
    "q_udf_cogrouped",
    oracle="""
    WITH o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT c.c_custkey, c.c_name, coalesce(o.n_orders, 0) AS n_orders
    FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def q_udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped applyInPandas: per-key pandas merge of two grouped
    DataFrames (custom-join escape hatch), verified against the
    equivalent SQL left join."""
    orders, cust = load(spark, sf_dir, "orders", "customer")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=["c_custkey", "c_name", "n_orders"])
        out = left[["c_custkey", "c_name"]].copy()
        out["n_orders"] = len(right)
        return out

    grouped = cust.groupBy("c_custkey").cogroup(orders.groupBy("o_custkey"))
    return grouped.applyInPandas(
        merge, schema="c_custkey long, c_name string, n_orders long"
    )


@query(
    "q_udtf_split",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word FROM part
    """,
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N output rows,
    verified against unnest/explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="p_partkey bigint, word string")
    class SplitWords:
        def eval(self, pk: int, text: str):
            for w in text.split(" "):
                yield pk, w

    spark.udtf.register("xetl_split_words", SplitWords)
    load(spark, sf_dir, "part")
    return spark.sql(
        "SELECT s.p_partkey, s.word FROM part, "
        "LATERAL xetl_split_words(p_partkey, p_type) s"
    )


@query(
    "q_udf_grouped_arrow",
    oracle="""
    SELECT c_nationkey, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS bal_sum
    FROM customer GROUP BY c_nationkey
    """,
)
def q_udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInArrow: per-group transform on raw pyarrow
    Tables — the zero-copy sibling of applyInPandas (no pandas
    conversion cost, exact Arrow types), verified against the SQL
    aggregate."""
    import pyarrow as pa

    def agg_group(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = table.column("c_nationkey")[0].as_py()
        bal = pc.sum(table.column("c_acctbal")).as_py() or 0.0
        return pa.table(
            {
                "c_nationkey": pa.array([key], pa.int64()),
                "n_cust": pa.array([table.num_rows], pa.int64()),
                "bal_sum": pa.array([round(bal, 2)], pa.float64()),
            }
        )

    (cust,) = load(spark, sf_dir, "customer")
    return (
        cust.select("c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInArrow(
            agg_group, schema="c_nationkey long, n_cust long, bal_sum double"
        )
    )


@query(
    "q_udtf_polymorphic",
    oracle="""
    SELECT o_orderkey, 0 AS bucket_idx,
           round(o_totalprice / 3, 2) AS share
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, 1, round(o_totalprice / 3, 2)
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, 2, round(o_totalprice / 3, 2)
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 static ``analyze``): the output
    schema is computed from a constant argument at plan time — here a
    row splitter whose fan-out degree is a parameter. The Arrow-batched
    eval path is the same as static UDTFs; only schema resolution is
    dynamic."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf

    class SplitShares:
        @staticmethod
        def analyze(n: AnalyzeArgument, key: AnalyzeArgument, amt: AnalyzeArgument) -> AnalyzeResult:
            from pyspark.sql.types import (
                DoubleType,
                IntegerType,
                LongType,
                StructType,
            )

            st = (
                StructType()
                .add("o_orderkey", LongType())
                .add("bucket_idx", IntegerType())
                .add("share", DoubleType())
            )
            if n.value <= 0:
                raise ValueError("n must be positive")
            return AnalyzeResult(schema=st)

        def eval(self, n, key, amt):
            share = round(amt / n, 2)
            for i in range(n):
                yield key, i, share

    spark.udtf.register("split_shares", udtf(SplitShares))
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT s.* FROM orders,
               LATERAL split_shares(3, o_orderkey, o_totalprice) s
        WHERE orders.o_orderkey % 100 = 0
        """
    )
