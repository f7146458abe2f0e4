"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the declared operator inventory (SURVEY.md §2-B)
for the driver's DuckDB differential check at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import xetl_spark.queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 5-way star join +
    aggregation (revenue by nation)."""
    return Q.REGISTRY["q_join_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for approximate /
    nondeterministic / streaming-stateful ops → rows-only check)."""
    return Q.oracles()
