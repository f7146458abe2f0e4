"""Declared query inventory — the SURVEY.md §2-B contract.

Every operator the engine claims is registered here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are exactly SQL-expressible) a DuckDB oracle SQL string the
driver runs side-by-side for hash verification. Ops whose results are
approximate / nondeterministic (sampling seeds, LSH, streaming state)
carry no oracle and are property-tested in tests/ instead.

Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# memoized per-(app, sf_dir) table DataFrames: a DataFrame is an
# immutable logical plan, so reusing it across queries skips repeated
# parquet footer/schema reads and analysis (~0.3s/query locally)
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def query(name: str, oracle: str | None = None) -> Callable:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Read the requested parquet tables and register them as temp views.

    Parquet scans keep predicate pushdown / column pruning intact; every
    query starts from these lazily — no caching here, so each query's
    plan is exactly what Catalyst sees on a cold cluster.

    Timestamp normalization (matches DuckDB's reading of the same
    files): parquet NTZ timestamps are read as TimestampType under the
    UTC session (inferTimestampNTZ off). events.ts is dtype-probed:
    fixtures written as TIMESTAMP(MICROS) arrive as TimestampType and
    pass through untouched; legacy TIMESTAMP(NANOS) fixtures arrive as
    raw int64 (nanosAsLong) and are floor-truncated to microseconds —
    the same truncation DuckDB applies on read.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # queries are run sequentially by the driver; drop any persisted
    # intermediates a previous query left behind (dedup pipelines cache
    # shared subtrees) so a long battery can't accumulate executor memory
    spark.catalog.clearCache()
    # timestamp→string rendering is session-TZ dependent; pin UTC so
    # results match the (UTC-naive) DuckDB oracle on any host
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # spark.app.id is readable on both classic and Connect sessions
    # (sparkContext is absent under Connect)
    app = spark.conf.get("spark.app.id", "app")
    out = []
    for n in names or TABLES:
        key = (app, sf_dir, n)
        df = _TABLE_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            if n == "events" and dict(df.dtypes).get("ts") == "bigint":
                from pyspark.sql import functions as F

                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            _TABLE_CACHE[key] = df
        df.createOrReplaceTempView(n)
        out.append(df)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}


# Import side-effect registration.
from xetl_spark.queries import relational  # noqa: E402,F401
from xetl_spark.queries import relational2  # noqa: E402,F401
from xetl_spark.queries import window  # noqa: E402,F401
from xetl_spark.queries import scalar_fns  # noqa: E402,F401
from xetl_spark.queries import scalar_fns2  # noqa: E402,F401
from xetl_spark.queries import scans  # noqa: E402,F401
from xetl_spark.queries import llm_ops  # noqa: E402,F401
from xetl_spark.queries import streaming_ops  # noqa: E402,F401
from xetl_spark.queries import sql_surface  # noqa: E402,F401
from xetl_spark.queries import udf_surface  # noqa: E402,F401


def _interleave_registry() -> None:
    """Round-robin the registry across source modules.

    External correctness harnesses sample a prefix of the registry; a
    module-ordered dict means that prefix is all relational queries and
    a regression anywhere else goes unsampled. Interleaving one query
    per family per round puts every family (scans, windows, scalars,
    streaming, LLM ops, UDFs, SQL surface) inside any prefix of ~10+.
    """
    from itertools import zip_longest

    groups: dict[str, list[str]] = {}
    for name, q in REGISTRY.items():
        groups.setdefault(q.fn.__module__.rsplit(".", 1)[-1], []).append(name)
    order = [n for tier in zip_longest(*groups.values()) for n in tier if n]
    reordered = {n: REGISTRY[n] for n in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_interleave_registry()
