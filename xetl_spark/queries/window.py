"""Window-function inventory: ranking, analytic, frames, top-k per group."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xetl_spark.operators import topk_per_group
from xetl_spark.queries import load, query


@query(
    "q_win_ranking",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           row_number() OVER w AS rn,
           rank()       OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS rk,
           dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS drk
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount)
    """,
)
def q_win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank (single shuffle; both windows share
    the partition key so Catalyst reuses the exchange).

    row_number's ORDER BY includes every projected column as tiebreaker:
    the fixture has duplicate (orderkey, linenumber) rows, and a
    deterministic result needs a total order over the visible columns.
    """
    (li,) = load(spark, sf_dir, "lineitem")
    w_line = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    w_qty = Window.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w_line).alias("rn"),
        F.rank().over(w_qty).alias("rk"),
        F.dense_rank().over(w_qty).alias("drk"),
    )


@query(
    "q_win_ntile_pctrank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ntile(4)       OVER w AS tile,
           round(percent_rank() OVER w, 6) AS prk,
           round(cume_dist()    OVER w, 6) AS cd
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    """,
)
def q_win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist under a total order."""
    (li,) = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           epoch_us(o_orderdate) AS order_us,
           round(lag(o_totalprice)  OVER w, 2)            AS prev_price,
           round(lead(o_totalprice) OVER w, 2)            AS next_price,
           round(first_value(o_totalprice) OVER w, 2)     AS first_price,
           round(last_value(o_totalprice)  OVER w, 2)     AS last_price_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first / last analytic functions (default frame:
    unbounded preceding → current row, same in both engines)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros("o_orderdate").alias("order_us"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price_so_far"),
    )


@query(
    "q_win_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           round(sum(l_extendedprice) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum_price
    FROM lineitem
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running and moving aggregates over ROWS frames.

    ORDER BY covers the aggregated columns so duplicate rows can't make
    frame contents engine-dependent; sums of 2-decimal inputs round
    safely at 2 decimals (no representable midpoints near the boundary).
    """
    (li,) = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_qty"),
        F.round(
            F.sum("l_extendedprice").over(w.rowsBetween(-2, 0)), 2
        ).alias("moving_sum_price"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per-customer 30-day trailing spend, keyed on epoch
    seconds (numeric range is the engine-portable form of an interval
    frame; value-based so tie order can't affect results)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "q_win_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                     ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part)
    WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per brand (window + filter; no global sort)."""
    (part,) = load(spark, sf_dir, "part")
    top = topk_per_group(
        part, ["p_brand"], [F.col("p_retailprice").desc(), F.col("p_partkey")], 3
    )
    return top.select(
        "p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "rn"
    )


@query(
    "q_win_nth_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_nth_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value under a total order; the
    last_value frame is widened to the full partition (the default
    frame ends at CURRENT ROW, which makes last_value = current row —
    the classic trap)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w_full).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@query(
    "q_win_moving_median",
    oracle="""
    SELECT o_orderkey, o_custkey,
           median(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS med3
    FROM orders
    """,
)
def q_win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a 3-row trailing frame per customer — an
    order-statistic window aggregate (not a running sum), the robust
    smoother for noisy per-entity series. Spark bars `median` from
    framed windows (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    frame is collected (O(frame)=3 values, not O(partition)) and the
    order statistic computed with array expressions: odd count takes
    the middle, even interpolates (a+b)/2 — exactly DuckDB's
    median-on-DOUBLE, so raw values hash-match."""
    (orders,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    s = F.array_sort(F.collect_list("o_totalprice").over(w))
    n = F.size(s)
    mid = ((n + 1) / 2).cast("int")  # floor for positive n
    half = (n / 2).cast("int")
    med = F.when(n % 2 == 1, F.element_at(s, mid)).otherwise(
        (F.element_at(s, half) + F.element_at(s, half + 1)) / 2.0
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        med.alias("med3"),
    )


@query(
    "q_win_share_of_total",
    oracle="""
    WITH rev AS (
      SELECT n_regionkey AS region, n_name AS nation,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT region, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS share_in_region,
           round(revenue / sum(revenue) OVER (), 6) AS share_global
    FROM rev
    """,
)
def q_win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: each nation's revenue as a share of its
    region and of the global total — window sums over an already-
    aggregated relation (25 rows), so the 'global window' materializes
    nothing meaningful; the heavy lifting stays in the keyed
    pre-aggregation. Shares divide two 2dp-rounded sums and round at
    6dp — identical doubles both engines."""
    orders, customer, nation = load(spark, sf_dir, "orders", "customer", "nation")
    rev = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_regionkey").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_region), 6).alias(
            "share_in_region"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_global"
        ),
    )
