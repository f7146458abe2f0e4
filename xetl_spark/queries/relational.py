"""Relational core: scans, projections, filters, joins, aggregation,
sort/limit, set ops — each registered with a DuckDB oracle.

Float discipline: every floating aggregate is rounded identically on
both sides (sums to 2 dp, ratios/avgs to 4 dp) so accumulation-order
differences between engines can't flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.operators import (
    asof_join,
    dedup_keep_first,
    deterministic_sample,
    range_join,
)
from xetl_spark.queries import load, query

DAY = "yyyy-MM-dd"


# ---------------------------------------------------------------- pricing / agg


@query(
    "q_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)) + 5e-5, 2)         AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 5e-7, 2) AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: multi-agg hash aggregation.

    Catalyst plans partial (map-side) + final aggregation automatically;
    the shuffle carries only |groups| rows per partition.
    """
    (li,) = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc) + 5e-5, 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))) + 5e-7, 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_join_revenue_by_nation",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)) + 5e-5, 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way star join + aggregation (TPC-H Q5 shape).

    The dimension chain (customer⋈nation⋈region) is broadcast — at
    100 TB only the fact⋈orders join shuffles, on the join key.
    """
    li, orders, cust, nation, region = load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                # +5e-5: revenue terms lie on an exact 1e-4 decimal grid;
                # half-grid epsilon pushes exact .xx5 midpoints off the
                # rounding boundary identically in Spark and the oracle
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 5e-5,
                2,
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(*)                    AS n_rows,
           count(DISTINCT l_orderkey)  AS n_orders,
           count(DISTINCT l_partkey)   AS n_parts,
           count(DISTINCT l_suppkey)   AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (expand-based distinct rewrite)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "q_agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4)  AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 4)  AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(min(l_quantity), 4) AS min_qty,
           round(max(l_quantity), 4) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (interpolated), matching quantile_cont."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25_price"),
        F.round(F.min("l_quantity"), 4).alias("min_qty"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_linestatus,
           round(stddev_samp(l_quantity), 4)                    AS sd_qty,
           round(var_samp(l_extendedprice), 2)                  AS var_price,
           round(corr(l_extendedprice, l_quantity), 4)          AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 2)    AS covar_pq
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_pq"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (null-filled super-aggregate rows)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           array_to_string(list_sort(list(DISTINCT CAST(l_linenumber AS VARCHAR))), ',') AS linenos
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set canonicalized (sorted, stringified) for determinism."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias("statuses"),
        F.concat_ws(
            ",", F.sort_array(F.collect_set(F.col("l_linenumber").cast("string")))
        ).alias("linenos"),
    )


@query(
    "q_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on explicit values (no value-discovery job at scale)."""
    (li,) = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv


@query(
    "q_agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS total_price,
           round(avg(l_discount), 6) AS avg_disc,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless global aggregation (single reduced row)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


# ---------------------------------------------------------------------- joins


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, row-level projection."""
    orders, cust = load(spark, sf_dir, "orders", "customer")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)                          AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2)   AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero matching orders."""
    orders, cust = load(spark, sf_dir, "orders", "customer")
    o = orders.filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "q_join_right_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name
    FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
    RIGHT JOIN orders ON c.c_custkey = o_custkey
    WHERE o_orderstatus = 'P'
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join; unmatched right rows carry null customer."""
    orders, cust = load(spark, sf_dir, "orders", "customer")
    c = cust.filter(F.col("c_acctbal") > 0)
    return (
        c.join(orders, c.c_custkey == orders.o_custkey, "right")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@query(
    "q_join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
         urgent AS (SELECT o_custkey, count(*) AS n_urgent
                    FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
    SELECT coalesce(c_custkey, o_custkey) AS custkey,
           round(coalesce(c_acctbal, -1), 2) AS acctbal,
           coalesce(n_urgent, 0) AS n_urgent
    FROM big_cust FULL JOIN urgent ON c_custkey = o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    orders, cust = load(spark, sf_dir, "orders", "customer")
    big = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )
    return big.join(urgent, big.c_custkey == urgent.o_custkey, "full").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.round(F.coalesce(F.col("c_acctbal"), F.lit(-1.0)), 2).alias("acctbal"),
        F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS)."""
    orders, cust = load(spark, sf_dir, "orders", "customer")
    big = orders.filter(F.col("o_totalprice") > 200000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS)."""
    orders, cust = load(spark, sf_dir, "orders", "customer")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (small dims only; guarded at scale)."""
    region, nation = load(spark, sf_dir, "region", "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT s_suppkey, s_name, n_nationkey, n_name
    FROM supplier JOIN nation ON s_nationkey < n_nationkey AND n_nationkey <= 3
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi theta join (broadcast nested loop on a bounded side)."""
    supplier, nation = load(spark, sf_dir, "supplier", "nation")
    n = nation.filter(F.col("n_nationkey") <= 3)
    return supplier.join(
        F.broadcast(n), supplier.s_nationkey < n.n_nationkey
    ).select("s_suppkey", "s_name", "n_nationkey", "n_name")


@query(
    "q_join_nullsafe",
    oracle="""
    WITH t AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
               FROM customer WHERE c_custkey < 20000)
    SELECT coalesce(a.seg, '<null>') AS seg, count(*) AS n_pairs
    FROM t a JOIN t b ON a.seg IS NOT DISTINCT FROM b.seg
    GROUP BY coalesce(a.seg, '<null>')
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM). The
    5-segment self-join emits |segment|^2 pairs by construction, so
    the demonstration is key-capped at 20k customers (covers sf<=0.1
    in full; r13 — the registry-wide sf1 sweep caught the uncapped
    form producing 4.5B join rows at the 150k-customer fixture, a
    quadratic a contract demo has no business paying)."""
    (cust,) = load(spark, sf_dir, "customer")
    t = cust.filter(F.col("c_custkey") < 20000).select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, F.col("a.seg").eqNullSafe(F.col("b.seg")))
        .groupBy(F.coalesce(F.col("a.seg"), F.lit("<null>")).alias("seg"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "q_join_range",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: equi key + time band (SMJ + band filter)."""
    li, orders = load(spark, sf_dir, "lineitem", "orders")
    joined = range_join(
        li,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on=["l_orderkey"],
        condition=F.col("l_shipdate").between(
            F.col("o_orderdate"),
            F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        ),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS click_us,
           round(coalesce(c.value, -1), 2) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click.

    Spark side uses the union+window composition (one shuffle on
    user_id); oracle uses DuckDB's native ASOF JOIN.
    """
    (events,) = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="c_ts",
        right_payload=["c_ts", "c_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.unix_micros("c_ts_asof").alias("click_us"),
        F.round(F.coalesce(F.col("c_value_asof"), F.lit(-1.0)), 2).alias(
            "click_value"
        ),
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join (hint asserted in tests)."""
    supplier, nation = load(spark, sf_dir, "supplier", "nation")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        )
    )


# ------------------------------------------------------- projection / filter


@query(
    "q_project_rename_drop",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_totalprice AS price,
           upper(o_orderstatus) AS status
    FROM orders
    """,
)
def q_project_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed column + drop."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.withColumnRenamed("o_orderkey", "order_id")
        .withColumn("status", F.upper(F.col("o_orderstatus")))
        .withColumn("price", F.col("o_totalprice"))
        .select("order_id", "price", "status")
    )


@query(
    "q_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.05 OR l_tax < 0.02)
      AND l_shipdate IS NOT NULL
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter algebra: BETWEEN, IN, OR/AND, IS NULL — all pushed down."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.02))
        & F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "q_filter_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE regexp_matches(p_name, '.*(steel|copper).*')
       OR p_type LIKE 'PROMO%'
    """,
)
def q_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (rlike) and LIKE predicates."""
    (part,) = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").rlike("(steel|copper)") | F.col("p_type").like("PROMO%")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "q_conditional_expr",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def q_conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif conditional expressions."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 250000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "is_urgent"
        ),
    )


@query(
    "q_cast_matrix",
    oracle="""
    SELECT l_orderkey,
           trunc(l_quantity)::BIGINT         AS qty_int,
           CAST(l_quantity AS VARCHAR)       AS qty_str,
           CAST(l_linenumber AS DOUBLE)      AS lineno_dbl,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
           CAST(l_quantity > 25 AS INT)      AS qty_gt25
    FROM lineitem
    """,
)
def q_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across primitive types (explicit trunc for double→int to
    pin shared semantics; Spark truncates, DuckDB rounds)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_linenumber").cast("double").alias("lineno_dbl"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
        (F.col("l_quantity") > 25).cast("int").alias("qty_gt25"),
    )


@query(
    "q_sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash sampling: reproducible 10% sample (engine-portable,
    unlike seeded RNG sampling which is partitioning-dependent)."""
    (orders,) = load(spark, sf_dir, "orders")
    return deterministic_sample(orders, ["o_orderkey"], 10).select(
        "o_orderkey", "o_totalprice"
    )


# -------------------------------------------------- sort / limit / set ops


@query(
    "q_sort_multi_key",
    oracle="""
    SELECT c_custkey, c_mktsegment, nullif(round(c_acctbal, 2), 0) AS bal
    FROM customer
    ORDER BY c_mktsegment ASC, bal DESC NULLS LAST, c_custkey
    """,
)
def q_sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (content-verified;
    ordering itself is asserted in unit tests since the oracle hash is
    order-insensitive)."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.nullif(F.round(F.col("c_acctbal"), 2), F.lit(0.0)).alias("bal"),
    ).orderBy(
        F.col("c_mktsegment").asc(),
        F.col("bal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort at scale)."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .limit(10)
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    ORDER BY o_orderkey LIMIT 100 OFFSET 50
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic limit+offset under a total order."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .select("o_orderkey", "o_orderstatus")
        .offset(50)
        .limit(100)
    )


@query(
    "q_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'big' AS src FROM orders WHERE o_totalprice > 250000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, overlapping slices kept)."""
    (orders,) = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("src")
    )
    b = orders.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_totalprice", F.lit("big").alias("src")
    )
    return a.unionAll(b)


@query(
    "q_union_by_name",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, s_acctbal AS bal FROM supplier
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered projections."""
    cust, supplier = load(spark, sf_dir, "customer", "supplier")
    a = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    b = supplier.select(
        F.col("s_acctbal").alias("bal"),
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
    )
    return a.unionByName(b)


@query(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics)."""
    (orders,) = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "q_set_except_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference with multiplicity)."""
    (li,) = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    return a.exceptAll(b)


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderstatus, o_orderkey, round(o_totalprice, 2) AS price
    FROM (SELECT *, row_number() OVER (
              PARTITION BY o_custkey, o_orderstatus
              ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dropDuplicates(subset): keep the earliest order per
    (customer, status) under an explicit total order."""
    (orders,) = load(spark, sf_dir, "orders")
    return dedup_keep_first(
        orders, ["o_custkey", "o_orderstatus"], [F.col("o_orderdate"), F.col("o_orderkey")]
    ).select(
        "o_custkey", "o_orderstatus", "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )


@query(
    "q_agg_regression",
    oracle="""
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity)                AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)      AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2)  AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 4)         AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 4)       AS avg_x
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2/avgx) —
    one-pass distributed OLS per group, all map-side partials."""
    (li,) = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("icept"),
        F.round(F.regr_r2(y, x), 4).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
    )
