"""Breadth batch 2: array set operations, encodings, extra window
functions, grouping_id, and more TPC-H-shaped reporting queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xetl_spark.queries import load, query


@query(
    "q_fn_array_setops",
    oracle="""
    WITH t AS (
      SELECT n_regionkey,
             list_sort(list(n_name) FILTER (WHERE n_nationkey % 2 = 0)) AS evens,
             list_sort(list(n_name) FILTER (WHERE n_nationkey % 3 = 0)) AS threes
      FROM nation GROUP BY n_regionkey)
    SELECT n_regionkey,
           array_to_string(list_sort(list_distinct(list_concat(evens, threes))), ',') AS union_names,
           array_to_string(list_sort(list_intersect(evens, threes)), ',')             AS both_names,
           array_to_string(list_sort(list_filter(evens, x -> NOT list_contains(threes, x))), ',') AS only_even
    FROM t
    """,
)
def q_fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_union / array_intersect / array_except (canonicalized to
    sorted comma-joined strings for hashing)."""
    (nation,) = load(spark, sf_dir, "nation")
    g = nation.groupBy("n_regionkey").agg(
        F.sort_array(
            F.collect_list(F.when(F.col("n_nationkey") % 2 == 0, F.col("n_name")))
        ).alias("evens"),
        F.sort_array(
            F.collect_list(F.when(F.col("n_nationkey") % 3 == 0, F.col("n_name")))
        ).alias("threes"),
    )
    return g.select(
        "n_regionkey",
        F.concat_ws(",", F.array_sort(F.array_union("evens", "threes"))).alias(
            "union_names"
        ),
        F.concat_ws(",", F.array_sort(F.array_intersect("evens", "threes"))).alias(
            "both_names"
        ),
        F.concat_ws(",", F.array_sort(F.array_except("evens", "threes"))).alias(
            "only_even"
        ),
    )


@query(
    "q_fn_encoding",
    oracle="""
    SELECT c_custkey,
           upper(hex(encode(c_name)))         AS name_hex,
           to_base64(encode(c_name))          AS name_b64,
           decode(from_base64(to_base64(encode(c_name)))) AS roundtrip,
           bin(c_nationkey)                   AS nk_bin
    FROM customer
    """,
)
def q_fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hex / base64 / binary-string encodings with a b64 roundtrip."""
    (cust,) = load(spark, sf_dir, "customer")
    raw = F.encode(F.col("c_name"), "UTF-8")
    return cust.select(
        "c_custkey",
        F.upper(F.hex(raw)).alias("name_hex"),
        F.base64(raw).alias("name_b64"),
        F.decode(F.unbase64(F.base64(raw)), "UTF-8").alias("roundtrip"),
        F.bin(F.col("c_nationkey")).alias("nk_bin"),
    )


@query(
    "q_win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(nth_value(o_totalprice, 2) OVER w, 2)  AS second_price,
           round(first_value(o_totalprice) OVER w, 2)   AS first_price,
           count(*) OVER (PARTITION BY o_custkey)       AS n_in_group
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first_value over full-partition frames + windowed
    count without ORDER BY."""
    (orders,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("o_custkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.count("*").over(wc).alias("n_in_group"),
    )


@query(
    "q_agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag)::INT * 2 + GROUPING(l_linestatus)::INT AS gid,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id() distinguishing super-aggregate rows from real
    null-keyed groups."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("n")
    ).select("l_returnflag", "l_linestatus", F.col("gid").cast("int").alias("gid"), "n")


@query(
    "q_agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)  AS sum_price_dec,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST((1 - l_discount) AS DECIMAL(8,2))) AS VARCHAR) AS revenue_dec,
           CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)  AS min_price_dec
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic: cast to fixed-point, aggregate, render.

    Decimal sums are exact in both engines — no accumulation-order or
    rounding-midpoint ambiguity — which is why money pipelines at scale
    should prefer DecimalType despite the ~2× compute cost vs double.
    """
    (li,) = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = (1 - F.col("l_discount")).cast("decimal(8,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(p).cast("string").alias("sum_price_dec"),
        F.sum(p * d).cast("string").alias("revenue_dec"),
        F.min(p).cast("string").alias("min_price_dec"),
    )


@query(
    "q_tpch_q7_like",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           date_part('year', l_shipdate)::INT AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)) + 5e-5, 2) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name < sn.n_name
    GROUP BY cn.n_name, sn.n_name, date_part('year', l_shipdate)
    """,
)
def q_tpch_q7_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-shipping shape (TPC-H Q7): double nation dimension join
    with an inequality between the two dimension branches."""
    li, orders, cust, supplier, nation = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.c_nk)
        .join(F.broadcast(sn), supplier.s_nationkey == sn.s_nk)
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 5e-5, 2
            ).alias("volume")
        )
    )


@query(
    "q_tpch_q14_like",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def q_tpch_q14_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-revenue-share shape (TPC-H Q14): conditional aggregate
    ratio over a broadcast part join."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q_tpch_q12_like",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(l_quantity >= 25) AS BIGINT) AS high_line_count,
           CAST(count_if(l_quantity < 25) AS BIGINT)  AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q12_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority-count shape (TPC-H Q12): range-bounded join +
    split conditional counts."""
    li, orders = load(spark, sf_dir, "lineitem", "orders")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate").between(
                F.col("o_orderdate"), F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("l_quantity") >= 25).alias("high_line_count"),
            F.count_if(F.col("l_quantity") < 25).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q4_like",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority-checking shape (TPC-H Q4): date slice + correlated
    EXISTS (semi join) + count."""
    load(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_tpch_q6_like",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount) + 5e-5, 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change shape (TPC-H Q6): pure scan + filter +
    global agg — the predicate-pushdown showcase."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")) + 5e-5, 2
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_tpch_q19_like",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)) + 5e-5, 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 20 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
       OR (p_type LIKE 'PROMO%' AND l_quantity < 15)
    """,
)
def q_tpch_q19_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue shape (TPC-H Q19): disjunctive multi-attribute
    predicate spanning both join sides (tests predicate placement —
    single-side conjuncts still push below the join)."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 20) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 10))
        | (F.col("p_type").like("PROMO%") & (F.col("l_quantity") < 15))
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 5e-5, 2
        ).alias("revenue"),
        F.count("*").alias("n"),
    )


@query("q_sample_stratified", oracle=None)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy): per-stratum fractions; fraction
    bounds property-tested (seeded RNG → no SQL oracle)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.sampleBy(
        "l_returnflag", fractions={"A": 0.05, "N": 0.2, "R": 0.1}, seed=42
    ).select("l_orderkey", "l_linenumber", "l_returnflag")


@query(
    "q_histogram",
    oracle="""
    WITH b AS (
      SELECT least(greatest(CAST(floor((o_totalprice - 0) / 50000) AS INT), 0), 9) AS bucket
      FROM orders)
    SELECT bucket,
           CAST(bucket * 50000 AS DOUBLE)       AS lo,
           CAST((bucket + 1) * 50000 AS DOUBLE) AS hi,
           count(*) AS n
    FROM b GROUP BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via portable floor bucketing (clamped
    edges) — one aggregation, the building block for numeric profiling
    at scale."""
    (orders,) = load(spark, sf_dir, "orders")
    width, nbins = 50000, 10
    bucket = F.least(
        F.greatest(F.floor(F.col("o_totalprice") / width).cast("int"), F.lit(0)),
        F.lit(nbins - 1),
    )
    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * width).cast("double").alias("lo"),
            ((F.col("bucket") + 1) * width).cast("double").alias("hi"),
            "n",
        )
    )


@query(
    "q_na_handling",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             nullif(c_mktsegment, 'BUILDING')          AS seg,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal
      FROM customer)
    SELECT c_custkey,
           coalesce(seg, 'UNKNOWN')   AS seg_filled,
           coalesce(bal, -1.0)        AS bal_filled,
           CASE WHEN coalesce(seg, 'UNKNOWN') = 'MACHINERY' THEN 'MACHINES'
                ELSE coalesce(seg, 'UNKNOWN') END AS seg_replaced
    FROM t
    WHERE seg IS NOT NULL OR bal IS NOT NULL
    """,
)
def q_na_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: na.fill, na.replace, na.drop(how='all' on
    a column subset) — the DataFrameNaFunctions API."""
    (cust,) = load(spark, sf_dir, "customer")
    t = cust.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.round(F.col("c_acctbal"), 2))
        .alias("bal"),
    )
    dropped = t.na.drop(how="all", subset=["seg", "bal"])
    filled = dropped.na.fill({"seg": "UNKNOWN", "bal": -1.0})
    replaced = filled.na.replace({"MACHINERY": "MACHINES"}, subset=["seg"])
    return filled.select(
        "c_custkey",
        F.col("seg").alias("seg_filled"),
        F.col("bal").alias("bal_filled"),
    ).join(
        replaced.select("c_custkey", F.col("seg").alias("seg_replaced")), "c_custkey"
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey % 7 <> 0          -- deletes
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,                      -- updates
             round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey % 11 <> 0          -- inserts (of %7 rows)
    )
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           coalesce(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
           coalesce(n.price, o.price) AS price
    FROM old o FULL JOIN new n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus <> n.o_orderstatus OR o.price <> n.price
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction between two synthetic table versions
    (operators/cdc.py snapshot_diff): derive old/new views of orders
    with disjoint delete/insert/update populations, emit one tagged
    row per changed key from a single key-co-partitioned full-outer
    join. DuckDB recomputes the same diff declaratively."""
    from xetl_spark.operators.cdc import snapshot_diff

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    old = base.filter(F.col("o_orderkey") % 7 != 0)
    new = base.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 10 == 0, "X").otherwise(F.col("o_orderstatus")),
    )
    return snapshot_diff(old, new, keys=["o_orderkey"])


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT s_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators/relational.py salted_join):
    each left key is spread over 16 shuffle buckets via a
    deterministic row-hash salt and the small right side is replicated
    across the buckets, so one pathological hot key can no longer pin
    a single reducer. Results are exactly the plain equi-join (the
    oracle), which is the point: salting changes the physical
    distribution only. At 100 TB this is the manual fallback when
    AQE's skew split can't help (one key > a partition by itself)."""
    from xetl_spark.operators.relational import salted_join

    lineitem, supplier = load(spark, sf_dir, "lineitem", "supplier")
    left = lineitem.select("l_suppkey", "l_extendedprice", "l_discount")
    right = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(left, right, on=["l_suppkey"], salt_buckets=16)
    return joined.groupBy("s_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


@query(
    "q_histogram_equidepth",
    oracle="""
    WITH t AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM t GROUP BY bucket
    """,
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram via ntile: every bucket holds
    ~n/10 rows, bucket edges are the observed deciles. The global
    ORDER BY carries a full tiebreaker (o_orderkey) so bucket
    assignment is engine-independent. The 100 TB note: a global ntile
    is a single-reducer sort; at scale the same result comes from
    approx_percentile edges + a broadcast bucket join — this query
    pins the exact semantics the approximation targets."""
    (orders,) = load(spark, sf_dir, "orders")
    t = orders.select(
        "o_totalprice",
        F.ntile(10)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("bucket"),
    )
    return t.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "q_basket_frequent_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def q_basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in at
    least 2 orders — the frequent-itemset building block. Two shuffles
    total: one groupBy assembles each order's sorted distinct-part
    array (subsuming the old distinct + self-join exchanges — the r6
    SCALING.md worst grower), pair expansion is map-side higher-order
    array code with a max-basket quadratic guard (never triggered on
    TPC-H's ≤7-item baskets, so oracle-exact), and the pair count is
    the second shuffle with map-side partials."""
    from xetl_spark.operators.basket import frequent_pairs

    (lineitem,) = load(spark, sf_dir, "lineitem")
    return frequent_pairs(
        lineitem, "l_orderkey", "l_partkey", min_support=2
    ).select(
        F.col("item_a").alias("part_a"),
        F.col("item_b").alias("part_b"),
        F.col("n_baskets").alias("n_orders"),
    )


@query(
    "q_cdc_scd2",
    oracle="""
    WITH cur AS (
      SELECT user_id, event_type, ts AS valid_from FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-10') WHERE rn = 1
    ), chg AS (
      SELECT user_id, event_type AS new_type, ts AS chg_ts FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-10') WHERE rn = 1
    ), j AS (
      SELECT c.user_id, c.event_type, c.valid_from, g.new_type, g.chg_ts
      FROM cur c LEFT JOIN chg g USING (user_id)
    )
    SELECT user_id, event_type, epoch_us(valid_from) AS vf_us,
           CAST(NULL AS BIGINT) AS vt_us, TRUE AS is_current
    FROM j WHERE chg_ts IS NULL OR new_type = event_type
    UNION ALL
    SELECT user_id, event_type, epoch_us(valid_from),
           epoch_us(chg_ts), FALSE
    FROM j WHERE chg_ts IS NOT NULL AND new_type <> event_type
    UNION ALL
    SELECT user_id, new_type, epoch_us(chg_ts),
           CAST(NULL AS BIGINT), TRUE
    FROM j WHERE chg_ts IS NOT NULL AND new_type <> event_type
    """,
)
def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 fold (operators/cdc.py scd2):
    the open row per user (latest event type before Jan 10) is closed
    by that user's first differing post-Jan-10 event and a new current
    row opens at the change timestamp; unchanged keys pass through.
    One keyed shuffle; the oracle reconstructs the same close/open
    algebra relationally."""
    from pyspark.sql import Window

    from xetl_spark.operators import scd2

    (events,) = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-10 00:00:00").cast("timestamp")
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    cur = (
        events.filter(F.col("ts") < cutoff)
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.filter(F.col("ts") >= cutoff)
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_type")
    )
    hist = scd2(
        cur,
        chg,
        keys=["user_id"],
        ts_col="ts",
        compare_cols=["event_type"],
        start_col="valid_from",
        end_col="valid_to",
        current_col="is_current",
    )
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("vf_us"),
        F.unix_micros("valid_to").alias("vt_us"),
        "is_current",
    )


@query(
    "q_join_bloom_pruned",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def q_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join pruning with the relational Bloom filter
    (operators/sketch.py): sketch the selective side's keys (a few KB,
    broadcast), pre-filter the 100 TB side BEFORE its shuffle, then
    run the exact join — false positives survive the probe but die in
    the join, so the result is exactly the plain join (the oracle).
    This is the manual form of Catalyst's runtime bloom injection,
    usable when the filter must cross a stage boundary the optimizer
    can't see through (e.g. a pre-aggregated or checkpointed side).
    Working set: the fact side's DISTINCT keys (probed once each),
    which is the right trade when keys ≪ rows — the usual fact-table
    shape."""
    from xetl_spark.operators.sketch import bloom_build, bloom_probe

    lineitem, orders = load(spark, sf_dir, "lineitem", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    sk = bloom_build(urgent, "o_orderkey", num_hashes=7, num_bits=1 << 17)
    probed = bloom_probe(
        sk,
        lineitem.select("l_orderkey").distinct(),
        "l_orderkey",
        num_hashes=7,
        num_bits=1 << 17,
    ).filter(F.col("maybe_present"))
    pruned = lineitem.join(
        F.broadcast(probed.select("l_orderkey")), "l_orderkey", "left_semi"
    )
    return (
        pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_join_effective_dated",
    oracle="""
    WITH cur AS (
      SELECT user_id, event_type, ts AS valid_from FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-10') WHERE rn = 1
    ), chg AS (
      SELECT user_id, event_type AS new_type, ts AS chg_ts FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-10') WHERE rn = 1
    ), j AS (
      SELECT c.user_id, c.event_type, c.valid_from, g.new_type, g.chg_ts
      FROM cur c LEFT JOIN chg g USING (user_id)
    ), hist AS (
      SELECT user_id, event_type, valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM j WHERE chg_ts IS NULL OR new_type = event_type
      UNION ALL
      SELECT user_id, event_type, valid_from, chg_ts
      FROM j WHERE chg_ts IS NOT NULL AND new_type <> event_type
      UNION ALL
      SELECT user_id, new_type, chg_ts, CAST(NULL AS TIMESTAMP)
      FROM j WHERE chg_ts IS NOT NULL AND new_type <> event_type
    )
    SELECT f.event_id, f.user_id, epoch_us(f.ts) AS fact_ts_us,
           h.event_type AS dim_type_at_fact
    FROM events f LEFT JOIN hist h
      ON f.user_id = h.user_id
     AND f.ts >= h.valid_from
     AND (h.valid_to IS NULL OR f.ts < h.valid_to)
    WHERE f.ts >= TIMESTAMP '2024-01-12'
    """,
)
def q_join_effective_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dated dimension lookup — the standard warehouse
    pattern over an SCD2 history: each fact row joins the dimension
    version whose [valid_from, valid_to) interval contains the fact
    timestamp. The history comes from the same fold as q_cdc_scd2; the
    interval predicate rides the user_id equi-join (sort-merge + band
    filter, never a nested loop), exactly the range-join shape. Facts
    before any open row get NULL (left join) — no silent row loss."""
    from pyspark.sql import Window

    from xetl_spark.operators import scd2

    (events,) = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-10 00:00:00").cast("timestamp")
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    cur = (
        events.filter(F.col("ts") < cutoff)
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.filter(F.col("ts") >= cutoff)
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_type")
    )
    hist = scd2(
        cur,
        chg,
        keys=["user_id"],
        ts_col="ts",
        compare_cols=["event_type"],
        start_col="valid_from",
        end_col="valid_to",
        current_col="is_current",
    ).select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("dim_type_at_fact"),
        "valid_from",
        "valid_to",
    )
    facts = events.filter(
        F.col("ts") >= F.lit("2024-01-12 00:00:00").cast("timestamp")
    )
    return facts.join(
        hist,
        (F.col("user_id") == F.col("h_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    ).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("fact_ts_us"),
        "dim_type_at_fact",
    )


@query(
    "q_ivm_rollup_maintenance",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    WHERE event_id % 4 != 1
    GROUP BY event_type
    """,
)
def q_ivm_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance end-to-end (operators/ivm.py):
    snapshot a grouped rollup over 3/4 of events, then fold ONE change
    batch (the remaining quarter as inserts, another quarter as CDC
    retractions) through ivm_apply + minmax_apply and read the merged
    state — hash-verified against a full recompute of the surviving
    multiset. min/max runs with k=2 so the batch's extremes actually
    drain kept arrays and exercise the semi-join-pruned
    recompute-on-eviction repair, not just the happy path."""
    from xetl_spark.operators.ivm import (
        agg_snapshot,
        ivm_apply,
        ivm_read,
        minmax_apply,
        minmax_read,
        minmax_snapshot,
    )

    (events,) = load(spark, sf_dir, "events")
    m = F.col("event_id") % 4
    base = events.filter(m != 3)
    inserts = events.filter(m == 3).withColumn("w", F.lit(1))
    retracts = events.filter(m == 1).withColumn("w", F.lit(-1))
    batch = inserts.unionByName(retracts)
    live = events.filter(m != 1)  # post-batch truth, the repair source

    keys = ["event_type"]
    sums = agg_snapshot(base, keys, ["value"])
    sums = ivm_apply(sums, batch, keys, ["value"], weight_col="w")
    mm = minmax_snapshot(base, keys, ["value"], k=2)
    mm = minmax_apply(mm, batch, keys, ["value"], weight_col="w", k=2, base=live)
    return (
        ivm_read(sums, ["value"])
        .select("event_type", "n", F.round("sum_value", 2).alias("sum_value"))
        .join(
            minmax_read(mm, ["value"]).select("event_type", "min_value", "max_value"),
            "event_type",
        )
    )
