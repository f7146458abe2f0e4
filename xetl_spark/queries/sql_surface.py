"""SQL-surface inventory: subqueries (scalar / IN / correlated EXISTS),
CTEs, HAVING, arg-max aggregates, conditional aggregates, string_agg,
deterministic mode, unpivot, struct & map explosion, TPC-H-shaped
reporting queries, and TF-IDF.

These run through ``spark.sql`` over the registered table views —
exercising the SQL front-end explicitly (the DataFrame API rows of the
inventory live in the other modules; Catalyst plans both identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.queries import load, query


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], sql: str) -> DataFrame:
    load(spark, sf_dir, *tables)
    return spark.sql(sql)


@query(
    "q_sub_scalar",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 4) AS price_ratio
    FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (planned as a broadcast of one row)."""
    return _sql(
        spark,
        sf_dir,
        ("orders",),
        """
        SELECT o_orderkey,
               round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 4) AS price_ratio
        FROM orders WHERE o_orderstatus = 'P'
        """,
    )


@query(
    "q_sub_in",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def q_sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (rewritten to a left-semi join by Catalyst)."""
    return _sql(
        spark,
        sf_dir,
        ("orders", "customer"),
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        """,
    )


@query(
    "q_sub_exists_correlated",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey AND l_discount > 0.09)
    """,
)
def q_sub_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS (semi + anti join under the hood)."""
    return _sql(
        spark,
        sf_dir,
        ("orders", "lineitem"),
        """
        SELECT o_orderkey, o_orderstatus FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o.o_orderkey AND l_discount > 0.09)
        """,
    )


@query(
    "q_cte",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment, round(avg(c_acctbal), 2) AS seg_avg
      FROM customer GROUP BY c_mktsegment)
    SELECT c.c_custkey, c.c_mktsegment, s.seg_avg,
           CAST(c.c_acctbal > s.seg_avg AS INT) AS above_avg
    FROM customer c JOIN seg s ON c.c_mktsegment = s.c_mktsegment
    """,
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common table expression reused in a self-referential join."""
    return _sql(
        spark,
        sf_dir,
        ("customer",),
        """
        WITH seg AS (
          SELECT c_mktsegment, round(avg(c_acctbal), 2) AS seg_avg
          FROM customer GROUP BY c_mktsegment)
        SELECT c.c_custkey, c.c_mktsegment, s.seg_avg,
               CAST(c.c_acctbal > s.seg_avg AS INT) AS above_avg
        FROM customer c JOIN seg s ON c.c_mktsegment = s.c_mktsegment
        """,
    )


@query(
    "q_sub_scalar_correlated",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS bal
    FROM supplier s
    WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def q_sub_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2 shape: per-group max
    matched back to rows; Catalyst decorrelates to an aggregate+join)."""
    return _sql(
        spark,
        sf_dir,
        ("supplier",),
        """
        SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS bal
        FROM supplier s
        WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
        """,
    )


@query(
    "q_tpch_q18_like",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price, sum_qty
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             round(sum(l_quantity), 2) AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY c_custkey, o_orderkey, o_totalprice)
    WHERE sum_qty > 250
    """,
)
def q_tpch_q18_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer shape (TPC-H Q18): join + group + HAVING
    over the grouped quantity.

    The grouping key (c_custkey, o_orderkey, o_totalprice) is
    functionally dependent on o_orderkey, so the aggregate commutes
    below both joins: sum lineitem quantities per order FIRST (one
    orderkey shuffle over the fact), keep the few large-volume orders,
    and only then join orders (co-partitioned on the same key) and
    customer (AQE broadcasts the now-tiny build side). The oracle
    keeps the canonical join-then-group form — results identical."""
    li, orders, cust = load(spark, sf_dir, "lineitem", "orders", "customer")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        qty.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "sum_qty"
        )
    )


@query(
    "q_cte_recursive",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '2001-08-01')
    SELECT substring(CAST(m AS VARCHAR), 1, 7) AS month,
           (SELECT count(*) FROM orders
            WHERE date_trunc('month', o_orderdate) = m) AS n_orders
    FROM months
    """,
)
def q_cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark ≥4.0): a month spine over the order-date
    domain with per-month order counts — the warehouse date-dimension
    pattern, including zero-order months."""
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '2001-08-01')
        SELECT substring(CAST(m AS STRING), 1, 7) AS month,
               (SELECT count(*) FROM orders
                WHERE CAST(date_trunc('month', o_orderdate) AS DATE) = m) AS n_orders
        FROM months
        """
    )


@query(
    "q_having",
    oracle="""
    SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY l_partkey
    HAVING count(*) > 20 AND sum(l_quantity) > 500
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over aggregates."""
    return _sql(
        spark,
        sf_dir,
        ("lineitem",),
        """
        SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY l_partkey
        HAVING count(*) > 20 AND sum(l_quantity) > 500
        """,
    )


@query(
    "q_agg_argmax",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS biggest_order,
           arg_min(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS smallest_order
    FROM orders GROUP BY o_custkey
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max aggregates); the 1e-9*key term makes the
    ordering total so ties can't differ across engines (prices have
    2 decimals, so the perturbation can never flip a real comparison)."""
    (orders,) = load(spark, sf_dir, "orders")
    val = F.col("o_totalprice") + F.col("o_orderkey") * 1e-9
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", val).alias("biggest_order"),
        F.min_by("o_orderkey", val).alias("smallest_order"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT)       AS n_discounted,
           CAST(bool_and(l_quantity > 0) AS BOOLEAN)         AS all_positive,
           CAST(bool_or(l_tax > 0.07) AS BOOLEAN)            AS any_high_tax,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 2) AS f_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: count_if, bool_and, bool_or,
    filtered sum."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice")).otherwise(0.0)),
            2,
        ).alias("f_revenue"),
    )


@query(
    "q_agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg parity via sorted collect)."""
    (nation,) = load(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "q_agg_mode_deterministic",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty FROM (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY count(*) DESC, l_quantity) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity)
    WHERE rn = 1
    """,
)
def q_agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent value, smallest value wins ties
    (native mode() is tie-nondeterministic in both engines)."""
    return _sql(
        spark,
        sf_dir,
        ("lineitem",),
        """
        SELECT l_returnflag, l_quantity AS mode_qty FROM (
          SELECT l_returnflag, l_quantity,
                 row_number() OVER (PARTITION BY l_returnflag
                     ORDER BY count(*) DESC, l_quantity) AS rn
          FROM lineitem GROUP BY l_returnflag, l_quantity)
        WHERE rn = 1
        """,
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long via stack() (melt)."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', round(c_acctbal, 2), "
        "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)",
    )


@query(
    "q_struct_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus                 AS s_status,
           round(o_totalprice, 2)        AS s_price,
           round(o_totalprice, 2) * 2    AS s_doubled
    FROM orders
    """,
)
def q_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build + field access (nested data surface; output is the
    flattened fields so hashes stay engine-portable)."""
    (orders,) = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    return orders.select(
        "o_orderkey",
        s.getField("status").alias("s_status"),
        s.getField("price").alias("s_price"),
        (s.getField("price") * 2).alias("s_doubled"),
    )


@query(
    "q_explode_map",
    oracle="""
    SELECT event_id, 'k' AS key, CAST(json_extract(props, '$.k') AS INT) AS val
    FROM events
    """,
)
def q_explode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode() of a map column into key/value rows."""
    (events,) = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return events.select("event_id", F.explode(m).alias("key", "val"))


@query(
    "q_tpch_q3_like",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)) + 5e-5, 2) AS revenue,
           epoch_us(o_orderdate) AS orderdate_us,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate_us LIMIT 10
    """,
)
def q_tpch_q3_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape (TPC-H Q3): selective 3-way join, agg,
    top-10 by revenue."""
    li, orders, cust = load(spark, sf_dir, "lineitem", "orders", "customer")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 5e-5, 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("orderdate_us"))
        .limit(10)
    )


@query(
    "q_tpch_q10_like",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)) + 5e-5, 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_tpch_q10_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting shape (TPC-H Q10): fact join + dim
    broadcast + top-20."""
    li, orders, cust, nation = load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 5e-5, 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+')) AS term
      FROM documents),
    tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY doc, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    total AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
    SELECT tf.doc, tf.term, tf.tf, dfreq.df,
           round(tf.tf * (ln((total.n + 1) / (dfreq.df + 1)) + 1), 6) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN total
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (smoothed) per doc/term — explode + two keyed aggregations
    + broadcast of the tiny document-frequency side."""
    from xetl_spark.operators import text

    (docs,) = load(spark, sf_dir, "documents")
    out = text.tf_idf(docs, "text", "doc_id")
    return out.select("doc", "term", "tf", "df", F.round("tfidf", 6).alias("tfidf"))


@query(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
             round(o_totalprice * 2, 2) AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0),
    tgt AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
      FROM orders)
    SELECT * FROM updates
    UNION ALL
    SELECT t.* FROM tgt t
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert (anti-join + union emulation of MERGE INTO;
    with Delta/Iceberg present the same call maps to a native MERGE)."""
    from xetl_spark.operators import merge_upsert

    (orders,) = load(spark, sf_dir, "orders")
    target = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = target.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 2, 2).alias("o_totalprice"),
    )
    return merge_upsert(target, updates, ["o_orderkey"])


@query("q_sim_ivf_ann", oracle=None)
def q_sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (KMeans inverted-file) ANN top-5 — the data-adaptive scale
    path; recall vs brute force asserted in tests."""
    from xetl_spark.operators import ivf_ann_topk

    (emb,) = load(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 30), "embedding", "vec_id", k=5
    )


@query("q_sim_ivf_index", oracle=None)
def q_sim_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF ANN: build the partitionBy(cell) index, then
    answer top-5 via a partition-pruned scan of only the probed cells
    — the repeated-query scale path (index amortized across query
    batches). Result-parity with in-memory IVF and pruning are
    asserted in tests/test_approx.py."""
    import tempfile

    from xetl_spark.operators import ivf_build_index, ivf_query_index

    (emb,) = load(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="xetl_ivf_") + "/index"
    ivf_build_index(emb, "embedding", "vec_id", idx, n_clusters=16, seed=42)
    return ivf_query_index(
        spark, idx, emb.filter(F.col("vec_id") < 30), "embedding", "vec_id", k=5
    )


@query("q_agg_approx_distinct", oracle=None)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct (rsd bound asserted in tests —
    no exact oracle by construction)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query("q_sample_seeded", oracle=None)
def q_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling (df.sample): fraction property asserted
    in tests; engine-specific RNG so no SQL oracle."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.sample(fraction=0.1, seed=42).select("o_orderkey", "o_totalprice")


@query(
    "q_quality_report",
    oracle="""
    SELECT 'not_null_o_custkey' AS check,
           CAST(count_if(o_custkey IS NULL) AS BIGINT) AS n_violations,
           count_if(o_custkey IS NULL) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'in_range_o_totalprice',
           CAST(count_if(o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 400000) AS BIGINT),
           count_if(o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 400000) = 0
    FROM orders
    UNION ALL
    SELECT 'matches_o_orderpriority',
           CAST(count_if(NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS BIGINT),
           count_if(NOT regexp_matches(o_orderpriority, '^[1-5]-')) = 0
    FROM orders
    UNION ALL
    SELECT 'unique_o_orderkey',
           (SELECT CAST(sum(c - 1) AS BIGINT) FROM
              (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)),
           (SELECT sum(c - 1) FROM
              (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)) = 0
    """,
)
def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint report (deequ-style): all
    row-level rules in one aggregation pass + keyed uniqueness rule."""
    from xetl_spark.operators import quality as Q

    (orders,) = load(spark, sf_dir, "orders")
    checks = [
        *Q.not_null("o_custkey"),
        Q.in_range("o_totalprice", 0, 400000),
        Q.matches("o_orderpriority", "^[1-5]-"),
        Q.unique("o_orderkey"),
    ]
    return Q.quality_report(orders, checks)


@query(
    "q_lateral",
    oracle="""
    SELECT o_orderkey, l.net, l.tax_amt
    FROM orders,
         LATERAL (SELECT round(o_totalprice * 0.93, 4) AS net,
                         round(o_totalprice * 0.07, 4) AS tax_amt) l
    WHERE o_orderkey % 100 = 0
    """,
)
def q_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table (Spark 4 SQL): per-row computed
    relation joined back — the SQL-standard spelling of reusable
    row-scoped expressions."""
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, l.net, l.tax_amt
        FROM orders,
             LATERAL (SELECT round(o_totalprice * 0.93, 4) AS net,
                             round(o_totalprice * 0.07, 4) AS tax_amt) l
        WHERE o_orderkey % 100 = 0
        """
    )


@query(
    "q_agg_hll_sketch",
    oracle=None,
)
def q_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketches (Apache DataSketches,
    hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-group
    sketches merged to a grand total WITHOUT rescanning — the 100 TB
    distinct-counting pattern (daily sketches unioned into monthly,
    error bound fixed by lgK). Estimate-vs-exact bound asserted in
    tests/test_approx.py."""
    (orders,) = load(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_agg(o_custkey, 14)").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )
    return per_status.select(
        "o_orderstatus",
        F.expr("hll_sketch_estimate(sk)").alias("approx_custs"),
        "exact_custs",
    ).unionByName(
        per_status.agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_custs")
        ).select(
            F.lit("ALL").alias("o_orderstatus"),
            "approx_custs",
            F.lit(None).cast("long").alias("exact_custs"),
        )
    )


@query(
    "q_agg_approx_top_k",
    oracle="""
    SELECT item, cnt FROM (
      SELECT l_returnflag AS item, count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag
      ORDER BY cnt DESC LIMIT 2)
    """,
)
def q_agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy-hitters sketch: top-2 most frequent return
    flags. With maxItemsTracked >= cardinality the sketch is exact, so
    it hash-matches the exact GROUP BY/ORDER BY oracle; at 100 TB the
    same expression keeps bounded memory where the exact query's
    full aggregation state might not."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.agg(F.expr("approx_top_k(l_returnflag, 2, 100)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
    )


@query(
    "q_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY ALL ORDER BY ALL
    """,
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 ⇄ DuckDB dialect parity):
    grouping keys inferred from the non-aggregate select list."""
    return _sql(
        spark,
        sf_dir,
        ("orders",),
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY ALL ORDER BY ALL
        """,
    )


@query(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
    FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 350000.0
    """,
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named markers (spark.sql(..., args=...)):
    the injection-safe templating path — parameters are bound by the
    engine as typed literals, never string-spliced."""
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderstatus = :status AND o_totalprice > :floor
        """,
        args={"status": "F", "floor": 350000.0},
    )


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS band,
           bit_or(l_linenumber)  AS bor,
           bit_xor(l_linenumber) AS bxor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/bit_or/bit_xor) — flag-mask folding;
    partial-aggregatable, so map-side combine keeps the shuffle tiny."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("band"),
        F.bit_or("l_linenumber").alias("bor"),
        F.bit_xor("l_linenumber").alias("bxor"),
    )


@query(
    "q_agg_median",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 2)     AS med_qty,
           round(median(l_extendedprice) + 1e-6, 2) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median aggregate (interpolated at even counts in both
    engines; the +1e-6 half-grid epsilon keeps even-count midpoints
    like x.xx5 rounding the same way in both engines). Exact medians
    need the full group's values — at 100 TB
    prefer percentile_approx (mergeable sketch) unless exactness is a
    hard requirement."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 2).alias("med_qty"),
        F.round(F.median("l_extendedprice") + 1e-6, 2).alias("med_price"),
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)    AS all_over_1k,
           bool_or(o_orderstatus = 'P')     AS any_pending,
           count(*) FILTER (o_orderdate >= DATE '1995-01-01') AS recent
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and/bool_or, a.k.a. every/any) plus a
    FILTER-clause conditional count."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.count_if(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")).alias("recent"),
    )


@query(
    "q_agg_within_group",
    oracle="""
    SELECT l_returnflag,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 2) AS p25,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 2) AS p75,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ordered-set aggregates: percentile_cont
    (interpolated) and percentile_disc (an actual data value) WITHIN
    GROUP. Exact order statistics — see q_agg_median's scale note."""
    return _sql(
        spark,
        sf_dir,
        ("lineitem",),
        """
        SELECT l_returnflag,
               round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 2) AS p25,
               round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 2) AS p75,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_disc
        FROM lineitem GROUP BY l_returnflag
        """,
    )


@query(
    "q_profile_table",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           count(*) - count(o_orderkey) AS null_count,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_s,
           CAST(max(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (data-quality discovery): null count, exact
    distinct count, and min/max per column, emitted one row per column.

    One wide aggregation over the table (Catalyst expands the multiple
    exact count-distincts into a single multi-pass aggregate — still no
    driver involvement, no per-column rescans of the parquet), then an
    unpivot to rows. Doubles are canonicalized to DECIMAL(18,2) strings
    so both engines render identically."""
    (orders,) = load(spark, sf_dir, "orders")

    def prof(col: str, render):
        return [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.countDistinct(col).alias(f"{col}__distinct"),
            render(F.min(col)).alias(f"{col}__min"),
            render(F.max(col)).alias(f"{col}__max"),
        ]

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_dec = lambda c: c.cast("decimal(18,2)").cast("string")  # noqa: E731
    cols = {
        "o_orderkey": as_str,
        "o_custkey": as_str,
        "o_orderstatus": as_str,
        "o_totalprice": as_dec,
        "o_orderpriority": as_str,
    }
    wide = orders.agg(*[e for c, r in cols.items() for e in prof(c, r)])
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, null_count, n_distinct, min_s, max_s)"
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
             AS n_big_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via bitmap aggregation (Spark 3.5
    bitmap_construct_agg / bitmap_or_agg / bitmap_count): keys bucket
    into fixed 32KB bitmaps that OR together — mergeable like a
    sketch but EXACT, the roaring-bitmap pattern big warehouses use
    when count(DISTINCT) must be both correct and re-aggregatable.
    Unlike Catalyst's expand-based distinct rewrite (one extra shuffle
    per distinct column), the bitmap agg is a plain one-pass
    aggregation. Oracle: plain COUNT(DISTINCT) — the results must be
    identical, which is the point."""
    (orders,) = load(spark, sf_dir, "orders")
    bucket = F.expr("bitmap_bucket_number(o_custkey)")
    bit = F.expr("bitmap_bit_position(o_custkey)")
    per_bucket = (
        orders.select(
            "o_orderpriority",
            bucket.alias("bkt"),
            bit.alias("pos"),
            (F.col("o_totalprice") > 200000).alias("big"),
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(
            F.expr("bitmap_construct_agg(pos)").alias("bm"),
            F.expr(
                "bitmap_construct_agg(CASE WHEN big THEN pos END)"
            ).alias("bm_big"),
        )
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_cust"),
        F.expr("sum(bitmap_count(bm_big))").alias("n_big_cust"),
    )


@query(
    "q_udf_sql_function",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice * 0.93, 2) AS net,
           CASE WHEN o_totalprice > 250000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS tier
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def q_udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDFs (Spark 4 CREATE FUNCTION ... RETURN):
    reusable expressions registered in pure SQL — inlined by Catalyst
    into the calling plan, so unlike Python UDFs they cost nothing at
    100 TB (no serialization boundary, full codegen + pushdown)."""
    load(spark, sf_dir, "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE) "
        "RETURNS DOUBLE RETURN round(p * 0.93, 2)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p > 250000 THEN 'high' "
        "WHEN p > 100000 THEN 'mid' ELSE 'low' END"
    )
    return spark.sql(
        """
        SELECT o_orderkey, net_price(o_totalprice) AS net,
               price_tier(o_totalprice) AS tier
        FROM orders WHERE o_orderkey % 50 = 0
        """
    )


@query(
    "q_fn_collation",
    oracle="""
    SELECT c_custkey, c_name,
           lower(c_name) = 'customer#000000020' AS eq_ci,
           CASE WHEN lower(c_name) LIKE '%customer%' THEN 1 ELSE 0 END
             AS has_word_ci,
           lower(c_name) AS sort_key
    FROM customer WHERE c_custkey % 20 = 0
    """,
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4 COLLATE UTF8_LCASE):
    case-insensitive equality and LIKE at the type level instead of
    lower()-wrapping every predicate — collation-aware comparisons
    stay codegen'd and sargable. The oracle expresses the same
    semantics with explicit case folding."""
    (cust,) = load(spark, sf_dir, "customer")
    ci = F.expr("collate(c_name, 'UTF8_LCASE')")
    return cust.filter(F.col("c_custkey") % 20 == 0).select(
        "c_custkey",
        "c_name",
        (ci == F.lit("CUSTOMER#000000020")).alias("eq_ci"),
        F.when(ci.like("%CUSTOMER%"), 1).otherwise(0).alias("has_word_ci"),
        F.lower("c_name").alias("sort_key"),
    )


@query(
    "q_sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the linear FROM-first
    query style — each stage feeds the next like a DataFrame chain,
    parsed to exactly the same Catalyst plan as the classic form (the
    oracle is that classic form)."""
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS total
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "q_agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS names_asc,
           string_agg(n_name, '|' ORDER BY n_nationkey DESC) AS names_by_key_desc
    FROM nation GROUP BY n_regionkey
    """,
)
def q_agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-controlled string aggregation (Spark 4 LISTAGG ... WITHIN
    GROUP): deterministic concatenation order is declared in the
    aggregate itself instead of relying on input order — the only
    shuffle-safe way to build ordered strings at scale."""
    load(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)
                 AS names_asc,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_nationkey DESC)
                 AS names_by_key_desc
        FROM nation GROUP BY n_regionkey
        """
    )


@query(
    "q_sql_identifier_template",
    oracle="""
    SELECT c_mktsegment AS seg, count(*) AS n,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_sql_identifier_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() templating (Spark 3.4+): table and column names
    bound as parameters through the injection-safe identifier clause —
    the dynamic-SQL path that stays analyzable (wrong names fail at
    analysis, not as string-spliced surprises)."""
    load(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT IDENTIFIER(:col) AS seg, count(*) AS n,
               round(sum(IDENTIFIER(:balcol)), 2) AS total_bal
        FROM IDENTIFIER(:tab) GROUP BY IDENTIFIER(:col)
        """,
        args={"tab": "customer", "col": "c_mktsegment", "balcol": "c_acctbal"},
    )
