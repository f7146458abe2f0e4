"""The rest of the TPC-H-shaped suite (Q2/Q5/Q8/Q9/Q11/Q13/Q15/Q16/
Q17/Q20/Q21/Q22 shapes), adapted to the driver fixtures' star schema.

The fixtures carry no ``partsupp`` table and no comment/phone/commit-
date columns, so each query keeps its canonical *plan shape* —
correlated extrema, scalar subqueries, EXISTS / NOT EXISTS pairs,
outer-join distributions, market-share ratios — while sourcing the
supplier↔part relationship through ``lineitem``. Together with the
Q1/Q3/Q4/Q6/Q7/Q10/Q12/Q14/Q18/Q19 shapes registered elsewhere this
completes all 22 classic decision-support plan shapes.

Cross-engine hash discipline (see tools/oracle_harness.py):

- Money aggregates are fixed-point: ``DECIMAL(18,2) × DECIMAL(8,2)``
  sums are exact in both Spark and DuckDB, so equality-to-extremum
  (Q2/Q15) and threshold predicates (Q11/Q22) are deterministic —
  no float accumulation-order hazards. Decimal outputs are rendered
  as strings, the same convention as q_agg_decimal_exact.
- Correlated-average thresholds (Q17) are cleared of division
  entirely: ``l_quantity < 0.2 * avg(q)`` is evaluated as the exact
  integer comparison ``5 * l_quantity * cnt < sum(q)`` (quantities
  are integral, so both sides are exactly representable doubles).
- Ratio outputs (Q8) divide two exact decimal sums after a cast to
  double — the decimal→double rounding is IEEE-identical in both
  engines, so the quotient and its rounding are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.queries import load, query

_DEC_P = 'CAST(l_extendedprice AS DECIMAL(18,2))'
_DEC_REV = f"{_DEC_P} * CAST((1 - l_discount) AS DECIMAL(8,2))"


def _rev_dec() -> F.Column:
    """Exact fixed-point lineitem revenue (matches _DEC_REV)."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(8,2)")


@query(
    "q_tpch_q2_like",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             sum({_DEC_REV}) AS srev
      FROM lineitem GROUP BY 1, 2
    )
    SELECT p_partkey, p_name, s_name,
           CAST(srev AS VARCHAR) AS supply_rev
    FROM ps
    JOIN part ON partkey = p_partkey
    JOIN supplier ON suppkey = s_suppkey
    WHERE p_size > 45
      AND srev = (SELECT min(srev) FROM ps i WHERE i.partkey = ps.partkey)
    """,
)
def q_tpch_q2_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost-supplier shape (TPC-H Q2): correlated minimum over
    the part↔supplier relationship, which the fixtures express through
    lineitem instead of partsupp. The correlated ``= (SELECT min …)``
    becomes a partition-window minimum — one shuffle on partkey, no
    self-join — and the revenue extremum is decimal-exact so the
    equality filter is deterministic cross-engine.

    Scale: the p_size predicate is per-part, so it commutes with the
    per-(part, supplier) aggregation AND the per-part minimum — the
    broadcast semi-join pushes it below the big aggregation, shrinking
    the fact input ~10× before any shuffle (the oracle filters after
    its CTE; results are identical because dropping whole partitions
    of the correlation key can't change surviving groups' minima).
    The window then runs partitioned on partkey, the same key the
    aggregation shuffled on; dimension joins broadcast.
    """
    from pyspark.sql import Window

    li, part, supplier = load(spark, sf_dir, "lineitem", "part", "supplier")
    big = part.filter(F.col("p_size") > 45)
    ps = (
        li.join(
            F.broadcast(big.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_rev_dec()).alias("srev"))
    )
    w = Window.partitionBy("partkey")
    return (
        ps.withColumn("min_rev", F.min("srev").over(w))
        .filter(F.col("srev") == F.col("min_rev"))
        .join(F.broadcast(big), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("srev").cast("string").alias("supply_rev"),
        )
    )


@query(
    "q_tpch_q5_like",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)) + 5e-5, 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume shape (TPC-H Q5): five-way join where the
    interesting predicate is *between fact branches* (customer nation =
    supplier nation), then revenue per nation for one region and year.

    Scale: orders is date-filtered before its join (pushed to the
    scan); nation/region broadcast; the c=s nation equality is a
    residual filter on the already-joined row, not a join explosion.
    """
    li, orders, cust, supplier, nation, region = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 5e-5, 2
            ).alias("revenue")
        )
    )


@query(
    "q_tpch_q8_like",
    oracle=f"""
    WITH mkt AS (
      SELECT date_part('year', o_orderdate)::INT AS o_year,
             sum(CASE WHEN sn.n_name = 'NATION_7' THEN {_DEC_REV} END) AS nat_rev,
             sum({_DEC_REV}) AS tot_rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region    ON cn.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
      GROUP BY 1
    )
    SELECT o_year,
           round(CAST(coalesce(nat_rev, 0) AS DOUBLE)
                 / CAST(tot_rev AS DOUBLE), 6) AS mkt_share
    FROM mkt
    """,
)
def q_tpch_q8_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National-market-share shape (TPC-H Q8): one supplier nation's
    fraction of a region's market for one part type, per order year.
    Both the numerator (conditional) and denominator are exact decimal
    sums; the quotient divides their IEEE-identical double images.

    Scale: single fact aggregation keyed on year after broadcast
    dimension joins — the CASE keeps it to one pass, no self-join of
    national vs total volumes.
    """
    li, orders, cust, part, supplier, nation, region = load(
        spark, sf_dir, "lineitem", "orders", "customer", "part", "supplier",
        "nation", "region",
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    rev = _rev_dec()
    mkt = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", rev)).alias("nat_rev"),
            F.sum(rev).alias("tot_rev"),
        )
    )
    return mkt.select(
        "o_year",
        F.round(
            F.coalesce(F.col("nat_rev"), F.lit(0)).cast("double")
            / F.col("tot_rev").cast("double"),
            6,
        ).alias("mkt_share"),
    )


@query(
    "q_tpch_q9_like",
    oracle="""
    SELECT n_name AS nation, date_part('year', o_orderdate)::INT AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST((1 - l_discount) AS DECIMAL(8,2))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(8,2))
                      * CAST(0.50 AS DECIMAL(4,2))) AS VARCHAR) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type-profit shape (TPC-H Q9): profit per supplier nation
    per order year for a part-name pattern. The fixtures lack
    ps_supplycost, so unit cost is proxied as half the part's retail
    price — same plan shape (fact × 4 dims, pattern-filtered part),
    decimal-exact so profit strings hash-match.

    Scale: part filter broadcasts; one fact aggregation on
    (nation, year) — 25 × ~7 groups, trivially balanced.
    """
    li, part, supplier, orders, nation = load(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    profit = _rev_dec() - (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(8,2)")
        * F.lit(0.50).cast("decimal(4,2)")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%bolt%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("string").alias("profit"))
    )


@query(
    "q_tpch_q11_like",
    oracle=f"""
    WITH nv AS (
      SELECT s_nationkey AS nationkey, l_partkey AS partkey,
             sum({_DEC_P} * CAST((1 - l_discount) AS DECIMAL(8,2))) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 3
      GROUP BY 1, 2
    )
    SELECT partkey, CAST(value AS VARCHAR) AS part_value
    FROM nv
    WHERE value > (SELECT sum(value) * 0.001 FROM nv)
    """,
)
def q_tpch_q11_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock shape (TPC-H Q11): per-part traded value within
    one nation, kept only where it exceeds a fraction of the nation's
    total — a scalar subquery over the same aggregate. The threshold
    compare stays in decimal (value > total × 0.001 with the constant
    as an exact DECIMAL) so the row set is deterministic.

    Scale: the per-part aggregate is computed once and reused for the
    scalar total via a broadcast of a single row — Spark expresses the
    scalar subquery as a cross-join with a 1-row aggregate, which AQE
    plans as a broadcast; no recomputation, no driver collect.
    """
    li, supplier = load(spark, sf_dir, "lineitem", "supplier")
    nv = (
        li.join(
            F.broadcast(supplier.filter(F.col("s_nationkey") == 3)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev_dec()).alias("value"))
    )
    total = nv.agg(
        (F.sum("value") * F.lit(0.001).cast("decimal(6,3)")).alias("threshold")
    )
    return (
        nv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("partkey", F.col("value").cast("string").alias("part_value"))
    )


@query(
    "q_tpch_q13_like",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-distribution shape (TPC-H Q13): left outer join with a
    join-time (not post-join) filter on the right side, then a
    distribution of counts-of-counts. Customers whose only orders are
    '5-LOW' must still appear with c_count = 0 — the filter belongs in
    the ON clause, which is the semantic this query pins.

    Scale: two shuffles (custkey, then c_count) over key spaces that
    are uniform by construction; no broadcast needed since customer is
    a fact-sized side at 100 TB, and the orders filter prunes at scan.
    """
    cust, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch_q15_like",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, sum({_DEC_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS VARCHAR) AS total_rev
    FROM rev JOIN supplier ON suppkey = s_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q_tpch_q15_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-supplier shape (TPC-H Q15): quarterly revenue per supplier,
    return the supplier(s) achieving the global maximum. The reference
    query uses a view + scalar max; here the view is a named aggregate
    reused for both branches, and revenue is decimal-exact so ``= max``
    returns every tied supplier identically in both engines.

    Scale: the scalar max is a 1-row broadcast joined back; supplier
    dimension broadcasts. No window over a global ordering (which
    would single-task at 100 TB).
    """
    li, supplier = load(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_rev_dec()).alias("total_rev"))
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(F.broadcast(supplier), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("string").alias("total_rev")
        )
    )


@query(
    "q_tpch_q16_like",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier-relationship shape (TPC-H Q16): distinct supplier
    count per (brand, type, size) bucket, excluding one brand and a
    NOT IN sub-list of suppliers (negative balance proxies the
    reference's complaint filter). NOT IN over a non-nullable key
    compiles to an anti-join.

    Scale: the excluded-supplier list is tiny → broadcast anti-join;
    part filter broadcasts; countDistinct runs Catalyst's two-phase
    expand, so a hot bucket never funnels raw rows to one reducer.
    """
    li, part, supplier = load(spark, sf_dir, "lineitem", "part", "supplier")
    sizes = [1, 9, 14, 19, 23, 36, 45, 49]
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(sizes)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17_like",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS partkey, sum(l_quantity) AS sq, count(*) AS cq
      FROM lineitem GROUP BY 1
    )
    SELECT round(sum(l_extendedprice) / 7.0 + 5e-5, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pq   ON l_partkey = partkey
    WHERE p_brand = 'Brand#5'
      AND 5 * l_quantity * cq < sq
    """,
)
def q_tpch_q17_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order shape (TPC-H Q17): revenue from lineitems
    whose quantity is below 20% of their part's average quantity. The
    correlated AVG is algebraically cleared of division —
    ``5·q·count < sum`` — so the threshold is exact integer arithmetic
    in both engines (quantities are integral; products stay far under
    2^53).

    Scale: the brand predicate is per-part, so the per-part (sum,
    count) only matters for brand parts — a broadcast semi-join prunes
    the fact ~25× before the aggregation shuffle (the oracle computes
    pq over all parts; unused groups can't change the join result).
    The pruned aggregate joins back co-partitioned on partkey. No
    correlated-subquery re-scan per row.
    """
    li, part = load(spark, sf_dir, "lineitem", "part")
    brand = part.filter(F.col("p_brand") == "Brand#5")
    li_b = li.join(
        F.broadcast(brand.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    pq = li_b.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("l_quantity").alias("sq"), F.count("*").alias("cq")
    )
    return (
        li_b.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, F.col("l_partkey") == F.col("partkey"))
        .filter(5 * F.col("l_quantity") * F.col("cq") < F.col("sq"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0 + 5e-5, 2).alias("avg_yearly")
        )
    )


@query(
    "q_tpch_q20_like",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'SMALL'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 400
    )
    """,
)
def q_tpch_q20_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential-promotion shape (TPC-H Q20): suppliers who moved a
    large volume of one part type in one year — an IN over a grouped
    HAVING subquery, compiled as a semi-join. The reference's partsupp
    availability threshold becomes a shipped-quantity threshold, the
    same nested-aggregate-then-filter plan shape. The sum-of-integral-
    quantities comparison is exact.

    Scale: the subquery aggregates lineitem on suppkey (map-side
    partials first); the semi-join against the 100-row supplier dim is
    a broadcast of the *aggregated* side once AQE sees its size.
    """
    li, part, supplier = load(spark, sf_dir, "lineitem", "part", "supplier")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_type") == "SMALL")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 400)
        .select("l_suppkey")
    )
    return supplier.join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q_tpch_q21_like",
    oracle="""
    WITH ret AS (
      SELECT DISTINCT l_orderkey AS orderkey, l_suppkey AS suppkey,
             l_returnflag = 'R' AS returned
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, count(*) AS numwait
    FROM ret r1
    JOIN supplier ON r1.suppkey = s_suppkey
    WHERE r1.returned
      AND EXISTS (SELECT 1 FROM ret r2
                  WHERE r2.orderkey = r1.orderkey
                    AND r2.suppkey <> r1.suppkey)
      AND NOT EXISTS (SELECT 1 FROM ret r3
                      WHERE r3.orderkey = r1.orderkey
                        AND r3.suppkey <> r1.suppkey
                        AND r3.returned)
    GROUP BY s_name
    """,
)
def q_tpch_q21_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting shape (TPC-H Q21): the classic
    EXISTS / NOT EXISTS pair over the same derived relation. With no
    receipt/commit dates in the fixtures, "late" is proxied by a
    returned item (l_returnflag = 'R') in a finished order: count, per
    supplier, the multi-supplier orders where *only* that supplier's
    items came back.

    Rather than two correlated re-scans, the distinct (order, supplier,
    returned) relation is aggregated once per order — total suppliers
    and returned-suppliers — and both EXISTS branches become predicates
    on that single co-partitioned join (n_supp > 1, n_ret = 1). Same
    semantics, one shuffle on orderkey instead of three.
    """
    li, orders, supplier = load(spark, sf_dir, "lineitem", "orders", "supplier")
    ret = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_suppkey").alias("suppkey"),
            (F.col("l_returnflag") == "R").alias("returned"),
        )
        .distinct()
        # feeds both the per-order aggregate and the returned-rows side
        # of the final join — persist instead of re-deriving the
        # lineitem⋈orders distinct twice
        .persist()
    )
    # two-level aggregation instead of the twin countDistinct (r14,
    # guide §2.3 "aggregate before you shuffle"): the multi-distinct
    # rewrite EXPANDS ret 2× before its shuffle, while (orderkey,
    # suppkey) → orderkey collapses map-side first. Identical values:
    # per_supp is distinct by construction, so count(*) is the
    # distinct supplier count and max(returned) marks suppliers with
    # any returned item — sum of those is countDistinct(when(...)).
    per_supp = ret.groupBy("orderkey", "suppkey").agg(
        F.max("returned").alias("ret_any")
    )
    per_order = per_supp.groupBy("orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("ret_any").cast("int")).alias("n_ret"),
    )
    return (
        ret.filter(F.col("returned"))
        .join(per_order, "orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .join(F.broadcast(supplier), F.col("suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q_tpch_q22_like",
    oracle="""
    WITH pos AS (
      SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_custkey, c_nationkey
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey AS nationkey, count(*) AS numcust,
           CAST(sum(bal) AS VARCHAR) AS totacctbal
    FROM pos
    WHERE bal * (SELECT count(*) FROM pos) > (SELECT sum(bal) FROM pos)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
    """,
)
def q_tpch_q22_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity shape (TPC-H Q22): customers with
    above-average positive balances and no recent orders, grouped by
    nation (the fixtures have no phone column, so nationkey stands in
    for the country code). Above-average is the division-free exact
    form ``bal · count > sum`` over DECIMAL(18,2) balances, and the
    NOT EXISTS is an anti-join against date-filtered orders.

    Scale: the (count, sum) scalar is one broadcast row; the anti-join
    shuffles on custkey with the orders side pre-filtered at scan. Every
    fixture customer has *some* order, so the recency predicate is what
    keeps the result non-empty — mirroring Q22's "no orders in 7 years"
    intent.
    """
    cust, orders = load(spark, sf_dir, "customer", "orders")
    pos = cust.filter(F.col("c_acctbal") > 0).select(
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        "c_custkey",
        "c_nationkey",
    )
    stats = pos.agg(F.count("*").alias("n_pos"), F.sum("bal").alias("sum_pos"))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        pos.join(F.broadcast(stats))
        .filter(F.col("bal") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal").cast("string").alias("totacctbal"),
        )
    )
