"""Scalar-function surface, second batch: string similarity/parts, bit
ops, trig/log math, calendar functions, sequence generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.queries import load, query


@query(
    "q_fn_string2",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000001')   AS lev_dist,
           reverse(c_mktsegment)                       AS seg_rev,
           repeat('ab', 3)                             AS rep,
           left(c_name, 4)                             AS l4,
           right(c_name, 4)                            AS r4,
           CAST(contains(c_name, '9') AS BOOLEAN)      AS has9,
           CAST(starts_with(c_mktsegment, 'BU') AS BOOLEAN) AS is_bu,
           CAST(ends_with(c_mktsegment, 'RY') AS BOOLEAN)   AS ends_ry,
           split_part(c_name, '#', 2)                  AS name_num,
           ascii(c_mktsegment)                         AS first_code,
           chr(65 + c_nationkey % 26)                  AS letter
    FROM customer
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family 2: levenshtein, reverse, repeat, left/right,
    contains/startswith/endswith, split_part, ascii/chr."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000001")).alias("lev_dist"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.substring(F.col("c_name"), -4, 4).alias("r4"),
        F.contains(F.col("c_name"), F.lit("9")).alias("has9"),
        F.startswith(F.col("c_mktsegment"), F.lit("BU")).alias("is_bu"),
        F.endswith(F.col("c_mktsegment"), F.lit("RY")).alias("ends_ry"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.ascii("c_mktsegment").alias("first_code"),
        F.chr(F.lit(65) + F.col("c_nationkey") % 26).alias("letter"),
    )


@query(
    "q_fn_math2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 8)                    AS s,
           round(cos(l_discount), 8)                    AS c,
           round(atan2(l_discount, l_tax + 0.001), 8)   AS at2,
           round(log10(l_extendedprice), 8)             AS lg10,
           round(log2(l_extendedprice), 8)              AS lg2,
           round(degrees(l_discount), 8)                AS deg,
           round(radians(l_quantity), 8)                AS rad,
           xor(CAST(l_orderkey AS BIGINT), CAST(l_partkey AS BIGINT)) AS bxor,
           CAST(l_orderkey AS BIGINT) & 255             AS band,
           CAST(l_orderkey AS BIGINT) | 1               AS bor,
           CAST(l_orderkey * 4 AS BIGINT)               AS shl2,
           round(cbrt(l_extendedprice), 8)              AS cbrt_p
    FROM lineitem
    """,
)
def q_fn_math2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family 2: trig, log bases, degrees/radians, bitwise ops,
    shifts (pinned as *4 in the oracle), cbrt."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 8).alias("s"),
        F.round(F.cos("l_discount"), 8).alias("c"),
        F.round(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.001), 8).alias("at2"),
        F.round(F.log10("l_extendedprice"), 8).alias("lg10"),
        F.round(F.log2("l_extendedprice"), 8).alias("lg2"),
        F.round(F.degrees("l_discount"), 8).alias("deg"),
        F.round(F.radians("l_quantity"), 8).alias("rad"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("bxor"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("band"),
        F.col("l_orderkey").bitwiseOR(F.lit(1)).alias("bor"),
        F.shiftleft(F.col("l_orderkey"), 2).alias("shl2"),
        F.round(F.cbrt("l_extendedprice"), 8).alias("cbrt_p"),
    )


@query(
    "q_fn_datetime2",
    oracle="""
    SELECT o_orderkey,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')  AS month_end,
           date_part('week', o_orderdate)::INT                        AS wk,
           date_part('quarter', o_orderdate)::INT                     AS qtr,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2mo,
           strftime(CAST(o_orderdate AS DATE) - 15, '%Y-%m-%d')       AS minus15d,
           strftime(make_date(2024, 1 + date_part('month', o_orderdate)::INT % 12, 1), '%Y-%m-%d') AS synth_date,
           date_part('doy', o_orderdate)::INT                         AS doy
    FROM orders
    """,
)
def q_fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family 2: last_day, weekofyear, quarter, add_months,
    date_sub, make_date, dayofyear.

    weekofyear: both engines implement ISO-8601 week numbering.
    """
    (orders,) = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.weekofyear(d).alias("wk"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus2mo"),
        F.date_format(F.date_sub(d, 15), "yyyy-MM-dd").alias("minus15d"),
        F.date_format(
            F.make_date(F.lit(2024), F.lit(1) + F.month(d) % 12, F.lit(1)),
            "yyyy-MM-dd",
        ).alias("synth_date"),
        F.dayofyear(d).alias("doy"),
    )


@query(
    "q_fn_generate",
    oracle="""
    SELECT r_regionkey, unnest(range(0, r_regionkey + 1)) AS i
    FROM region
    """,
)
def q_fn_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation: sequence() + explode (generate_series parity)."""
    (region,) = load(spark, sf_dir, "region")
    return region.select(
        "r_regionkey",
        F.explode(F.sequence(F.lit(0), F.col("r_regionkey"))).alias("i"),
    )


@query(
    "q_fn_map2",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)       AS k_val,
           CAST(json_extract(props, '$.k') AS INT) * 2   AS k_doubled,
           2                                             AS n_after_concat,
           'bonus'                                       AS second_key,
           CAST(json_extract(props, '$.k') AS INT) + 100 AS zipped_sum
    FROM events
    """,
)
def q_fn_map2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family 2: map_from_arrays, map_concat, transform_values,
    map_zip_with, map_values/size (scalar projections for hashing;
    the oracle mirrors through the JSON source of truth)."""
    (events,) = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    bonus = F.map_from_arrays(F.array(F.lit("bonus")), F.array(F.lit(100)))
    merged = F.map_concat(m, bonus)
    doubled = F.transform_values(m, lambda k, v: v * 2)
    zipped = F.map_zip_with(
        m,
        F.map_from_arrays(F.map_keys(m), F.transform(F.map_values(m), lambda v: F.lit(100))),
        lambda k, v1, v2: v1 + v2,
    )
    return events.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(doubled, "k").alias("k_doubled"),
        F.size(merged).alias("n_after_concat"),
        F.element_at(F.array_sort(F.map_keys(merged)), 1).alias("second_key"),
        F.element_at(zipped, "k").alias("zipped_sum"),
    )


@query(
    "q_join_multikey_nullsafe",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             nullif(l_returnflag, 'N') AS rf, l_quantity
      FROM lineitem WHERE l_partkey % 37 = 0)
    SELECT coalesce(a.rf, '<null>') AS rf,
           count(*) AS n_pairs,
           round(sum(a.l_quantity + b.l_quantity), 2) AS qty_sum
    FROM t a JOIN t b
      ON a.l_orderkey = b.l_orderkey
     AND a.rf IS NOT DISTINCT FROM b.rf
     AND a.l_linenumber <= b.l_linenumber
    GROUP BY coalesce(a.rf, '<null>')
    """,
)
def q_join_multikey_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key join mixing plain equality, null-safe equality (<=>),
    and an inequality — the §2-B 'multi-key + null-safe' row."""
    (li,) = load(spark, sf_dir, "lineitem")
    t = li.filter(F.col("l_partkey") % 37 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("rf"),
        "l_quantity",
    )
    a, b = t.alias("a"), t.alias("b")
    joined = a.join(
        b,
        on=[
            F.col("a.l_orderkey") == F.col("b.l_orderkey"),
            F.col("a.rf").eqNullSafe(F.col("b.rf")),
            F.col("a.l_linenumber") <= F.col("b.l_linenumber"),
        ],
    )
    return joined.groupBy(
        F.coalesce(F.col("a.rf"), F.lit("<null>")).alias("rf")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum(F.col("a.l_quantity") + F.col("b.l_quantity")), 2).alias(
            "qty_sum"
        ),
    )


@query(
    "q_fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('%s|%d', o_orderstatus, o_orderkey)        AS tagged,
           format('{:.2f}', o_totalprice)                    AS price_fmt,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0')        AS key_pad
    FROM orders
    """,
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting: printf-style and fixed-decimal rendering."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.format_string("%s|%d", F.col("o_orderstatus"), F.col("o_orderkey")).alias(
            "tagged"
        ),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price_fmt"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_pad"),
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)        AS k_int,
           CAST(json_extract(props, '$.k') AS DOUBLE)     AS k_dbl,
           json_extract_string(props, '$.k')              AS k_str,
           CAST(json_type(json(props)) = 'OBJECT' AS BOOLEAN) AS is_obj
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse_json into a
    variant column, typed extraction with variant_get, schema probing
    with schema_of_variant — the open-schema path for semi-structured
    ingestion (binary-encoded, predicate-pushdown-friendly, vs the
    per-query string re-parse of get_json_object)."""
    (events,) = load(spark, sf_dir, "events")
    v = events.select("event_id", F.parse_json(F.col("props")).alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(v, '$.k', 'double')").alias("k_dbl"),
        F.expr("CAST(variant_get(v, '$.k', 'long') AS STRING)").alias("k_str"),
        F.expr("schema_of_variant(v)").startswith("OBJECT").alias("is_obj"),
    )


@query(
    "q_fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE round(l_extendedprice / (l_linenumber - 1), 4) END AS safe_div,
           CASE WHEN l_orderkey % 512 = 0 AND l_orderkey > 7 THEN NULL
                ELSE l_orderkey + CASE WHEN l_orderkey % 512 = 0
                     THEN 9223372036854775800 ELSE 1 END END         AS safe_add,
           TRY_CAST(l_returnflag AS INT)                             AS flag_int,
           TRY_CAST(l_linestatus AS BOOLEAN)                         AS status_bool
    FROM lineitem
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-tolerant expressions (try_divide / try_add /
    try_cast): invalid arithmetic and casts yield NULL rows instead of
    task failures — the semantics a 100 TB pipeline needs so one bad
    record can't abort a stage. The overflow is planted on ~0.2% of
    rows (l_orderkey % 512), not all of them: a caught JVM overflow
    costs microseconds PER THROW, and the original every-row-overflows
    form spent ~50s at the sf1 fixture on exception handling alone
    (r13 sweep finding) — try_* prices errors as rare, which is what
    the demo should model too."""
    (li,) = load(spark, sf_dir, "lineitem")
    addend = F.when(
        F.col("l_orderkey") % 512 == 0, F.lit(9223372036854775800)
    ).otherwise(F.lit(1))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 1), 4
        ).alias("safe_div"),
        F.try_add(F.col("l_orderkey"), addend).alias("safe_add"),
        F.col("l_returnflag").try_cast("int").alias("flag_int"),
        F.col("l_linestatus").try_cast("boolean").alias("status_bool"),
    )


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT s_suppkey,
             'https://supplier-' || s_suppkey || '.example.com/catalog/parts?region='
               || s_nationkey || '&page=2' AS url
      FROM supplier
    )
    SELECT s_suppkey,
           regexp_extract(url, '^https?://([^/]+)', 1)  AS host,
           regexp_extract(url, '^([a-z]+)://', 1)       AS proto,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'region=([0-9]+)', 1)    AS region_param
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing: Spark's dedicated parse_url (HOST/PROTOCOL/PATH and
    per-key QUERY extraction) vs a regexp oracle — the log/clickstream
    ingestion staple."""
    (supp,) = load(spark, sf_dir, "supplier")
    url = F.concat(
        F.lit("https://supplier-"),
        F.col("s_suppkey"),
        F.lit(".example.com/catalog/parts?region="),
        F.col("s_nationkey"),
        F.lit("&page=2"),
    )
    u = supp.select("s_suppkey", url.alias("url"))
    return u.select(
        "s_suppkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("region")).alias("region_param"),
    )


@query(
    "q_fn_crypto",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS roundtrip,
           sha256(o_orderstatus) AS status_sha256,
           md5(CAST(o_orderkey AS VARCHAR)) AS key_md5
    FROM orders WHERE o_orderkey % 200 = 0
    """,
)
def q_fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt → aes_decrypt
    roundtrip (AES-128-GCM, the at-rest PII pattern — the oracle checks
    the decrypted value equals the plaintext, which is the contract)
    plus sha2-256 / md5 digests that must match any engine
    bit-for-bit."""
    (orders,) = load(spark, sf_dir, "orders")
    key = F.lit("0123456789abcdef")
    return orders.filter(F.col("o_orderkey") % 200 == 0).select(
        "o_orderkey",
        F.aes_decrypt(
            F.aes_encrypt(F.col("o_orderstatus").cast("binary"), key), key
        )
        .cast("string")
        .alias("roundtrip"),
        F.sha2(F.col("o_orderstatus").cast("binary"), 256).alias("status_sha256"),
        F.md5(F.col("o_orderkey").cast("string").cast("binary")).alias("key_md5"),
    )
