"""Scalar-function surface: string / date / math / array / map / JSON /
hash families, each verified against DuckDB equivalents.

Where dialects disagree (initcap, months_between, bankers' rounding)
the query either pins shared semantics explicitly or the divergent
function is exercised in unit tests instead of the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.queries import load, query


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_up,
           lower(p_brand)                                  AS brand_low,
           substring(p_name, 1, 8)                         AS name_prefix,
           concat(p_brand, ':', p_type)                    AS brand_type,
           length(p_name)                                  AS name_len,
           trim(concat('  ', p_name, '  '))                AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_pad,
           replace(p_type, ' ', '_')                       AS type_snake,
           strpos(p_name, 'a')                             AS first_a,
           translate(p_brand, '#', '-')                    AS brand_dash,
           regexp_extract(p_name, '[a-z]+')                AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g')     AS devoweled,
           len(string_split(p_name, ' '))                  AS n_words
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family over part names."""
    (part,) = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_low"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           date_part('year', o_orderdate)::INT             AS yr,
           date_part('month', o_orderdate)::INT            AS mo,
           date_part('day', o_orderdate)::INT              AS dy,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')   AS plus30,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           epoch(o_orderdate)::BIGINT                      AS epoch_s,
           date_part('dow', o_orderdate)::INT              AS dow,
           strftime(o_orderdate, '%Y-%m-%d')               AS iso_day
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, arithmetic, epoch, formatting.

    dow pinned to DuckDB's 0=Sunday convention via dayofweek-1.
    """
    (orders,) = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                        AS price_r1,
           floor(l_extendedprice)::BIGINT                   AS price_floor,
           ceil(l_extendedprice)::BIGINT                    AS price_ceil,
           abs(l_discount - 0.05)                           AS disc_dev,
           round(power(l_quantity, 2), 4)                   AS qty_sq,
           round(sqrt(l_extendedprice), 6)                  AS price_sqrt,
           round(exp(l_discount), 8)                        AS disc_exp,
           round(ln(l_extendedprice + 1), 8)                AS price_ln,
           CAST(l_orderkey % 7 AS BIGINT)                   AS mod7,
           CAST(sign(l_discount - 0.05) AS INT)             AS disc_sign,
           round(greatest(l_discount, l_tax), 4)            AS gl_max,
           round(least(l_discount, l_tax), 4)               AS gl_min
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (positive-domain pmod == %, so both dialects agree)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.exp("l_discount"), 8).alias("disc_exp"),
        F.round(F.log(F.col("l_extendedprice") + 1), 8).alias("price_ln"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.round(F.greatest("l_discount", "l_tax"), 4).alias("gl_max"),
        F.round(F.least("l_discount", "l_tax"), 4).alias("gl_min"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                          AS dim,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)       AS vec_sum,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           len(list_filter(embedding, x -> x > 0))                 AS n_pos,
           round(CAST(list_max(embedding) AS DOUBLE), 6)           AS vmax,
           round(CAST(embedding[1] AS DOUBLE), 6)                  AS first_val,
           len(list_distinct(list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE), 1) + 0.0 AS VARCHAR)))) AS n_distinct_r1
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions (transform/filter/aggregate) over
    embedding vectors — all JVM-side lambda expressions."""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 6).alias("vec_sum"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x), 6).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(v), 6).alias("vmax"),
        F.round(F.element_at(v, 1), 6).alias("first_val"),
        F.size(
            F.array_distinct(
                # +0.0 normalizes IEEE negative zero before stringifying
                F.transform(v, lambda x: (F.round(x, 1) + F.lit(0.0)).cast("string"))
            )
        ).alias("n_distinct_r1"),
    )


@query(
    "q_fn_array_explode",
    oracle="""
    SELECT vec_id, pos, round(CAST(embedding[pos] AS DOUBLE), 6) AS val
    FROM embeddings CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS pos) t
    """,
)
def q_fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of array columns (first 4 positions)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", F.posexplode("embedding").alias("pos0", "x"))
    return ex.filter(F.col("pos0") < 4).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x").cast("double"), 6).alias("val"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)          AS k_val,
           'k'                                              AS first_key,
           1                                                AS n_keys
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access: parse JSON props into map<string,int>,
    then map_keys / size / element_at (scalar outputs for hashing)."""
    (events,) = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return events.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(m).alias("n_keys"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)      AS k_int,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_valid(props) AS BOOLEAN)           AS is_valid,
           CAST(json_extract(props, '$.missing') IS NULL AS BOOLEAN) AS missing_null
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over events.props (from_json /
    get_json_object / json_tuple equivalents)."""
    (events,) = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.from_json(F.col("props"), "struct<k:int>")["k"].alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.when(F.from_json(F.col("props"), "map<string,string>").isNotNull(), True)
        .otherwise(False)
        .alias("is_valid"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_null"),
    )


@query(
    "q_fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                         AS name_md5,
           sha256(c_name)                      AS name_sha256,
           length(md5(c_name))                 AS md5_len
    FROM customer
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash functions (md5 / sha2-256)."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.length(F.md5("c_name")).alias("md5_len"),
    )


@query("q_fn_nondeterministic_ids", oracle=None)
def q_fn_nondeterministic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """monotonically_increasing_id / xxhash64 / crc32 — engine-specific
    values, so verified by properties (uniqueness, stability) in tests,
    rows-only here."""
    (cust,) = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.monotonically_increasing_id().alias("mono_id"),
        F.xxhash64("c_name").alias("name_xxh"),
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc"),
    )
