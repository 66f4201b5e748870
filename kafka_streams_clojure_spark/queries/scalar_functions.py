"""Scalar function families (SURVEY.md §2.8).

The reference's scalar surface is "any pure Clojure function" inside a
transducer step (README.md:80-82); the engine maps that to Catalyst
built-in expressions — JVM-side, whole-stage-codegen'd, never
row-at-a-time Python.

Oracle discipline: only functions with bit-identical semantics in
Spark and DuckDB are used on comparison paths (sqrt is correctly
rounded IEEE; pow/ln/exp can differ by 1 ulp between JVM fdlibm and
libm, so squares are written as x*x and log-family funcs stay off the
oracle surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import load_table


@query(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                              AS name_lower,
           upper(p_brand)                             AS brand_upper,
           substring(p_type, 1, 5)                    AS type_prefix,
           length(p_name)                             AS name_len,
           trim(p_name)                               AS name_trim,
           p_brand || '/' || p_type                   AS brand_type,
           regexp_replace(p_name, 'a', '@', 'g')      AS name_subst,
           (p_name LIKE '%la%')                       AS has_la
    FROM part
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", "a", "@").alias("name_subst"),
        F.col("p_name").like("%la%").alias("has_la"),
    )


@query(
    "q_str_pad_funcs",
    oracle="""
    SELECT s_suppkey,
           lpad(s_name, 20, '.')   AS name_lpad,
           rpad(s_name, 20, '.')   AS name_rpad,
           reverse(s_name)         AS name_rev,
           repeat('ab', 3)         AS abab,
           replace(s_name, '#', '-') AS name_repl,
           left(s_name, 4)         AS name_left,
           right(s_name, 4)        AS name_right
    FROM supplier
    """,
)
def q_str_pad_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad("s_name", 20, ".").alias("name_lpad"),
        F.rpad("s_name", 20, ".").alias("name_rpad"),
        F.reverse("s_name").alias("name_rev"),
        F.repeat(F.lit("ab"), 3).alias("abab"),
        F.replace(F.col("s_name"), F.lit("#"), F.lit("-")).alias("name_repl"),
        F.left(F.col("s_name"), F.lit(4)).alias("name_left"),
        F.right(F.col("s_name"), F.lit(4)).alias("name_right"),
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT event_type FROM events WHERE value > 50
    UNION
    SELECT event_type FROM events WHERE user_id < 20
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — the set-union complement of q_union_merge's
    bag-union."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 50).select("event_type")
    b = ev.filter(F.col("user_id") < 20).select("event_type")
    return a.union(b).distinct()


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                        AS y,
           month(o_orderdate)                                       AS m,
           day(o_orderdate)                                         AS d,
           date_trunc('month', o_orderdate)                         AS month_start,
           CAST(floor(epoch(o_orderdate)) AS BIGINT)                AS unix_s,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("unix_s"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias("days_to_eoy"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice)                    AS price_round,
           floor(l_extendedprice)                    AS price_floor,
           ceil(l_extendedprice)                     AS price_ceil,
           abs(l_discount - 0.05)                    AS disc_dev,
           l_quantity * l_quantity                   AS qty_sq,
           sqrt(l_quantity)                          AS qty_sqrt,
           l_partkey % 7                             AS pk_mod
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice").cast("double").alias("price_round"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_partkey") % 7).alias("pk_mod"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END                        AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           greatest(o_totalprice, 200000.0)          AS at_least_200k,
           least(o_totalprice, 200000.0)             AS at_most_200k
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(200000.0)).alias("at_least_200k"),
        F.least(F.col("o_totalprice"), F.lit(200000.0)).alias("at_most_200k"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                               AS n_tokens,
           len(list_distinct(string_split(text, ' ')))                AS n_distinct,
           list_contains(string_split(text, ' '), 'data')             AS has_data,
           array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), ',') AS first3_sorted,
           len(list_filter(string_split(text, ' '), t -> length(t) > 6)) AS n_long_tokens
    FROM documents
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions (transform/filter lambdas run
    inside Catalyst — no Python)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3_sorted"),
        F.size(F.filter(toks, lambda t: F.length(t) > 6)).alias("n_long_tokens"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(props::JSON ->> 'k' AS INTEGER)  AS k_val,
           len(json_keys(props::JSON))           AS n_keys
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed payload access: parse the JSON value into MapType and
    read through map functions (the schema-first mapping of the
    reference's opaque dynamic values, SURVEY §1.2)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") >= 50)
