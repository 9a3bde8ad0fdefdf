"""Relational query surface (SURVEY.md §2.2-§2.9 operators) over the
driver testdata, each with a DuckDB oracle twin.

Money sums use exact integer-cents math (see functions/exact_math.py)
so double aggregation order can never flip a rounded digit between
engines. Computed integer columns are cast to BIGINT on both sides so
schemas align.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.functions.exact_math import exact_money_sum, money_cents

QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# q1 pricing summary — scan + pushed-down filter + hash agg (F-ops, A-ops)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)                    AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0                AS sum_base_price,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS sum_disc_price,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_charge,
           ROUND(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) / (1.0 * COUNT(*)), 6)      AS avg_qty,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 6) AS avg_price,
           ROUND(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: lineitem pricing summary with exact integer-cents money aggregation."""
    li = load_tables(spark, sf_dir)["lineitem"]
    li = li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
    qty = F.sum(F.round("l_quantity", 0).cast("long"))
    base_cents = F.sum(money_cents(F.col("l_extendedprice"), 100))
    disc_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge_expr = disc_expr * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qty.alias("sum_qty"),
        (base_cents / 100.0).alias("sum_base_price"),
        exact_money_sum(disc_expr, 10000).alias("sum_disc_price"),
        exact_money_sum(charge_expr, 1000000).alias("sum_charge"),
        F.round(qty / F.count("*"), 6).alias("avg_qty"),
        F.round(base_cents / 100.0 / F.count("*"), 6).alias("avg_price"),
        F.round(F.sum(money_cents(F.col("l_discount"), 100)) / 100.0 / F.count("*"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q3 top revenue orders — 3-way join + agg + deterministic top-k (J, A, W1)
# ---------------------------------------------------------------------------
@register(
    "q3_top_orders",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_date
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top unshipped orders by revenue for a market segment before a date."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))
        .agg(exact_money_sum(rev, 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5 local-supplier revenue per nation — 6-way join (J1 shape at depth)
# ---------------------------------------------------------------------------
@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local supplier revenue per nation inside one region and year."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(exact_money_sum(rev, 10000).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# J1 — broadcast dim-lookup join (reference get_country,
# /root/reference/src/senzing_pipeline.py:34-37)
# ---------------------------------------------------------------------------
@register(
    "j1_dim_lookup",
    """
    SELECT r_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 6) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j1_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension lookup: customers joined to their nation and region names."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(money_cents(F.col("c_acctbal"))) / 100.0 / F.count("*"), 6).alias(
                "avg_acctbal"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J2 — exact-name seed match (reference filter_senzing seed join,
# /root/reference/src/senzing_pipeline.py:375-389)
# ---------------------------------------------------------------------------
@register(
    "j2_seed_match",
    """
    WITH seeds AS (SELECT c_name AS name FROM customer WHERE c_custkey % 37 = 0)
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer JOIN seeds ON c_name = seeds.name
    """,
)
def j2_seed_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-name seed match: customer rows equi-joined to a literal seed name list."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    seeds = c.where(F.col("c_custkey") % 37 == 0).select(F.col("c_name").alias("name"))
    return c.join(F.broadcast(seeds), c["c_name"] == seeds["name"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# F1 — regex blocklist filter (reference filter_bearer,
# /root/reference/src/senzing_pipeline.py:83-112: 17 patterns OR-ed)
# ---------------------------------------------------------------------------
BLOCKLIST_PATTERN = "(^cold )|(bolt$)|(widget)"

@register(
    "f1_blocklist_filter",
    f"""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE NOT regexp_matches(lower(p_name), '{BLOCKLIST_PATTERN}')
    GROUP BY p_brand
    """,
)
def f1_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """17-regex bearer blocklist: drop customer rows whose name matches any pattern."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .where(~F.lower(F.col("p_name")).rlike(BLOCKLIST_PATTERN))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# F3 — membership predicate (reference MATCH_LEVEL_CODE isin,
# /root/reference/src/senzing_pipeline.py:252-264)
# ---------------------------------------------------------------------------
@register(
    "f3_membership_filter",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM events
    WHERE event_type IN ('click', 'purchase', 'view')
    GROUP BY event_type
    """,
)
def f3_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_LEVEL-style membership filter: orders restricted to a literal status/priority set."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("event_type").isin("click", "purchase", "view"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_money_sum(F.col("value")).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# A1 + W2 — group-count → probability distribution (reference
# generate_aliases, /root/reference/src/senzing_pipeline.py:289-305)
# ---------------------------------------------------------------------------
@register(
    "a1_alias_distribution",
    """
    WITH c AS (
      SELECT c_mktsegment AS alias, c_nationkey AS entity, COUNT(*) AS cnt
      FROM customer GROUP BY 1, 2
    )
    SELECT alias, entity, cnt,
           ROUND(cnt / (1.0 * SUM(cnt) OVER (PARTITION BY alias)), 6) AS prob
    FROM c
    """,
)
def a1_alias_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias probability distribution: per-name frequencies normalized within each nation."""
    t = load_tables(spark, sf_dir)
    counts = (
        t["customer"]
        .groupBy(F.col("c_mktsegment").alias("alias"), F.col("c_nationkey").alias("entity"))
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("alias")
    return counts.withColumn("prob", F.round(F.col("cnt") / F.sum("cnt").over(w), 6))


# ---------------------------------------------------------------------------
# A6 — first-non-empty / earliest pick (reference entity-name pick,
# /root/reference/src/senzing_pipeline.py:349-353)
# ---------------------------------------------------------------------------
@register(
    "a6_first_order",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderstatus AS first_status, o_totalprice AS first_price
    FROM ranked WHERE rn = 1
    """,
)
def a6_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-non-empty pick: each customer's earliest order by date with deterministic ties."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("first_status"),
            F.col("o_totalprice").alias("first_price"),
        )
    )


# ---------------------------------------------------------------------------
# W1 — per-group top-k (reference top-30 phrases per doc,
# /root/reference/src/analysis.py:11)
# ---------------------------------------------------------------------------
@register(
    "w1_top3_orders_per_customer",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def w1_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: each customer's 3 largest orders via a row_number window."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# W4 — argmax disambiguation (reference best-entity pick by score)
# ---------------------------------------------------------------------------
@register(
    "w4_argmax_part_supplier",
    """
    WITH rev AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS rev_ten_thousandths
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY rev_ten_thousandths DESC, l_suppkey) AS rn
      FROM rev
    )
    SELECT l_partkey, l_suppkey AS best_suppkey, rev_ten_thousandths / 10000.0 AS revenue
    FROM ranked WHERE rn = 1
    """,
)
def w4_argmax_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax per part: the single cheapest supplier row chosen by a window ordering."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(money_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
                "rev_ten_thousandths"
            )
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(F.desc("rev_ten_thousandths"), F.asc("l_suppkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("l_suppkey").alias("best_suppkey"),
            (F.col("rev_ten_thousandths") / 10000.0).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# U1 — union + distinct (reference hop-set union,
# /root/reference/src/senzing_pipeline.py:394-397)
# ---------------------------------------------------------------------------
@register(
    "u1_union_distinct_nations",
    """
    SELECT DISTINCT n_nationkey, n_name
    FROM (SELECT c_nationkey AS k FROM customer
          UNION ALL
          SELECT s_nationkey FROM supplier) u
    JOIN nation ON k = n_nationkey
    """,
)
def u1_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of customer and supplier nation keys."""
    t = load_tables(spark, sf_dir)
    keys = (
        t["customer"].select(F.col("c_nationkey").alias("k"))
        .unionByName(t["supplier"].select(F.col("s_nationkey").alias("k")))
    )
    return (
        keys.join(F.broadcast(t["nation"]), keys["k"] == F.col("n_nationkey"))
        .select("n_nationkey", "n_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# C7 — conditional description synthesis (reference generate_entities,
# /root/reference/src/senzing_pipeline.py:161-193; clause order preserved)
# ---------------------------------------------------------------------------
@register(
    "c7_description_synthesis",
    """
    SELECT c_custkey,
           concat(c_name, ', segment ', c_mktsegment,
                  CASE WHEN c_acctbal < 0 THEN ', in debt' ELSE '' END,
                  CASE WHEN n_name IS NOT NULL THEN concat(', located in ', n_name) ELSE '' END
           ) AS description
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
)
def c7_description_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Description synthesis: concat_ws clause-ordered customer summary strings."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .select(
            "c_custkey",
            F.concat(
                F.col("c_name"),
                F.lit(", segment "),
                F.col("c_mktsegment"),
                F.when(F.col("c_acctbal") < 0, F.lit(", in debt")).otherwise(F.lit("")),
                F.when(
                    F.col("n_name").isNotNull(), F.concat(F.lit(", located in "), F.col("n_name"))
                ).otherwise(F.lit("")),
            ).alias("description"),
        )
    )


# ---------------------------------------------------------------------------
# C8 — chained type-inference rule (reference get_entity_type,
# /root/reference/src/senzing_pipeline.py:122-135)
# ---------------------------------------------------------------------------
@register(
    "c8_type_inference",
    """
    SELECT p_partkey,
           CASE WHEN p_type = 'PROMO' THEN 'PROMOTIONAL'
                WHEN p_size >= 30 THEN 'LARGE'
                WHEN p_name LIKE '%widget%' THEN 'WIDGET'
                ELSE 'MISC' END AS part_class
    FROM part
    """,
)
def c8_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-inference casts incl. the replicated or-bug: string columns coerced to typed values."""
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.when(F.col("p_type") == "PROMO", "PROMOTIONAL")
        .when(F.col("p_size") >= 30, "LARGE")
        .when(F.col("p_name").like("%widget%"), "WIDGET")
        .otherwise("MISC")
        .alias("part_class"),
    )
