"""TPC-H completion tier: the remaining classic TPC-H query shapes
(q6-q10, q12-q16, q18-q21) adapted to this testdata's columns, closing
out the full 22-query relational pattern family together with
relational.py (q1/q3/q5) and relational2.py (q4/q11/q17/q22). q2's
argmin-per-group shape is already covered by ``w4_argmax_part_supplier``
(plans/relational.py) and is not duplicated here.

Adaptations (the testdata has no partsupp table and lineitem carries
only ``l_shipdate``):
- "receipt lateness" (q12/q21) is derived from ``l_shipdate -
  o_orderdate``; ship *mode* (q12) becomes a fast/slow ship-latency
  class.
- partsupp-based shapes (q16/q20) use the distinct (partkey, suppkey)
  pairs observed in lineitem as the supplies relation, and q20's
  "excess availability" becomes "supplied more than half of the part's
  shipped quantity".
- q9's supplycost uses ``p_retailprice × l_quantity`` as the cost leg.

All money math is exact-integer (functions/exact_math.py): prices scale
×100, price×(1−discount) scales ×10000, ratios are a single final
division — so Spark and DuckDB agree bit-for-bit regardless of
aggregation order.

Scale notes (100 TB):
- Every query is a star join over the big fact (lineitem/orders) with
  broadcast dims (nation/region/part-subset/supplier-subset where
  small) — no shuffle of the fact beyond its group/join key.
- The q15/q18 "HAVING vs global max / threshold" shapes aggregate the
  fact FIRST (map-side partials), then compare against a broadcast
  1-row scalar — never a second pass over the fact.
- q21's "sole late supplier" is a single per-order aggregate (count
  distinct suppliers, count late suppliers, argmax-late) — one shuffle
  on l_orderkey instead of the textbook double-EXISTS self-join pair,
  which would shuffle lineitem three times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.functions.exact_math import money_cents

QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Shared exact-revenue fragments: l_extendedprice*(1-l_discount) at
# scale 10000 (2dp price × 2dp discount factor → 4dp exact).
_REV_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"


def _rev_cents4(li=None) -> F.Column:
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return money_cents(rev, 10000)


# ---------------------------------------------------------------------------
# q6 — forecast revenue change: single-table filter + exact sum. The
# discount band compares scaled integers (5..7 hundredths) so no float
# boundary can flip membership.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    """
    SELECT SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
               * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1997
      AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue delta from discounted lineitems in a date/quantity band."""
    li = load_tables(spark, sf_dir)["lineitem"]
    disc = money_cents(F.col("l_discount"))
    return (
        li.where(
            (F.year("l_shipdate") == 1997)
            & disc.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(money_cents(F.col("l_extendedprice")) * disc) / 10000.0).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations, by supplier-nation /
# customer-nation / ship year. Nation dims broadcast; fact shuffles
# once on the group key.
# ---------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           SUM({_REV_SQL}) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND EXTRACT(year FROM l_shipdate) IN (1996, 1997)
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year, both directions."""
    t = load_tables(spark, sf_dir)
    n = t["nation"].select("n_nationkey", "n_name")
    ns = n.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "s_nk"
    )
    nc = n.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "c_nk"
    )
    df = (
        t["lineitem"]
        .where(F.year("l_shipdate").isin(1996, 1997))
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return df.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg((F.sum(_rev_cents4()) / 10000.0).alias("revenue"))


# ---------------------------------------------------------------------------
# q8 — market share of NATION_1 suppliers within AMERICA-region
# customers, per order year. The share is a ratio of two exact integer
# sums with a single final division.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    f"""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           ROUND(SUM(CASE WHEN ns.n_name = 'NATION_1' THEN {_REV_SQL} ELSE 0 END)
                 * 1.0 / SUM({_REV_SQL}), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region    ON nc.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    WHERE r_name = 'AMERICA'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share of a part type's revenue within a region by year."""
    t = load_tables(spark, sf_dir)
    nc = (
        t["nation"]
        .join(F.broadcast(t["region"].where(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    ns = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_cents4()
    df = (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        df.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit by supplier nation and year. Cost leg is
# p_retailprice × quantity (partsupp stand-in); both legs land on the
# same ×10000 integer scale before the subtraction so the profit sum
# is exact.
# ---------------------------------------------------------------------------
@register(
    "q9_profit_by_nation_year",
    f"""
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           SUM({_REV_SQL}
               - CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * 100) / 10000.0 AS profit
    FROM lineitem
    JOIN part     ON l_partkey  = p_partkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-line profit per supplier nation and year via integer-cents math."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].where(F.col("p_name").like("%widget%")).select(
        "p_partkey", money_cents(F.col("p_retailprice")).alias("retail_cents")
    )
    profit = _rev_cents4() - F.col("retail_cents") * F.col("l_quantity").cast(
        "long"
    ) * F.lit(100)
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit) / 10000.0).alias("profit"))
    )


# ---------------------------------------------------------------------------
# q10 — returned-item losers: top 20 customers by refunded revenue in
# one quarter. The ORDER BY carries c_custkey as a unique tie-break so
# LIMIT is deterministic in both engines.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           SUM({_REV_SQL}) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY SUM({_REV_SQL}) DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by revenue lost to returned items in one quarter."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    agg = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_cents4()).alias("rev_cents"))
    )
    return (
        agg.orderBy(F.desc("rev_cents"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name",
            (F.col("rev_cents") / 10000.0).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q12 — ship-latency class vs order priority (shipmode adaptation):
# for lineitems shipped in 1997, count high-priority vs other orders
# per FAST/SLOW ship class (≤30 days order→ship vs longer).
# ---------------------------------------------------------------------------
@register(
    "q12_ship_class_priority",
    """
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE EXTRACT(year FROM l_shipdate) = 1997
    GROUP BY 1
    """,
)
def q12_ship_class_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: late-commit lineitems per ship mode split by order priority class."""
    t = load_tables(spark, sf_dir)
    df = (
        t["lineitem"]
        .where(F.year("l_shipdate") == 1997)
        .join(t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        df.withColumn(
            "ship_class",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, "FAST"
            ).otherwise("SLOW"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution, INCLUDING zero-order
# customers (the left outer join is the point of the shape).
# ---------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count incl. zero-order customers."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q14 — promo revenue share for one month: ratio of two exact integer
# sums, one division, rounded once.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    f"""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
                 / SUM({_REV_SQL}), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo parts' share of one month's gross discounted revenue."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    rev = _rev_cents4()
    return (
        li.join(F.broadcast(t["part"].select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by revenue over a quarter. The fact aggregates
# first; the global max is one broadcast row; the equality compare is
# on exact integer cents so "ties" are well-defined.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT MAX(total_cents) AS max_cents FROM revenue)
    SELECT s_suppkey, s_name, total_cents / 10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no, mx
    WHERE total_cents = max_cents
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue via a window max."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_cents4()).alias("total_cents"))
    )
    mx = rev.agg(F.max("total_cents").alias("max_cents"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", (F.col("total_cents") / 10000.0).alias("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q16 — supplier variety per part attribute group. The supplies
# relation is the distinct (partkey, suppkey) pairs from lineitem;
# "complaint" suppliers (negative balance) are excluded with an anti
# pattern (broadcast NOT IN set).
# ---------------------------------------------------------------------------
@register(
    "q16_part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) supplies
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier variety per (brand, type, size) excluding complaint suppliers."""
    t = load_tables(spark, sf_dir)
    supplies = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50)
    )
    bad_supp = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        supplies.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q18 — large-volume orders: per-order quantity sum over a threshold,
# then customer attribution. The HAVING aggregate runs map-side first;
# only qualifying orderkeys rejoin the dims.
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total lineitem quantity exceeds 300, with their customers."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 200)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


# ---------------------------------------------------------------------------
# q19 — bracketed OR-of-ANDs predicate (brand × size band × quantity
# band). The whole disjunction evaluates inside the scan filter after
# the broadcast part join — Catalyst pushes the part-side conjuncts to
# the part scan.
# ---------------------------------------------------------------------------
@register(
    "q19_bracket_revenue",
    f"""
    SELECT SUM({_REV_SQL}) / 10000.0 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three brand/container/quantity OR-bracket predicates."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    q = F.col("l_quantity")
    brackets = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
                F.col("p_partkey") == F.col("l_partkey"))
        .where(brackets)
        .agg((F.sum(_rev_cents4()) / 10000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q20 — dominant suppliers of widget parts: suppliers who shipped more
# than 2× the average per-supplier share of a part's total quantity.
# (TPC-H's absolute "half the availqty" threshold is not scale-robust
# here: supplier fan-out per part grows with SF, so a fixed fraction
# empties out. Relative-to-average keeps the shape AND the selectivity
# at any SF.) Cross-multiplied integer compare — no division.
# ---------------------------------------------------------------------------
@register(
    "q20_dominant_suppliers",
    """
    WITH widget AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
    ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      FROM lineitem JOIN widget ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    pt AS (
      SELECT l_partkey, CAST(SUM(supp_qty) AS BIGINT) AS tot_qty,
             COUNT(*) AS n_supps
      FROM ps GROUP BY 1
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE supp_qty * n_supps > 2 * tot_qty
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock of a part family in one nation."""
    t = load_tables(spark, sf_dir)
    widget = t["part"].where(F.col("p_name").like("%widget%")).select("p_partkey")
    ps = (
        t["lineitem"]
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    pt = ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("tot_qty"), F.count("*").alias("n_supps")
    )
    return (
        ps.join(pt, "l_partkey")
        .where(F.col("supp_qty") * F.col("n_supps") > F.lit(2) * F.col("tot_qty"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# q21 — sole late supplier: in multi-supplier orders where exactly one
# supplier shipped late (>60 days after the order date), count per
# supplier how often they were that one. The textbook EXISTS/NOT
# EXISTS pair collapses into ONE per-order aggregate — one shuffle of
# lineitem instead of three self-joins.
# ---------------------------------------------------------------------------
@register(
    "q21_sole_late_supplier",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                                CAST(l_shipdate AS DATE)) > 60
                                 THEN l_suppkey END) AS n_late,
             MAX(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                     CAST(l_shipdate AS DATE)) > 60
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey
    )
    SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order JOIN supplier ON s_suppkey = late_supp
    WHERE n_supps >= 2 AND n_late = 1
    GROUP BY 1, 2
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers solely responsible for late multi-supplier orders."""
    t = load_tables(spark, sf_dir)
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    per_order = (
        t["lineitem"]
        .join(
            t["orders"]
            .where(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.where((F.col("n_supps") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier (TPC-H Q2 adapted: no partsupp table in
# this schema, so the (part, supplier) supply cost is the cheapest
# observed lineitem price for the pair, exact in cents). Completes
# the 22/22 TPC-H family. Region-restricted suppliers (EUROPE), all
# tying suppliers kept, correlated-min expressed as groupBy + join
# back (no per-part subquery re-scan).
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    """
    WITH eur_supp AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    big_parts AS (
      SELECT p_partkey, p_brand, p_size FROM part WHERE p_size >= 40
    ),
    costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS cost_cents
      FROM lineitem
      JOIN big_parts ON l_partkey = p_partkey
      JOIN eur_supp ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    best AS (
      SELECT l_partkey, MIN(cost_cents) AS best_cents FROM costs GROUP BY 1
    )
    SELECT p.p_partkey, p.p_brand, p.p_size,
           es.s_name, es.n_name,
           c.cost_cents / 100.0 AS supply_cost
    FROM costs c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.cost_cents = b.best_cents
    JOIN big_parts p ON p.p_partkey = c.l_partkey
    JOIN eur_supp es ON es.s_suppkey = c.l_suppkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest EUROPE supplier(s) per large part (TPC-H Q2 shape).

    The correlated MIN subquery becomes one groupBy + an equi-join
    back — a single extra shuffle over the (part, supplier)-grain
    cost table, never a per-part re-scan. Dimension sides (suppliers
    restricted by region, the part slice) broadcast.
    """
    t = load_tables(spark, sf_dir)
    eur_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    big_parts = t["part"].where(F.col("p_size") >= 40).select(
        "p_partkey", "p_brand", "p_size"
    )
    costs = (
        t["lineitem"]
        .join(
            F.broadcast(big_parts.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(money_cents(F.col("l_extendedprice"))).alias("cost_cents"))
    )
    best = costs.groupBy("l_partkey").agg(F.min("cost_cents").alias("best_cents"))
    return (
        costs.join(
            best,
            (costs.l_partkey == best.l_partkey)
            & (costs.cost_cents == best.best_cents),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(big_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            "s_name",
            "n_name",
            (F.col("cost_cents") / 100.0).alias("supply_cost"),
        )
    )


@register(
    "setop_repeat_customers",
    """
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    """,
)
def setop_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI set operations as first-class plan nodes: customers active
    in BOTH 1996 and 1997 (INTERSECT, distinct semantics) minus those
    with any finalized-'F' 1997 order (EXCEPT, distinct semantics).
    (This testdata's orders span 1995..2001.)

    Reference parity: the reference's id-set membership filters
    (src/eda.py-style set intersections over Python sets) are the
    driver for F4/F5; this query lifts the same set algebra to the
    engine level where it survives data that no longer fits a driver
    set.

    Scale notes (100 TB):
    - Year predicates are range filters on ``o_orderdate`` (not
      ``year()`` calls), so they push to the parquet scan and prune
      date-partitioned layouts.
    - ``intersect``/``subtract`` compile to a distinct-aggregate plus
      left-semi/left-anti hash joins on the lone ``c_custkey`` column:
      map-side partial DISTINCT collapses each branch to unique
      custkeys per partition BEFORE the single key shuffle, so the
      shuffled volume is bounded by |customers|, not |orders|.
    - All three branches scan only (o_custkey, o_orderdate,
      o_orderstatus) — column pruning keeps the fact scan narrow.
    """
    orders = load_tables(spark, sf_dir)["orders"]

    def active(year: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= f"{year}-01-01")
                & (F.col("o_orderdate") < f"{year + 1}-01-01")
            )
            .select(F.col("o_custkey").alias("c_custkey"))
        )

    finalized_1997 = (
        orders.filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return active(1996).intersect(active(1997)).subtract(finalized_1997)
