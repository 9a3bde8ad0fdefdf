"""Relational depth tier: the subquery shapes a warehouse engine must
cover beyond plain star joins — EXISTS / NOT EXISTS, correlated scalar
subqueries, HAVING against a global aggregate, and dimension upsert
(merge). Modeled on the classic TPC-H query patterns (q4/q17/q22/q11)
adapted to this testdata's columns.

All money math rides as exact integer cents
(functions/exact_math.py); all threshold comparisons are pure-integer
(cross-multiplied) so no float rounding can flip a row's membership
between engines.

Scale notes (100 TB):
- EXISTS/NOT EXISTS compile to left_semi / left_anti joins — no
  row multiplication, shuffle keyed on the join key, AQE-skew-safe.
- The correlated scalar subquery is de-correlated by hand into a
  per-key aggregate + equi-join (what Catalyst does internally for
  supported shapes; written explicitly so the plan is guaranteed).
- Global-scalar thresholds (q11/q22 shape) broadcast one aggregated
  row via crossJoin(broadcast(...)) — no shuffle of the big side.
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


# ---------------------------------------------------------------------------
# EXISTS (TPC-H q4 shape): orders from 1996 with at least one lineitem
# shipped more than 60 days after the order date, counted by priority.
# ---------------------------------------------------------------------------
@register(
    "q4_exists_late_ship",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1996
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
      )
    GROUP BY o_orderpriority
    """,
)
def q4_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority counts for orders with an EXISTS late-shipping lineitem."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.year("o_orderdate") == 1996)
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H q17 shape): revenue from
# small-quantity lineitems — quantity below 20% of the part's average
# — for one brand. The correlation is de-correlated into a per-part
# aggregate; the 0.2×avg comparison is cross-multiplied to integers:
#   qty < 0.2 * (sum_qty / n)   ⇔   qty * n * 5 < sum_qty
# (l_quantity is integer-valued in this data; both sides BIGINT).
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS BIGINT) * n * 5 < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: avg yearly revenue loss from small-quantity orders of one brand/container."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        money_cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    pq = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("n")
    )
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.join(F.broadcast(brand_parts), li["l_partkey"] == F.col("p_partkey"))
        .join(pq, "l_partkey")
        .where(F.col("qty") * F.col("n") * 5 < F.col("sum_qty"))
        .agg((F.sum("price_cents") / 100.0 / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# NOT EXISTS + global scalar (TPC-H q22 shape): customers with an
# above-average positive balance and no orders since 2000 (dormant
# accounts), by nation. The balance threshold is the average positive
# balance — computed once, broadcast, compared in exact cents
# cross-multiplied form:
#   bal > sum_pos / n_pos   ⇔   bal * n_pos > sum_pos
# ---------------------------------------------------------------------------
@register(
    "q22_idle_rich_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sum_pos,
             COUNT(*) AS n_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS total_bal
    FROM customer, avg_bal
    WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * n_pos > sum_pos
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: idle customers with above-average balance, counted per phone country code."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].withColumn("bal_cents", money_cents(F.col("c_acctbal")))
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.sum("bal_cents").alias("sum_pos"), F.count("*").alias("n_pos"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos")
    )
    recent = (
        t["orders"]
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    idle = rich.join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        (F.sum("bal_cents") / 100.0).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# HAVING vs global aggregate (TPC-H q11 shape): suppliers whose
# lineitem revenue exceeds 0.1% of total revenue. Threshold compare is
# integer cross-multiplication: value * 10000 > total.
# ---------------------------------------------------------------------------
@register(
    "q11_major_suppliers",
    """
    WITH sv AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM sv)
    SELECT l_suppkey AS s_suppkey, value_cents / 100.0 AS supplier_value
    FROM sv, tot
    WHERE value_cents * 10000 > total_cents
    """,
)
def q11_major_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: part-supplier value concentrations above a nation-wide threshold fraction."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_suppkey", money_cents(F.col("l_extendedprice")).alias("cents")
    )
    sv = li.groupBy("l_suppkey").agg(F.sum("cents").alias("value_cents"))
    tot = sv.agg(F.sum("value_cents").alias("total_cents"))
    return (
        sv.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            (F.col("value_cents") / 100.0).alias("supplier_value"),
        )
    )


# ---------------------------------------------------------------------------
# Dimension upsert / merge (SCD-1): apply a deterministic update batch
# to the customer dimension — existing keys take the batch's values,
# new keys are inserted — and tag each output row with its change
# type. The batch is synthesized from the dimension itself (every
# 10th key re-segmented, every 97th key cloned to a new key range) so
# both engines derive the identical batch.
#
# Spark plan: full outer join on the key, coalesce per column — the
# standard shuffle-merge a MERGE INTO compiles to without a
# transactional table format underneath.
# ---------------------------------------------------------------------------
@register(
    "merge_upsert_customers",
    """
    WITH updates AS (
      SELECT c_custkey AS key, 'RESEGMENTED' AS mktsegment FROM customer
      WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 10000000, c_mktsegment FROM customer
      WHERE c_custkey % 97 = 0
    )
    SELECT COALESCE(c_custkey, key) AS c_custkey,
           COALESCE(updates.mktsegment, customer.c_mktsegment) AS c_mktsegment,
           CASE WHEN c_custkey IS NULL THEN 'inserted'
                WHEN key IS NULL THEN 'unchanged'
                ELSE 'updated' END AS change_type
    FROM customer FULL OUTER JOIN updates ON c_custkey = key
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert: staged changes applied to customers (update matched, insert new)."""
    c = load_tables(spark, sf_dir)["customer"].select("c_custkey", "c_mktsegment")
    updates = (
        c.where(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_custkey").alias("key"), F.lit("RESEGMENTED").alias("mktsegment"))
        .unionByName(
            c.where(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 10_000_000).alias("key"),
                F.col("c_mktsegment").alias("mktsegment"),
            )
        )
    )
    merged = c.join(updates, c["c_custkey"] == updates["key"], "full_outer")
    return merged.select(
        F.coalesce(F.col("c_custkey"), F.col("key")).alias("c_custkey"),
        F.coalesce(F.col("mktsegment"), F.col("c_mktsegment")).alias("c_mktsegment"),
        F.when(F.col("c_custkey").isNull(), "inserted")
        .when(F.col("key").isNull(), "unchanged")
        .otherwise("updated")
        .alias("change_type"),
    )


# ---------------------------------------------------------------------------
# Window-function variety pack: the analytic-function family beyond
# the row_number/rank/sum tiers already covered (W1-W5) — ntile,
# percent_rank, cume_dist, lag, lead in one pass. The ordering key
# (cents, o_orderkey) is unique, so every function is deterministic.
#
# percent_rank/cume_dist are emitted through INTEGER-EXACT half-up
# rounding of the exact rational — round(a/b, 6) computed as
# (2·a·10^6 + b) div (2·b), then /1e6 — on BOTH engines, not
# ROUND(double, 6). The doubles the engines derive are identical
# (single IEEE division of integer ranks), but their ROUNDs are not:
# Spark rounds the double's SHORTEST DECIMAL REPR (BigDecimal
# HALF_UP), DuckDB rounds the binary value, and at the 100x step's
# 3M-row partitions ~1200 of 15M values landed in the disagreement
# gap (found by the r11 Tier A oracle run at 100x; invisible at
# sf0.01-10x sizes). The integer form is the exact-cents pattern
# (functions/exact_math.py) applied to rank ratios. With the unique
# ordering, rank == row_number, so a = rn-1 / b = n-1 (percent_rank)
# and a = rn / b = n (cume_dist).
# ---------------------------------------------------------------------------
@register(
    "w6_analytic_functions",
    """
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT o_orderkey, o_orderpriority, cents,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             lag(cents) OVER w AS prev_cents,
             lead(cents) OVER w AS next_cents
      FROM o
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey)
    )
    SELECT o_orderkey, o_orderpriority, quartile,
           CASE WHEN n > 1 THEN
             CAST((2 * (rn - 1) * 1000000 + (n - 1)) // (2 * (n - 1)) AS DOUBLE)
               / 1000000.0
           ELSE CAST(0.0 AS DOUBLE) END AS pct_rank,
           CAST((2 * rn * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000.0
             AS cume,
           prev_cents,
           next_cents,
           cents - COALESCE(prev_cents, cents) AS step_cents
    FROM r
    """,
)
def w6_analytic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function battery: lag/lead/first/last/ntile over per-customer order sequences."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        money_cents(F.col("o_totalprice")).alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wp = Window.partitionBy("o_orderpriority")
    lag = F.lag("cents").over(w)
    r = o.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(wp).cast("long").alias("n"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        lag.alias("prev_cents"),
        F.lead("cents").over(w).alias("next_cents"),
    )
    # integer-exact half-up 6dp rounding of the exact rank ratios
    # (header comment): identical BIGINT arithmetic on both engines
    return r.select(
        "o_orderkey",
        "o_orderpriority",
        "quartile",
        F.expr(
            "CASE WHEN n > 1 THEN"
            " CAST((2 * (rn - 1) * 1000000 + (n - 1)) div (2 * (n - 1))"
            " AS DOUBLE) / 1000000.0"
            " ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("pct_rank"),
        F.expr(
            "CAST((2 * rn * 1000000 + n) div (2 * n) AS DOUBLE) / 1000000.0"
        ).alias("cume"),
        "prev_cents",
        "next_cents",
        F.expr("cents - COALESCE(prev_cents, cents)").alias("step_cents"),
    )
