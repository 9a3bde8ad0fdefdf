"""OLAP + sketch analytics tier: grouping sets (ROLLUP/CUBE),
retention cohorts, unpivot, PII masking, and an engine-portable
HyperLogLog distinct sketch.

Every query here has a full DuckDB oracle. The HLL follows the
portable-hash recipe proven by dedup/minhash.py: the hash family is
md5 (identical in every engine), register sums ride as exact
DECIMAL(38) integers (sums of powers of two overflow a double's
53-bit mantissa, so float summation would be order-dependent), and
the only floating-point steps are a fixed expression tree evaluated
identically by both engines, rounded to 4dp.

Scale notes (100 TB):
- ROLLUP/CUBE are single-pass partial-aggregating plans in Spark —
  the grouping-set expansion happens inside the Expand operator
  before the shuffle, so each row is combined map-side.
- The HLL sketch is two aggregations (register max, then register
  sum); state is 256 registers per group regardless of cardinality —
  this is exactly the sketch you'd keep per partition at 100 TB.
- Retention joins each event to its user's first-seen day: the
  first-seen table is user-keyed (small) and the join co-partitions
  on user_id — one shuffle each side, no window over the event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
# HyperLogLog distinct-user sketch per event type (m=256 registers).
#
# Register: bucket = first byte of md5(user_id); rho = 1 + number of
# leading zero bits in the next 60 bits (15 hex chars — 60 bits keeps
# the value inside a signed BIGINT on both engines). Estimator is the
# standard HLL-with-linear-counting-fallback (Flajolet et al. 2007):
#   S = sum over 256 registers of 2^(64-M_j)   (empty register: 2^64)
#   E_raw = alpha_256 * 256^2 * 2^64 / S
#   if E_raw <= 2.5*256 and V>0:  E = 256 * ln(256/V)   (V = empty)
# The sum is computed in DECIMAL(38,0): every term is an exact power
# of two up to 2^64 and the mantissa of a double cannot hold the
# mixed-magnitude sum exactly, so float summation would be
# order-dependent across engines.
#
# The estimate itself is also exact integer arithmetic (r3 — the sf0.1
# sweep caught a 1-ulp double division landing on either side of a
# ROUND(·, 4) tie between engines): alpha_256 is the exact rational
#   0.7213 / (1 + 1.079/256) = 7213·256 / 2570790 = 1846528 / 2570790
# so E_raw·10^4 = N4 / (2570790·S) with N4 = 1846528·65536·2^64·10^4
# (35 digits — fits DECIMAL(38,0)/HUGEINT). hll_estimate is the
# 4dp-FLOORED estimate, floor done by integer division — bit-equal on
# any engine. The linear-counting branch predicate (E_raw <= 2.5·256)
# becomes the exact compare est_scaled <= 640·10^4; the ln() in that
# branch stays float (255 possible inputs, round-to-4dp ties aren't
# realistically hittable, and the small-cardinality gates exercise it).
# ---------------------------------------------------------------------------
_HLL_N4 = str(1846528 * 65536 * 2**64 * 10**4)

_HLL_SQL = f"""
    WITH h AS (
      SELECT event_type,
             md5(CAST(user_id AS VARCHAR)) AS hx,
             user_id
      FROM events
    ),
    r AS (
      SELECT event_type,
             CAST(('0x' || substring(hx, 1, 2)) AS BIGINT) AS bucket,
             CAST(('0x' || substring(hx, 3, 15)) AS BIGINT) AS w
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN w = 0 THEN 61 ELSE 61 - length(bin(w)) END) AS m
      FROM r GROUP BY event_type, bucket
    ),
    agg AS (
      SELECT event_type,
             CAST(SUM(CAST(power(2, 64 - m) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_present,
             COUNT(*) AS n_buckets
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             (256 - n_buckets) AS v,
             CAST('{_HLL_N4}' AS HUGEINT)
               // (2570790 * CAST(s_present + (256 - n_buckets)
                                  * CAST(power(2, 64) AS DECIMAL(38,0)) AS HUGEINT))
               AS est_scaled
      FROM agg
    ),
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM h GROUP BY event_type
    )
    SELECT est.event_type,
           CAST(n_exact AS BIGINT) AS n_exact,
           CASE WHEN est_scaled <= 6400000 AND v > 0
                THEN ROUND(256 * ln(256.0 / v), 4)
                ELSE CAST(est_scaled AS BIGINT) / 10000.0 END AS hll_estimate
    FROM est JOIN ex ON est.event_type = ex.event_type
"""


@register("hll_distinct_users", _HLL_SQL)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog-style distinct-user estimate per event type, with the exact count alongside."""
    e = load_tables(spark, sf_dir)["events"].select("event_type", "user_id")
    h = e.select(
        "event_type",
        "user_id",
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    )
    r = h.select(
        "event_type",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring("hx", 3, 15), 16, 10).cast("bigint").alias("w"),
    )
    regs = r.groupBy("event_type", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(61)).otherwise(
                F.lit(61) - F.length(F.bin(F.col("w")))
            )
        ).alias("m")
    )
    agg = regs.groupBy("event_type").agg(
        F.sum(F.expr("CAST(power(2, 64 - m) AS DECIMAL(38,0))"))
        .cast("decimal(38,0)")
        .alias("s_present"),
        F.count("*").alias("n_buckets"),
    )
    est = agg.select(
        "event_type",
        (F.lit(256) - F.col("n_buckets")).alias("v"),
        F.expr(
            f"CAST(CAST('{_HLL_N4}' AS DECIMAL(38,0)) DIV "
            "(CAST(2570790 AS DECIMAL(38,0)) * "
            "(s_present + (256 - n_buckets) * CAST(power(2, 64) AS DECIMAL(38,0)))) "
            "AS BIGINT)"
        ).alias("est_scaled"),
    )
    ex = h.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_exact"))
    return est.join(ex, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.when(
            (F.col("est_scaled") <= 6400000) & (F.col("v") > 0),
            F.round(F.lit(256) * F.log(F.lit(256.0) / F.col("v")), 4),
        )
        .otherwise(F.col("est_scaled") / F.lit(10000.0))
        .alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# ROLLUP: order revenue by (region, nation) with subtotal rows.
# grouping_id disambiguates real NULLs from subtotal NULLs (none in
# this data, but the column is part of the operator's contract).
# ---------------------------------------------------------------------------
@register(
    "olap_rollup_revenue",
    """
    SELECT r_name, n_name,
           GROUPING(r_name, n_name) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def olap_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation) with subtotal and grand-total rows for order revenue."""
    t = load_tables(spark, sf_dir)
    base = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name", money_cents(F.col("o_totalprice")).alias("cents"))
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            (F.sum("cents") / 100.0).alias("revenue"),
        )
        .select("r_name", "n_name", F.col("gid").cast("long"), "n_orders", "revenue")
    )


# ---------------------------------------------------------------------------
# CUBE: order counts across (order year × status), all marginals.
# ---------------------------------------------------------------------------
@register(
    "olap_cube_orders",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           o_orderstatus,
           GROUPING(EXTRACT(year FROM o_orderdate), o_orderstatus) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS revenue
    FROM orders
    GROUP BY CUBE (EXTRACT(year FROM o_orderdate), o_orderstatus)
    """,
)
def olap_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all grouping-set combinations with counts and revenue."""
    o = load_tables(spark, sf_dir)["orders"].select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        "o_orderstatus",
        money_cents(F.col("o_totalprice")).alias("cents"),
    )
    return (
        o.cube("o_year", "o_orderstatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            (F.sum("cents") / 100.0).alias("revenue"),
        )
        .select("o_year", "o_orderstatus", F.col("gid").cast("long"), "n_orders", "revenue")
    )


# ---------------------------------------------------------------------------
# Retention cohorts: users cohorted by first-seen day; a cohort cell
# counts distinct users active day_offset days after their first day.
# ---------------------------------------------------------------------------
@register(
    "retention_cohorts",
    """
    WITH e AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id
    )
    SELECT cohort_day, (day - cohort_day) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM e JOIN first_seen ON e.user_id = first_seen.user_id
    GROUP BY cohort_day, day_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly signup cohorts x activity month retention matrix from the events table."""
    e = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.expr("ts_sec div 86400").alias("day")
    )
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(first_seen, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Unpivot (wide → long): part metrics to (metric, value) rows. The
# retail price rides as exact cents so the long value column is BIGINT.
# Spark's native unpivot compiles to Expand — map-side, no shuffle;
# the oracle is the portable UNION ALL formulation.
# ---------------------------------------------------------------------------
@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retail_cents', CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)
    FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide part metrics melted to (metric, value) rows via stack/unpivot."""
    p = load_tables(spark, sf_dir)["part"].select(
        "p_partkey",
        F.col("p_size").cast("long").alias("size"),
        money_cents(F.col("p_retailprice")).alias("retail_cents"),
    )
    return p.unpivot("p_partkey", ["size", "retail_cents"], "metric", "value")


# ---------------------------------------------------------------------------
# PII anonymization: direct identifiers masked (digits in the customer
# name become '*' except the last 2 — enough to eyeball joins in a
# debug sample without recovering the id), quasi-identifiers
# generalized (account balance → width-1000-cent bucket), plus the
# bucket's occupancy so a k-anonymity audit can read suppression
# candidates straight off the result. The regexes stay inside the
# dialect subset Java regex and RE2 share.
# ---------------------------------------------------------------------------
@register(
    "pii_mask_customers",
    """
    WITH m AS (
      SELECT c_custkey,
             concat(regexp_replace(substring(c_name, 1, length(c_name) - 2),
                                   '[0-9]', '*', 'g'),
                    substring(c_name, length(c_name) - 1, 2)) AS name_masked,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) // 100000 AS acctbal_bucket
      FROM customer
    )
    SELECT c_custkey, name_masked, acctbal_bucket,
           CAST(COUNT(*) OVER (PARTITION BY acctbal_bucket) AS BIGINT) AS bucket_k
    FROM m
    """,
)
def pii_mask_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII masking: hashed keys, redacted phone/address with format preserved."""
    from pyspark.sql import Window

    c = load_tables(spark, sf_dir)["customer"]
    m = c.select(
        "c_custkey",
        F.concat(
            F.regexp_replace(
                F.expr("substring(c_name, 1, length(c_name) - 2)"), "[0-9]", "*"
            ),
            F.expr("substring(c_name, length(c_name) - 1, 2)"),
        ).alias("name_masked"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) div 100000"
        ).alias("acctbal_bucket"),
    )
    w = Window.partitionBy("acctbal_bucket")
    return m.withColumn("bucket_k", F.count("*").over(w).cast("long"))


# ---------------------------------------------------------------------------
# Count-Min sketch heavy-hitter estimation (depth 4 × width 64,
# md5-derived row hashes). Unlike the HLL (which needs one float
# division), CM is PURE INTEGER end-to-end: registers are counts,
# the estimate is min over depth rows — both engines replay the
# sketch exactly, no rounding anywhere. Estimates are checked against
# the true counts (always estimate >= truth; one-sided CM error).
#
# 100 TB shape: the sketch table is (depth × width) = 256 rows per
# group regardless of stream length; register increments partial-
# aggregate map-side. Querying = 4-row lookup per tracked key.
# ---------------------------------------------------------------------------
_CM_DEPTH = 4
_CM_WIDTH = 64


def _cm_bucket_sql(row: int) -> str:
    # row-seeded md5 → bucket in [0, width)
    return (
        f"CAST(('0x' || substring(md5(concat('{row}|', CAST(user_id AS VARCHAR))), 1, 8)) "
        f"AS BIGINT) % {_CM_WIDTH}"
    )


@register(
    "cm_sketch_user_counts",
    f"""
    WITH regs AS (
      {' UNION ALL '.join(
          f"SELECT {r} AS row_id, {_cm_bucket_sql(r)} AS bucket, COUNT(*) AS c "
          f"FROM events GROUP BY 2"
          for r in range(_CM_DEPTH)
      )}
    ),
    tracked AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 50 = 0
    ),
    lookups AS (
      SELECT t.user_id, r.row_id, r.c
      FROM tracked t JOIN regs r
        ON r.bucket = CAST(('0x' || substring(md5(concat(CAST(r.row_id AS VARCHAR),
                      '|', CAST(t.user_id AS VARCHAR))), 1, 8)) AS BIGINT) % {_CM_WIDTH}
    ),
    est AS (
      SELECT user_id, MIN(c) AS cm_estimate FROM lookups GROUP BY user_id
    ),
    truth AS (
      SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY user_id
    )
    SELECT est.user_id,
           CAST(cm_estimate AS BIGINT) AS cm_estimate,
           CAST(true_count AS BIGINT) AS true_count
    FROM est JOIN truth ON est.user_id = truth.user_id
    """,
)
def cm_sketch_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch per-user event-count estimates joined against the true counts."""
    e = load_tables(spark, sf_dir)["events"].select("user_id")

    def bucket(row: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{row}|"), col.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % _CM_WIDTH
        )

    regs = None
    for r in range(_CM_DEPTH):
        part = e.groupBy(bucket(r, F.col("user_id")).alias("bucket")).agg(
            F.count("*").alias("c")
        ).select(F.lit(r).alias("row_id"), "bucket", "c")
        regs = part if regs is None else regs.unionByName(part)
    tracked = e.where(F.col("user_id") % 50 == 0).distinct()
    lookups = tracked.crossJoin(F.broadcast(regs)).where(
        F.col("bucket")
        == (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("row_id").cast("string"),
                            F.lit("|"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _CM_WIDTH
        )
    )
    est = lookups.groupBy("user_id").agg(F.min("c").alias("cm_estimate"))
    truth = e.groupBy("user_id").agg(F.count("*").alias("true_count"))
    return est.join(truth, "user_id").select(
        "user_id",
        F.col("cm_estimate").cast("long"),
        F.col("true_count").cast("long"),
    )


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching: nearest customer-name neighbors among
# a blocked candidate set. Blocking is two-keyed: name length ±1 AND a
# shared boundary character (same first char OR same last char) — the
# standard multi-key blocking that keeps candidate sets sub-quadratic
# when many strings share one length (exactly what a real seed table
# looks like; a length-only block there degenerates to seeds×corpus).
# A single substitution typo preserves both boundary chars unless it
# hits position 1 or n, and an indel shifts at most one of them, so
# recall for typo-style matches stays high; the block is part of the
# query's declared semantics and the oracle replays it verbatim.
# levenshtein() is exact and identical in both engines; ranking is
# (distance, name) so ties are deterministic.
# ---------------------------------------------------------------------------
@register(
    "fuzzy_name_match",
    """
    WITH seeds AS (
      SELECT c_custkey AS seed_key, c_name AS seed_name FROM customer
      WHERE c_custkey % 200 = 0
    ),
    cands AS (
      SELECT DISTINCT s.seed_key, s.seed_name,
             c.c_custkey AS cand_key, c.c_name AS cand_name
      FROM seeds s JOIN customer c
        ON abs(length(s.seed_name) - length(c.c_name)) <= 1
       AND (substr(s.seed_name, 1, 1) = substr(c.c_name, 1, 1)
            OR right(s.seed_name, 1) = right(c.c_name, 1))
       AND s.seed_key <> c.c_custkey
    ),
    scored AS (
      SELECT *, levenshtein(seed_name, cand_name) AS dist FROM cands
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY seed_key
                                   ORDER BY dist, cand_name, cand_key) AS rk
      FROM scored
    )
    SELECT seed_key, seed_name, cand_key, cand_name,
           CAST(dist AS BIGINT) AS dist, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 Levenshtein-nearest customer names per supplier seed name, blocked by first letter."""
    from pyspark.sql import Window

    c = load_tables(spark, sf_dir)["customer"]
    # BOTH block keys become EQUI join columns: each seed explodes into
    # its three admissible candidate lengths × its two tagged boundary
    # chars; each candidate row carries its exact length and its two
    # tagged boundary chars. The join key is (len, tagged-char), a hash
    # join at any scale — a plain inequality/OR condition would compile
    # to BroadcastNestedLoopJoin (seeds × corpus pair evaluation).
    # Matching via both keys yields duplicate pairs; DISTINCT collapses
    # them before scoring.
    first_of = lambda col: F.concat(F.lit("F:"), F.substring(F.col(col), 1, 1))
    last_of = lambda col: F.concat(F.lit("L:"), F.expr(f"right({col}, 1)"))
    seeds = (
        c.where(F.col("c_custkey") % 200 == 0)
        .select(F.col("c_custkey").alias("seed_key"), F.col("c_name").alias("seed_name"))
        .withColumn(
            "cand_len",
            F.explode(
                F.array(
                    F.length("seed_name") - 1,
                    F.length("seed_name"),
                    F.length("seed_name") + 1,
                )
            ),
        )
        .withColumn(
            "bkey", F.explode(F.array(first_of("seed_name"), last_of("seed_name")))
        )
        .distinct()
    )
    cand_side = c.withColumn(
        "bkey", F.explode(F.array(first_of("c_name"), last_of("c_name")))
    )
    cands = (
        F.broadcast(seeds)
        .join(
            cand_side,
            (F.length("c_name") == F.col("cand_len"))
            & (cand_side["bkey"] == seeds["bkey"]),
        )
        .where(F.col("seed_key") != F.col("c_custkey"))
        .select(
            "seed_key",
            "seed_name",
            F.col("c_custkey").alias("cand_key"),
            F.col("c_name").alias("cand_name"),
        )
        .distinct()
        .withColumn("dist", F.levenshtein("seed_name", "cand_name"))
    )
    w = Window.partitionBy("seed_key").orderBy("dist", "cand_name", "cand_key")
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "seed_key",
            "seed_name",
            "cand_key",
            "cand_name",
            F.col("dist").cast("long"),
            F.col("rk").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Table profiling (data-quality summary): one row per column of the
# orders table — null count, exact distinct count, min/max rendered to
# strings. The single-pass Spark plan computes every column's stats in
# one aggregation (no per-column scans); the oracle mirrors it with a
# stacked UNION ALL. Numeric min/max go through exact cents / integer
# casts so the string rendering is identical across engines.
# ---------------------------------------------------------------------------
@register(
    "profile_orders",
    """
    SELECT 'o_orderkey' AS col,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_cents', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT),
           CAST(MIN(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS VARCHAR),
           CAST(MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling of orders: null count, distinct count, min/max per column as rows."""
    o = load_tables(spark, sf_dir)["orders"]
    cents = money_cents(F.col("o_totalprice"))
    specs = [
        ("o_orderkey", F.col("o_orderkey")),
        ("o_custkey", F.col("o_custkey")),
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_totalprice_cents", cents),
        ("o_orderpriority", F.col("o_orderpriority")),
    ]
    # one aggregation computes every column's stats; min/max aggregate
    # in the column's OWN type (numeric order, not lexicographic) and
    # only the result is rendered to string. The stack to (col, stats)
    # rows is a tiny 1-row explode afterwards.
    aggs = []
    for name, val in specs:
        aggs += [
            (F.count(F.lit(1)) - F.count(val)).alias(f"null_{name}"),
            F.count_distinct(val).alias(f"nd_{name}"),
            F.min(val).cast("string").alias(f"min_{name}"),
            F.max(val).cast("string").alias(f"max_{name}"),
        ]
    wide = o.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col"),
                        F.col(f"null_{name}").cast("long").alias("n_null"),
                        F.col(f"nd_{name}").cast("long").alias("n_distinct"),
                        F.col(f"min_{name}").alias("min_val"),
                        F.col(f"max_{name}").alias("max_val"),
                    )
                    for name, _ in specs
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.col", "s.n_null", "s.n_distinct", "s.min_val", "s.max_val")


# ---------------------------------------------------------------------------
# Exact statistical aggregates: per-segment covariance, Pearson
# correlation, stddev, and OLS slope/intercept of order totalprice
# against item count. Float SUMs are order-dependent, so every moment
# is accumulated as an exact BIGINT (x = whole dollars ≤ ~6·10⁵,
# y = item count ≤ 7: Σx² ≤ 2.5·10¹¹·|G| stays far under 2⁶³); the
# closed forms then use one division and one sqrt on already-final
# integers — IEEE-754 requires sqrt and division to be correctly
# rounded, so both engines produce the identical double bit pattern
# before the 6dp round. This is the textbook "sufficient statistics"
# distributed pattern: one pass, map-side partial sums, no second
# centering pass.
# ---------------------------------------------------------------------------
@register(
    "stat_regression",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice, 0) AS BIGINT) AS x
      FROM orders
    ),
    items AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS y
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT c.c_mktsegment AS seg, o.x, i.y
      FROM o JOIN items i ON i.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    m AS (
      SELECT seg,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM joined GROUP BY seg
    )
    SELECT seg, n,
           ROUND(((1.0 * n) * sxy - (1.0 * sx) * sy) / ((1.0 * n) * n), 6)
             AS covar_pop,
           ROUND(((1.0 * n) * sxy - (1.0 * sx) * sy)
                 / SQRT(((1.0 * n) * sxx - (1.0 * sx) * sx)
                        * ((1.0 * n) * syy - (1.0 * sy) * sy)),
                 6) AS corr,
           ROUND(SQRT((1.0 * n) * sxx - (1.0 * sx) * sx) / n, 6) AS stddev_pop_x,
           ROUND(((1.0 * n) * sxy - (1.0 * sx) * sy)
                 / ((1.0 * n) * sxx - (1.0 * sx) * sx), 6) AS slope,
           ROUND((sy - ((1.0 * n) * sxy - (1.0 * sx) * sy)
                       / ((1.0 * n) * sxx - (1.0 * sx) * sx) * sx)
                 / n, 6) AS intercept
    FROM m
    """,
)
def stat_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment exact moments → covar/corr/stddev/OLS fit."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice"), 0).cast("long").alias("x"),
    )
    items = t["lineitem"].groupBy("l_orderkey").agg(F.count("*").alias("y"))
    joined = (
        o.join(items, items.l_orderkey == o.o_orderkey)
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(F.col("c_mktsegment").alias("seg"), "x", "y")
    )
    m = joined.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # every product promotes to DOUBLE before multiplying: sx*sx as
    # BIGINT overflows at sf>=0.1 (sx ~ 4.5e9 per segment), and the
    # engines disagree on overflow (DuckDB promotes to HUGEINT, Spark
    # wraps). Double products are correctly rounded, and both engines
    # evaluate the SAME left-associated tree -> identical bits.
    one = F.lit(1.0)
    cov_num = (one * n) * sxy - (one * sx) * sy
    varx = (one * n) * sxx - (one * sx) * sx
    vary = (one * n) * syy - (one * sy) * sy
    slope = cov_num / varx
    return m.select(
        "seg",
        "n",
        F.round(cov_num / ((one * n) * n), 6).alias("covar_pop"),
        F.round(cov_num / F.sqrt(varx * vary), 6).alias("corr"),
        F.round(F.sqrt(varx) / n, 6).alias("stddev_pop_x"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - cov_num / varx * sx) / n, 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Market-basket association rules over co-ordered parts: support,
# confidence, and lift for pair rules a ⇒ b — the classic retail
# affinity workload (Agrawal & Srikant's Apriori output shape for
# k=2). All three metrics are single divisions of exact integer
# counts (round 6); lift's n·cnt_ab product stays far inside BIGINT.
# Scale shape: the pair expansion is the same per-order self-join the
# co-order graph uses (fan-out bounded by order width, ~7 items), one
# groupBy on the pair, then item counts broadcast back onto the pair
# table. Min-support pruning (Apriori's core trick) applies BEFORE
# the metric joins, so low-support noise never reaches the join.
# ---------------------------------------------------------------------------
BASKET_MIN_PAIR = 3
BASKET_TOPK = 50


@register(
    "basket_association_rules",
    f"""
    WITH n AS (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders FROM orders),
    item AS (
      SELECT l_partkey AS item, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ),
    pair AS (
      SELECT a.l_partkey AS ia, b.l_partkey AS ib,
             CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS cnt_ab
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= {BASKET_MIN_PAIR}
    ),
    scored AS (
      SELECT p.ia, p.ib, p.cnt_ab, xa.cnt AS cnt_a, xb.cnt AS cnt_b, n.n_orders,
             ROUND(p.cnt_ab / (1.0 * n.n_orders), 6) AS support,
             ROUND(p.cnt_ab / (1.0 * xa.cnt), 6) AS confidence,
             ROUND((p.cnt_ab * n.n_orders) / (1.0 * xa.cnt * xb.cnt), 6) AS lift
      FROM pair p JOIN item xa ON xa.item = p.ia
      JOIN item xb ON xb.item = p.ib
      CROSS JOIN n
    )
    SELECT ia, ib, cnt_ab, cnt_a, cnt_b, support, confidence, lift,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY lift DESC, cnt_ab DESC, ia ASC, ib ASC) AS rnk
      FROM scored
    )
    WHERE rnk <= {BASKET_TOPK}
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top pair rules by lift over co-ordered parts."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_partkey")
    n = t["orders"].agg(F.countDistinct("o_orderkey").alias("n_orders"))
    item = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.countDistinct("l_orderkey").alias("cnt")
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("ia"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("ib"))
    pair = (
        a.join(b, "ok")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.countDistinct("ok").alias("cnt_ab"))
        .where(F.col("cnt_ab") >= BASKET_MIN_PAIR)
    )
    scored = (
        pair.join(
            F.broadcast(item.select(F.col("item").alias("ia"), F.col("cnt").alias("cnt_a"))),
            "ia",
        )
        .join(
            F.broadcast(item.select(F.col("item").alias("ib"), F.col("cnt").alias("cnt_b"))),
            "ib",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "ia",
            "ib",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            "n_orders",
            F.round(F.col("cnt_ab") / (F.lit(1.0) * F.col("n_orders")), 6).alias(
                "support"
            ),
            F.round(F.col("cnt_ab") / (F.lit(1.0) * F.col("cnt_a")), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("cnt_ab") * F.col("n_orders"))
                / (F.lit(1.0) * F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )
    w = Window.orderBy(
        F.desc("lift"), F.desc("cnt_ab"), F.asc("ia"), F.asc("ib")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= BASKET_TOPK)
        .drop("n_orders")
    )


# ---------------------------------------------------------------------------
# Market concentration: the Herfindahl–Hirschman index of supplier
# revenue share per nation — Σ share² over suppliers, the standard
# antitrust/market-structure metric. Shares are exact-cents ratios;
# HHI is a sum of squared DOUBLE ratios, which IS order-sensitive in
# general — so the sum is computed over integer-scaled share values
# (share in basis points as BIGINT, squared exactly) and divided once
# at the end: associative, bit-identical under any partial-agg order.
# One fact aggregation + one nation rollup.
# ---------------------------------------------------------------------------
@register(
    "supplier_hhi",
    """
    WITH rev AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT nation, CAST(SUM(cents) AS BIGINT) AS tot_cents FROM rev GROUP BY nation
    ),
    share AS (
      SELECT r.nation,
             CAST((r.cents * 1000000) // t.tot_cents AS BIGINT) AS share_ppm
      FROM rev r JOIN tot t ON t.nation = r.nation
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(share_ppm * share_ppm) / 1000000000000.0, 6) AS hhi
    FROM share GROUP BY nation
    """,
)
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier revenue concentration (HHI in [0, 1])."""
    from erkg_tutorials_spark.functions.exact_math import money_cents

    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy(
            F.col("s_nationkey").alias("nation"), F.col("l_suppkey").alias("supp")
        )
        .agg(F.sum(money_cents(F.col("l_extendedprice"))).alias("cents"))
    )
    tot = rev.groupBy("nation").agg(F.sum("cents").alias("tot_cents"))
    share = rev.join(F.broadcast(tot), "nation").select(
        "nation",
        F.expr("(cents * 1000000) div tot_cents").alias("share_ppm"),
    )
    return share.groupBy("nation").agg(
        F.count("*").alias("n_suppliers"),
        F.round(
            F.sum(F.col("share_ppm") * F.col("share_ppm")) / F.lit(1e12), 6
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# Exact nearest-rank percentiles via histogram counting — the
# scale pattern that replaces a global sort. approx_percentile /
# percentile_approx sketches are not cross-engine reproducible, and a
# true sort of the fact table is a full-data exchange; instead the
# fact rows collapse to a (group, value) -> count histogram first
# (map-side partial agg; the distinct-value domain is orders of
# magnitude smaller than the row count), then ONE window over the
# tiny histogram computes cumulative counts, and the percentile is
# the minimal value whose cumulative count reaches ceil(q*n) —
# nearest-rank definition, exact in integers (ceil(q*n) =
# (n*q_pct + 99) div 100, no floats anywhere until the final /100.0
# cents display division). Scale shape: one groupBy shuffle on
# (group, cents) + a per-group window over distinct values; the raw
# fact table is never sorted or re-shuffled whole.
# ---------------------------------------------------------------------------
_PCTS = (50, 90, 99)


@register(
    "exact_percentiles_orders",
    f"""
    WITH hist AS (
      SELECT o_orderpriority AS priority,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    cum AS (
      SELECT priority, cents, c,
             SUM(c) OVER (PARTITION BY priority ORDER BY cents) AS cum,
             SUM(c) OVER (PARTITION BY priority) AS n
      FROM hist
    )
    SELECT priority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           {", ".join(
               f"MIN(CASE WHEN cum >= (n * {p} + 99) // 100 THEN cents END) / 100.0 AS p{p}"
               for p in _PCTS
           )}
    FROM cum GROUP BY priority
    """,
)
def exact_percentiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 of order value per priority,
    via the histogram-counting pattern (no sort, no sketch)."""
    o = load_tables(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("priority"),
        money_cents(F.col("o_totalprice")).alias("cents"),
    )
    hist = o.groupBy("priority", "cents").agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("priority").orderBy("cents")
    w_all = Window.partitionBy("priority")
    cum = hist.select(
        "priority",
        "cents",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_orders")] + [
        (
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {p} + 99) div 100"), F.col("cents")
                )
            )
            / 100.0
        ).alias(f"p{p}")
        for p in _PCTS
    ]
    return cum.groupBy("priority").agg(*aggs)


# ---------------------------------------------------------------------------
# HLL MERGE: union of the five per-type sketches by register max —
# the mergeability property that makes sketches work at 100 TB (per
# partition/day/shard sketches combine without touching raw data;
# the union estimate comes from the merged 256 registers alone). The
# raw rows feed ONLY the per-type register build (the same one
# hll_distinct_users runs); everything after operates on <= 5*256
# register rows.
# ---------------------------------------------------------------------------
_HLL_UNION_SQL = f"""
    WITH h AS (
      SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx, user_id FROM events
    ),
    r AS (
      SELECT event_type,
             CAST(('0x' || substring(hx, 1, 2)) AS BIGINT) AS bucket,
             CAST(('0x' || substring(hx, 3, 15)) AS BIGINT) AS w
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN w = 0 THEN 61 ELSE 61 - length(bin(w)) END) AS m
      FROM r GROUP BY event_type, bucket
    ),
    merged AS (
      SELECT bucket, MAX(m) AS m FROM regs GROUP BY bucket
    ),
    agg AS (
      SELECT CAST(SUM(CAST(power(2, 64 - m) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_present,
             COUNT(*) AS n_buckets
      FROM merged
    ),
    est AS (
      SELECT (256 - n_buckets) AS v,
             CAST('{{n4}}' AS HUGEINT)
               // (2570790 * CAST(s_present + (256 - n_buckets)
                                  * CAST(power(2, 64) AS DECIMAL(38,0)) AS HUGEINT))
               AS est_scaled
      FROM agg
    ),
    ex AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM h),
    ns AS (SELECT COUNT(DISTINCT event_type) AS n_sketches FROM regs)
    SELECT CAST(ns.n_sketches AS BIGINT) AS n_sketches,
           CAST(ex.n_exact AS BIGINT) AS n_exact,
           CASE WHEN est_scaled <= 6400000 AND v > 0
                THEN ROUND(256 * ln(256.0 / v), 4)
                ELSE CAST(est_scaled AS BIGINT) / 10000.0 END AS hll_union_estimate
    FROM est CROSS JOIN ex CROSS JOIN ns
""".replace("{n4}", _HLL_N4)


@register("hll_union_users", _HLL_UNION_SQL)
def hll_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users across ALL event types, estimated by MERGING the
    per-type HLL sketches (register max) — no second pass over rows."""
    e = load_tables(spark, sf_dir)["events"].select("event_type", "user_id")
    h = e.select(
        "event_type",
        "user_id",
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    )
    r = h.select(
        "event_type",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring("hx", 3, 15), 16, 10).cast("bigint").alias("w"),
    )
    regs = r.groupBy("event_type", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(61)).otherwise(
                F.lit(61) - F.length(F.bin(F.col("w")))
            )
        ).alias("m")
    )
    merged = regs.groupBy("bucket").agg(F.max("m").alias("m"))
    agg = merged.agg(
        F.sum(F.expr("CAST(power(2, 64 - m) AS DECIMAL(38,0))"))
        .cast("decimal(38,0)")
        .alias("s_present"),
        F.count("*").alias("n_buckets"),
    )
    est = agg.select(
        (F.lit(256) - F.col("n_buckets")).alias("v"),
        F.expr(
            f"CAST(CAST('{_HLL_N4}' AS DECIMAL(38,0)) DIV "
            "(CAST(2570790 AS DECIMAL(38,0)) * "
            "(s_present + (256 - n_buckets) * CAST(power(2, 64) AS DECIMAL(38,0)))) "
            "AS BIGINT)"
        ).alias("est_scaled"),
    )
    ex = h.agg(F.count_distinct("user_id").alias("n_exact"))
    ns = regs.agg(F.count_distinct("event_type").alias("n_sketches"))
    return (
        est.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(ns))
        .select(
            F.col("n_sketches").cast("long").alias("n_sketches"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.when(
                (F.col("est_scaled") <= 6400000) & (F.col("v") > 0),
                F.round(F.lit(256) * F.log(F.lit(256.0) / F.col("v")), 4),
            )
            .otherwise(F.col("est_scaled") / F.lit(10000.0))
            .alias("hll_union_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over a quasi-identifier tuple (Sweeney 2002,
# "k-Anonymity: a model for protecting privacy" — public paper): the
# privacy gate a dataset must pass before the pii_mask_customers
# release step. A (nation, segment, balance-band) equivalence class
# smaller than K re-identifies its members; the audit reports every
# violating class plus its size — one groupBy, scan-side banding,
# scale-trivial.
# ---------------------------------------------------------------------------
KANON_K = 5
KANON_BAND_CENTS = 200_000  # $2000 balance bands


@register(
    "kanonymity_violations",
    f"""
    WITH classes AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) // {KANON_BAND_CENTS} AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS class_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT nationkey, segment, bal_band, class_size
    FROM classes WHERE class_size < {KANON_K}
    """,
)
def kanonymity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: quasi-identifier equivalence classes (nation, segment, balance band) smaller than K, i.e. re-identifiable groups."""
    c = load_tables(spark, sf_dir)["customer"]
    classes = (
        c.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            # truncation toward zero on BOTH sides: DuckDB's integer
            # `//` truncates (−150000 // 200000 = 0, not −1), and
            # cast(double) truncates the same way, so negative
            # balances land in band 0/−1/… identically
            (money_cents(F.col("c_acctbal")) / F.lit(KANON_BAND_CENTS))
            .cast("bigint")
            .alias("bal_band"),
        )
        .groupBy("nationkey", "segment", "bal_band")
        .agg(F.count("*").alias("class_size"))
    )
    return classes.where(F.col("class_size") < KANON_K)


# ---------------------------------------------------------------------------
# Sketch-based audience INTERSECTION via inclusion-exclusion:
# |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), each estimate from the same
# fixed-point HLL pipeline as hll_union_users (md5 registers, exact
# DECIMAL(38,0) harmonic sum, HUGEINT-safe scaled division, linear
# counting below the small-range threshold). This is the 100 TB twin
# of audience_overlap_bitmap: the exact bitmap needs the full id sets
# co-shuffled; the sketch path needs only the 256-register summaries,
# which union by register-max and never touch rows again. The exact
# intersection count rides alongside so the oracle pins both the
# arithmetic and the estimate's determinism (every input to the
# float ln()/rounding is an integer both engines derive identically).
# ---------------------------------------------------------------------------
_HLL_PAIR = ("view", "click")


def _hll_est_sql(regs: str) -> str:
    """DuckDB est pipeline over a (bucket, m) register CTE ``regs`` —
    the exact expression hll_union_users uses, parameterized."""
    return f"""(
      SELECT CASE WHEN est_scaled <= 6400000 AND v > 0
                  THEN ROUND(256 * ln(256.0 / v), 4)
                  ELSE CAST(est_scaled AS BIGINT) / 10000.0 END
      FROM (
        SELECT (256 - nb) AS v,
               CAST('{_HLL_N4}' AS HUGEINT)
                 // (2570790 * CAST(s + (256 - nb)
                     * CAST(power(2, 64) AS DECIMAL(38,0)) AS HUGEINT))
                 AS est_scaled
        FROM (
          SELECT CAST(SUM(CAST(power(2, 64 - m) AS DECIMAL(38,0)))
                   AS DECIMAL(38,0)) AS s,
                 COUNT(*) AS nb
          FROM {regs}
        )
      )
    )"""


@register(
    "hll_intersect_users",
    f"""
    WITH h AS (
      SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx, user_id
      FROM events WHERE event_type IN ('{_HLL_PAIR[0]}', '{_HLL_PAIR[1]}')
    ),
    r AS (
      SELECT event_type,
             CAST(('0x' || substring(hx, 1, 2)) AS BIGINT) AS bucket,
             CAST(('0x' || substring(hx, 3, 15)) AS BIGINT) AS w
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN w = 0 THEN 61 ELSE 61 - length(bin(w)) END) AS m
      FROM r GROUP BY event_type, bucket
    ),
    ra AS (SELECT bucket, m FROM regs WHERE event_type = '{_HLL_PAIR[0]}'),
    rb AS (SELECT bucket, m FROM regs WHERE event_type = '{_HLL_PAIR[1]}'),
    ru AS (SELECT bucket, MAX(m) AS m FROM regs GROUP BY bucket),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM (
        SELECT user_id FROM h WHERE event_type = '{_HLL_PAIR[0]}'
        INTERSECT
        SELECT user_id FROM h WHERE event_type = '{_HLL_PAIR[1]}'
      )
    )
    SELECT ex.n_exact AS n_exact_intersection,
           {_hll_est_sql('ra')} AS est_a,
           {_hll_est_sql('rb')} AS est_b,
           {_hll_est_sql('ru')} AS est_union,
           ROUND({_hll_est_sql('ra')} + {_hll_est_sql('rb')}
                 - {_hll_est_sql('ru')}, 4) AS hll_intersect_estimate
    FROM ex
    """,
)
def hll_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience intersection of two event types estimated by HLL inclusion-exclusion (register-only math), with the exact count alongside."""
    a, b = _HLL_PAIR
    e = (
        load_tables(spark, sf_dir)["events"]
        .where(F.col("event_type").isin(a, b))
        .select("event_type", "user_id")
    )
    h = e.withColumn("hx", F.md5(F.col("user_id").cast("string")))
    r = h.select(
        "event_type",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint").alias("bucket"),
        F.conv(F.substring("hx", 3, 15), 16, 10).cast("bigint").alias("w"),
    )
    regs = r.groupBy("event_type", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(61)).otherwise(
                F.lit(61) - F.length(F.bin(F.col("w")))
            )
        ).alias("m")
    )

    def est(reg_df: DataFrame, name: str) -> DataFrame:
        agg = reg_df.agg(
            F.sum(F.expr("CAST(power(2, 64 - m) AS DECIMAL(38,0))"))
            .cast("decimal(38,0)")
            .alias("s"),
            F.count("*").alias("nb"),
        )
        return agg.select(
            F.when(
                (
                    F.expr(
                        f"CAST(CAST('{_HLL_N4}' AS DECIMAL(38,0)) DIV "
                        "(CAST(2570790 AS DECIMAL(38,0)) * "
                        "(s + (256 - nb) * CAST(power(2, 64) AS DECIMAL(38,0)))) AS BIGINT)"
                    )
                    <= 6400000
                )
                & (F.lit(256) - F.col("nb") > 0),
                F.round(
                    F.lit(256) * F.log(F.lit(256.0) / (F.lit(256) - F.col("nb"))),
                    4,
                ),
            )
            .otherwise(
                F.expr(
                    f"CAST(CAST('{_HLL_N4}' AS DECIMAL(38,0)) DIV "
                    "(CAST(2570790 AS DECIMAL(38,0)) * "
                    "(s + (256 - nb) * CAST(power(2, 64) AS DECIMAL(38,0)))) AS BIGINT)"
                )
                / F.lit(10000.0)
            )
            .alias(name)
        )

    ea = est(regs.where(F.col("event_type") == a).select("bucket", "m"), "est_a")
    eb = est(regs.where(F.col("event_type") == b).select("bucket", "m"), "est_b")
    eu = est(
        regs.groupBy("bucket").agg(F.max("m").alias("m")).select("bucket", "m"),
        "est_union",
    )
    users_a = h.where(F.col("event_type") == a).select("user_id").distinct()
    users_b = h.where(F.col("event_type") == b).select("user_id").distinct()
    ex = (
        users_a.intersect(users_b)
        .agg(F.count("*").alias("n_exact_intersection"))
    )
    return (
        ex.crossJoin(F.broadcast(ea))
        .crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            F.col("n_exact_intersection").cast("long"),
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("hll_intersect_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (the third OLAP grouping API next to CUBE and
# ROLLUP): an asymmetric set list CUBE can't express without waste —
# (year, status), (year, priority), (year), () — with GROUPING_ID
# disambiguating the null-as-total rows. One pass, Spark expands the
# sets inside a single Expand+HashAggregate (no N-scan union).
# ---------------------------------------------------------------------------
@register(
    "olap_grouping_sets",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           o_orderstatus,
           o_orderpriority,
           GROUPING(EXTRACT(year FROM o_orderdate), o_orderstatus,
                    o_orderpriority) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS (
      (EXTRACT(year FROM o_orderdate), o_orderstatus),
      (EXTRACT(year FROM o_orderdate), o_orderpriority),
      (EXTRACT(year FROM o_orderdate)),
      ()
    )
    """,
)
def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric GROUPING SETS over orders: (year,status), (year,priority), (year), () with GROUPING_ID and exact-cents revenue."""
    o = load_tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               o_orderstatus,
               o_orderpriority,
               CAST(grouping_id(year(o_orderdate), o_orderstatus,
                                o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    / 100.0 AS DOUBLE) AS revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS (
          (year(o_orderdate), o_orderstatus),
          (year(o_orderdate), o_orderpriority),
          (year(o_orderdate)),
          ()
        )
        """
    )
