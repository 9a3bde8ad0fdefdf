"""Second analytics tier: classic large-scale patterns that the
first tiers don't yet exercise — two-pass exact heavy hitters
(Misra-Gries candidate pruning + exact verify), rolling distinct
counts via the explode-contribution trick (no range join), Markov
event-transition matrices, sweep-line peak concurrency, 2D skyline
(Pareto frontier) via running-max windows, cross-document duplicated
n-gram spans (Lee et al. 2022-style substring dedup signal), and the
Gram-matrix (X^T X) aggregation that underlies distributed PCA.

Every query has a full DuckDB oracle; floats only appear in final
per-row divisions of already-exact integers (the money_cents recipe,
`functions/exact_math.py`).

Scale notes (100 TB):
- heavy_hitters_users: pass 1 is a Misra-Gries summary per
  partition (bounded O(K) state regardless of key cardinality — the
  point at 100 TB, where a groupBy over all keys would shuffle every
  distinct key); the merged candidate set is guaranteed a superset
  of all true heavy hitters by the averaging argument (if global
  freq > n/K then some partition has freq_p > n_p/K, and MG with K
  counters never evicts such a key). Pass 2 exact-counts ONLY the
  broadcast candidates, so the output is exact and oracle-equal while
  the shuffle carries at most K x partitions keys.
- rolling_distinct_users_7d: a trailing-window COUNT(DISTINCT) is
  re-expressed as explode(day..day+6) + groupBy — 7x the *distinct*
  (type, user, day) rows, one shuffle, no O(days x rows) range join
  and no per-day re-scan.
- peak_open_orders: interval overlap via sweep-line — intervals
  collapse to a +1/-1 per-day delta histogram map-side; the window
  runs over the tiny (group, day) domain, never the fact table.
- skyline_parts: the 2D Pareto frontier needs no pairwise dominance
  join — one sort per group and two running-max windows.
- embedding_gram_matrix: X^T X by explode + self-join on the row
  key + partial-aggregated groupBy — the shuffle carries d(d+1)/2
  rows total, independent of row count. This is the covariance
  pattern for PCA/whitening at any scale.
"""

from __future__ import annotations

import pandas as pd
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
# Two-pass exact heavy hitters: Misra-Gries candidate pruning, then
# an exact count restricted to the (broadcast) candidate set.
# Output = every user with count * K > n, with exact counts — so the
# oracle is a plain GROUP BY / HAVING, independent of the pruning.
# ---------------------------------------------------------------------------
HH_K = 2000


def misra_gries_candidates(batches, column: str, k: int = HH_K):
    """Streaming Misra-Gries over an iterator of pandas batches.

    State is capped at ``k`` counters: on overflow the (k+1)-th
    largest count is subtracted from every counter and non-positive
    entries are dropped. Any key whose partition frequency exceeds
    n_p/(k+1) is guaranteed to survive (each decrement round removes
    the same amount from > k keys, so total decrement <= n_p/(k+1)).
    """
    counters: dict = {}
    for pdf in batches:
        for key, c in pdf[column].value_counts().items():
            counters[key] = counters.get(key, 0) + int(c)
        if len(counters) > k:
            d = sorted(counters.values(), reverse=True)[k]
            counters = {u: v - d for u, v in counters.items() if v > d}
    yield pd.DataFrame({column: list(counters.keys())})


@register(
    "heavy_hitters_users",
    f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events)
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS cnt, MAX(n.n_total) AS n_total
    FROM events e CROSS JOIN n
    GROUP BY e.user_id
    HAVING COUNT(*) * {HH_K} > MAX(n.n_total)
    """,
)
def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with strictly more than n/{K} of all events, exactly.

    Pass 1 (Misra-Gries summaries, O(K) state per partition) only
    prunes; pass 2 exact-counts the broadcast candidates, so the
    result is identical to the full groupBy — but the shuffle carries
    candidates only.
    """
    e = load_tables(spark, sf_dir)["events"].select("user_id")

    def mg(batches):
        yield from misra_gries_candidates(batches, "user_id", HH_K)

    cand = e.mapInPandas(mg, "user_id bigint").distinct()
    counts = (
        e.join(F.broadcast(cand), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    n = e.agg(F.count("*").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(n))
        .where(F.col("cnt") * HH_K > F.col("n_total"))
        .select("user_id", "cnt", "n_total")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users per event type, via the
# explode-contribution trick: each distinct (type, user, day) row
# contributes to the 7 window-end days day..day+6; one groupBy
# computes every window. Output keeps only days the type was active.
# ---------------------------------------------------------------------------
@register(
    "rolling_distinct_users_7d",
    """
    WITH du AS (
      SELECT DISTINCT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
             user_id
      FROM events
    ),
    days AS (SELECT DISTINCT event_type, day FROM du)
    SELECT d.event_type, d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS users_7d
    FROM days d
    JOIN du u ON u.event_type = d.event_type AND u.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1, 2
    """,
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per event type.

    COUNT(DISTINCT) over a sliding window has no direct window-frame
    form; the scalable plan explodes each distinct (type, user, day)
    into its 7 contribution days and aggregates once — the oracle
    states the same result as a (quadratic) range join.
    """
    du = (
        load_tables(spark, sf_dir)["events"]
        .select("event_type", F.expr("ts_sec div 86400").alias("day"), "user_id")
        .distinct()
    )
    contrib = du.select(
        "event_type",
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6))).alias("d"),
    )
    days = du.select("event_type", F.col("day").alias("d")).distinct()
    return (
        contrib.join(days, ["event_type", "d"], "left_semi")
        .groupBy("event_type", F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


# ---------------------------------------------------------------------------
# Markov transition matrix of event types: P(next | current) from
# each user's time-ordered event sequence.
# ---------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c_pair
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    )
    SELECT cur, nxt, c_pair,
           CAST(SUM(c_pair) OVER (PARTITION BY cur) AS BIGINT) AS c_from,
           ROUND(c_pair * 1.0 / SUM(c_pair) OVER (PARTITION BY cur), 6) AS p_cond
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | current) over per-user event sequences.

    One shuffle by user_id for the sequence window (the natural
    partitioning — each user's history is processed where it lands),
    then a count over the tiny |types|^2 domain; the division happens
    once per output row on final integers.
    """
    e = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "ts_ns", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count("*").alias("c_pair"))
    wc = Window.partitionBy("cur")
    return c.select(
        "cur",
        "nxt",
        "c_pair",
        F.sum("c_pair").over(wc).alias("c_from"),
        F.round(F.col("c_pair") / F.sum("c_pair").over(wc), 6).alias("p_cond"),
    )


# ---------------------------------------------------------------------------
# Peak concurrent open orders per priority, sweep-line style. An
# order is open from o_orderdate until its last lineitem ships.
# ---------------------------------------------------------------------------
@register(
    "peak_open_orders",
    """
    WITH closes AS (
      SELECT l_orderkey, MAX(l_shipdate) AS close_date FROM lineitem GROUP BY 1
    ),
    iv AS (
      SELECT o.o_orderpriority AS priority,
             CAST(datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS BIGINT) AS sd,
             CAST(datediff('day', DATE '1970-01-01', CAST(c.close_date AS DATE)) AS BIGINT) + 1 AS ed
      FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey
    ),
    deltas AS (
      SELECT priority, sd AS day, 1 AS delta FROM iv
      UNION ALL
      SELECT priority, ed AS day, -1 AS delta FROM iv
    ),
    daily AS (
      SELECT priority, day, CAST(SUM(delta) AS BIGINT) AS delta
      FROM deltas GROUP BY 1, 2
    ),
    run AS (
      SELECT priority, day,
             SUM(delta) OVER (PARTITION BY priority ORDER BY day) AS open_orders
      FROM daily
    ),
    peak AS (SELECT priority, MAX(open_orders) AS peak FROM run GROUP BY 1)
    SELECT r.priority, CAST(p.peak AS BIGINT) AS peak,
           strftime(DATE '1970-01-01' + CAST(MIN(r.day) AS INTEGER), '%Y-%m-%d')
             AS first_peak_day
    FROM run r JOIN peak p ON p.priority = r.priority AND r.open_orders = p.peak
    GROUP BY 1, 2
    """,
)
def peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max simultaneously-open orders per priority + first day it hits.

    Sweep-line: each interval becomes a +1/-1 delta, deltas collapse
    to a per-(priority, day) histogram with map-side combine, and one
    window over that tiny domain yields the running concurrency. The
    fact tables are never sorted or windowed directly.
    """
    t = load_tables(spark, sf_dir)
    epoch = F.to_date(F.lit("1970-01-01"))
    closes = t["lineitem"].groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("close_date")
    )
    iv = (
        t["orders"]
        .join(closes, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("o_orderdate"), epoch).cast("long").alias("sd"),
            (F.datediff(F.col("close_date"), epoch).cast("long") + 1).alias("ed"),
        )
    )
    deltas = iv.select(
        "priority", F.col("sd").alias("day"), F.lit(1).alias("delta")
    ).unionAll(iv.select("priority", F.col("ed").alias("day"), F.lit(-1).alias("delta")))
    daily = deltas.groupBy("priority", "day").agg(F.sum("delta").alias("delta"))
    w = Window.partitionBy("priority").orderBy("day")
    run = daily.select(
        "priority", "day", F.sum("delta").over(w).alias("open_orders")
    )
    peak = run.groupBy(F.col("priority").alias("p_prio")).agg(
        F.max("open_orders").alias("peak")
    )
    return (
        run.join(
            F.broadcast(peak),
            (F.col("priority") == F.col("p_prio"))
            & (F.col("open_orders") == F.col("peak")),
        )
        .groupBy("priority", F.col("peak").cast("long").alias("peak"))
        .agg(
            F.date_format(
                F.date_add(epoch, F.min("day").cast("int")), "yyyy-MM-dd"
            ).alias("first_peak_day")
        )
    )


# ---------------------------------------------------------------------------
# 2D skyline (Pareto frontier) per brand: minimize price, maximize
# size. No pairwise dominance join — two running-max windows.
# ---------------------------------------------------------------------------
@register(
    "skyline_parts",
    """
    WITH p AS (
      SELECT p_brand, p_partkey,
             CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS cents, p_size
      FROM part
    ),
    sk AS (
      SELECT *,
             MAX(p_size) OVER (PARTITION BY p_brand ORDER BY cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_less,
             MAX(p_size) OVER (PARTITION BY p_brand, cents) AS m_eq
      FROM p
    )
    SELECT p_brand, p_partkey, cents / 100.0 AS price, p_size
    FROM sk
    WHERE (m_less IS NULL OR m_less < p_size) AND p_size = m_eq
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts per brand (cheapest-for-their-size).

    A part is dominated iff a strictly cheaper part is at least as
    large, or an equal-priced part is strictly larger. Both checks are
    running-max windows over one per-brand sort — O(n log n), versus
    the O(n^2) NOT EXISTS the oracle would naively use.
    """
    p = load_tables(spark, sf_dir)["part"].select(
        "p_brand",
        "p_partkey",
        money_cents(F.col("p_retailprice")).alias("cents"),
        "p_size",
    )
    w_less = (
        Window.partitionBy("p_brand")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("p_brand", "cents")
    sk = p.select(
        "p_brand",
        "p_partkey",
        "cents",
        "p_size",
        F.max("p_size").over(w_less).alias("m_less"),
        F.max("p_size").over(w_eq).alias("m_eq"),
    )
    return sk.where(
        (F.col("m_less").isNull() | (F.col("m_less") < F.col("p_size")))
        & (F.col("p_size") == F.col("m_eq"))
    ).select(
        "p_brand", "p_partkey", (F.col("cents") / 100.0).alias("price"), "p_size"
    )


# ---------------------------------------------------------------------------
# Cross-document duplicated word-5-gram spans — the signal behind
# substring-level training-data dedup (Lee et al. 2022): which exact
# spans repeat across distinct documents, and how often.
# ---------------------------------------------------------------------------
_NGRAM_N = 5


def _lead_concat_sql() -> str:
    leads = " || ' ' || ".join(
        ["term"] + [f"LEAD(term, {k}) OVER w" for k in range(1, _NGRAM_N)]
    )
    return f"""
    , g AS (
      SELECT doc_id, {leads} AS gram,
             LEAD(term, {_NGRAM_N - 1}) OVER w AS t_last
      FROM pos
      WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    )
    SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM g WHERE t_last IS NOT NULL
    GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    """


def _duplicated_ngrams_oracle() -> str:
    from erkg_tutorials_spark.plans.llmops import _POS_CTE

    return _POS_CTE + _lead_concat_sql()


@register("dedup_duplicated_ngrams", _duplicated_ngrams_oracle())
def dedup_duplicated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-5-gram spans appearing in >= 2 distinct documents.

    Sliding n-grams come from LEAD windows inside each document's
    partition (documents are the natural unit of parallelism — no
    cross-doc data motion to build grams), then one gram-keyed count
    with map-side combine. Common-gram skew only ever concentrates
    counters, not rows, because the combine is partial.
    """
    from erkg_tutorials_spark.plans.llmops import _positions

    pos = _positions(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("i")
    parts = [F.col("term")] + [
        F.lead("term", k).over(w) for k in range(1, _NGRAM_N)
    ]
    g = pos.select(
        "doc_id",
        F.when(
            F.lead("term", _NGRAM_N - 1).over(w).isNotNull(),
            F.concat_ws(" ", *parts),
        ).alias("gram"),
    ).where(F.col("gram").isNotNull())
    return (
        g.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Gram matrix X^T X over the embedding table — the aggregation that
# powers distributed PCA / whitening. Elements are quantized to 1e-6
# so the sums are exact integers (order-independent across engines).
# ---------------------------------------------------------------------------
_Q = 1_000_000


@register(
    "embedding_gram_matrix",
    f"""
    WITH x AS (
      SELECT vec_id, CAST(i AS BIGINT) AS i,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_Q}, 0) AS BIGINT) AS q
      FROM embeddings
      CROSS JOIN unnest(generate_series(1, len(embedding))) AS t(i)
    )
    SELECT a.i AS i, b.i AS j,
           CAST(SUM(a.q * b.q) AS BIGINT) AS s,
           ROUND(SUM(a.q * b.q) / {float(_Q) ** 2}, 6) AS gram
    FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular X^T X over the embedding column.

    explode -> self-join on vec_id -> groupBy (i, j): the join is
    co-partitioned on the row key (each vector's d(d+1)/2 products
    are formed where the vector lives) and the partial-aggregated
    shuffle carries exactly d(d+1)/2 rows regardless of table size.
    Quantizing each element to 1e-6 (a deterministic per-row IEEE op)
    makes the sums exact BIGINTs — float summation would be
    partial-aggregation-order-dependent.
    """
    x = (
        load_tables(spark, sf_dir)["embeddings"]
        .select("vec_id", F.posexplode("embedding").alias("i0", "xe"))
        .select(
            "vec_id",
            (F.col("i0") + 1).cast("long").alias("i"),
            F.round(F.col("xe").cast("double") * _Q, 0).cast("long").alias("q"),
        )
    )
    a = x.alias("a")
    b = x.alias("b")
    return (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("s"))
        .select(
            "i",
            "j",
            F.col("s").cast("long").alias("s"),
            F.round(F.col("s") / F.lit(float(_Q) ** 2), 6).alias("gram"),
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation via value-based quartile cuts. No global
# NTILE (an empty-partition window = one task over every customer at
# scale); instead the nearest-rank p25/p50/p75 of each metric come
# from per-metric histograms and scoring is a broadcast-join compare.
# Ties share a score (value-based quartiles), which is also the more
# meaningful semantics for segmentation.
# ---------------------------------------------------------------------------
@register(
    "rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    mx AS (SELECT MAX(last_day) AS maxd FROM base),
    cust AS (
      SELECT b.custkey, mx.maxd - b.last_day AS recency_days, b.frequency, b.cents
      FROM base b CROSS JOIN mx
    ),
    mvals AS (
      SELECT custkey, 'r' AS metric, -recency_days AS v FROM cust
      UNION ALL SELECT custkey, 'f', frequency FROM cust
      UNION ALL SELECT custkey, 'm', cents FROM cust
    ),
    hist AS (SELECT metric, v, CAST(COUNT(*) AS BIGINT) AS c FROM mvals GROUP BY 1, 2),
    cum AS (
      SELECT metric, v, c,
             SUM(c) OVER (PARTITION BY metric ORDER BY v) AS cum,
             SUM(c) OVER (PARTITION BY metric) AS n
      FROM hist
    ),
    cuts AS (
      SELECT metric,
             MIN(CASE WHEN cum >= (n * 25 + 99) // 100 THEN v END) AS q25,
             MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS q50,
             MIN(CASE WHEN cum >= (n * 75 + 99) // 100 THEN v END) AS q75
      FROM cum GROUP BY 1
    ),
    scored AS (
      SELECT mv.custkey, mv.metric,
             1 + CASE WHEN mv.v > c.q25 THEN 1 ELSE 0 END
               + CASE WHEN mv.v > c.q50 THEN 1 ELSE 0 END
               + CASE WHEN mv.v > c.q75 THEN 1 ELSE 0 END AS score
      FROM mvals mv JOIN cuts c ON c.metric = mv.metric
    )
    SELECT cu.custkey, cu.recency_days, cu.frequency, cu.cents / 100.0 AS monetary,
           CAST(MAX(CASE WHEN s.metric = 'r' THEN s.score END) AS BIGINT) AS r_score,
           CAST(MAX(CASE WHEN s.metric = 'f' THEN s.score END) AS BIGINT) AS f_score,
           CAST(MAX(CASE WHEN s.metric = 'm' THEN s.score END) AS BIGINT) AS m_score,
           CAST(MAX(CASE WHEN s.metric = 'r' THEN s.score END) * 100
              + MAX(CASE WHEN s.metric = 'f' THEN s.score END) * 10
              + MAX(CASE WHEN s.metric = 'm' THEN s.score END) AS BIGINT) AS segment
    FROM cust cu JOIN scored s ON s.custkey = cu.custkey
    GROUP BY 1, 2, 3, 4
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-quartile RFM scores per customer (4 = best tier).

    One groupBy to customer grain, then each metric's nearest-rank
    p25/p50/p75 via the histogram pattern (windows run over per-metric
    distinct-value histograms, partitioned by metric — never an
    empty-partition NTILE over all customers), and scoring is a
    3-row broadcast-join comparison. Recency scores through its
    negation so "more recent" ranks high like the other metrics.
    """
    o = load_tables(spark, sf_dir)["orders"]
    epoch = F.to_date(F.lit("1970-01-01"))
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.datediff(F.col("o_orderdate"), epoch).cast("long")).alias("last_day"),
        F.count("*").alias("frequency"),
        F.sum(money_cents(F.col("o_totalprice"))).alias("cents"),
    )
    mx = base.agg(F.max("last_day").alias("maxd"))
    cust = base.crossJoin(F.broadcast(mx)).select(
        "custkey",
        (F.col("maxd") - F.col("last_day")).alias("recency_days"),
        "frequency",
        "cents",
    )
    mvals = (
        cust.select("custkey", F.lit("r").alias("metric"), (-F.col("recency_days")).alias("v"))
        .unionAll(cust.select("custkey", F.lit("f"), F.col("frequency")))
        .unionAll(cust.select("custkey", F.lit("m"), F.col("cents")))
    )
    hist = mvals.groupBy("metric", "v").agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("metric").orderBy("v")
    w_all = Window.partitionBy("metric")
    cum = hist.select(
        "metric",
        "v",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    cuts = cum.groupBy("metric").agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.expr(f"(n * {p} + 99) div 100"), F.col("v"))
            ).alias(f"q{p}")
            for p in (25, 50, 75)
        ]
    )
    scored = mvals.join(F.broadcast(cuts), "metric").select(
        "custkey",
        "metric",
        (
            F.lit(1)
            + (F.col("v") > F.col("q25")).cast("int")
            + (F.col("v") > F.col("q50")).cast("int")
            + (F.col("v") > F.col("q75")).cast("int")
        ).alias("score"),
    )
    pivoted = scored.groupBy("custkey").agg(
        *[
            F.max(F.when(F.col("metric") == m, F.col("score"))).alias(f"{m}_score")
            for m in ("r", "f", "m")
        ]
    )
    return cust.join(pivoted, "custkey").select(
        "custkey",
        "recency_days",
        "frequency",
        (F.col("cents") / 100.0).alias("monetary"),
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long")
        .alias("segment"),
    )


# ---------------------------------------------------------------------------
# Robust outlier detection: exact median + MAD per event type from
# ONE value histogram (the nearest-rank pattern of
# exact_percentiles_orders, applied twice without re-scanning facts).
# ---------------------------------------------------------------------------
@register(
    "mad_outliers_events",
    """
    WITH hist AS (
      SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, cents, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    ),
    med AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END) AS median_cents
      FROM cum GROUP BY event_type
    ),
    dev_hist AS (
      SELECT h.event_type, ABS(h.cents - m.median_cents) AS adev,
             CAST(SUM(h.c) AS BIGINT) AS c
      FROM hist h JOIN med m ON m.event_type = h.event_type
      GROUP BY 1, 2
    ),
    dev_cum AS (
      SELECT event_type, adev, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY adev) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM dev_hist
    ),
    mad AS (
      SELECT event_type,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN adev END) AS mad_cents
      FROM dev_cum GROUP BY event_type
    )
    SELECT m.event_type, m.n, m.median_cents / 100.0 AS median_value,
           d.mad_cents / 100.0 AS mad_value,
           CAST(COALESCE(SUM(CASE WHEN dh.adev > 3 * d.mad_cents THEN dh.c END), 0) AS BIGINT)
             AS n_outliers
    FROM med m
    JOIN mad d ON d.event_type = m.event_type
    JOIN dev_hist dh ON dh.event_type = m.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median, MAD, and |x - med| > 3*MAD outlier counts per event type.

    Both medians come from the SAME (type, cents) histogram — the
    deviation histogram is derived from it by re-keying, so the raw
    event table is scanned once no matter how many robust statistics
    are stacked on top. All comparisons are integer-exact.
    """
    e = load_tables(spark, sf_dir)["events"].select(
        "event_type", money_cents(F.col("value")).alias("cents")
    )
    hist = e.groupBy("event_type", "cents").agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("event_type").orderBy("cents")
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "cents",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    med = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("cents"))
        ).alias("median_cents"),
    )
    dev_hist = (
        hist.join(F.broadcast(med), "event_type")
        .groupBy(
            "event_type",
            F.abs(F.col("cents") - F.col("median_cents")).alias("adev"),
        )
        .agg(F.sum("c").alias("c"))
    )
    w_dcum = Window.partitionBy("event_type").orderBy("adev")
    dev_cum = dev_hist.select(
        "event_type",
        "adev",
        "c",
        F.sum("c").over(w_dcum).alias("cum"),
        F.sum("c").over(w_all).alias("dn"),
    )
    mad = dev_cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(dn + 1) div 2"), F.col("adev"))
        ).alias("mad_cents")
    )
    return (
        dev_hist.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy(
            "event_type",
            "n",
            (F.col("median_cents") / 100.0).alias("median_value"),
            (F.col("mad_cents") / 100.0).alias("mad_value"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("adev") > 3 * F.col("mad_cents"), F.col("c"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers")
        )
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis–Spirakis A-ES with a
# hash-derived uniform instead of RNG state): each row draws
# u = md5-uniform in (0,1) and ranks by ln(u)/w — the same ordering
# as the textbook u^(1/w) key, without pow. P(row in sample) is
# proportional-to-weight-without-replacement; the hash makes the
# "draw" reproducible under retries/stragglers, which RNG-state
# sampling is not. ln is quantized to 1e-6 integers before ranking
# (the doc_perplexity_bigram precedent), with the unique key as
# tie-break, so both engines cut the top-k identically.
# ---------------------------------------------------------------------------
WSAMPLE_K = 200


@register(
    "sample_weighted_orders",
    f"""
    WITH keyed AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS weight_cents,
             CAST(ROUND(
               ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
                  / 4503599627370497.0)
               / (CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) / 100.0)
               * 1000000, 0) AS BIGINT) AS qkey
      FROM orders
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY priority
                                   ORDER BY qkey DESC, o_orderkey) AS rn
      FROM keyed
    )
    SELECT priority, o_orderkey, weight_cents / 100.0 AS weight, qkey
    FROM ranked WHERE rn <= {WSAMPLE_K}
    """,
)
def sample_weighted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} weighted sample of orders per priority (A-ES keys).

    One window per priority partition over the keyed rows; at scale
    the per-group top-k would first take a per-partition top-k
    (partial) before the shuffle — Spark's rank-limit pushdown does
    this for ROW_NUMBER + filter. Weights are exact cents; the only
    float ops are the fixed ln-key expression, quantized before
    ranking.
    """
    o = load_tables(spark, sf_dir)["orders"]
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4503599627370497.0)
    w = money_cents(F.col("o_totalprice")) / 100.0
    keyed = o.select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        money_cents(F.col("o_totalprice")).alias("weight_cents"),
        F.round(F.log(u) / w * 1_000_000, 0).cast("long").alias("qkey"),
    )
    rn = F.row_number().over(
        Window.partitionBy("priority").orderBy(F.col("qkey").desc(), "o_orderkey")
    )
    return (
        keyed.withColumn("rn", rn)
        .where(F.col("rn") <= WSAMPLE_K)
        .select(
            "priority",
            "o_orderkey",
            (F.col("weight_cents") / 100.0).alias("weight"),
            "qkey",
        )
    )


# ---------------------------------------------------------------------------
# ExactSubstr-style removal spans (Lee et al. 2021 §4.1, public
# paper: drop substrings shared verbatim across documents): the
# per-document transform built on the cross-doc duplicated-5-gram
# table above. Every occurrence of a gram that appears in ≥ 2
# distinct documents marks word positions [i, i+4]; overlapping and
# back-to-back marks merge into maximal removal spans by the classic
# gaps-and-islands device (a new island starts where the start
# exceeds the running max end of PRIOR marks — one ordered window per
# doc, exclusive upper frame, exactly like events_gaps_islands).
#
# Scale: grams and marks stay partitioned by doc; the only cross-doc
# motion is the gram-keyed duplicate count (map-side combinable) and
# the gram-keyed semi-join back onto occurrences — the shape the
# suffix-array original cannot parallelize and this formulation can.
# ---------------------------------------------------------------------------


def _substring_spans_oracle() -> str:
    from erkg_tutorials_spark.plans.llmops import _POS_CTE

    n = _NGRAM_N
    leads = " || ' ' || ".join(
        ["term"] + [f"LEAD(term, {k}) OVER w" for k in range(1, n)]
    )
    return _POS_CTE + f"""
    , g AS (
      SELECT doc_id, i, {leads} AS gram,
             LEAD(term, {n - 1}) OVER w AS t_last
      FROM pos
      WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    occ AS (SELECT doc_id, i, gram FROM g WHERE t_last IS NOT NULL),
    dup AS (
      SELECT gram FROM occ GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marks AS (
      SELECT o.doc_id, o.i AS s, o.i + {n - 1} AS e
      FROM occ o JOIN dup d ON d.gram = o.gram
    ),
    isl AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), -1) THEN 1 ELSE 0 END AS brk
      FROM marks
    ),
    grp AS (
      SELECT doc_id, s, e,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    )
    SELECT doc_id, CAST(island AS BIGINT) AS island,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_marks,
           CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS span_words
    FROM grp GROUP BY doc_id, island
    """


@register("dedup_substring_spans", _substring_spans_oracle())
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal spans: maximal merged word-position intervals covered by cross-document duplicated 5-grams, per document."""
    from erkg_tutorials_spark.plans.llmops import _positions

    pos = _positions(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("i")
    parts = [F.col("term")] + [
        F.lead("term", k).over(w) for k in range(1, _NGRAM_N)
    ]
    occ = pos.select(
        "doc_id",
        "i",
        F.when(
            F.lead("term", _NGRAM_N - 1).over(w).isNotNull(),
            F.concat_ws(" ", *parts),
        ).alias("gram"),
    ).where(F.col("gram").isNotNull())
    dup = (
        occ.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    marks = occ.join(dup, "gram").select(
        "doc_id",
        F.col("i").alias("s"),
        (F.col("i") + _NGRAM_N - 1).alias("e"),
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = marks.withColumn(
        "brk",
        F.when(
            F.col("s")
            > F.coalesce(F.max("e").over(wprev), F.lit(-1).cast("long")),
            1,
        ).otherwise(0),
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = isl.withColumn(
        "island", F.sum("brk").over(wrun).cast("long")
    )
    return grp.groupBy("doc_id", "island").agg(
        F.min("s").cast("long").alias("span_start"),
        F.max("e").cast("long").alias("span_end"),
        F.count("*").cast("long").alias("n_marks"),
        (F.max("e") - F.min("s") + 1).cast("long").alias("span_words"),
    )
