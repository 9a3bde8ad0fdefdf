"""Third analytics tier: exact-result scale primitives that the
approximate families deliberately avoid —

* ``simjoin_prefix_filter``: an EXACT set-similarity self-join
  (shingle Jaccard >= tau) via AllPairs-style prefix filtering
  (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06). Unlike the
  MinHash/SimHash/LSH paths (which trade recall for speed), prefix
  filtering is a *complete* pruning: the candidate set provably
  contains every qualifying pair, so the verified output equals the
  brute-force pairwise join bit-for-bit while shuffling only each
  document's rarest-token prefix.
* ``bloom_prefilter_orders``: a deterministic Bloom filter built
  from a dimension key set and probed by the fact table, with exact
  false-positive accounting — the runtime-prefilter pattern
  quantified (vs ``runtime_prefilter_join``'s exact-set variant).
* ``winsorized_event_stats``: exact nearest-rank p01/p99
  winsorization per group from a value histogram — the standard
  robust-stats cleanup before training-data aggregation, computed
  without any single-task global sort.

Every query has a full DuckDB oracle; ratios are single divisions of
already-exact integers (the money_cents / quantize-then-sum recipe).

Scale notes (100 TB):
- simjoin_prefix_filter: the prefix join's left side carries only
  ``|x| - ceil(tau*|x|) + 1`` tokens per record (half the tokens at
  tau=0.5), ordered rarest-first so hot shingles almost never appear
  in any prefix; the verify join touches only surviving candidate
  pairs. No all-pairs product anywhere. Production PPJoin adds
  positional upper bounds on top; the completeness argument (below)
  is unchanged.
- bloom_prefilter_orders: the bitset is bounded (M_BITS rows max)
  and broadcast; the fact table is scanned once map-side with no
  shuffle before the pass/fail verdict. At 100 TB the "expensive
  join" behind the filter only sees the pass rows.
- winsorized_event_stats: percentiles come from the per-group
  histogram of DISTINCT cent values (bounded domain), windowed per
  group — the fact table itself is never sorted.
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
# Exact Jaccard similarity self-join via prefix filtering.
#
# tau is carried as the integer fraction TAU_NUM/TAU_DEN so every
# threshold comparison is integer-exact in both engines:
#   J(A,B) >= tau  <=>  ni * TAU_DEN >= TAU_NUM * (|A| + |B| - ni).
#
# Completeness of the pruning (docstring math the tests pin):
# canonicalize |A| <= |B|. J >= tau implies the overlap o satisfies
# o(1+tau) >= tau(|A| + |B|) >= tau(|B| + o), i.e. o >= tau*|B|, so
# o >= ceil(tau*|B|) >= ceil(tau*|A|). If A shares NO token with B
# inside A's prefix (its first |A| - ceil(tau*|A|) + 1 tokens in the
# global rarest-first order), every common token lies in A's suffix
# of size ceil(tau*|A|) - 1, so o < ceil(tau*|A|) — contradiction.
# Hence joining the SMALLER record's prefix against the larger
# record's FULL token set misses nothing; the size bound
# |B| <= |A|/tau (from o <= |A| and o >= tau*|B|) prunes further.
# ---------------------------------------------------------------------------
SIMJOIN_TAU_NUM = 1
SIMJOIN_TAU_DEN = 2  # tau = 0.5


@register(
    "simjoin_prefix_filter",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle
      FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS ni
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(ni * 1.0 / (za.n + zb.n - ni), 6) AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = id_a
    JOIN sizes zb ON zb.doc_id = id_b
    WHERE ni * {SIMJOIN_TAU_DEN} >= {SIMJOIN_TAU_NUM} * (za.n + zb.n - ni)
    """,
)
def simjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= 1/2, EXACTLY,
    via prefix filtering — same output as the brute-force oracle,
    but the candidate join only shuffles each doc's rarest-token
    prefix instead of its full shingle set.

    Reference analogue: the tutorials dedup entities by pairwise
    name similarity over blocked candidates; this is the exact
    set-overlap version of that blocking, with a proof of
    completeness instead of a recall target.
    """
    from erkg_tutorials_spark.dedup.minhash import shingles
    from erkg_tutorials_spark.plans.memo import memoized_sized

    t = load_tables(spark, sf_dir)
    # shares the containment query's memoized shingle table
    sh = memoized_sized(
        spark, sf_dir, "containment_doc_shingles",
        lambda: shingles(t["documents"], k=3),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))

    # per-doc rarest-first prefix: first n - ceil(tau*n) + 1 tokens.
    # ceil(tau*n) computed in integers: (n*NUM + DEN - 1) div DEN.
    # ``pos`` is the token's rank over the doc's FULL sorted set (the
    # positional filter below needs absolute positions, not
    # prefix-relative ones).
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    pref = (
        sh.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(
            F.col("pos")
            <= F.col("n")
            - F.expr(
                f"(n * {SIMJOIN_TAU_NUM} + {SIMJOIN_TAU_DEN} - 1) "
                f"div {SIMJOIN_TAU_DEN}"
            )
            + 1
        )
        .select("doc_id", "n", "shingle", "pos")
    )
    # PPJoin (r9 VERDICT item 5): candidates come from a PREFIX ×
    # PREFIX self-join, not prefix × full-token-set. Completeness: for
    # a qualifying pair with |A| <= |B|, o >= ceil(tau*|B|) =: alpha
    # (derivation above), and the AllPairs lemma says the prefixes of
    # length |A|-alpha+1 and |B|-alpha+1 share a token; each side's
    # own n-ceil(tau*n)+1 prefix is a superset of that (alpha >=
    # ceil(tau*n) on both). Halves the candidate-join shuffle at
    # tau=1/2 — the suffix tokens never leave the scan.
    a = pref.select(
        F.col("doc_id").alias("ia"),
        F.col("n").alias("na"),
        "shingle",
        F.col("pos").alias("pa"),
    )
    b = pref.select(
        F.col("doc_id").alias("ib"),
        F.col("n").alias("nb"),
        "shingle",
        F.col("pos").alias("pb"),
    )
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("na") < F.col("nb"))
            | ((F.col("na") == F.col("nb")) & (F.col("ia") < F.col("ib")))
        )
        # length filter: tau*|B| <= |A|
        .where(F.col("nb") * SIMJOIN_TAU_NUM <= F.col("na") * SIMJOIN_TAU_DEN)
        # positional filter (PPJoin): a common token at sorted
        # positions (pa, pb) caps the overlap at
        # 1 + min(na - pa, nb - pb) when it is the pair's FIRST common
        # token (all later common tokens sit after it on both sides);
        # the pair qualifies only if o*(DEN+NUM) >= NUM*(na+nb), so a
        # row failing that bound cannot be the first-common-token row
        # of a qualifying pair. Integer-exact, ANY-row-survives
        # semantics via the distinct() below.
        .where(
            (1 + F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")))
            * (SIMJOIN_TAU_DEN + SIMJOIN_TAU_NUM)
            >= SIMJOIN_TAU_NUM * (F.col("na") + F.col("nb"))
        )
        .select("ia", "ib", "na", "nb")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("ia"), "shingle")
    sb = sh.select(F.col("doc_id").alias("ib"), "shingle")
    verified = (
        cand.join(sa, "ia")
        .join(sb, ["ib", "shingle"])
        .groupBy("ia", "ib", "na", "nb")
        .agg(F.count("*").cast("long").alias("ni"))
        .where(
            F.col("ni") * SIMJOIN_TAU_DEN
            >= SIMJOIN_TAU_NUM * (F.col("na") + F.col("nb") - F.col("ni"))
        )
    )
    # oracle convention: id_a < id_b (ours is size-canonical)
    return verified.select(
        F.least("ia", "ib").alias("id_a"),
        F.greatest("ia", "ib").alias("id_b"),
        F.round(
            F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")), 6
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Exact edit-distance self-join via deletion neighborhoods (FastSS,
# Bocek et al. 2007 tech report; the SymSpell scheme). For d = 1:
#   ed(s, t) <= 1  ==>  D1(s) ∩ D1(t) != ∅
# where D1(x) = {x} ∪ {x with one char deleted} — a substitution at
# position i makes both sides equal after deleting position i; an
# insertion/deletion makes one side equal to the other's 0-deletion.
# The converse does NOT hold (sharing a variant only bounds ed <= 2),
# so candidates are verified with levenshtein(). This prunes where
# q-gram count filtering cannot: strings sharing a long constant
# prefix (every TPC-H supplier name starts "Supplier#") share most
# q-grams, but share a deletion variant only if they differ in at
# most ~2 positions.
# ---------------------------------------------------------------------------
EDIT_DMAX = 1


@register(
    "simjoin_edit_distance",
    f"""
    WITH s AS (SELECT s_suppkey, s_name FROM supplier)
    SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
    FROM s a JOIN s b ON a.s_suppkey < b.s_suppkey
    WHERE abs(length(a.s_name) - length(b.s_name)) <= {EDIT_DMAX}
      AND levenshtein(a.s_name, b.s_name) <= {EDIT_DMAX}
    """,
)
def simjoin_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All supplier-name pairs within edit distance {EDIT_DMAX},
    EXACTLY, via the deletion-neighborhood join: each name explodes
    into length+1 deletion variants, candidates are pairs sharing a
    variant (provably a superset of every qualifying pair), and a
    levenshtein() verify pass makes the output equal to the
    brute-force pairwise join. The equi-join on variants shuffles
    O(n * len) short keys instead of materializing the n^2 product.
    """
    s = load_tables(spark, sf_dir)["supplier"].select("s_suppkey", "s_name")
    variants = s.select(
        "s_suppkey",
        "s_name",
        F.explode(
            F.expr(
                "array_union(array(s_name), transform(sequence(1, length(s_name)), "
                "i -> concat(substring(s_name, 1, i - 1), "
                "substring(s_name, i + 1, length(s_name)))))"
            )
        ).alias("v"),
    )
    a = variants.select(
        F.col("s_suppkey").alias("id_a"), F.col("s_name").alias("name_a"), "v"
    )
    b = variants.select(
        F.col("s_suppkey").alias("id_b"), F.col("s_name").alias("name_b"), "v"
    )
    cand = (
        a.join(b, "v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "name_a", "id_b", "name_b")
        .distinct()
    )
    return cand.where(
        F.levenshtein("name_a", "name_b") <= EDIT_DMAX
    ).select(
        "id_a",
        "id_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
    )


# ---------------------------------------------------------------------------
# Deterministic Bloom filter build + probe with exact FP accounting.
# Hash family: h_i(x) = md5("<x>#<i>") first 15 hex digits as int,
# mod M_BITS — byte-identical in Spark (conv(...,16,10)) and DuckDB
# (CAST('0x'||... AS BIGINT)), so the bitset, the pass set, and the
# false-positive count are all exactly reproducible.
# ---------------------------------------------------------------------------
BLOOM_M_BITS = 16384
BLOOM_K = 3
_BLOOM_SEGMENT = "AUTOMOBILE"


@register(
    "bloom_prefilter_orders",
    f"""
    WITH keys AS (
      SELECT DISTINCT c_custkey FROM customer
      WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
    ),
    bits AS (
      SELECT DISTINCT
        CAST(('0x' || substr(
          md5(CAST(c_custkey AS VARCHAR) || '#' || CAST(i AS VARCHAR)),
          1, 15)) AS BIGINT) % {BLOOM_M_BITS} AS pos
      FROM keys CROSS JOIN unnest(generate_series(0, {BLOOM_K - 1})) AS t(i)
    ),
    probe AS (
      SELECT o.o_orderkey, o.o_custkey, t.i,
        CAST(('0x' || substr(
          md5(CAST(o.o_custkey AS VARCHAR) || '#' || CAST(t.i AS VARCHAR)),
          1, 15)) AS BIGINT) % {BLOOM_M_BITS} AS pos
      FROM orders o CROSS JOIN unnest(generate_series(0, {BLOOM_K - 1})) AS t(i)
    ),
    verdict AS (
      SELECT p.o_orderkey, p.o_custkey,
             CAST(COUNT(b.pos) AS BIGINT) = {BLOOM_K} AS pass
      FROM probe p LEFT JOIN bits b ON b.pos = p.pos
      GROUP BY 1, 2
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS n_keys,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
      CAST(COUNT(*) AS BIGINT) AS n_probed,
      CAST(SUM(CASE WHEN v.pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      CAST(SUM(CASE WHEN k.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_true,
      CAST(SUM(CASE WHEN v.pass AND k.c_custkey IS NULL THEN 1 ELSE 0 END)
        AS BIGINT) AS n_false_pos
    FROM verdict v LEFT JOIN keys k ON k.c_custkey = v.o_custkey
    """,
)
def bloom_prefilter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a {BLOOM_M_BITS}-bit, {BLOOM_K}-hash Bloom filter over
    one market segment's customer keys, probe every order through
    it, and report the exact pass / true-match / false-positive
    counts. The bitset is bounded and broadcast; the fact scan never
    shuffles before the verdict — the quantified version of the
    runtime-prefilter join pattern.
    """
    t = load_tables(spark, sf_dir)
    keys = (
        t["customer"]
        .where(F.col("c_mktsegment") == _BLOOM_SEGMENT)
        .select("c_custkey")
        .distinct()
    )

    def _pos(col: str, i) -> str:
        return (
            f"CAST(conv(substr(md5(concat(CAST({col} AS STRING), '#', "
            f"CAST({i} AS STRING))), 1, 15), 16, 10) AS BIGINT) "
            f"% {BLOOM_M_BITS}"
        )

    # Build side: distinct bit positions packed into 64-bit words
    # (<= M_BITS/64 rows), shipped as ONE broadcast map row. The probe
    # then tests membership per fact row map-side — no explode, no
    # per-order shuffle; the only exchange left is the final partial-
    # aggregated scalar rollup.
    hashes = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("i")
    bits = (
        keys.select("c_custkey", hashes)
        .select(F.expr(_pos("c_custkey", "i")).alias("pos"))
        .distinct()
    )
    words = bits.select(
        F.expr("pos div 64").alias("w"), F.expr("CAST(pos % 64 AS INT)").alias("b")
    ).groupBy("w").agg(
        F.expr(
            "aggregate(collect_set(b), CAST(0 AS BIGINT), "
            "(acc, x) -> acc | shiftleft(CAST(1 AS BIGINT), x))"
        ).alias("word")
    )
    bitmap = words.agg(
        F.expr("map_from_entries(collect_list(struct(w, word)))").alias("wm"),
        F.sum(F.bit_count("word")).cast("long").alias("n_bits_set"),
    )

    def _member(h: str) -> str:
        return (
            f"(shiftrightunsigned("
            f"coalesce(element_at(wm, ({h}) div 64), CAST(0 AS BIGINT)), "
            f"CAST(({h}) % 64 AS INT)) & 1) = 1"
        )

    h = [_pos("o_custkey", i) for i in range(BLOOM_K)]
    verdict = (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .crossJoin(F.broadcast(bitmap))
        .select(
            "o_custkey",
            F.expr(" AND ".join(_member(hi) for hi in h)).alias("pass"),
        )
    )
    scalars = keys.agg(F.count("*").cast("long").alias("n_keys")).crossJoin(
        F.broadcast(bitmap.select("n_bits_set"))
    )
    truth = keys.withColumnRenamed("c_custkey", "o_custkey").withColumn(
        "is_true", F.lit(1)
    )
    return (
        verdict.join(F.broadcast(truth), "o_custkey", "left")
        .agg(
            F.count("*").cast("long").alias("n_probed"),
            F.sum(F.when(F.col("pass"), 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.sum(F.when(F.col("is_true").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_true"),
            F.sum(
                F.when(F.col("pass") & F.col("is_true").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(scalars))
        .select(
            "n_keys", "n_bits_set", "n_probed", "n_pass", "n_true", "n_false_pos"
        )
    )


# ---------------------------------------------------------------------------
# Exact winsorization: clamp each event's value to its type's exact
# nearest-rank [p01, p99] band, then aggregate the clamped values.
# Percentile rank ceil(p*n) in integers: (n*p_num + p_den - 1) div
# p_den. Same histogram recipe as exact_percentiles_orders /
# mad_outliers_events; the fact table is never globally sorted.
# ---------------------------------------------------------------------------
WINSOR_LO_NUM, WINSOR_LO_DEN = 1, 100  # p01
WINSOR_HI_NUM, WINSOR_HI_DEN = 99, 100  # p99


@register(
    "winsorized_event_stats",
    f"""
    WITH vals AS (
      SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ),
    hist AS (
      SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS c
      FROM vals GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, cents, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    ),
    pct AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MIN(CASE WHEN cum >= (n * {WINSOR_LO_NUM} + {WINSOR_LO_DEN} - 1)
                                  // {WINSOR_LO_DEN} THEN cents END) AS lo,
             MIN(CASE WHEN cum >= (n * {WINSOR_HI_NUM} + {WINSOR_HI_DEN} - 1)
                                  // {WINSOR_HI_DEN} THEN cents END) AS hi
      FROM cum GROUP BY event_type
    )
    SELECT v.event_type, p.n,
           p.lo / 100.0 AS p01_value,
           p.hi / 100.0 AS p99_value,
           CAST(SUM(CASE WHEN v.cents < p.lo THEN 1
                         WHEN v.cents > p.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped,
           CAST(SUM(greatest(p.lo, least(p.hi, v.cents))) AS BIGINT) / 100.0
             AS winsorized_sum,
           ROUND(CAST(SUM(greatest(p.lo, least(p.hi, v.cents))) AS BIGINT)
                 * 1.0 / p.n / 100.0, 4) AS winsorized_mean
    FROM vals v JOIN pct p ON p.event_type = v.event_type
    GROUP BY v.event_type, p.n, p.lo, p.hi
    """,
)
def winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event stats after exact p01/p99 winsorization —
    the two-pass robust-aggregation pattern: tiny per-group
    percentile scalars from a distinct-value histogram, broadcast
    back over one more scan of the facts."""
    e = load_tables(spark, sf_dir)["events"]
    vals = e.select("event_type", money_cents(F.col("value")).alias("cents"))
    hist = vals.groupBy("event_type", "cents").agg(
        F.count("*").cast("long").alias("c")
    )
    wcum = Window.partitionBy("event_type").orderBy("cents")
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "cents",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    pct = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(
                    f"(n * {WINSOR_LO_NUM} + {WINSOR_LO_DEN} - 1) "
                    f"div {WINSOR_LO_DEN}"
                ),
                F.col("cents"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(
                    f"(n * {WINSOR_HI_NUM} + {WINSOR_HI_DEN} - 1) "
                    f"div {WINSOR_HI_DEN}"
                ),
                F.col("cents"),
            )
        ).alias("hi"),
    )
    clamped = vals.join(F.broadcast(pct), "event_type").select(
        "event_type",
        "n",
        "lo",
        "hi",
        F.greatest("lo", F.least("hi", F.col("cents"))).alias("wcents"),
        ((F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi")))
        .cast("long")
        .alias("clip"),
    )
    return clamped.groupBy("event_type", "n", "lo", "hi").agg(
        F.sum("clip").cast("long").alias("n_clamped"),
        (F.sum("wcents").cast("long") / 100.0).alias("winsorized_sum"),
        F.round(
            F.sum("wcents").cast("long") / F.col("n") / 100.0, 4
        ).alias("winsorized_mean"),
    ).select(
        "event_type",
        "n",
        (F.col("lo") / 100.0).alias("p01_value"),
        (F.col("hi") / 100.0).alias("p99_value"),
        "n_clamped",
        "winsorized_sum",
        "winsorized_mean",
    )


# ---------------------------------------------------------------------------
# EXACT audience overlap via packed bitmaps: the distinct user set of
# each event type becomes (word = user div 64, 64-bit OR of user%64
# bits) rows — the roaring/bitmap-index pattern. Pairwise
# intersection is then SUM(bit_count(wa & wb)) over an equi-join on
# word: the shuffle carries |types| x (max_user/64) packed rows
# REGARDLESS of event count, and the result is exact — the
# set-intersection complement to the approximate HLL union
# (hll_union_users).
# ---------------------------------------------------------------------------
@register(
    "audience_overlap_bitmap",
    """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, za.n AS n_a, zb.n AS n_b, p.n_common,
           ROUND(p.n_common * 1.0 / (za.n + zb.n - p.n_common), 6) AS jaccard
    FROM pairs p
    JOIN sizes za ON za.event_type = p.type_a
    JOIN sizes zb ON zb.event_type = p.type_b
    """,
)
def audience_overlap_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience intersection/Jaccard between event
    types, computed on packed 64-bit user bitmaps instead of raw
    (type, user) rows."""
    e = load_tables(spark, sf_dir)["events"]
    words = (
        e.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type",
            F.expr("user_id div 64").alias("w"),
            F.expr("CAST(user_id % 64 AS INT)").alias("b"),
        )
        .groupBy("event_type", "w")
        .agg(
            F.expr(
                "aggregate(collect_set(b), CAST(0 AS BIGINT), "
                "(acc, x) -> acc | shiftleft(CAST(1 AS BIGINT), x))"
            ).alias("word")
        )
    )
    sizes = words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n")
    )
    a = words.select(
        F.col("event_type").alias("type_a"), "w", F.col("word").alias("wa")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "w", F.col("word").alias("wb")
    )
    pairs = (
        a.join(b, "w")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb"))))
            .cast("long")
            .alias("n_common")
        )
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"),
                                     F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"),
                                     F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental (delta-vs-corpus) exact near-dup: the production ingest
# mode — a new batch arrives and must be checked against the standing
# corpus WITHOUT re-joining the corpus against itself. Same prefix-
# filter completeness as simjoin_prefix_filter, but one-sided: the
# overlap bound o >= ceil(tau*|A|) holds for A = the delta document
# alone, so joining only the DELTA side's rarest-token prefixes
# against the corpus posting list misses nothing, and candidate
# volume scales with the delta, not the corpus. Delta membership is
# deterministic (doc_id % 5 == 0 stands in for "today's batch").
# ---------------------------------------------------------------------------
DELTA_MOD = 5


@register(
    "dedup_incremental_exact",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle
      FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
             CAST(COUNT(*) AS BIGINT) AS ni
      FROM sh d JOIN sh c
        ON d.shingle = c.shingle
       AND d.doc_id % {DELTA_MOD} = 0
       AND c.doc_id % {DELTA_MOD} <> 0
      GROUP BY 1, 2
    )
    SELECT delta_id, corpus_id,
           ROUND(ni * 1.0 / (zd.n + zc.n - ni), 6) AS jaccard
    FROM inter
    JOIN sizes zd ON zd.doc_id = delta_id
    JOIN sizes zc ON zc.doc_id = corpus_id
    WHERE ni * {SIMJOIN_TAU_DEN} >= {SIMJOIN_TAU_NUM} * (zd.n + zc.n - ni)
    """,
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 1/2 matches of a delta batch against the
    standing corpus, with candidates generated from the DELTA side's
    prefixes only — candidate volume tracks the batch size, never
    the corpus size."""
    from erkg_tutorials_spark.dedup.minhash import shingles
    from erkg_tutorials_spark.plans.memo import memoized_sized

    t = load_tables(spark, sf_dir)
    sh = memoized_sized(
        spark, sf_dir, "containment_doc_shingles",
        lambda: shingles(t["documents"], k=3),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    is_delta = F.col("doc_id") % DELTA_MOD == 0

    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    delta_prefix = (
        sh.where(is_delta)
        .join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(
            F.col("pos")
            <= F.col("n")
            - F.expr(
                f"(n * {SIMJOIN_TAU_NUM} + {SIMJOIN_TAU_DEN} - 1) "
                f"div {SIMJOIN_TAU_DEN}"
            )
            + 1
        )
        .select(F.col("doc_id").alias("delta_id"), F.col("n").alias("nd"), "shingle")
    )
    corpus = sh.where(~is_delta).join(sizes, "doc_id").select(
        F.col("doc_id").alias("corpus_id"), F.col("n").alias("nc"), "shingle"
    )
    cand = (
        delta_prefix.join(corpus, "shingle")
        .select("delta_id", "corpus_id", "nd", "nc")
        .distinct()
    )
    sd = sh.select(F.col("doc_id").alias("delta_id"), "shingle")
    sc = sh.select(F.col("doc_id").alias("corpus_id"), "shingle")
    return (
        cand.join(sd, "delta_id")
        .join(sc, ["corpus_id", "shingle"])
        .groupBy("delta_id", "corpus_id", "nd", "nc")
        .agg(F.count("*").cast("long").alias("ni"))
        .where(
            F.col("ni") * SIMJOIN_TAU_DEN
            >= SIMJOIN_TAU_NUM * (F.col("nd") + F.col("nc") - F.col("ni"))
        )
        .select(
            "delta_id",
            "corpus_id",
            F.round(
                F.col("ni") / (F.col("nd") + F.col("nc") - F.col("ni")), 6
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Join-skew diagnostic: per-key weight distribution of the
# orders-lineitem join key, reported as the exact top-5 heaviest
# keys plus distribution-shape scalars (max/avg imbalance factor,
# p99 weight). At 100 TB this is the report that tells you WHETHER
# to salt — computed from one partial-aggregated groupBy over the
# fact table and a bounded top-k, never a sort of all keys.
# ---------------------------------------------------------------------------
SKEW_TOPK = 5


@register(
    "skew_report_lineitem",
    f"""
    WITH w AS (
      SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS weight
      FROM lineitem GROUP BY 1
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(weight) AS BIGINT) AS n_rows,
             CAST(MAX(weight) AS BIGINT) AS max_w
      FROM w
    ),
    hist AS (
      SELECT weight, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1
    ),
    cum AS (
      SELECT weight, c, SUM(c) OVER (ORDER BY weight) AS cum,
             SUM(c) OVER () AS n
      FROM hist
    ),
    p99 AS (
      SELECT CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN weight END)
                  AS BIGINT) AS p99_w
      FROM cum
    ),
    topk AS (
      SELECT key, weight,
             ROW_NUMBER() OVER (ORDER BY weight DESC, key) AS rk
      FROM w QUALIFY rk <= {SKEW_TOPK}
    )
    SELECT t.rk, t.key AS heavy_key, t.weight,
           s.n_keys, s.n_rows,
           ROUND(s.max_w * 1.0 * s.n_keys / s.n_rows, 6) AS imbalance_factor,
           p.p99_w
    FROM topk t CROSS JOIN stats s CROSS JOIN p99 p
    """,
)
def skew_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-key skew report for lineitem.l_orderkey: top-5
    heaviest keys + imbalance factor (max weight / mean weight) +
    nearest-rank p99 weight, from one groupBy, a weight histogram,
    and a TakeOrderedAndProject top-k — all keys are never sorted."""
    li = load_tables(spark, sf_dir)["lineitem"]
    w = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count("*").cast("long").alias("weight")
    )
    stats = w.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("weight").cast("long").alias("n_rows"),
        F.max("weight").cast("long").alias("max_w"),
    )
    hist = w.groupBy("weight").agg(F.count("*").cast("long").alias("c"))
    wcum = Window.orderBy("weight")  # distinct-weight domain: tiny
    cum = hist.select(
        "weight", F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    p99 = cum.agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n * 99 + 99) div 100"), F.col("weight")
            )
        )
        .cast("long")
        .alias("p99_w")
    )
    topk = (
        w.orderBy(F.desc("weight"), "key")
        .limit(SKEW_TOPK)
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("weight"), "key"))
        )
    )
    return (
        topk.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(p99))
        .select(
            "rk",
            F.col("key").alias("heavy_key"),
            "weight",
            "n_keys",
            "n_rows",
            F.round(
                F.col("max_w") * F.col("n_keys") / F.col("n_rows"), 6
            ).alias("imbalance_factor"),
            "p99_w",
        )
    )
