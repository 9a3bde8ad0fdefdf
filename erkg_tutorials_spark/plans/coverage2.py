"""Second coverage sweep over SURVEY.md §2 rows that had pytest-only
verification but no driver-checked ``queries()`` entry:

- F6 + A3 + E3 — the "unlinked mentions" review report
  (reference ``analysis.py:35`` keeps mentions with non-null text and
  ``kb_id == ""``; the E3 pipeline aggregates them for review)
- A4/A5 — distinct-id and line-count scan statistics
  (``senzing_pipeline.py:392-393`` ``.unique()``, ``:61/:225`` counts)
- W3 — rank ordering with a deterministic tiebreaker
  (display ordering of TextRank outputs, ``tutorial.ipynb`` cell 25)
- R5 — dict→wide-columns pivot (the FEATURES-map pivot of
  ``senzing_pipeline.py:161-190``, here as a groupBy().pivot())
- N1 — sentencize: split documents into ordered sentence rows
  (spaCy sentencizer, ``scraper.py:51``; pure-SQL tier per SURVEY §2.11)
- C10 — ordered newline-join of fragments per group
  (``scraper.py:68-74`` joins page fragments with ``"\\n"``)
- V1 — the hashing-embedder pandas_udf itself, oracle-checked in
  raw-count mode (md5(token) first-8-bytes % dim bucketing is
  replayable in SQL; dim=32 makes the modulus the low 5 bits of the
  last two hex nibbles)

Every query here has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables

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
# F6/A3/E3 — unlinked-mention review report. Mentions are the 1- and
# 2-grams of the first 100 documents; the "KB link" is the ruler
# pattern table (same patterns as phrase_ruler_match). A mention whose
# gram matches no pattern gets kb_id = '' — the reference's unlinked
# predicate — and the report aggregates distinct docs + occurrences,
# top-50 by frequency (reference analysis.py:25-37 + tutorial cell 26).
# ---------------------------------------------------------------------------
_F6_PATTERNS = (
    ("ORG", "table scan", "e1"),
    ("ORG", "hash join", "e2"),
    ("MISC", "sort", "e4"),
    ("ORG", "spark", "e6"),
)


def _f6_oracle() -> str:
    vals = ", ".join(f"('{l}', '{p}', '{i}')" for l, p, i in _F6_PATTERNS)
    return f"""
    WITH pat(label, pattern, id) AS (VALUES {vals}),
    toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w
      FROM documents WHERE doc_id < 100
    ),
    grams AS (
      SELECT doc_id, w[i] AS gram
      FROM toks CROSS JOIN unnest(generate_series(1, len(w))) AS t(i)
      UNION ALL
      SELECT doc_id, concat_ws(' ', w[i], w[i+1])
      FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
    ),
    m AS (
      SELECT g.doc_id, g.gram, COALESCE(p.id, '') AS kb_id
      FROM grams g LEFT JOIN pat p ON g.gram = lower(p.pattern)
    )
    SELECT gram AS mention,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occ
    FROM m
    WHERE gram IS NOT NULL AND gram <> '' AND kb_id = ''
    GROUP BY gram
    ORDER BY n_occ DESC, mention
    LIMIT 50
    """


@register("f6_unlinked_report", _f6_oracle())
def f6_unlinked_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlinked-mention report: surface forms whose fuzzy candidate set is empty."""
    t = load_tables(spark, sf_dir)
    pat = spark.createDataFrame(list(_F6_PATTERNS), ["label", "pattern", "id"])
    docs = (
        t["documents"]
        .where(F.col("doc_id") < 100)
        .select("doc_id", F.split(F.lower("text"), " ").alias("w"))
    )
    one = docs.select("doc_id", F.explode("w").alias("gram"))
    two = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN "
                "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1])) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    grams = one.unionByName(two)
    linked = pat.select(F.lower("pattern").alias("gram"), F.col("id").alias("kb_id"))
    m = grams.join(F.broadcast(linked), "gram", "left").withColumn(
        "kb_id", F.coalesce("kb_id", F.lit(""))
    )
    return (
        m.where(F.col("gram").isNotNull() & (F.col("gram") != "") & (F.col("kb_id") == ""))
        .groupBy(F.col("gram").alias("mention"))
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .orderBy(F.desc("n_occ"), F.asc("mention"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# A4/A5 — scan statistics: row count (reference line-count passes,
# senzing_pipeline.py:61/:225) + distinct-id counts (:392-393 .unique()).
# One pass, partial aggregation; no window.
# ---------------------------------------------------------------------------
@register(
    "a5_scan_stats",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios
    FROM orders
    """,
)
def a5_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan statistics: row count, distinct keys, and byte totals of the documents table."""
    t = load_tables(spark, sf_dir)
    return t["orders"].agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("o_custkey").alias("n_custs"),
        F.count_distinct("o_orderpriority").alias("n_prios"),
    )


# ---------------------------------------------------------------------------
# W3 — global rank ordering + limit (reference displays phrase lists
# ordered by rank; tutorial.ipynb cell 25). Deterministic tiebreaker on
# the key column. Spark executes this as TakeOrderedAndProject — no
# full sort of the table.
# ---------------------------------------------------------------------------
@register(
    "w3_rank_ordering",
    """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    LIMIT 100
    """,
)
def w3_rank_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() ordering of nations by customer count with ties preserved."""
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# R5 — dict→wide-columns pivot. The reference pivots the per-entity
# FEATURES map into named columns before description synthesis
# (senzing_pipeline.py:161-190 reads ent_feat.get(key) per key). Here:
# per-user event-type counts pivoted to one column per type.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _r5_oracle() -> str:
    cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN event_type = '{e}' THEN 1 ELSE 0 END) AS BIGINT) AS {e}"
        for e in _EVENT_TYPES
    )
    return f"""
    SELECT user_id,
           {cols}
    FROM events
    GROUP BY user_id
    """


@register("r5_event_pivot", _r5_oracle())
def r5_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-map to wide columns: pivot event types into per-user count columns."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0, list(_EVENT_TYPES))
    )


# ---------------------------------------------------------------------------
# N1 — sentencize: documents → ordered sentence rows with per-sentence
# stats (spaCy sentencizer as pure SQL; SURVEY §2.11 N1). posexplode
# keeps the sentence index — the relational encoding of Doc.sents.
# ---------------------------------------------------------------------------
@register(
    "n1_sentence_stats",
    """
    WITH s AS (
      SELECT doc_id, string_split(text, '. ') AS sents
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS sent_idx,
           CAST(length(sents[i]) AS BIGINT) AS n_chars,
           CAST(len(string_split(trim(sents[i]), ' ')) AS BIGINT) AS n_tokens
    FROM s CROSS JOIN unnest(generate_series(1, len(sents))) AS t(i)
    WHERE trim(sents[i]) <> ''
    """,
)
def n1_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize/sentencize documents and report per-doc sentence and token counts."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .where(F.col("doc_id") < 200)
        .select("doc_id", F.posexplode(F.split("text", "\\. ")).alias("sent_idx", "sent"))
        .where(F.trim("sent") != "")
        .select(
            "doc_id",
            F.col("sent_idx").cast("int").alias("sent_idx"),
            F.length("sent").cast("long").alias("n_chars"),
            F.size(F.split(F.trim("sent"), " ")).cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# C10 — ordered newline-join per group (reference joins page fragments
# with "\n", scraper.py:68-74). Per-user event-type log ordered by
# (ts, event_id): collect_list(struct) → array_sort → transform →
# array_join. The struct sort key makes the collect order-insensitive —
# the SURVEY §7 canonical-order rule for collect_list nondeterminism.
# ---------------------------------------------------------------------------
@register(
    "c10_event_log",
    """
    SELECT user_id,
           string_agg(event_type, chr(10) ORDER BY ts, event_id) AS event_log
    FROM events
    WHERE user_id < 200
    GROUP BY user_id
    """,
)
def c10_event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered newline-join: per-user chronological event log concatenated into one string."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("user_id") < 200)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(ts_ns, event_id, event_type))),"
                    " x -> x.event_type)"
                ),
                "\n",
            ).alias("event_log")
        )
    )


# ---------------------------------------------------------------------------
# V1 — the hashing-embedder pandas_udf, oracle-checked. Raw-count mode
# (no L2 normalize) keeps every value an exact small integer in
# float32, so Spark's Arrow-batched UDF output and DuckDB's SQL replay
# compare exactly. Bucket = int(md5(token)[:8 bytes], big-endian) % 32
# — with dim=32 only the low 5 bits survive, i.e. the last two hex
# nibbles of the first 8 digest bytes: (nib14*16 + nib15) % 32.
# ---------------------------------------------------------------------------
_V1_DIM = 32

@register(
    "v1_embed_hash",
    # whitespace runs are collapsed on BOTH sides so the oracle's
    # single-space string_split and the UDF's Python str.split() see
    # identical tokens even if text ever carries tabs/newlines
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents WHERE doc_id < 200
    ),
    b AS (
      SELECT doc_id,
             ((instr('0123456789abcdef', substring(md5(tok), 15, 1)) - 1) * 16
              + (instr('0123456789abcdef', substring(md5(tok), 16, 1)) - 1)) % {_V1_DIM} AS bucket
      FROM toks WHERE tok <> ''
    )
    SELECT doc_id, CAST(bucket AS INT) AS bucket, COUNT(*) AS cnt
    FROM b GROUP BY doc_id, bucket
    """,
)
def v1_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-tier text embedding via an Arrow pandas_udf, summarized per doc."""
    from erkg_tutorials_spark.linking.embed import hashing_embedder

    t = load_tables(spark, sf_dir)
    docs = t["documents"].where(F.col("doc_id") < 200).select(
        "doc_id",
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("text"),
    )
    emb = docs.withColumn(
        "embedding", hashing_embedder(_V1_DIM, normalize=False)(F.col("text"))
    )
    return (
        emb.select("doc_id", F.posexplode("embedding").alias("bucket", "v"))
        .where(F.col("v") > 0)
        .select(
            "doc_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("v").cast("long").alias("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: deterministic hash-based dataset split
# (train/val/test 80/10/10). The split key is content-independent
# (id-hashed, md5 nibbles 13-16 → 0..65535 → %100), so re-running over
# a grown corpus never moves an existing doc between splits — the
# property that matters for training-data lineage. Stratification is
# *verified* by the per-(split, lang) breakdown this query returns.
# ---------------------------------------------------------------------------
_NIB = "instr('0123456789abcdef', substring(h, {p}, 1)) - 1"


def _split_oracle() -> str:
    # (((n13)*16 + n14)*16 + n15)*16 + n16 — the integer value of md5
    # hex nibbles 13-16, same number Spark's conv(substring(...),16,10)
    # produces
    expr = f"((({_NIB.format(p=13)}) * 16 + ({_NIB.format(p=14)})) * 16 + ({_NIB.format(p=15)})) * 16 + ({_NIB.format(p=16)})"
    return f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    ),
    b AS (SELECT doc_id, lang, n_chars, ({expr}) % 100 AS bucket FROM h),
    s AS (
      SELECT lang, n_chars,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM s GROUP BY split, lang
    """


@register("split_assign", _split_oracle())
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment from md5 coins over doc ids."""
    t = load_tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 13, 4), 16, 10)
        .cast("long")
        % 100
    )
    return (
        t["documents"]
        .select(
            "lang",
            "n_chars",
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: quality-gate filter report — the classic
# pre-training corpus filter (length window + type-token-ratio cap)
# with per-language kept/dropped accounting. One pass: the quality
# signals aggregate per doc, the verdict is a projection, the report a
# reaggregation — no UDFs anywhere.
# ---------------------------------------------------------------------------
@register(
    "corpus_filter_stats",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    q AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             COUNT(DISTINCT tok) / (1.0 * COUNT(*)) AS ttr
      FROM toks GROUP BY doc_id
    ),
    v AS (
      SELECT d.lang,
             (q.n_tokens >= 30 AND q.ttr <= 0.8) AS kept,
             q.n_tokens
      FROM q JOIN documents d USING (doc_id)
    )
    SELECT lang, kept, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM v GROUP BY lang, kept
    """,
)
def corpus_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation funnel: per-filter pass/fail counts over the documents table."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    q = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.count_distinct("tok") / F.count("*")).alias("ttr"),
    )
    v = q.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang",
        ((F.col("n_tokens") >= 30) & (F.col("ttr") <= 0.8)).alias("kept"),
        "n_tokens",
    )
    return v.groupBy("lang", "kept").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: benchmark decontamination. Corpus docs are
# scored by the fraction of their word-8-gram shingles that appear
# anywhere in a held-out benchmark set (docs 0-19) — the standard
# n-gram-overlap contamination check run before training. The
# benchmark shingle set is broadcast (it is small by construction);
# corpus shingling is the same scan-side explosion as MinHash.
# Docs shorter than 8 tokens have no shingles and are excluded.
# ---------------------------------------------------------------------------
_CONTAM_K = 8

@register(
    "text_contamination",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', {", ".join(f"w[i+{j}]" for j in range(_CONTAM_K))}) AS shingle
      FROM toks
      CROSS JOIN unnest(generate_series(1, greatest(len(w) - {_CONTAM_K - 1}, 0))) AS t(i)
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
    corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 20),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corp GROUP BY doc_id),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_hit
      FROM corp c JOIN bench b ON c.shingle = b.shingle
      GROUP BY c.doc_id
    )
    SELECT s.doc_id, s.n_shingles,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           ROUND(COALESCE(h.n_hit, 0) / (1.0 * s.n_shingles), 6) AS contamination
    FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: 13-gram overlap between documents and a probe set."""
    from erkg_tutorials_spark.dedup.minhash import shingles

    t = load_tables(spark, sf_dir)
    # cached: the shingle explosion feeds three consumers (bench set,
    # per-doc sizes, hit counts) — uncached it would run 3×
    sh = shingles(t["documents"], k=_CONTAM_K).cache()
    bench = sh.where(F.col("doc_id") < 20).select("shingle").distinct()
    corp = sh.where(F.col("doc_id") >= 20)
    sizes = corp.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        F.round(F.coalesce("n_hit", F.lit(0)) / F.col("n_shingles"), 6).alias(
            "contamination"
        ),
    )


# ---------------------------------------------------------------------------
# Dedup last mile: MinHash-LSH pairs → transitive clusters → canonical
# keep/drop verdict per document (dedup/clusters.py). The transitive
# closure (connected components) is oracle-ized by unrolled min-label
# propagation over the pair graph (plans/oracle_pr.py) — near-dup
# cluster chains are short, so 10 rounds ≫ any pair-graph diameter
# (an insufficient bound would hash-mismatch, so it is checked).
# ---------------------------------------------------------------------------
def _dedup_clusters_oracle() -> str:
    from erkg_tutorials_spark.plans.oracle_pr import cc_label_prop_sql
    from erkg_tutorials_spark.plans.textq import MINHASH_PAIRS_CTE

    return (
        MINHASH_PAIRS_CTE
        + """,
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
"""
        + cc_label_prop_sql(rounds=10)
        + """
    SELECT d.doc_id,
           COALESCE(l.lbl, d.doc_id) AS cluster,
           d.doc_id = COALESCE(l.lbl, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN l10 l ON d.doc_id = l.id
    """
    )


@register("dedup_clusters", _dedup_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster assignment via large-star/small-star connected components."""
    from erkg_tutorials_spark.dedup.clusters import dedup_assign
    from erkg_tutorials_spark.plans.textq import minhash_pairs_cached

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    pairs = minhash_pairs_cached(spark, sf_dir)
    out = dedup_assign(docs.select("doc_id"), pairs)
    return out.select("doc_id", "cluster", "is_canonical")


# Same oracle as dedup_clusters ON PURPOSE (r8 VERDICT item 5): the
# flood-safe composed path (exact-hash collapse -> rep-level pairs ->
# components -> members inherit the rep's component, O(d) rows under a
# d-copy flood) must reproduce the pair-expanded verdicts bit-for-bit.
@register("dedup_flood_clusters", _dedup_clusters_oracle())
def dedup_flood_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flood-safe dedup verdicts: collapse-first cluster assignment that never materializes pair-level rows, verdict-identical to dedup_clusters."""
    from erkg_tutorials_spark.dedup.minhash import minhash_lsh_cluster_assign

    t = load_tables(spark, sf_dir)
    return minhash_lsh_cluster_assign(
        t["documents"], k=5, num_hashes=8, bands=2, threshold=0.5
    )


# ---------------------------------------------------------------------------
# N2 — shape-rule NER (text/ner.py) over a corpus constructed from the
# TPC-H name columns (the synthetic documents table is all-lowercase,
# which would make the oracle a trivially-empty compare). Four
# sentence shapes exercise every rule: honorific PERSON, plain
# capitalized-run PERSON, determiner-stripped ORG, suffix ORG, and
# singleton drops (sentence-start tokens, ALL-CAPS nation names).
# ---------------------------------------------------------------------------
_N2_DOCS_CASE = """
      CASE CAST({key} % 4 AS INTEGER)
        WHEN 0 THEN 'Mr. Alan Smith' || CAST({key} AS {vtype}) || ' works at Acme Corp. near the lake .'
        WHEN 1 THEN 'Khadija Ismayilova' || CAST({key} AS {vtype}) || ' met Barack Obama in ' || {nation} || ' .'
        WHEN 2 THEN 'This Londex Resources S.A. subsidiary filed in ' || {nation} || ' today .'
        ELSE 'Analysts expect Zeta Holdings Ltd.' || CAST({key} AS {vtype}) || ' to expand .'
      END
"""


def _n2_oracle() -> str:
    from erkg_tutorials_spark.text.ner import shape_ner_oracle_sql

    case = _N2_DOCS_CASE.format(
        key="c_custkey", vtype="VARCHAR", nation="n.n_name"
    )
    docs_cte = f"""
    WITH docs AS MATERIALIZED (
      SELECT c_custkey AS doc_id, {case} AS text
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE c_custkey < 300
    )"""
    return shape_ner_oracle_sql(docs_cte)


@register("n2_shape_ner", _n2_oracle())
def n2_shape_ner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-rule statistical NER tier: capitalization/digit-pattern entity spans per doc."""
    from erkg_tutorials_spark.text.ner import shape_ner

    t = load_tables(spark, sf_dir)
    case = _N2_DOCS_CASE.format(key="c_custkey", vtype="STRING", nation="n_name")
    docs = (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.col("c_custkey") < 300)
        .select(F.col("c_custkey").alias("doc_id"), F.expr(case).alias("text"))
    )
    return shape_ner(docs)


# ---------------------------------------------------------------------------
# Near-dup retention policy: after MinHash clustering, keep ONE
# canonical document per cluster chosen by quality (longest in tokens,
# ties by doc_id) — the step a training-data pipeline actually ships
# (dedup_clusters labels the clusters; this decides who survives).
# Reference scope: the reference has no dedup at all; declared
# extension tier. Scale: clusters come from the memoized banded pair
# set (no all-pairs), the argmax is one window partitioned by cluster
# (bounded groups), and singletons never shuffle twice — the quality
# join is on doc_id, the same key the scan is already hashed by.
# ---------------------------------------------------------------------------
def _dedup_keep_best_oracle() -> str:
    from erkg_tutorials_spark.plans.oracle_pr import cc_label_prop_sql
    from erkg_tutorials_spark.plans.textq import MINHASH_PAIRS_CTE

    return (
        MINHASH_PAIRS_CTE
        + """,
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
"""
        + cc_label_prop_sql(rounds=10)
        + """,
    asg AS (
      SELECT d.doc_id, COALESCE(l.lbl, d.doc_id) AS cluster,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
      FROM documents d LEFT JOIN l10 l ON d.doc_id = l.id
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY n_tok DESC, doc_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_docs
      FROM asg
    )
    SELECT cluster, doc_id AS kept_doc_id, n_tok AS kept_n_tok,
           n_docs, CAST(n_docs - 1 AS BIGINT) AS n_dropped
    FROM ranked WHERE rk = 1
    """
    )


@register("dedup_keep_best", _dedup_keep_best_oracle())
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc selection per near-dup cluster: argmax token
    count (ties: lowest doc_id). One row per cluster — singletons keep
    themselves with n_dropped = 0."""
    from erkg_tutorials_spark.dedup.clusters import dedup_assign
    from erkg_tutorials_spark.plans.textq import minhash_pairs_cached

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    pairs = minhash_pairs_cached(spark, sf_dir)
    clusters = dedup_assign(docs.select("doc_id"), pairs).select(
        "doc_id", "cluster"
    )
    quality = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok")
    )
    joined = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster").orderBy(F.desc("n_tok"), "doc_id")
    ranked = joined.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_docs", F.count("*").over(Window.partitionBy("cluster")).cast("long")
    )
    return ranked.where(F.col("rk") == 1).select(
        "cluster",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_tok").alias("kept_n_tok"),
        "n_docs",
        (F.col("n_docs") - 1).cast("long").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Train/eval leakage audit: near-dup pairs that CROSS split
# boundaries. Deduplicating before splitting is the rule; this is the
# verifier a training-data pipeline runs to prove it — every MinHash
# near-dup pair whose two docs landed in different splits is a
# potential eval-contamination channel (the document-level twin of
# the n-gram `text_contamination` probe). Composes the two existing
# oracles verbatim: the MinHash pair set (textq) and the md5-coin
# split (split_assign above), so the audit is itself hash-gated.
# Scale notes (100 TB): the pair set is tiny (∝ true near-dups); the
# split columns are two broadcast-friendly id-keyed joins against it
# — the documents table is scanned only for (doc_id), pruned columns.
# ---------------------------------------------------------------------------
def _leakage_oracle() -> str:
    from erkg_tutorials_spark.plans.textq import MINHASH_PAIRS_CTE

    expr = f"((({_NIB.format(p=13)}) * 16 + ({_NIB.format(p=14)})) * 16 + ({_NIB.format(p=15)})) * 16 + ({_NIB.format(p=16)})"
    return (
        MINHASH_PAIRS_CTE
        + f""",
    hsplit AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    ),
    splits AS (
      SELECT doc_id,
             CASE WHEN ({expr}) % 100 < 80 THEN 'train'
                  WHEN ({expr}) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM hsplit
    )
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
    FROM pairs p
    JOIN splits sa ON sa.doc_id = p.id_a
    JOIN splits sb ON sb.doc_id = p.id_b
    WHERE sa.split <> sb.split
    """
    )


@register("split_leakage_audit", _leakage_oracle())
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination audit: MinHash near-dup pairs whose documents fall in different train/val/test splits."""
    from erkg_tutorials_spark.plans.textq import minhash_pairs_cached

    t = load_tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 13, 4), 16, 10)
        .cast("long")
        % 100
    )
    splits = t["documents"].select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    pairs = minhash_pairs_cached(spark, sf_dir)
    return (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
            ),
            "id_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
            ),
            "id_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )
