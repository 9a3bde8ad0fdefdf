"""LLM-training-data operators, batch 2: positional inverted index,
bigram language-model statistics, and SemDeDup-style semantic
deduplication.

- ``inverted_index_postings`` builds the classic search-index
  artifact (term → sorted position postings per document, plus
  document frequency) with one explode and one groupBy — the shape a
  100 TB corpus indexer shards by term.
- ``text_bigram_lm`` computes exact bigram conditional probabilities
  (the counting core of perplexity-based quality filtering): all
  integer counts, one final rounded division per row.
- ``dedup_semantic`` is the SemDeDup pattern (Abbas et al. 2023,
  arXiv:2303.09540): cluster embeddings with k-means, then mark
  near-duplicates ONLY within each cluster — pairwise work is bounded
  by cluster size, never corpus². The k-means centroids are the same
  deterministically-trained, session-memoized set the IVF index uses
  (plans/vectorq.py), so the full DuckDB oracle replays training,
  assignment, and intra-cluster scoring bit-for-bit.
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


# Shared token-position CTE: 1-based positions in both engines
# (DuckDB lists are 1-based; Spark's posexplode is 0-based, so the
# Spark side adds 1).
_POS_CTE = """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, w[i] AS term, CAST(i AS BIGINT) AS i
      FROM toks CROSS JOIN unnest(generate_series(1, len(w))) AS t(i)
    )
"""


def _positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos0", "term"),
    ).select("doc_id", "term", (F.col("pos0") + 1).cast("long").alias("i"))


@register(
    "inverted_index_postings",
    _POS_CTE
    + """,
    g AS (
      SELECT term, doc_id, COUNT(*) AS tf,
             array_to_string(list_sort(list(i)), ' ') AS positions
      FROM pos GROUP BY 1, 2
    )
    SELECT term, doc_id, tf, positions,
           COUNT(*) OVER (PARTITION BY term) AS df
    FROM g
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index: one row per (term, document) with
    the sorted in-document positions (space-joined — flat scalar
    output so any downstream canonicalizer can sort rows) and the
    term's document frequency. Single shuffle keyed by (term, doc_id);
    the df window re-uses the same term partitioning (no extra
    exchange beyond the window sort)."""
    g = (
        _positions(spark, sf_dir)
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").alias("tf"),
            F.array_join(
                F.sort_array(F.collect_list("i")), " "
            ).alias("positions"),
        )
    )
    return g.withColumn("df", F.count("*").over(Window.partitionBy("term")))


@register(
    "text_bigram_lm",
    _POS_CTE
    + """,
    bi AS (
      SELECT doc_id, term AS w1,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY i) AS w2
      FROM pos
    ),
    c AS (
      SELECT w1, w2, COUNT(*) AS c_bigram
      FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2
    )
    SELECT w1, w2, c_bigram,
           CAST(SUM(c_bigram) OVER (PARTITION BY w1) AS BIGINT) AS c_left,
           ROUND(c_bigram * 1.0 / SUM(c_bigram) OVER (PARTITION BY w1), 6) AS p_cond
    FROM c
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bigram conditional probabilities P(w2 | w1).

    All counting is integer (associative, order-independent); the
    single division happens once per output row on already-final
    integers, so both engines produce the identical rounded double.
    Output is vocab² -bounded — tiny relative to the corpus — and the
    plan is explode → count → one window over the (small) count table.
    """
    pos = _positions(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("i")
    bi = pos.select(
        F.col("term").alias("w1"), F.lead("term").over(w).alias("w2")
    ).where(F.col("w2").isNotNull())
    c = bi.groupBy("w1", "w2").agg(F.count("*").alias("c_bigram"))
    wleft = Window.partitionBy("w1")
    return c.select(
        "w1",
        "w2",
        "c_bigram",
        F.sum("c_bigram").over(wleft).alias("c_left"),
        F.round(F.col("c_bigram") / F.sum("c_bigram").over(wleft), 6).alias("p_cond"),
    )


# ---------------------------------------------------------------------------
# SemDeDup: k-means cluster → intra-cluster near-dup flags.
# ---------------------------------------------------------------------------
SEMDEDUP_TAU = 0.25


def _semdedup_oracle() -> str:
    from erkg_tutorials_spark.plans.vectorq import _kmeans_cent_cte

    return (
        _kmeans_cent_cte()
        + f"""
    assign_scored AS (
      SELECT v.vec_id, c.cent_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY ROUND(list_dot_product(v.emb, c.cvec)
               / (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC, c.cent_id) AS rn
      FROM v CROSS JOIN cent c
    ),
    assigned AS MATERIALIZED (
      SELECT a.vec_id, a.cent_id AS cell, v.emb
      FROM assign_scored a JOIN v ON v.vec_id = a.vec_id WHERE a.rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.emb, b.emb)
              / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6) >= {SEMDEDUP_TAU}
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           d.vec_id IS NOT NULL AS is_dup
    FROM assigned s LEFT JOIN dups d ON d.vec_id = s.vec_id
    """
    )


@register("dedup_semantic", _semdedup_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: a vector is a duplicate iff some
    LOWER-id vector in its k-means cluster has cosine ≥ τ (so the
    min-id member of every near-dup group survives).

    Scale shape: centroids broadcast (k rows); assignment is one
    map-side pass; the only self-join is keyed by cluster cell, so
    pairwise work is Σ cell², bounded by the clustering — the whole
    point of SemDeDup vs all-pairs. Reuses the session-memoized IVF
    centroids (vectorq.ivf_centroids_cached), whose deterministic
    hash-seeded Lloyd training the oracle replays exactly.
    """
    from erkg_tutorials_spark.plans.vectorq import ivf_centroids_cached
    from erkg_tutorials_spark.similarity.knn import _as_double, _dot

    emb = load_tables(spark, sf_dir)["embeddings"]
    v = emb.select("vec_id", _as_double("embedding").alias("emb"))
    cent = ivf_centroids_cached(spark, sf_dir).select(
        "cent_id", F.col("cvec").alias("cvec")
    )
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "cos",
        F.round(
            _dot("emb", "cvec")
            / (F.sqrt(_dot("emb", "emb")) * F.sqrt(_dot("cvec", "cvec"))),
            6,
        ),
    )
    wv = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    # norms precomputed ONCE per vector here: the intra-cell pair scan
    # below touches each vector ~|cell| times and must not redo the
    # O(d) self-dot per pair (the knn modules' standard trick)
    assigned = (
        scored.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").cast("long").alias("cell"), "emb")
        .withColumn("vn", F.sqrt(_dot("emb", "emb")))
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("cell"),
        F.col("emb").alias("ea"),
        F.col("vn").alias("na"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("cell"),
        F.col("emb").alias("eb"),
        F.col("vn").alias("nb"),
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 6),
        )
        .where(F.col("cos") >= SEMDEDUP_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return assigned.join(dups, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.coalesce(F.col("_d"), F.lit(False)).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (text/bpe.py). The merge loop is fully
# declarative (runs + parity windows make greedy-left merging
# expressible), so the oracle replays training — pair counting,
# lexicographic tie-breaks, run-parity merging — bit-for-bit.
# ---------------------------------------------------------------------------
BPE_MERGES = 8


def _bpe_oracle() -> str:
    from erkg_tutorials_spark.text.bpe import bpe_iterations_sql

    return (
        """
    WITH words AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
      ) WHERE len(word) > 0 GROUP BY 1
    ),"""
        + bpe_iterations_sql(n_merges=BPE_MERGES)
        + """
    SELECT step, left_sym, right_sym, pair_count FROM merges
    """
    )


@register("bpe_train_merges", _bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus's first BPE merges in-engine.

    The corpus is touched once (word-frequency pass); the training
    state is the distinct-word symbol table weighted by frequency —
    corpus-size-independent, the property that makes distributed BPE
    training viable at 100 TB. Every round is one exact-integer pair
    count, a 1-row broadcast of the argmax pair, and one window pass.
    """
    from erkg_tutorials_spark.text.bpe import bpe_train, word_freqs

    docs = load_tables(spark, sf_dir)["documents"]
    merges, _ = bpe_train(word_freqs(docs), n_merges=BPE_MERGES)
    return merges


# ---------------------------------------------------------------------------
# BPE encode-side stats (r10): tokenizer FERTILITY — the
# tokens-per-word and chars-per-token ratios per source after the
# learned merges are applied. The apply side of bpe_train_merges:
# a training-data pipeline budgets token counts (and catches
# vocabulary-hostile sources — code, non-Latin scripts, boilerplate)
# from exactly this table before shard building.
#
# The encode itself costs nothing beyond training here: the final
# training state IS the corpus vocabulary's symbolization, so
# per-word token counts are a COUNT over it, and the corpus pass is
# one explode + (source, word) groupBy joined against the
# |vocabulary|-row counts table. At 100 TB the vocab join is the
# standard dim join (broadcast when it fits, AQE shuffle otherwise);
# the corpus is touched once. All ratios are exact integer `div`
# x1000 — no float anywhere.
# ---------------------------------------------------------------------------
def _bpe_fertility_oracle() -> str:
    from erkg_tutorials_spark.text.bpe import bpe_iterations_sql

    return (
        """
    WITH words AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
      ) WHERE len(word) > 0 GROUP BY 1
    ),"""
        + bpe_iterations_sql(n_merges=BPE_MERGES)
        + f""",
    nsyms AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_syms
      FROM s{BPE_MERGES} GROUP BY word
    ),
    docw AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS occ FROM (
        SELECT source, unnest(string_split(lower(text), ' ')) AS word
        FROM documents
      ) WHERE len(word) > 0 GROUP BY 1, 2
    ),
    agg AS (
      SELECT d.source,
             CAST(SUM(d.occ) AS BIGINT) AS words,
             CAST(SUM(d.occ * n.n_syms) AS BIGINT) AS bpe_tokens,
             CAST(SUM(d.occ * len(d.word)) AS BIGINT) AS chars
      FROM docw d JOIN nsyms n USING (word) GROUP BY 1
    ),
    nd AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    )
    SELECT a.source, nd.n_docs, a.words, a.bpe_tokens, a.chars,
           (a.bpe_tokens * 1000) // a.words AS fertility_x1000,
           (a.chars * 1000) // a.bpe_tokens AS chars_per_token_x1000
    FROM agg a JOIN nd USING (source)
    """
    )


@register("bpe_encode_fertility", _bpe_fertility_oracle())
def bpe_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility under the corpus's own learned BPE merges: words, BPE tokens, chars, and the x1000 integer ratios."""
    from erkg_tutorials_spark.plans.memo import memoized
    from erkg_tutorials_spark.text.bpe import bpe_train, word_freqs

    docs = load_tables(spark, sf_dir)["documents"]
    state = memoized(
        spark,
        sf_dir,
        "bpe_final_state",
        lambda: bpe_train(word_freqs(docs), n_merges=BPE_MERGES)[1],
    )
    nsyms = state.groupBy("word").agg(
        F.count("*").cast("long").alias("n_syms")
    )
    docw = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        )
        .where(F.length("word") > 0)
        .groupBy("source", "word")
        .agg(F.count("*").cast("long").alias("occ"))
    )
    agg = (
        docw.join(nsyms, "word")
        .groupBy("source")
        .agg(
            F.sum("occ").cast("long").alias("words"),
            F.sum(F.col("occ") * F.col("n_syms"))
            .cast("long")
            .alias("bpe_tokens"),
            F.sum(F.col("occ") * F.length("word"))
            .cast("long")
            .alias("chars"),
        )
    )
    nd = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return agg.join(nd, "source").select(
        "source",
        "n_docs",
        "words",
        "bpe_tokens",
        "chars",
        F.expr("(bpe_tokens * 1000L) div words").alias("fertility_x1000"),
        F.expr("(chars * 1000L) div bpe_tokens").alias(
            "chars_per_token_x1000"
        ),
    )


# ---------------------------------------------------------------------------
# Per-document perplexity under the corpus's own bigram MLE LM — the
# quality-filtering signal a training-data pipeline computes for every
# document (CCNet / Gopher-style, with the LM trained in-engine).
#
# Cross-engine float discipline: ln(p) is quantized to an exact 1e-6
# integer PER DISTINCT BIGRAM (a deterministic per-row IEEE op over
# the vocab²-bounded LM table), so the per-document accumulation is
# integer arithmetic — associative, partial-agg-order independent.
# The only post-sum float op is one display division per output row.
# Scale shape: the LM table is vocab²-bounded (tiny vs the corpus);
# per-doc scoring joins each doc's bigram counts to the broadcast LM.
# ---------------------------------------------------------------------------
@register(
    "doc_perplexity_bigram",
    _POS_CTE
    + """,
    bi AS (
      SELECT doc_id, term AS w1,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY i) AS w2
      FROM pos
    ),
    doc_bi AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c_doc
      FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
    ),
    lm AS (
      SELECT w1, w2,
             CAST(ROUND(ln(SUM(c_doc) * 1.0 /
               SUM(SUM(c_doc)) OVER (PARTITION BY w1)) * 1000000, 0) AS BIGINT)
               AS qlog
      FROM doc_bi GROUP BY w1, w2
    )
    SELECT d.doc_id,
           CAST(SUM(d.c_doc) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(d.c_doc * lm.qlog) / (SUM(d.c_doc) * 1000000.0), 6)
             AS avg_nll
    FROM doc_bi d JOIN lm ON lm.w1 = d.w1 AND lm.w2 = d.w2
    GROUP BY d.doc_id
    """,
)
def doc_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average negative log-likelihood per document under the
    corpus-trained bigram MLE model.

    The LM is derived from the same corpus, so every document bigram
    is in-vocabulary (no smoothing needed for MLE scoring). The join
    to the LM is vocab²-bounded — broadcast-sized at any corpus scale.
    """
    pos = _positions(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("i")
    bi = pos.select(
        "doc_id",
        F.col("term").alias("w1"),
        F.lead("term").over(w).alias("w2"),
    ).where(F.col("w2").isNotNull())
    doc_bi = bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("c_doc"))
    wl = Window.partitionBy("w1")
    lm = (
        doc_bi.groupBy("w1", "w2")
        .agg(F.sum("c_doc").alias("c12"))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(F.col("c12") / F.sum("c12").over(wl)) * 1_000_000, 0
            )
            .cast("long")
            .alias("qlog"),
        )
    )
    return (
        doc_bi.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c_doc").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("c_doc") * F.col("qlog"))
                / (F.sum("c_doc") * 1_000_000.0),
                6,
            ).alias("avg_nll"),
        )
    )
