"""Text-analysis operators for LLM training-data pipelines.

Quality scoring, language-ID, token counting and fingerprinting over a
``documents(doc_id, text, ...)`` table. All pure built-in SQL functions
(JVM-side, whole-stage-codegen friendly) — no Python UDFs in these hot
paths, so they run at scan speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in")

# Tiny per-language marker lists for the n-gram/stopword language-ID
# heuristic. Deliberately deterministic + SQL-expressible.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "les", "une"),
    "de": ("der", "die", "und"),
}


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokenization → one row per (doc, token)."""
    return df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: token counts, type-token ratio,
    stopword ratio, mean token length (all ratios rounded to 6dp so the
    doubles are engine-stable)."""
    toks = tokens(df, text_col, id_col)
    return toks.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.round(F.countDistinct("tok") / F.count("*"), 6).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("tok").isin(*STOPWORDS_EN), 1).otherwise(0)) / F.count("*"), 6
        ).alias("stopword_ratio"),
        F.round(F.sum(F.length("tok")) / F.count("*"), 6).alias("avg_token_len"),
    )


# Frozen linear quality-classifier weights (fastText/CCNet-style
# "model-based quality filter", but with the trained coefficients
# frozen in-repo so the scorer is hermetic and pure-SQL). Order
# matters: z is accumulated left-to-right in exactly this order in
# BOTH engines, so the double arithmetic is bit-identical (IEEE-754
# + and * are deterministic; only re-association could diverge).
# n_tokens is scaled by 1/256 (a power of two, so the division is
# exact in binary64).
QUALITY_LOGIT_WEIGHTS = {
    "intercept": -2.4375,
    "ttr": 2.0,
    "stopword_ratio": 8.0,
    "avg_token_len": 0.25,
    "n_tokens_over_256": -1.0,
}


def quality_z_sql(
    ttr: str = "ttr",
    stopword_ratio: str = "stopword_ratio",
    avg_token_len: str = "avg_token_len",
    n_tokens: str = "n_tokens",
) -> str:
    """The logit expression as ANSI SQL, built from
    ``QUALITY_LOGIT_WEIGHTS`` — the single source of truth shared by
    every oracle that replays the scorer (``quality_logistic_score``
    and the composed e3 pipeline), so a weight change can never
    silently desync one replay from the plan. Term order matches
    :func:`logistic_quality` exactly: binary64 ``+``/``*`` are
    deterministic, so identical association ⇒ bit-identical doubles.
    """
    w = QUALITY_LOGIT_WEIGHTS
    return (
        f"{w['intercept']} + {w['ttr']} * {ttr}"
        f" + {w['stopword_ratio']} * {stopword_ratio}"
        f" + {w['avg_token_len']} * {avg_token_len}"
        f" + {w['n_tokens_over_256']} * ({n_tokens} / 256.0)"
    )


def logistic_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_n_tokens: bool = False,
) -> DataFrame:
    """Frozen-weight linear quality classifier over the
    :func:`quality_scores` features: emits the logit ``quality_z``
    (monotone in the keep-probability — the sigmoid is skipped so the
    output stays bit-deterministic across engines) and the keep
    verdict ``z >= 0``. The inference is a pure codegen'd expression:
    the "model" runs at scan speed with no Python boundary.
    """
    w = QUALITY_LOGIT_WEIGHTS
    feats = quality_scores(df, text_col, id_col)
    z = (
        F.lit(w["intercept"])
        + F.lit(w["ttr"]) * F.col("ttr")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["avg_token_len"]) * F.col("avg_token_len")
        + F.lit(w["n_tokens_over_256"]) * (F.col("n_tokens") / F.lit(256.0))
    )
    # quality_z is deliberately NOT rounded: the accumulation order
    # makes the binary64 value itself engine-identical, while a
    # 6dp ROUND would re-introduce divergence on half-boundary values
    # (Spark rounds the shortest-decimal rendering HALF_UP; DuckDB
    # rounds the binary expansion — they disagree on e.g. z=-0.1299165).
    cols = [F.col(id_col), z.alias("quality_z"), (z >= F.lit(0.0)).alias("keep")]
    if include_n_tokens:
        # downstream packing/sharding needs the token count anyway;
        # passing it through avoids a second tokenize+groupBy pass
        cols.insert(1, F.col("n_tokens"))
    return feats.select(*cols)


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (ceil(len/4) per word — the classic ~4-chars-per-token rule)."""
    toks = tokens(df, text_col, id_col)
    return toks.groupBy(id_col).agg(
        F.count("*").alias("n_ws_tokens"),
        F.sum(F.ceil(F.length("tok") / 4.0)).alias("n_subword_est"),
    )


# GPT-2-style pre-tokenizer, constrained to the RE2 ∩ Java regex
# subset (no lookahead; explicit ASCII classes instead of \p{L} so
# both engines agree byte-for-byte): contraction suffixes, space-
# prefixed letter runs, digit runs, punctuation runs.
BPE_PRETOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def bpe_pretoken_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc count of BPE pre-tokens (the segmentation step every
    BPE/byte-level tokenizer applies before merges) — a far tighter
    token estimate than chars/4, still pure JVM regex (no Python,
    no vocab file)."""
    return df.select(
        id_col,
        F.size(
            F.regexp_extract_all(text_col, F.lit(BPE_PRETOKEN_PATTERN), 0)
        ).cast("long").alias("n_pretokens"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic content fingerprint: md5 of the whitespace-
    normalized, lowercased text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), " +", " ")
    return df.select(id_col, F.md5(norm).alias("fingerprint"))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language-ID heuristic.

    Scores each doc against per-language marker lists; argmax with
    a fixed tiebreak order (en > de > es > fr by score, then language
    code ascending). Returns ``(doc_id, <lang>_hits..., pred_lang)``.
    """
    toks = tokens(df, text_col, id_col)
    aggs = [
        F.sum(F.when(F.col("tok").isin(*words), 1).otherwise(0)).alias(f"{lang}_hits")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    scored = toks.groupBy(id_col).agg(*aggs)
    # argmax via greatest + chained when (ties broken by lang code asc)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"{l}_hits") for l in langs])
    pred = F.when(F.col(f"{langs[0]}_hits") == best, langs[0])
    for l in langs[1:]:
        pred = pred.when(F.col(f"{l}_hits") == best, l)
    return scored.withColumn("pred_lang", pred)


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1 —
    public paper), the n-gram family (the line-based family needs
    multi-line docs):

    - ``frac_top_2gram``  — characters covered by the most frequent
      token 2-gram / total characters (Gopher drops > 0.20)
    - ``frac_dup_3gram``  — characters covered by all 3-grams that
      occur more than once / total characters (drops > 0.18)
    - ``top_token_ratio`` — occurrences of the most frequent token /
      token count

    Gram "characters covered" = occurrences × gram string length, the
    deterministic overlap-free approximation both engines compute
    identically. Single scan per gram order, groupBy (doc, gram),
    per-doc window argmax — no Python anywhere.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("doc_len"),
        F.split(F.lower(F.col(text_col)), " ").alias("w"),
    )

    def grams(n: int) -> DataFrame:
        return base.select(
            "doc_id",
            "doc_len",
            F.explode(
                # sequence(1, 0) DESCENDS in Spark, so short docs need
                # the explicit size guard, not a greatest() clamp
                F.expr(
                    f"CASE WHEN size(w) >= {n} THEN"
                    f" transform(sequence(1, size(w) - {n - 1}),"
                    f" i -> array_join(slice(w, i, {n}), ' '))"
                    " ELSE cast(array() as array<string>) END"
                )
            ).alias("gram"),
        ).groupBy("doc_id", "doc_len", "gram").agg(F.count("*").alias("c"))

    w_top = Window.partitionBy("doc_id").orderBy(
        F.desc("c"), F.asc("gram")
    )
    top2 = (
        grams(2)
        .withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.round(
                F.col("c") * F.length("gram") / F.col("doc_len"), 6
            ).alias("frac_top_2gram"),
        )
    )
    dup3 = (
        grams(3)
        .where(F.col("c") > 1)
        .groupBy("doc_id", "doc_len")
        .agg(F.sum(F.col("c") * F.length("gram")).alias("dup_chars"))
        .select(
            "doc_id",
            F.round(F.col("dup_chars") / F.col("doc_len"), 6).alias(
                "frac_dup_3gram"
            ),
        )
    )
    toptok = (
        tokens(df, text_col, id_col)
        .groupBy(F.col(id_col).alias("doc_id"), "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c") / F.sum("c"), 6).alias("top_token_ratio")
        )
    )
    return (
        base.select("doc_id")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .join(toptok, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("frac_top_2gram", F.lit(0.0)).alias("frac_top_2gram"),
            F.coalesce("frac_dup_3gram", F.lit(0.0)).alias("frac_dup_3gram"),
            F.coalesce("top_token_ratio", F.lit(0.0)).alias("top_token_ratio"),
        )
    )
