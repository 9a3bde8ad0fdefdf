"""Semantic tests for the search-ranking ops (BM25, TF-IDF)."""

import math
from collections import Counter, defaultdict

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.plans.textq import (
    BM25_TERMS,
    bm25_rank,
    tfidf_top_terms,
)
from tests.conftest import SF_DIR


def _corpus(spark):
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text").collect()
    return {r.doc_id: r.text.lower().split(" ") for r in docs}


class TestBM25:
    def test_matches_bruteforce(self, spark):
        corpus = _corpus(spark)
        n_docs = len(corpus)
        avgdl = sum(len(t) for t in corpus.values()) / n_docs
        df = Counter()
        tf = {}
        for d, toks in corpus.items():
            c = Counter(toks)
            tf[d] = c
            for t in BM25_TERMS:
                if c[t] > 0:
                    df[t] += 1
        k1, b = 1.2, 0.75

        def score(d):
            s = 0.0
            dl = len(corpus[d])
            for t in BM25_TERMS:
                f = tf[d][t]
                if f == 0:
                    continue
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1)
                s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
            return round(s, 6)

        want = sorted(
            ((score(d), d) for d in corpus if score(d) > 0),
            key=lambda x: (-x[0], x[1]),
        )[:20]
        got = [(r.score, r.doc_id) for r in bm25_rank(spark, SF_DIR).collect()]
        assert got == want

    def test_scores_positive_and_sorted(self, spark):
        rows = bm25_rank(spark, SF_DIR).collect()
        assert len(rows) > 0
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


class TestTFIDF:
    def test_top_terms_match_bruteforce(self, spark):
        corpus = _corpus(spark)
        tf = {d: Counter(toks) for d, toks in corpus.items()}
        df = Counter()
        for c in tf.values():
            for t in c:
                df[t] += 1
        n_docs = len(corpus)
        want = defaultdict(list)
        for d, c in tf.items():
            scored = sorted(
                ((round(f * math.log(n_docs / df[t]), 6), t) for t, f in c.items()),
                key=lambda x: (-x[0], x[1]),
            )[:3]
            want[d] = [(t, s) for s, t in scored]
        got = defaultdict(list)
        for r in sorted(tfidf_top_terms(spark, SF_DIR).collect(), key=lambda r: (r.doc_id, r.rk)):
            got[r.doc_id].append((r.tok, r.tfidf))
        assert dict(got) == dict(want)
