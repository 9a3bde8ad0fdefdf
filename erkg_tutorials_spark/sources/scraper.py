"""S9 — HTTP article scrape source (SURVEY.md §2.1).

Reference: ``IcijScraper`` (/root/reference/src/scraper.py:17-78) —
GET each URL with a browser UA header, parse ONLY the
``<header class="post-header">`` and ``<div class="post-body">``
subtrees (SoupStrainer = parse-time pushdown, F8), keep the text of
``h1``/``p``/``figcaption`` nodes, join with newlines adding a "." after
the h1 title (C10).

Spark shape: URLs arrive as a DataFrame; fetching runs inside
``mapInPandas`` so a 100M-URL crawl partitions across executors with
per-partition connection reuse. The HTTP client is injectable (and
this container has no network/requests lib, so tests inject a stub);
the HTML→text extraction — the actual operator semantics — is real and
tested.

bs4 is unavailable here, so extraction uses a small regex HTML walker
scoped to the strained subtrees; same observable behavior on the
reference's page shape.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

USER_AGENT = "Mozilla/5.0 (compatible; erkg-spark/0.1)"

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("text", StringType()),
    ]
)

_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")


def _strain(html: str) -> list[str]:
    """F8 parse-time pushdown: keep only the post-header and post-body
    subtrees (reference SoupStrainer predicate, scraper.py:30-34)."""
    out = []
    for pat in (
        r"<header[^>]*class=\"[^\"]*post-header[^\"]*\"[^>]*>(.*?)</header>",
        r"<div[^>]*class=\"[^\"]*post-body[^\"]*\"[^>]*>(.*?)</div>",
    ):
        out += re.findall(pat, html, flags=re.S | re.I)
    return out


def _node_texts(fragment: str) -> list[str]:
    """Text of h1 / p / figcaption nodes, in document order."""
    texts = []
    for m in re.finditer(
        r"<(h1|p|figcaption)\b[^>]*>(.*?)</\1>", fragment, flags=re.S | re.I
    ):
        txt = _WS.sub(" ", _TAG.sub(" ", m.group(2))).strip()
        if txt:
            texts.append(txt)
    return texts


def extract_article_text(html: str) -> str:
    """C10: newline-join fragment texts; the first (the h1 title) gets
    a trailing '.' (reference scraper.py:68-74)."""
    texts = []
    for fragment in _strain(html):
        texts += _node_texts(fragment)
    return "\n".join(t + "." if i == 0 else t for i, t in enumerate(texts))


def scrape_documents(
    urls: DataFrame,
    fetch: Callable[[str], str],
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, url, text) from a URL DataFrame via mapInPandas.

    ``fetch(url) -> html`` is injectable: a requests session with the
    UA header in production, a stub in tests/this container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "url": pdf[url_col],
                    "text": [extract_article_text(fetch(u)) for u in pdf[url_col]],
                }
            )

    return urls.mapInPandas(run, DOCUMENTS_SCHEMA)


def default_fetch(
    user_agent: str | None = None, timeout: float = 30.0
) -> Callable[[str], str]:
    """Opt-in stdlib HTTP fetcher for :func:`scrape_documents`.

    The reference fetches with a browser User-Agent header
    (/root/reference/src/scraper.py:7-8,56-60 — ``requests.get(url,
    headers=SCRAPE_HEADERS)``); this is the same contract on
    ``urllib.request`` so production use needs no extra dependency.
    It is NOT the default argument of ``scrape_documents`` on purpose:
    fetching is an explicit opt-in (``fetch=default_fetch()``), so no
    test, oracle replay, or sandboxed run ever touches the network
    implicitly. The returned callable is executed inside executor
    tasks (one call per URL within the Arrow batch loop) and is
    pickle-friendly: it captures only the two scalars.
    """
    ua = user_agent or (
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0 Safari/537.36"
    )

    def fetch(url: str) -> str:
        from urllib.request import Request, urlopen

        req = Request(url, headers={"User-Agent": ua})
        with urlopen(req, timeout=timeout) as resp:
            charset = resp.headers.get_content_charset() or "utf-8"
            return resp.read().decode(charset, errors="replace")

    return fetch
