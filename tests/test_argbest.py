"""argmax_one / argmin_one (similarity/knn.py) — the r12 min-struct
replacement for the row_number argbest windows in the ANN assignment
paths (kmeans/ivf/pq/cosine_join). Pins exact equivalence with the
window formulation they replaced, including the tiebreak, on a frame
with duplicate scores and multi-column keys/payloads."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.similarity.knn import argmax_one, argmin_one


@pytest.fixture(scope="module")
def cand(spark):
    # (key1, key2) groups × candidates; scores include exact ties so
    # the cid tiebreak is exercised, plus an array payload like the
    # real assignment sites carry (emb / sub).
    rows = []
    for k1 in range(4):
        for k2 in range(3):
            for cid in range(6):
                score = float((cid * 7 + k1 * 3 + k2) % 5)  # many ties
                rows.append((k1, k2, cid, score, [float(cid), float(k1)]))
    return spark.createDataFrame(
        rows, "k1 int, k2 int, cid int, score double, vec array<double>"
    )


def _window_best(df, desc: bool):
    order = [F.desc("score"), F.asc("cid")] if desc else [
        F.asc("score"), F.asc("cid")
    ]
    w = Window.partitionBy("k1", "k2").orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("k1", "k2", "cid", "vec")
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_argmax_equals_window(cand):
    got = argmax_one(
        cand, keys=["k1", "k2"], score="score", tie="cid",
        payload=["cid", "vec"],
    ).select("k1", "k2", "cid", "vec")
    assert _sorted_rows(got) == _sorted_rows(_window_best(cand, desc=True))


def test_argmin_equals_window(cand):
    got = argmin_one(
        cand, keys=["k1", "k2"], score="score", tie="cid",
        payload=["cid", "vec"],
    ).select("k1", "k2", "cid", "vec")
    assert _sorted_rows(got) == _sorted_rows(_window_best(cand, desc=False))


def test_partial_agg_below_exchange(cand):
    """The point of the rewrite: the candidate fan is PARTIALLY
    aggregated on the map side (min(struct) with a partial_min below
    the Exchange), so the shuffle carries one pre-reduced row per key
    per map partition instead of the whole per-key fan — and no Window
    runs. (The aggregate is a SortAggregate — struct buffers are not
    hash-mutable — but its sort is map-local over data the window form
    would have shuffled in full and sorted anyway.)"""
    got = argmax_one(
        cand, keys=["k1", "k2"], score="score", tie="cid", payload=["cid"]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # partial_min on the scan side of the exchange
    pre_exchange = plan.split("Exchange")[-1]
    assert "partial_min" in pre_exchange
