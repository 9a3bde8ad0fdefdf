"""Graph query surface, wave 2: spanning-forest and independent-set
verbs over the customer↔supplier trade graph (the GDS catalogue tier,
/root/reference/Readme.md) — distributed Borůvka MST and Luby-style
MIS, both derandomized so the DuckDB oracle is a full hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from erkg_tutorials_spark.graph.mis import luby_mis, luby_mis_sql
from erkg_tutorials_spark.graph.mst import boruvka_forest, boruvka_forest_sql
from erkg_tutorials_spark.plans.graphq import (
    _SYM_EDGES_CTE,
    _WSYM_EDGES_CTE,
    trade_edges_sym,
    trade_wedges_sym,
)

QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


MST_ROUNDS = 4
MST_JUMPS = 7
MIS_ROUNDS = 6


@register(
    "g_mst_forest",
    boruvka_forest_sql(_WSYM_EDGES_CTE, rounds=MST_ROUNDS, jumps=MST_JUMPS),
)
def g_mst_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the trade-count weighted graph via deterministic Borůvka rounds (edge_a, edge_b, weight, round)."""
    return boruvka_forest(
        trade_wedges_sym(spark, sf_dir), rounds=MST_ROUNDS, jumps=MST_JUMPS
    )


@register(
    "g_mis_luby",
    luby_mis_sql(_SYM_EDGES_CTE, rounds=MIS_ROUNDS),
)
def g_mis_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set of the trade graph via hash-derandomized Luby rounds (id, round selected)."""
    return luby_mis(trade_edges_sym(spark, sf_dir), rounds=MIS_ROUNDS)
