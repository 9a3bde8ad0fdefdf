"""Exact (order-independent) money arithmetic for cross-engine parity.

Floating-point SUMs are order-dependent: Spark's partial aggregation and
DuckDB's parallel aggregation add terms in different orders, so two
correct engines can disagree in the last ulps — enough to flip a
``round(x, 2)``. Decimal-valued inputs (prices with 2 decimals,
discounts with 2) are therefore scaled to integers *per row* (a
deterministic IEEE op), summed exactly as BIGINT (associative), and
divided back once at the end.

This is also the right call at 100 TB: integer sums are cheaper than
decimal128 and never lose precision no matter how many partial
aggregates AQE stitches together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_cents(col: Column, scale: int = 100) -> Column:
    """Scale a decimal-valued double to an exact integer (row-level).

    ``round`` before ``cast`` matters: Spark's double→long cast truncates
    while DuckDB's rounds, so we always round to an exact integer double
    first — after which both casts agree.
    """
    return F.round(col * F.lit(scale), 0).cast("long")


def exact_money_sum(col: Column, scale: int = 100) -> Column:
    """Order-independent SUM of a decimal-valued double: exact integer
    sum, descaled once. Returns a double."""
    return F.sum(money_cents(col, scale)) / F.lit(float(scale))


def sql_money_cents(expr: str, scale: int = 100) -> str:
    """DuckDB-oracle twin of :func:`money_cents`."""
    return f"CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)"


def sql_exact_money_sum(expr: str, scale: int = 100) -> str:
    """DuckDB-oracle twin of :func:`exact_money_sum`."""
    return f"SUM({sql_money_cents(expr, scale)}) / {float(scale)}"
