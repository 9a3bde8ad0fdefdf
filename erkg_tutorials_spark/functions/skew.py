"""Key-salting for skewed joins (SCALING.md global posture).

ERKG key distributions are Zipfian — alias→entity fan-out in the
reference sample is 2,502 aliases over 29 entities (tutorial.ipynb
cells 15-16 outputs), and hub vertices dominate trade-graph
neighborhoods. AQE's skew-join splitting handles most cases at
runtime; explicit salting is the deterministic fallback for the
pathological ones (one key ≫ a whole executor's memory), and the only
option for aggregation skew (AQE does not split skewed groupBy keys).

``salted_join``: replicate the small side ``salt`` times, scatter the
big side uniformly with a deterministic per-row salt, join on
(key, salt). Results are identical to the unsalted join; the shuffle
spreads each hot key over ``salt`` partitions.

``salted_count``: two-level aggregation — count per (key, salt), then
sum per key. The classic skewed-groupBy rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _scatter(df: DataFrame, salt: int) -> DataFrame:
    """Uniform per-row salt. Derived from the row's position
    (monotonically_increasing_id = partition id + in-partition index),
    NOT from row content: hashing the key would send each hot key's
    rows to one salt again, and hashing the full row collapses
    *duplicate* rows of the hot key onto one salt — the exact skew this
    exists to break. Position is stable for a given partitioning and
    any salt value in [0, salt) is correct, so a task retry cannot
    change results."""
    if SALT_COL in df.columns:
        raise ValueError(
            f"input already carries a {SALT_COL!r} column — salting twice "
            "would silently join/aggregate on the stale salt"
        )
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )


def _replicate(df: DataFrame, salt: int) -> DataFrame:
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small`` on column ``on`` with the big side's hot keys
    spread across ``salt`` shuffle partitions. ``small`` is replicated
    ``salt``× — use only when it's broadcast-sized-ish but a plain
    broadcast is off the table (e.g. it exceeds the driver limit).

    Join types preserving the replicated side's unmatched rows
    (right/full) would emit them once per replica; only big-side-
    preserving types are allowed."""
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti", "cross"}:
        raise ValueError(
            f"salted_join supports big-side-preserving join types only, got {how!r}"
        )
    if SALT_COL in small.columns:
        raise ValueError(
            f"small side already carries a {SALT_COL!r} column — replication "
            "would produce a duplicate-named join key"
        )
    b = _scatter(big, salt)
    s = _replicate(small, salt)
    return b.join(s, [on, SALT_COL], how).drop(SALT_COL)


def salted_count(df: DataFrame, key: str, salt: int = 8) -> DataFrame:
    """groupBy(key).count() resilient to key skew: partial count per
    (key, salt), final sum per key."""
    return (
        _scatter(df, salt)
        .groupBy(key, SALT_COL)
        .agg(F.count("*").alias("_c"))
        .groupBy(key)
        .agg(F.sum("_c").alias("count"))
    )
