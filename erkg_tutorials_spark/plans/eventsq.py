"""Event-stream query surface (batch form of the streaming tier).

Timestamps in the events table carry nanosecond precision; Spark reads
parquet ns as µs-truncated while DuckDB keeps ns. Every query therefore
floors to whole epoch seconds (identical in both engines) before any
comparison or output — raw timestamps never leave a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import load_tables
from erkg_tutorials_spark.functions.exact_math import exact_money_sum

QUERIES: dict = {}
ORACLES: dict = {}

SESSION_GAP_SECONDS = 1800


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@register(
    "events_hourly_rollup",
    """
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch twin of the
    Structured Streaming windowed count in streaming/events.py)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            "event_type",
            (F.expr("ts_sec div 3600") * 3600).alias("hour_epoch"),
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_money_sum(F.col("value")).alias("total_value"),
        )
    )


@register(
    "events_sessionize",
    f"""
    WITH e AS (
      SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
    ),
    lagged AS (
      SELECT *, LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM e
    ),
    flags AS (
      SELECT *, CASE WHEN prev IS NULL OR sec - prev > {SESSION_GAP_SECONDS} THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flags
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(sec) AS start_sec, MAX(sec) AS end_sec
    FROM sess GROUP BY 1, 2
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): lag → flag →
    running-sum session ids → per-session rollup. The canonical
    stateful-stream operator expressed as windows (batch form)."""
    t = load_tables(spark, sf_dir)
    e = t["events"].select("user_id", "event_id", F.col("ts_sec").alias("sec"))
    order = Window.partitionBy("user_id").orderBy("sec", "event_id")
    lagged = e.withColumn("prev", F.lag("sec").over(order))
    flags = lagged.withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull() | (F.col("sec") - F.col("prev") > SESSION_GAP_SECONDS), 1
        ).otherwise(0),
    )
    sess = flags.withColumn(
        "session_id", F.sum("new_s").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("sec").alias("start_sec"),
        F.max("sec").alias("end_sec"),
    )


# ---------------------------------------------------------------------------
# A3 — distinct-pair aggregation (reference set((text, kb_id)) per
# phrase, analysis.py:19-21)
# ---------------------------------------------------------------------------
@register(
    "a3_distinct_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def a3_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["events"].groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Sliding window rollup (30-min windows, 15-min slide): each event
# lands in exactly two windows — the batch twin of Structured
# Streaming's window(ts, '30 minutes', '15 minutes')
# ---------------------------------------------------------------------------
@register(
    "events_sliding_window",
    """
    WITH e AS (
      SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
    ),
    expanded AS (
      SELECT event_type, sec, unnest([
        (sec // 900) * 900,
        (sec // 900) * 900 - 900
      ]) AS w_start
      FROM e
    )
    SELECT event_type, w_start, CAST(w_start + 1800 AS BIGINT) AS w_end, COUNT(*) AS n_events
    FROM expanded
    WHERE sec >= w_start AND sec < w_start + 1800
    GROUP BY 1, 2, 3
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t["events"].select("event_type", F.col("ts_sec").alias("sec"))
    expanded = e.select(
        "event_type",
        "sec",
        F.explode(
            F.array(
                F.expr("(sec div 900) * 900"),
                F.expr("(sec div 900) * 900 - 900"),
            )
        ).alias("w_start"),
    ).where((F.col("sec") >= F.col("w_start")) & (F.col("sec") < F.col("w_start") + 1800))
    return expanded.groupBy(
        "event_type", "w_start", (F.col("w_start") + 1800).alias("w_end")
    ).agg(F.count("*").alias("n_events"))
