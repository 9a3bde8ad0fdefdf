"""Streaming joins (SURVEY.md §2.13 extension tier): stream-static
enrichment and the watermarked stream-stream interval join.

- ``enrich_stream``: stream ⋈ static dimension. The static side is a
  plain DataFrame — Spark broadcasts it per micro-batch, no state.
- ``attribution_stream``: the streaming twin of the batch
  ``range_join_view_purchase`` operator (plans/temporal.py) — every
  (view, purchase) pair by the same user with
  ``view.time < purchase.time <= view.time + window``. Stream-stream
  inner join with an event-time range condition: each side is
  watermarked, and the range condition itself bounds how long a view
  must be retained (Spark derives the state watermark from it), so
  state is O(events inside the attribution window), not O(stream).

The parity contract (tests/test_streaming_joins.py): replaying the
events table through ``attribution_stream`` emits exactly the batch
operator's pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW_SECONDS = 3600


def enrich_stream(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static join: attach dimension attributes to each event —
    the streaming counterpart of the broadcast dim join (J1).

    Snapshot semantics: for a file-backed ``dim`` the file listing is
    resolved when the query plan is built, so rows appended to the
    dimension while the query runs are NOT visible to later
    micro-batches (measured on this engine — a batch-1 probe sees the
    batch-0 listing; tests/test_streaming_joins.py pins it). For a
    dimension that must refresh without a restart, use
    :func:`enrich_each_batch`, which re-resolves the dimension per
    micro-batch inside ``foreachBatch``.
    """
    return events.join(F.broadcast(dim), key, "left")


def enrich_each_batch(dim_loader, sink, key: str = "user_id"):
    """Refreshing stream-static enrichment: a ``foreachBatch`` callable
    that re-loads the dimension via ``dim_loader()`` on EVERY
    micro-batch (fresh file listing → appended dim rows are visible),
    broadcast-joins it onto the batch, and hands the result to
    ``sink(enriched_df, batch_id)``.

    This is the standard production pattern for slowly-changing
    dimensions under Structured Streaming: the stream side stays
    incremental while the dimension is a per-batch snapshot read —
    one tiny broadcast per micro-batch, no restart, no join state.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        enriched = batch_df.join(F.broadcast(dim_loader()), key, "left")
        sink(enriched, batch_id)

    return fn


def attribution_stream(
    events: DataFrame,
    window_seconds: int = ATTRIBUTION_WINDOW_SECONDS,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: views ⋈ purchases.

    ``events`` must carry (user_id, event_id, event_type, event_time).
    Both sides derive from the same input stream; each gets its own
    watermark. The join condition's time bounds let Spark evict view
    state once the purchase-side watermark passes
    ``view.event_time + window_seconds`` — bounded state by
    construction, the same eviction reasoning as the batch operator's
    bucketing argument.

    ``how="left_outer"`` additionally emits every unmatched view with
    null purchase columns — but only once the watermark passes the
    view's join bound (that is when "no purchase will ever match" is
    certain). Views younger than the watermark at end-of-input remain
    in state, NOT in the output: outer results are
    watermark-triggered, never end-of-stream-triggered. A consumer
    needing a final flush must advance event time past the bound
    (e.g. a heartbeat event) — pinned by the outer-join test.

    ``how="full_outer"`` emits unmatched rows from BOTH sides: views
    as in left_outer, and purchases with null view columns once the
    watermark passes the purchase's own bound (a view must precede
    its purchase, so "no view will ever match" is certain as soon as
    the view-side watermark passes purchase_time). ``user_id`` is
    taken from whichever side is present.
    """
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event_id"),
        F.col("event_time").alias("view_time"),
    ).withWatermark("view_time", watermark)
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("event_time").alias("purchase_time"),
    ).withWatermark("purchase_time", watermark)
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_time") > F.col("view_time"))
        & (
            F.col("purchase_time")
            <= F.col("view_time") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
        how,
    )
    return joined.select(
        F.coalesce("v_user", "p_user").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        F.unix_micros(F.col("view_time")).alias("view_us"),
        F.unix_micros(F.col("purchase_time")).alias("purchase_us"),
    )
