"""Streaming registry tier (plans/streamq.py): the claims the oracle
can't see directly.

The sf0.001 oracle parity for all three queries lives in
test_oracle_parity.py like every other registry entry; these tests pin
the *streaming-specific* facts: the plans are genuinely streaming, and
the dedup sink collapses the doubled feed BEFORE the batch aggregation
(the oracle only proves the post-aggregation numbers).
"""

from pyspark.sql import functions as F

from erkg_tutorials_spark.plans.streamq import _drain
from erkg_tutorials_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
)
from tests.conftest import SF_DIR


def test_streaming_plans_are_streaming(spark):
    assert read_events_stream(spark, SF_DIR).isStreaming


def test_dedup_sink_holds_exactly_one_copy(spark):
    doubled = read_events_stream(spark, SF_DIR).unionByName(
        read_events_stream(spark, SF_DIR)
    )
    sink = _drain(dedup_stream(doubled, keys=["event_id"]), "t_dedup", "append")
    n_single = (
        spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    )
    assert sink.count() == n_single  # 2n in, n out — not 2n, not n-1
    # and every key survived exactly once
    assert (
        sink.groupBy("event_id").count().where(F.col("count") > 1).count() == 0
    )
