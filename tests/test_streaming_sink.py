"""Exactly-once streaming sink (streaming/sink.py): crash-replay of a
micro-batch must not duplicate rows, torn first attempts leave no
residue, and a checkpointed restart appends only the NEW epoch."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row

from erkg_tutorials_spark.streaming.sink import (
    exactly_once_parquet_writer,
    read_exactly_once_sink,
    write_stream_exactly_once,
)

SCHEMA = "event_id LONG, value STRING"


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="erkg_sink_")
    paths = {n: os.path.join(base, n) for n in ("input", "sink", "chk")}
    os.makedirs(paths["input"])
    yield paths
    shutil.rmtree(base, ignore_errors=True)


def _rows(spark, path):
    return sorted(
        (r.event_id, r.value) for r in read_exactly_once_sink(spark, path).collect()
    )


def _feed(spark, input_dir, rows, fname):
    spark.createDataFrame([Row(**r) for r in rows], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(input_dir, fname))


def _run_stream(spark, dirs):
    stream = spark.readStream.schema(SCHEMA).parquet(
        os.path.join(dirs["input"], "*")
    )
    q = write_stream_exactly_once(stream, dirs["sink"], dirs["chk"])
    q.awaitTermination()


def test_replayed_epoch_does_not_duplicate(spark, dirs):
    _feed(spark, dirs["input"], [{"event_id": 1, "value": "a"}, {"event_id": 2, "value": "b"}], "f0")
    _run_stream(spark, dirs)
    first = _rows(spark, dirs["sink"])
    assert first == [(1, "a"), (2, "b")]

    # crash-replay: after a failure between sink write and checkpoint
    # commit, foreachBatch re-invokes with the SAME batch_id and the
    # same data — exactly what this simulates
    writer = exactly_once_parquet_writer(dirs["sink"])
    batch = spark.createDataFrame(
        [Row(event_id=1, value="a"), Row(event_id=2, value="b")], SCHEMA
    )
    writer(batch, 0)
    writer(batch, 0)  # replay twice for good measure
    assert _rows(spark, dirs["sink"]) == first


def test_torn_write_replaced_not_appended(spark, dirs):
    writer = exactly_once_parquet_writer(dirs["sink"])
    full = [Row(event_id=i, value=str(i)) for i in range(4)]
    # first attempt of epoch 7 crashed after writing only 2 rows...
    writer(spark.createDataFrame(full[:2], SCHEMA), 7)
    # ...the replay delivers the complete batch
    writer(spark.createDataFrame(full, SCHEMA), 7)
    assert _rows(spark, dirs["sink"]) == [(i, str(i)) for i in range(4)]


def test_checkpointed_restart_appends_new_epoch_only(spark, dirs):
    _feed(spark, dirs["input"], [{"event_id": 1, "value": "a"}], "f0")
    _run_stream(spark, dirs)
    _feed(spark, dirs["input"], [{"event_id": 2, "value": "b"}], "f1")
    _run_stream(spark, dirs)  # restart from the same checkpoint
    assert _rows(spark, dirs["sink"]) == [(1, "a"), (2, "b")]
    # two epochs on disk, each exactly once
    epochs = {
        d for d in os.listdir(dirs["sink"]) if d.startswith("_epoch_id=")
    }
    assert len(epochs) == 2
