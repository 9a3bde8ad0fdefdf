from erkg_tutorials_spark.streaming.events import (
    read_events_stream,
    hourly_rollup_stream,
    run_stream_once,
)
