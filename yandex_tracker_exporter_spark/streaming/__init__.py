from yandex_tracker_exporter_spark.streaming.pipeline import (
    read_event_stream,
    read_tracker_stream,
    windowed_event_counts,
    run_micro_batch_upsert,
)

__all__ = [
    "read_event_stream",
    "read_tracker_stream",
    "windowed_event_counts",
    "run_micro_batch_upsert",
]
