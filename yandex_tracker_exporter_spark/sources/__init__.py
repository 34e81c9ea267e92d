from yandex_tracker_exporter_spark.sources.tables import load_table, load_tables
from yandex_tracker_exporter_spark.sources.state import FileStateStore
from yandex_tracker_exporter_spark.sources.sinks import (
    write_versioned,
    read_latest,
    create_latest_view,
)

__all__ = [
    "load_table",
    "load_tables",
    "FileStateStore",
    "write_versioned",
    "read_latest",
    "create_latest_view",
]
