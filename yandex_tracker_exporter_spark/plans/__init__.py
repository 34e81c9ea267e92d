from yandex_tracker_exporter_spark.plans.search_spec import SearchSpec, compile_search

__all__ = ["SearchSpec", "compile_search"]
