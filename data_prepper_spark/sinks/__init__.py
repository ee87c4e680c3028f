"""Push sinks: per-partition writers to external endpoints."""

from data_prepper_spark.sinks.http import http_sink  # noqa: F401
