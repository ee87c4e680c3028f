"""Trace-pipeline stateful operators, batch form (SURVEY.md §2.6).

* service_map (reference service-map-stateful/.../
  ServiceMapStatefulProcessor.java:45: correlates spans by traceId
  across two rotating MapDB windows to emit service-graph edges) —
  in batch a self-join by (traceId, parent span) suffices; the state
  windows exist only because the reference streams.
* otel trace-group fill (otel-trace-raw-processor/.../
  OTelTraceRawProcessor.java:45: root span's traceGroup copied onto
  children, late children held in a TTL cache) — batch: broadcast join
  of root spans onto the trace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def service_map_edges(
    spans: DataFrame,
    trace_id: str = "trace_id",
    span_id: str = "span_id",
    parent_span_id: str = "parent_span_id",
    service: str = "service_name",
) -> DataFrame:
    """Distinct (source_service, dest_service) edges: child span whose
    parent belongs to a different service (RELATIONSHIP_STATE dedup set,
    ServiceMapStatefulProcessor.java:75)."""
    parents = spans.select(
        F.col(trace_id).alias("_t"),
        F.col(span_id).alias("_pid"),
        F.col(service).alias("source_service"),
    )
    children = spans.select(
        F.col(trace_id).alias("_t"),
        F.col(parent_span_id).alias("_pid"),
        F.col(service).alias("dest_service"),
    ).filter(F.col("_pid").isNotNull())
    return (
        children.join(parents, ["_t", "_pid"])
        .filter(F.col("source_service") != F.col("dest_service"))
        .select("source_service", "dest_service")
        .distinct()
    )


def fill_trace_group(
    spans: DataFrame,
    trace_id: str = "trace_id",
    parent_span_id: str = "parent_span_id",
    name: str = "name",
    trace_group: str = "trace_group",
) -> DataFrame:
    """Copy the root span's name onto every span of the trace as
    trace_group (root = parent_span_id IS NULL)."""
    roots = (
        spans.filter(F.col(parent_span_id).isNull())
        .select(F.col(trace_id), F.col(name).alias("_root_name"))
    )
    # plain shuffle join on trace_id: the roots side grows with trace
    # count (one row per trace), so a broadcast hint would OOM at scale;
    # AQE still broadcasts it when it is genuinely small
    return (
        spans.join(roots, trace_id, "left")
        .withColumn(trace_group, F.coalesce(F.col("_root_name"), F.col(name)))
        .drop("_root_name")
    )
