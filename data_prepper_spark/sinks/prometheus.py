"""Prometheus remote-write push sink.

Reference: prometheus-sink plugin (PrometheusSinkService.java +
PrometheusTimeSeries.java:94-290) — each metric event converts to one
or more TimeSeries: GAUGE/SUM -> one sample under __name__; SUMMARY ->
_count/_sum plus one series per quantile (quantile label);
HISTOGRAM -> _count/_sum (+_min/_max when present) plus one _bucket
series per bucket with the `le` label, last bucket labelled "+Inf".
The reference posts the PER-BUCKET counts as the _bucket values
(:258-264 — NOT re-cumulated to Prometheus's cumulative convention;
mirrored faithfully and flagged here). Labels = flattened attributes
(nested maps joined with '_'), sorted by name; `sanitize_names`
rewrites illegal chars to '_'. Batches encode to a WriteRequest,
snappy-compress, and POST with Content-Encoding: snappy.

Spark shape: the same mapInPandas flush-audit client as the other
push sinks; the wire encode reuses operators/prometheus.py's encoder
twin (which the remote-write SOURCE decodes — round-trip asserted in
tests). SigV4 / basic-auth handlers are credential plumbing, out of
scope; `headers` covers bearer tokens.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from data_prepper_spark.sinks.http import RESULT_SCHEMA, _dlq_write, _flush

_NAME_OK = re.compile(r"[^a-zA-Z0-9_:]")
_LABEL_OK = re.compile(r"[^a-zA-Z0-9_]")


def _ts_ms(iso: str | None) -> int:
    if not iso:
        return 0
    s = iso.replace("Z", "+00:00")
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def _event_series(row: dict, sanitize: bool) -> list:
    """One metric-event dict -> [{'labels': ..., 'samples': ...}]
    (PrometheusTimeSeries.java conversion rules)."""
    name = row.get("name") or "unknown_metric"
    if sanitize:
        name = _NAME_OK.sub("_", name)
    ts = _ts_ms(row.get("time") or row.get("startTime"))
    base = []
    for k, v in sorted((row.get("attributes") or {}).items()):
        lk = _LABEL_OK.sub("_", k) if sanitize else k
        base.append((lk, str(v)))

    def series(mname, value, extra=None):
        labels = dict(base)
        labels["__name__"] = mname
        if extra:
            labels[extra[0]] = extra[1]
        # sorted label order (the reference sorts by name, :200)
        return {
            "labels": dict(sorted(labels.items())),
            "samples": [(float(value), ts)],
        }

    kind = row.get("kind")
    out = []
    if kind in ("GAUGE", "SUM"):
        out.append(series(name, row.get("value") or 0.0))
    elif kind == "SUMMARY":
        out.append(series(name + "_count", row.get("count") or 0))
        out.append(series(name + "_sum", row.get("sum") or 0.0))
        qs = row.get("quantiles")
        for q in ([] if qs is None else list(qs)):
            out.append(
                series(name, q["value"], ("quantile", str(q["quantile"])))
            )
    elif kind in ("HISTOGRAM", "EXPONENTIAL_HISTOGRAM"):
        out.append(series(name + "_count", row.get("count") or 0))
        out.append(series(name + "_sum", row.get("sum") or 0.0))
        bounds = row.get("explicitBounds")
        bounds = [] if bounds is None else list(bounds)
        counts = row.get("bucketCountsList")
        counts = [] if counts is None else list(counts)
        for i, c in enumerate(counts):
            le = "+Inf" if i == len(counts) - 1 else str(bounds[i])
            out.append(series(name + "_bucket", c, ("le", le)))
    else:
        out.append(series(name, row.get("value") or 0.0))
    return out


def prometheus_sink(
    df: DataFrame,
    url: str,
    *,
    max_events: int = 100,
    max_retries: int = 5,
    retry_interval_ms: int = 100,
    sanitize_names: bool = True,
    headers: dict[str, str] | None = None,
    dlq_dir: str | None = None,
) -> DataFrame:
    """POST metric-event rows (the otel_metrics/prometheus decode
    shape: name/kind/time/value/count/sum/bucketCountsList/
    explicitBounds/quantiles/attributes) to a remote-write endpoint
    as snappy'd WriteRequests; returns the flush-audit DataFrame."""
    base_headers = {
        "Content-Type": "application/x-protobuf",
        "Content-Encoding": "snappy",
        "X-Prometheus-Remote-Write-Version": "0.1.0",
        **(headers or {}),
    }
    cols = [
        c for c in (
            "name", "kind", "time", "value", "count", "sum",
            "bucketCountsList", "explicitBounds", "quantiles",
            "attributes",
        ) if c in df.columns
    ]

    def send(batches):
        import pandas as pd

        from data_prepper_spark.operators.prometheus import (
            encode_write_request,
            snappy_compress,
        )

        buf: list = []
        n_events = 0
        results = []

        def flush():
            nonlocal buf, n_events
            if not buf:
                return
            wire = encode_write_request(buf)
            body = snappy_compress(wire)
            status, attempts = _flush(
                url, body, base_headers, max_retries, retry_interval_ms
            )
            dlq_file = None
            if not (200 <= status < 300) and dlq_dir is not None:
                dlq_file = _dlq_write(dlq_dir, wire, status, url)
            results.append(
                (url, status, attempts, n_events, len(body), dlq_file)
            )
            buf, n_events = [], 0

        for pdf in batches:
            for row in pdf.to_dict("records"):
                if n_events >= max_events:
                    flush()
                buf.extend(_event_series(row, sanitize_names))
                n_events += 1
        flush()
        yield pd.DataFrame(
            results,
            columns=[
                "url", "status", "attempts", "n_events", "bytes",
                "dlq_file",
            ],
        )

    return df.select(*cols).mapInPandas(send, schema=RESULT_SCHEMA)
