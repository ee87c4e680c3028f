"""OTLP push sink.

Reference: otlp-sink plugin — per-signal buffers batch events to
thresholds (OtlpSinkBuffer.java; ThresholdConfig maxEvents /
maxBatchSize), re-encode to OTLP protobuf (OtlpTraceHandler.java:49
addAllResourceSpans and the log/metric twins), gzip the wire bytes,
and POST with Content-Type application/x-protobuf; retries are the
OTel-spec set {429, 502, 503, 504} (OtlpHttpSender.java:49,89),
everything else fails fast. SigV4 signing is AWS-credential-bound and
out of scope.

Spark shape: same flush-audit mapInPandas as sinks/http.py — each
input row carries ONE OTLP/JSON-form payload (the canonical
interchange every decoder here consumes); a flush merges the buffered
payloads' resource lists into one Export*ServiceRequest, encodes with
the otel_pb encoder twins, gzips, POSTs. The audit DataFrame (one row
per flush) is the lineage analog of the reference's end-to-end ack.
"""

from __future__ import annotations

import gzip
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_prepper_spark.sinks.http import RESULT_SCHEMA, _dlq_write, _flush

OTLP_RETRYABLE = frozenset({429, 502, 503, 504})

_SIGNALS = {
    "traces": ("resourceSpans", "encode_traces_request"),
    "logs": ("resourceLogs", "encode_logs_request"),
    "metrics": ("resourceMetrics", "encode_metrics_request"),
}


def otlp_sink(
    df: DataFrame,
    url: str,
    signal: str = "traces",
    source: str = "message",
    *,
    max_events: int = 512,
    max_request_bytes: int = 1024 * 1024,
    max_retries: int = 5,
    retry_interval_ms: int = 100,
    compress: bool = True,
    headers: dict[str, str] | None = None,
    dlq_dir: str | None = None,
) -> DataFrame:
    """POST the OTLP/JSON payloads in `df[source]` to an OTLP/HTTP
    endpoint as gzipped protobuf, returning the flush-audit DataFrame
    (lazy). Batch size thresholds approximate the request size by the
    JSON length of the buffered payloads."""
    assert signal in _SIGNALS
    list_key, enc_name = _SIGNALS[signal]
    base_headers = {
        "Content-Type": "application/x-protobuf",
        **({"Content-Encoding": "gzip"} if compress else {}),
        **(headers or {}),
    }

    def send(batches):
        import pandas as pd

        from data_prepper_spark.operators import otel_pb

        encode = getattr(otel_pb, enc_name)
        buf: list = []
        buf_bytes = 0
        results = []

        def flush():
            nonlocal buf, buf_bytes
            if not buf:
                return
            merged: list = []
            for payload in buf:
                merged.extend(payload.get(list_key, []))
            wire = encode({list_key: merged})
            body = gzip.compress(wire) if compress else wire
            status, attempts = _flush(
                url, body, base_headers, max_retries, retry_interval_ms,
                retryable=OTLP_RETRYABLE, no_retry=frozenset(),
            )
            dlq_file = None
            if not (200 <= status < 300) and dlq_dir is not None:
                dlq_file = _dlq_write(dlq_dir, wire, status, url)
            results.append(
                (url, status, attempts, len(buf), len(body), dlq_file)
            )
            buf, buf_bytes = [], 0

        for pdf in batches:
            for j in pdf[source]:
                if j is None:
                    continue
                try:
                    payload = json.loads(j) if isinstance(j, str) else j
                except ValueError:
                    continue
                jl = len(j) if isinstance(j, str) else 256
                if buf and (
                    len(buf) >= max_events
                    or buf_bytes + jl > max_request_bytes
                ):
                    flush()
                buf.append(payload)
                buf_bytes += jl
        flush()
        yield pd.DataFrame(
            results,
            columns=[
                "url", "status", "attempts", "n_events", "bytes",
                "dlq_file",
            ],
        )

    return df.select(source).mapInPandas(send, schema=RESULT_SCHEMA)
