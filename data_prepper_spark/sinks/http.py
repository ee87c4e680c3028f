"""HTTP push sink.

Reference semantics mirrored (http-sink plugin):
- events buffer to threshold then flush as ONE request
  (ThresholdOptions.java:27-43 — default 100 events / 50mb; the
  flush-timeout knob is meaningless in a finite batch job and is
  omitted);
- retry policy is HttpSinkSender.java:32-33,67-104 exactly:
  RETRYABLE_STATUS_CODES {408,429,500,502,503,504} retried up to
  max_retries with a fixed interval, AUTH_ERROR_CODES {401,403} and
  every other non-2xx fail fast, transport exceptions retried;
- a batch that still fails lands in a DLQ quarantine file
  (HttpSinkService.java:32-90 dlqRecords / DlqPushHandler) — atomic
  ndjson write, one file per failed flush, with error metadata in a
  sidecar header line;
- counters mirror SinkMetrics: recordsSent / requestsSent / retries /
  recordsFailed.

Spark shape: the sink is `mapInPandas` over to_json(struct(*)) rows —
Arrow-batched feed, per-executor connection reuse, NO driver
collect. Each input partition emits one result row per flush
(url/status/attempts/events/dlq_file), so the job's output is a small
flush-audit DataFrame the caller can assert on, aggregate into
metrics, or join back — the lineage analog of the reference's
end-to-end ack at the sink boundary. At 1000 executors each partition
posts independently; the endpoint sets the real concurrency limit
(429 is retryable for exactly that reason).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRYABLE_STATUS_CODES = frozenset({408, 429, 500, 502, 503, 504})
AUTH_ERROR_CODES = frozenset({401, 403})

RESULT_SCHEMA = (
    "url string, status int, attempts int, n_events long, "
    "bytes long, dlq_file string"
)


def _flush(url, payload, headers, max_retries, retry_interval_ms,
           retryable=RETRYABLE_STATUS_CODES, no_retry=AUTH_ERROR_CODES):
    """One buffered batch -> one POST, reference retry policy.
    Returns (status, attempts). status 0 = transport failure. The
    status sets are parameters because the push sinks disagree:
    http-sink retries {408,429,500,502,503,504} and never retries
    auth {401,403}; otlp-sink retries {429,502,503,504} per the OTel
    spec (OtlpHttpSender.java:49)."""
    import urllib.error
    import urllib.request

    attempt = 0
    status = 0
    while attempt <= max_retries:
        attempt += 1
        try:
            req = urllib.request.Request(
                url, data=payload, headers=headers, method="POST"
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                status = r.status
        except urllib.error.HTTPError as e:
            status = e.code
        except (OSError, urllib.error.URLError):
            status = 0  # transport error: retryable
        if 200 <= status < 300:
            return status, attempt
        if status in no_retry:
            return status, attempt  # never retried (HttpSinkSender.java:89)
        if status != 0 and status not in retryable:
            return status, attempt
        if attempt <= max_retries:
            time.sleep(retry_interval_ms / 1000.0)
    return status, attempt


def _dlq_write(dlq_dir, payload, status, url):
    """Quarantine one failed flush: atomic ndjson file whose first
    line is the error header (DlqObject analog), the rest the events."""
    os.makedirs(dlq_dir, exist_ok=True)
    name = f"dlq-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.ndjson"
    tmp = os.path.join(dlq_dir, f"_tmp.{name}")
    hdr = json.dumps(
        {"_dlq": True, "url": url, "status": status, "ts_ns": time.time_ns()}
    )
    with open(tmp, "wb") as f:
        f.write(hdr.encode() + b"\n" + payload + b"\n")
    final = os.path.join(dlq_dir, name)
    os.replace(tmp, final)
    return final


def http_sink(
    df: DataFrame,
    url: str,
    *,
    codec: str = "json_array",
    max_events: int = 100,
    max_request_bytes: int = 50 * 1024 * 1024,
    max_retries: int = 5,
    retry_interval_ms: int = 100,
    headers: dict[str, str] | None = None,
    dlq_dir: str | None = None,
) -> DataFrame:
    """Post every row of `df` to `url`, returning the flush-audit
    DataFrame (lazy — run .collect()/.count() to execute the sink).
    codec: 'json_array' (reference JsonCodec form, the http-source
    wire contract) or 'ndjson'."""
    assert codec in ("json_array", "ndjson")
    base_headers = {
        "Content-Type": (
            "application/json"
            if codec == "json_array"
            else "application/x-ndjson"
        ),
        **(headers or {}),
    }

    jdf = df.select(F.to_json(F.struct(*df.columns)).alias("j"))

    def send(batches):
        import pandas as pd

        buf: list[str] = []
        buf_bytes = 0
        results = []

        def flush():
            nonlocal buf, buf_bytes
            if not buf:
                return
            if codec == "json_array":
                payload = ("[" + ",".join(buf) + "]").encode()
            else:
                payload = ("\n".join(buf) + "\n").encode()
            status, attempts = _flush(
                url, payload, base_headers, max_retries, retry_interval_ms
            )
            dlq_file = None
            if not (200 <= status < 300) and dlq_dir is not None:
                dlq_file = _dlq_write(dlq_dir, payload, status, url)
            results.append(
                (url, status, attempts, len(buf), len(payload), dlq_file)
            )
            buf, buf_bytes = [], 0

        for pdf in batches:
            for j in pdf["j"]:
                if buf and (
                    len(buf) >= max_events
                    or buf_bytes + len(j) > max_request_bytes
                ):
                    flush()
                buf.append(j)
                buf_bytes += len(j) + 1
        flush()
        yield pd.DataFrame(
            results,
            columns=[
                "url",
                "status",
                "attempts",
                "n_events",
                "bytes",
                "dlq_file",
            ],
        )

    return jdf.mapInPandas(send, schema=RESULT_SCHEMA)


def sink_metrics(audit: DataFrame) -> dict:
    """Aggregate a flush-audit DataFrame into the reference's
    SinkMetrics counter names."""
    row = audit.agg(
        F.sum(
            F.when(
                (F.col("status") >= 200) & (F.col("status") < 300),
                F.col("n_events"),
            ).otherwise(F.lit(0))
        ).alias("recordsSent"),
        F.count("*").alias("requestsSent"),
        F.sum(F.col("attempts") - 1).alias("retries"),
        F.sum(
            F.when(
                (F.col("status") < 200) | (F.col("status") >= 300),
                F.col("n_events"),
            ).otherwise(F.lit(0))
        ).alias("recordsFailed"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in row.asDict()}
