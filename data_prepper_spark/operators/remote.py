"""Remote-UDF processors: aws_lambda (HTTP-invoked event transform).

Reference: aws-lambda plugin processor (LambdaProcessor.java) —
events batch to a threshold, the batch POSTs as a JSON array, the
function returns a JSON array of transformed events. Two response
strategies (:188-190): response_events_match=true = STRICT
(StrictResponseEventHandlingStrategy.java:25-58 — response count must
equal input count; response event i REPLACES event i's data, original
metadata/tags survive), false = AGGREGATE (response events become new
events regardless of count). An invoke that still fails after retries
tags every event of the batch (:411) and passes the originals
through unchanged.

Spark shape: mapInPandas over to_json rows — the same per-partition
batched client as sinks/http.py; the transport is any HTTP endpoint
(the reference's AWS SDK invoke is the same POST-a-batch shape; SigV4
signing is credential-bound and out of scope). Events travel as JSON
strings because the function's response schema is by definition
unknown to the plan — apply from_json with your schema downstream.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_prepper_spark.sinks.http import RETRYABLE_STATUS_CODES

RESULT_SCHEMA = "message string, _tags array<string>"


def _invoke(url, payload, headers, max_retries, retry_interval_ms):
    """POST one batch, return (status, body_bytes, attempts)."""
    import urllib.error
    import urllib.request

    attempt, status, body = 0, 0, b""
    while attempt <= max_retries:
        attempt += 1
        try:
            req = urllib.request.Request(
                url, data=payload, headers=headers, method="POST"
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, r.read(), attempt
        except urllib.error.HTTPError as e:
            status, body = e.code, b""
        except (OSError, urllib.error.URLError):
            status = 0
        if status != 0 and status not in RETRYABLE_STATUS_CODES:
            return status, body, attempt
        if attempt <= max_retries:
            time.sleep(retry_interval_ms / 1000.0)
    return status, body, attempt


def lambda_processor(
    df: DataFrame,
    url: str,
    *,
    batch_size: int = 100,
    response_events_match: bool = True,
    max_retries: int = 3,
    retry_interval_ms: int = 100,
    tags_on_failure: tuple[str, ...] = ("lambda_failure",),
    headers: dict[str, str] | None = None,
) -> DataFrame:
    """Invoke a remote transform over every row of `df`, returning
    (message json-string, _tags). Strict mode pairs response i with
    input i (a count mismatch or failed invoke tags the originals and
    passes them through); aggregate mode emits the response events as
    the new stream (failed batches still pass originals, tagged)."""
    from .mutate import TAGS_COL

    base_headers = {
        "Content-Type": "application/json",
        **(headers or {}),
    }
    has_tags = TAGS_COL in df.columns
    data_cols = [c for c in df.columns if c != TAGS_COL]
    jdf = df.select(
        F.to_json(F.struct(*data_cols)).alias("j"),
        (F.col(TAGS_COL) if has_tags else F.array().cast(
            "array<string>"
        )).alias("t"),
    )

    def run(batches):
        import pandas as pd

        buf: list = []  # (json_str, tags)
        out_rows: list = []

        def flush():
            nonlocal buf
            if not buf:
                return
            payload = ("[" + ",".join(j for j, _ in buf) + "]").encode()
            status, body, _ = _invoke(
                url, payload, base_headers, max_retries, retry_interval_ms
            )
            parsed = None
            if 200 <= status < 300:
                try:
                    parsed = json.loads(body)
                    if not isinstance(parsed, list):
                        parsed = None
                except ValueError:
                    parsed = None
            if parsed is None:
                fail(list(buf))
            elif response_events_match:
                if len(parsed) != len(buf):
                    # StrictResponseModeNotRespected -> failure path
                    fail(list(buf))
                else:
                    for (j, tags), resp in zip(buf, parsed):
                        out_rows.append((
                            json.dumps(resp, separators=(",", ":")),
                            list(tags),
                        ))
            else:
                # aggregate: response events REPLACE the batch
                for resp in parsed:
                    out_rows.append((
                        json.dumps(resp, separators=(",", ":")), []
                    ))
            buf = []

        def fail(batch):
            for j, tags in batch:
                out_rows.append(
                    (j, sorted(set(tags) | set(tags_on_failure)))
                )

        for pdf in batches:
            for j, t in zip(pdf["j"], pdf["t"]):
                buf.append((j, [] if t is None else list(t)))
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame(out_rows, columns=["message", "_tags"])

    return jdf.mapInPandas(run, schema=RESULT_SCHEMA)
