"""Streaming twins for the round-4 wire decoders (VERDICT r04 #7):
spool -> readStream -> decode, with exact batch-parity — the OTLP
decoders are narrow Catalyst maps and run in-stream unchanged; the
prometheus decoders regroup payload-wide and run per-micro-batch via
foreachBatch. Plus the windowed-metrics rollup on the decoded stream.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

NOW = "2026-01-01T00:00:00Z"


def _rows_json(df):
    """Order-insensitive row fingerprints: one JSON string per row over
    name-sorted columns; map columns normalize to key-sorted entry
    arrays (the memory-sink round-trip may reorder map entries)."""
    cols = []
    for name in sorted(df.columns):
        f = df.schema[name]
        c = F.col(name)
        if f.dataType.typeName() == "map":
            c = F.array_sort(F.map_entries(c))
        cols.append(c.alias(name))
    out = [
        r["j"]
        for r in df.select(F.to_json(F.struct(*cols)).alias("j")).collect()
    ]
    return sorted(out)


def _traces_payload(suffix: str) -> dict:
    return {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name",
                         "value": {"stringValue": f"svc-{suffix}"}}
                    ]
                },
                "scopeSpans": [
                    {
                        "scope": {"name": "io.lib", "version": "1.2"},
                        "spans": [
                            {
                                "traceId":
                                    "0af7651916cd43dd8448eb211c80319c",
                                "spanId": "b7ad6b7169203331",
                                "parentSpanId": "",
                                "name": f"GET /{suffix}",
                                "kind": 2,
                                "startTimeUnixNano": "1544712660000000000",
                                "endTimeUnixNano": "1544712661500123456",
                                "attributes": [
                                    {"key": "http.method",
                                     "value": {"stringValue": "GET"}}
                                ],
                                "status": {"code": 1},
                            }
                        ],
                    }
                ],
            }
        ]
    }


def _metrics_payload(ts_nano: int, v: float) -> dict:
    return {
        "resourceMetrics": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name",
                         "value": {"stringValue": "svc1"}}
                    ]
                },
                "scopeMetrics": [
                    {
                        "scope": {"name": "m", "version": "1"},
                        "metrics": [
                            {
                                "name": "cpu",
                                "unit": "1",
                                "gauge": {
                                    "dataPoints": [
                                        {"timeUnixNano": str(ts_nano),
                                         "asDouble": v},
                                        {"timeUnixNano": str(
                                            ts_nano + 90_000_000_000),
                                         "asDouble": v + 0.2},
                                    ]
                                },
                            }
                        ],
                    }
                ],
            }
        ]
    }


def test_streaming_otlp_pb_decode_matches_batch(spark, tmp_path):
    """Protobuf spool -> readStream(binaryFile) -> narrow decode in
    append mode == the batch decoder over the same files."""
    from data_prepper_spark.operators.otel_pb import (
        encode_metrics_request,
        encode_traces_request,
        otel_metrics_pb,
        otel_traces_pb,
    )
    from data_prepper_spark.streaming.pipeline import (
        read_otlp_spool,
        streaming_otlp_decode,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(os.path.join(spool, "traces_pb"))
    os.makedirs(os.path.join(spool, "metrics_pb"))
    for i in range(2):
        with open(os.path.join(spool, "traces_pb", f"r{i}.pb"), "wb") as f:
            f.write(encode_traces_request(_traces_payload(f"t{i}")))
        with open(os.path.join(spool, "metrics_pb", f"r{i}.pb"), "wb") as f:
            f.write(encode_metrics_request(
                _metrics_payload(1544712660000000000 + i, 0.5 + i)))

    for signal, batch_fn in (
        ("traces", otel_traces_pb), ("metrics", otel_metrics_pb),
    ):
        stream = read_otlp_spool(spark, spool, signal, wire="pb")
        out = streaming_otlp_decode(stream, signal, wire="pb")
        name = f"otlp_{signal}_stream"
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = _rows_json(spark.table(name))

        batch_src = (
            spark.read.format("binaryFile")
            .load(os.path.join(spool, f"{signal}_pb"))
            .select(F.col("content").alias("body"))
        )
        want = _rows_json(batch_fn(batch_src, source="body"))
        assert got == want and len(got) > 0


def test_streaming_otlp_json_decode_matches_batch(spark, tmp_path):
    """OTLP/JSON ndjson spool -> readStream(text) -> decode == batch."""
    import json

    from data_prepper_spark.operators.otel import otel_logs
    from data_prepper_spark.streaming.pipeline import (
        read_otlp_spool,
        streaming_otlp_decode,
    )

    payload = {
        "resourceLogs": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name",
                         "value": {"stringValue": "svcL"}}
                    ]
                },
                "scopeLogs": [
                    {
                        "scope": {"name": "lg"},
                        "logRecords": [
                            {
                                "timeUnixNano": "1544712660000000000",
                                "severityNumber": 9,
                                "severityText": "INFO",
                                "body": {"stringValue": "hello"},
                            }
                        ],
                    }
                ],
            }
        ]
    }
    spool = str(tmp_path / "spool")
    os.makedirs(os.path.join(spool, "logs"))
    with open(os.path.join(spool, "logs", "r0.ndjson"), "w") as f:
        f.write(json.dumps(payload, separators=(",", ":")) + "\n")

    stream = read_otlp_spool(spark, spool, "logs", wire="json")
    out = streaming_otlp_decode(stream, "logs", wire="json")
    q = (
        out.writeStream.format("memory").queryName("otlp_logs_json_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = _rows_json(spark.table("otlp_logs_json_stream"))

    batch_src = spark.read.text(os.path.join(spool, "logs")).select(
        F.col("value").alias("body")
    )
    want = _rows_json(otel_logs(batch_src, source="body"))
    assert got == want and len(got) == 1


def test_streaming_prometheus_remote_write_matches_batch(spark, tmp_path):
    """Snappy WriteRequest spool -> foreachBatch(batch decoder) ->
    parquet == one batch decode of the same spool (each request is a
    self-contained payload, so per-micro-batch regrouping is exact)."""
    from data_prepper_spark.operators.prometheus import (
        encode_write_request,
        prometheus_remote_write,
        snappy_compress,
    )
    from data_prepper_spark.streaming.pipeline import (
        streaming_prometheus_decode,
    )

    ts = 1544712660300
    fixtures = [
        [
            {"labels": {"__name__": "http_req_bucket", "le": "0.5",
                        "job": "api"},
             "samples": [(1.0, ts)]},
            {"labels": {"__name__": "http_req_bucket", "le": "+Inf",
                        "job": "api"},
             "samples": [(6.0, ts)]},
            {"labels": {"__name__": "http_req_count", "job": "api"},
             "samples": [(6.0, ts)]},
            {"labels": {"__name__": "http_req_sum", "job": "api"},
             "samples": [(3.25, ts)]},
        ],
        [
            {"labels": {"__name__": "mem_bytes", "host": "h1"},
             "samples": [(512.0, ts), (640.0, ts + 700)]},
            {"labels": {"__name__": "errors_total", "svc": "auth"},
             "samples": [(12.0, ts)]},
        ],
    ]
    spool = str(tmp_path / "rw_spool")
    os.makedirs(spool)
    for i, fix in enumerate(fixtures):
        with open(os.path.join(spool, f"req{i}.pb"), "wb") as f:
            f.write(snappy_compress(encode_write_request(fix)))

    out_path = str(tmp_path / "decoded")
    q = streaming_prometheus_decode(
        spark, spool, out_path, str(tmp_path / "ck"),
        mode="remote_write", now_iso=NOW,
    ).start()
    q.awaitTermination(180)
    got = _rows_json(spark.read.parquet(out_path))

    batch_src = (
        spark.read.format("binaryFile").load(spool)
        .select(F.col("content").alias("body"))
    )
    want = _rows_json(
        prometheus_remote_write(batch_src, "body", now_iso=NOW)
    )
    assert got == want and len(got) > 0


def test_streaming_prometheus_scrape_matches_batch(spark, tmp_path):
    """Text exposition spool (one file per scrape, wholetext) ->
    foreachBatch == batch decode."""
    from data_prepper_spark.operators.prometheus import prometheus_scrape
    from data_prepper_spark.streaming.pipeline import (
        streaming_prometheus_decode,
    )

    pages = [
        "# TYPE mem_bytes gauge\n"
        'mem_bytes{host="h1"} 512 1544712660300\n'
        "# TYPE errors counter\n"
        'errors_total{svc="auth"} 12 1544712660.3\n',
        "# TYPE rpc_lat summary\n"
        'rpc_lat{quantile="0.5",svc="b"} 0.12 1544712660300\n'
        'rpc_lat_count{svc="b"} 40 1544712660300\n'
        'rpc_lat_sum{svc="b"} 7.5 1544712660300\n',
    ]
    spool = str(tmp_path / "scrape_spool")
    os.makedirs(spool)
    for i, page in enumerate(pages):
        with open(os.path.join(spool, f"scrape{i}.txt"), "w") as f:
            f.write(page)

    out_path = str(tmp_path / "decoded")
    q = streaming_prometheus_decode(
        spark, spool, out_path, str(tmp_path / "ck"),
        mode="scrape", now_iso=NOW,
    ).start()
    q.awaitTermination(180)
    got = _rows_json(spark.read.parquet(out_path))

    batch_src = (
        spark.read.format("text").option("wholetext", "true").load(spool)
        .select(F.col("value").alias("body"))
    )
    want = _rows_json(prometheus_scrape(batch_src, "body", now_iso=NOW))
    assert got == want and len(got) > 0


def test_windowed_metric_stats_stream_matches_batch(spark, tmp_path):
    """Decoded metric stream -> watermarked tumbling-window rollup
    (complete mode) == the same expression over the batch decode."""
    from data_prepper_spark.operators.otel_pb import (
        encode_metrics_request,
        otel_metrics_pb,
    )
    from data_prepper_spark.streaming.pipeline import (
        read_otlp_spool,
        streaming_otlp_decode,
        windowed_metric_stats,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(os.path.join(spool, "metrics_pb"))
    base = 1544712660000000000
    for i in range(3):
        with open(os.path.join(spool, "metrics_pb", f"r{i}.pb"), "wb") as f:
            f.write(encode_metrics_request(
                _metrics_payload(base + i * 30_000_000_000, 0.1 * i)))

    stream = read_otlp_spool(spark, spool, "metrics", wire="pb")
    agg = windowed_metric_stats(
        streaming_otlp_decode(stream, "metrics", wire="pb"),
        window="1 minute", watermark="2 minutes",
    )
    q = (
        agg.writeStream.format("memory").queryName("wm_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = _rows_json(spark.table("wm_stream"))

    batch_src = (
        spark.read.format("binaryFile")
        .load(os.path.join(spool, "metrics_pb"))
        .select(F.col("content").alias("body"))
    )
    want = _rows_json(
        windowed_metric_stats(
            otel_metrics_pb(batch_src, source="body"),
            window="1 minute", watermark="2 minutes",
        )
    )
    assert got == want and len(got) >= 2
