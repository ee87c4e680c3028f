"""OTLP push sink (sinks/otlp.py): gzip protobuf POST, OTel-spec
retry set, end-to-end round trip through the OTLP/HTTP listener for
all three signals."""

from __future__ import annotations

import json

import pytest

from data_prepper_spark.sinks.otlp import otlp_sink
from data_prepper_spark.sources.http import HttpSource
from tests.test_http_sink import FlakyServer
from tests.test_otel_pb import LOGS_PAYLOAD, METRICS_PAYLOAD, PAYLOAD


def _payload_df(spark, payload):
    return spark.createDataFrame(
        [(json.dumps(payload),)], "message string"
    )


@pytest.mark.parametrize(
    "signal,payload,check",
    [
        ("traces", PAYLOAD, ("name", {"GET /cart", "SELECT"})),
        ("logs", LOGS_PAYLOAD, ("body", {"oops", "2.5"})),
        (
            "metrics",
            METRICS_PAYLOAD,
            ("name", {"latency", "reqs", "cpu", "lat_exp", "size"}),
        ),
    ],
)
def test_sink_to_listener_roundtrip(spark, tmp_path, signal, payload, check):
    """sink encodes JSON-form -> gzipped protobuf; the listener
    un-gzips, spools .pb; the pb decoders return the original
    records."""
    col, expect = check
    with HttpSource(str(tmp_path / f"spool_{signal}")) as src:
        audit = otlp_sink(
            _payload_df(spark, payload),
            f"http://127.0.0.1:{src.port}/v1/{signal}",
            signal=signal,
        ).collect()
        assert [r["status"] for r in audit] == [200]
        if signal == "traces":
            got = src.read_otlp_traces(spark)
        else:
            got = src.read_otlp(spark, signal)
        assert {r[col] for r in got.select(col).collect()} == expect


def test_batching_merges_resource_lists(spark, tmp_path):
    """Multiple payload rows below threshold merge into ONE request
    (addAllResourceSpans semantics)."""
    rows = [(json.dumps(PAYLOAD),)] * 3
    df = spark.createDataFrame(rows, "message string").coalesce(1)
    with HttpSource(str(tmp_path / "spool_m")) as src:
        audit = otlp_sink(
            df, f"http://127.0.0.1:{src.port}/v1/traces"
        ).collect()
        assert len(audit) == 1 and audit[0]["n_events"] == 3
        got = src.read_otlp_traces(spark)
        assert got.count() == 6  # 3 payloads x 2 spans


def test_otel_spec_retry_set(spark):
    # 503 retried; 401 NOT in the otlp no-retry set either -> but 401
    # is not retryable per spec (only 429/502/503/504 are), fail fast
    srv = FlakyServer(fail_code=503, fail_n=2)
    try:
        audit = otlp_sink(
            _payload_df(spark, PAYLOAD),
            f"http://127.0.0.1:{srv.port}/x",
            max_retries=5,
            retry_interval_ms=10,
        ).collect()
        assert audit[0]["status"] == 200 and audit[0]["attempts"] == 3
    finally:
        srv.stop()
    srv = FlakyServer(fail_code=401, fail_n=10**9)
    try:
        audit = otlp_sink(
            _payload_df(spark, PAYLOAD),
            f"http://127.0.0.1:{srv.port}/x",
            max_retries=5,
            retry_interval_ms=10,
        ).collect()
        assert audit[0]["status"] == 401 and audit[0]["attempts"] == 1
    finally:
        srv.stop()


def test_failed_flush_quarantines_wire_bytes(spark, tmp_path):
    from data_prepper_spark.operators.otel_pb import decode_traces_request

    srv = FlakyServer(fail_code=500, fail_n=10**9)
    dlq = str(tmp_path / "dlq")
    try:
        audit = otlp_sink(
            _payload_df(spark, PAYLOAD),
            f"http://127.0.0.1:{srv.port}/x",
            max_retries=1,
            retry_interval_ms=10,
            dlq_dir=dlq,
        ).collect()
        # 500 is NOT retryable per OTel spec (unlike http-sink)
        assert audit[0]["status"] == 500 and audit[0]["attempts"] == 1
        raw = open(audit[0]["dlq_file"], "rb").read()
        hdr, wire = raw.split(b"\n", 1)
        assert json.loads(hdr)["status"] == 500
        # quarantined payload is the UNCOMPRESSED wire, replayable
        back = decode_traces_request(wire.rstrip(b"\n"))
        assert len(back["resourceSpans"][0]["scopeSpans"][0]["spans"]) == 2
    finally:
        srv.stop()
