"""HTTP push sink (sinks/http.py) against a live in-process listener.

Parity targets: HttpSinkSender.java retry sets, ThresholdOptions
batching, HttpSinkService DLQ quarantine.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from data_prepper_spark.sinks.http import http_sink, sink_metrics
from data_prepper_spark.sources.http import HttpSource


class FlakyServer:
    """Responds with `fail_code` for the first `fail_n` requests,
    then 200. Records bodies of successful posts."""

    def __init__(self, fail_code=503, fail_n=0):
        self.fail_code = fail_code
        self.fail_n = fail_n
        self.seen = 0
        self.bodies = []
        lock = threading.Lock()
        srv = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n)
                with lock:
                    srv.seen += 1
                    fail = srv.seen <= srv.fail_n
                    if not fail:
                        srv.bodies.append(body)
                code = srv.fail_code if fail else 200
                self.send_response(code)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"OK")

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(
            target=self._server.serve_forever, daemon=True
        ).start()
        self.port = self._server.server_address[1]

    def stop(self):
        self._server.shutdown()
        self._server.server_close()


def test_sink_to_source_roundtrip(spark, tmp_path):
    """The sink posts the http-source wire contract: sink -> listener
    -> spool -> Spark read returns the original rows."""
    df = spark.range(0, 250).selectExpr("id", "concat('v', id) as v")
    with HttpSource(str(tmp_path / "spool")) as src:
        audit = http_sink(
            df.repartition(4),
            f"http://127.0.0.1:{src.port}/log/ingest",
            max_events=50,
        ).collect()
        assert all(r["status"] == 200 for r in audit)
        assert sum(r["n_events"] for r in audit) == 250
        # threshold respected
        assert max(r["n_events"] for r in audit) <= 50
        got = src.read_logs(spark, schema="id long, v string")
        assert got.count() == 250
        assert got.agg({"id": "sum"}).collect()[0][0] == 250 * 249 // 2


def test_retryable_status_is_retried(spark):
    srv = FlakyServer(fail_code=503, fail_n=2)
    try:
        df = spark.range(0, 10).coalesce(1)
        audit = http_sink(
            df,
            f"http://127.0.0.1:{srv.port}/x",
            max_retries=5,
            retry_interval_ms=10,
        ).collect()
        assert len(audit) == 1
        assert audit[0]["status"] == 200
        assert audit[0]["attempts"] == 3  # two 503s then success
        m_df = http_sink(  # metrics helper on a fresh successful run
            df, f"http://127.0.0.1:{srv.port}/x", retry_interval_ms=10
        )
        m = sink_metrics(m_df)
        assert m["recordsSent"] == 10 and m["recordsFailed"] == 0
    finally:
        srv.stop()


def test_auth_error_not_retried_goes_to_dlq(spark, tmp_path):
    srv = FlakyServer(fail_code=401, fail_n=10**9)
    dlq = str(tmp_path / "dlq")
    try:
        df = spark.range(0, 5).coalesce(1)
        audit = http_sink(
            df,
            f"http://127.0.0.1:{srv.port}/x",
            max_retries=5,
            retry_interval_ms=10,
            dlq_dir=dlq,
        ).collect()
        assert audit[0]["status"] == 401
        assert audit[0]["attempts"] == 1  # AUTH_ERROR_CODES: no retry
        assert audit[0]["dlq_file"] is not None
        lines = open(audit[0]["dlq_file"]).read().splitlines()
        hdr = json.loads(lines[0])
        assert hdr["_dlq"] and hdr["status"] == 401
        # quarantined payload is the full batch, replayable
        assert len(json.loads(lines[1])) == 5
    finally:
        srv.stop()


def test_exhausted_retries_fail(spark, tmp_path):
    srv = FlakyServer(fail_code=503, fail_n=10**9)
    try:
        audit = http_sink(
            spark.range(0, 3).coalesce(1),
            f"http://127.0.0.1:{srv.port}/x",
            max_retries=2,
            retry_interval_ms=10,
            dlq_dir=str(tmp_path / "dlq2"),
        ).collect()
        assert audit[0]["status"] == 503
        assert audit[0]["attempts"] == 3  # 1 + max_retries
        m = sink_metrics(
            http_sink(
                spark.range(0, 3).coalesce(1),
                f"http://127.0.0.1:{srv.port}/x",
                max_retries=2,
                retry_interval_ms=10,
            )
        )
        assert m["recordsFailed"] == 3 and m["retries"] == 2
    finally:
        srv.stop()


def test_ndjson_codec(spark):
    srv = FlakyServer()
    try:
        http_sink(
            spark.range(0, 4).coalesce(1),
            f"http://127.0.0.1:{srv.port}/x",
            codec="ndjson",
        ).collect()
        body = srv.bodies[0].decode()
        assert [json.loads(x)["id"] for x in body.splitlines()] == [
            0,
            1,
            2,
            3,
        ]
    finally:
        srv.stop()
