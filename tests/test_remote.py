"""aws_lambda processor analog (operators/remote.py) against live
in-process transform endpoints. Parity targets: strict vs aggregate
response strategies, failure tagging, batch thresholds."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from data_prepper_spark.operators.remote import lambda_processor


class TransformServer:
    """POST /: applies `fn` to the parsed JSON array; records batch
    sizes."""

    def __init__(self, fn, fail_code=None):
        self.batches = []
        srv = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                events = json.loads(self.rfile.read(n))
                srv.batches.append(len(events))
                if fail_code is not None:
                    self.send_response(fail_code)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = json.dumps(fn(events)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(
            target=self._server.serve_forever, daemon=True
        ).start()
        self.port = self._server.server_address[1]

    def stop(self):
        self._server.shutdown()
        self._server.server_close()


def test_strict_mode_replaces_events(spark):
    srv = TransformServer(
        lambda evs: [
            {"id": e["id"], "loud": e["word"].upper()} for e in evs
        ]
    )
    try:
        df = spark.createDataFrame(
            [(i, f"w{i}") for i in range(25)], "id long, word string"
        ).coalesce(1)
        out = lambda_processor(
            df, f"http://127.0.0.1:{srv.port}/", batch_size=10
        ).collect()
        assert len(out) == 25
        rows = sorted(json.loads(r["message"])["loud"] for r in out)
        assert rows[0] == "W0" and len(rows) == 25
        assert all(r["_tags"] == [] for r in out)
        assert srv.batches == [10, 10, 5]  # threshold respected
    finally:
        srv.stop()


def test_aggregate_mode_changes_count(spark):
    # fan-out: each event becomes two response events
    srv = TransformServer(
        lambda evs: [
            {"src": e["id"], "half": h} for e in evs for h in (0, 1)
        ]
    )
    try:
        df = spark.createDataFrame([(1,), (2,)], "id long").coalesce(1)
        out = lambda_processor(
            df,
            f"http://127.0.0.1:{srv.port}/",
            response_events_match=False,
        ).collect()
        assert len(out) == 4
        assert {
            (json.loads(r["message"])["src"], json.loads(r["message"])["half"])
            for r in out
        } == {(1, 0), (1, 1), (2, 0), (2, 1)}
    finally:
        srv.stop()


def test_strict_count_mismatch_tags_originals(spark):
    srv = TransformServer(lambda evs: evs[:-1])  # drops one event
    try:
        df = spark.createDataFrame([(1,), (2,)], "id long").coalesce(1)
        out = lambda_processor(
            df, f"http://127.0.0.1:{srv.port}/", batch_size=10
        ).collect()
        assert len(out) == 2  # originals pass through
        assert all("lambda_failure" in r["_tags"] for r in out)
        assert {json.loads(r["message"])["id"] for r in out} == {1, 2}
    finally:
        srv.stop()


def test_failed_invoke_tags_batch(spark):
    srv = TransformServer(lambda evs: evs, fail_code=403)  # fail fast
    try:
        df = spark.createDataFrame([(7,)], "id long")
        out = lambda_processor(
            df,
            f"http://127.0.0.1:{srv.port}/",
            max_retries=1,
            retry_interval_ms=10,
            tags_on_failure=("_fail",),
        ).collect()
        assert out[0]["_tags"] == ["_fail"]
        assert json.loads(out[0]["message"]) == {"id": 7}
    finally:
        srv.stop()


def test_existing_tags_carried_and_merged(spark):
    from pyspark.sql import functions as F

    srv = TransformServer(lambda evs: evs, fail_code=400)
    try:
        df = spark.createDataFrame([(1,)], "id long").withColumn(
            "_tags", F.array(F.lit("seen"))
        )
        out = lambda_processor(
            df, f"http://127.0.0.1:{srv.port}/", max_retries=0
        ).collect()
        assert sorted(out[0]["_tags"]) == ["lambda_failure", "seen"]
    finally:
        srv.stop()
