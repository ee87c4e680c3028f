"""HTTP / OTLP-HTTP listener source (sources/http.py).

Reference parity targets: http-source LogHTTPService.java (json-array
body, 400 on non-array, header metadata, metrics counters),
MultiLineJsonCodec.java (ndjson), HttpHeaderExtractor.java (sensitive
denylist), OTLP/HTTP paths funneling into the same decoders as the
file-based codecs.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from data_prepper_spark.operators.otel_pb import encode_traces_request
from data_prepper_spark.sources.http import HttpSource


def _post(port: int, path: str, body: bytes, ctype="application/json"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=body,
        headers={"Content-Type": ctype},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


@pytest.fixture()
def src(tmp_path):
    with HttpSource(str(tmp_path / "spool")) as s:
        yield s


def test_json_array_ingest_roundtrip(spark, src):
    evs = [{"log": f"line {i}", "n": i} for i in range(25)]
    # two requests -> two spool files, one batch each
    assert _post(src.port, "/log/ingest", json.dumps(evs[:10]).encode()) == 200
    assert _post(src.port, "/log/ingest", json.dumps(evs[10:]).encode()) == 200
    got = src.read_logs(spark).orderBy("n").collect()
    assert [r["log"] for r in got] == [e["log"] for e in evs]
    assert src.metrics["successRequests"] == 2


def test_non_array_is_400_and_spools_nothing(spark, src):
    assert _post(src.port, "/log/ingest", b'{"log": "solo"}') == 400
    assert _post(src.port, "/log/ingest", b"not json at all") == 400
    assert src.metrics["badRequests"] == 2
    import os

    assert os.listdir(src.logs_dir()) == []


def test_ndjson_body(spark, src):
    body = b'{"a": 1}\n{"a": 2}\n\n{"a": 3}\n'
    assert _post(src.port, "/log/ingest", body, "application/x-ndjson") == 200
    assert src.read_logs(spark).count() == 3


def test_oversize_413(src):
    src.max_request_bytes = 100
    assert _post(src.port, "/log/ingest", b"[" + b" " * 200 + b"]") == 413
    assert src.metrics["requestsOverMaximumSize"] == 1


def test_header_metadata_and_sensitive_denylist(spark, tmp_path):
    with HttpSource(
        str(tmp_path / "s2"),
        metadata_headers=("x-tenant", "authorization"),
    ) as s:
        req = urllib.request.Request(
            f"http://127.0.0.1:{s.port}/log/ingest",
            data=b'[{"log": "x"}]',
            headers={
                "Content-Type": "application/json",
                "X-Tenant": "acme",
                "Authorization": "Bearer SECRET",
            },
            method="POST",
        )
        assert urllib.request.urlopen(req, timeout=10).status == 200
        row = s.read_logs(spark).collect()[0]
        meta = row["_meta_headers"]
        assert meta["x-tenant"] == "acme"
        # sensitive header never forwarded even though configured
        assert "authorization" not in meta


def test_unknown_path_404(src):
    assert _post(src.port, "/nope", b"[]") == 404


def test_otlp_json_and_protobuf_union(spark, src):
    payload = {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [
                        {
                            "key": "service.name",
                            "value": {"stringValue": "svc-a"},
                        }
                    ]
                },
                "scopeSpans": [
                    {
                        "scope": {"name": "lib", "version": "1"},
                        "spans": [
                            {
                                "traceId": "0102030405060708090a0b0c0d0e0f10",
                                "spanId": "0102030405060708",
                                "name": "GET /a",
                                "kind": 2,
                                "startTimeUnixNano": "1700000000000000000",
                                "endTimeUnixNano": "1700000001000000000",
                                "status": {},
                            }
                        ],
                    }
                ],
            }
        ]
    }
    assert _post(src.port, "/v1/traces", json.dumps(payload).encode()) == 200
    pb_payload = json.loads(json.dumps(payload))
    pb_payload["resourceSpans"][0]["scopeSpans"][0]["spans"][0][
        "name"
    ] = "GET /b"
    wire = encode_traces_request(pb_payload)
    assert (
        _post(src.port, "/v1/traces", wire, "application/x-protobuf") == 200
    )
    rows = src.read_otlp_traces(spark).orderBy("name").collect()
    assert [r["name"] for r in rows] == ["GET /a", "GET /b"]
    # both wire formats flow through the SAME decode semantics
    assert {r["serviceName"] for r in rows} == {"svc-a"}
    assert rows[0]["traceId"] == rows[1]["traceId"]


def test_otlp_pb_all_signals_spool(src):
    """All three signals accept protobuf now (decoders exist for
    traces, logs AND metrics since r4); payloads land in the _pb
    spool verbatim."""
    import os

    from data_prepper_spark.operators.otel_pb import (
        encode_metrics_request,
    )

    wire = encode_metrics_request(
        {"resourceMetrics": [{"scopeMetrics": [{"metrics": [
            {"name": "m", "gauge": {"dataPoints": [
                {"timeUnixNano": "0", "asDouble": 1.0}
            ]}}
        ]}]}]}
    )
    assert (
        _post(src.port, "/v1/metrics", wire, "application/x-protobuf")
        == 200
    )
    pdir = os.path.join(src.spool_dir, "otlp_metrics_pb")
    names = [f for f in os.listdir(pdir) if f.endswith(".pb")]
    assert len(names) == 1
    assert open(os.path.join(pdir, names[0]), "rb").read() == wire


def test_streaming_spool_pickup(spark, src, tmp_path):
    from pyspark.sql import types as T

    assert (
        _post(
            src.port,
            "/log/ingest",
            json.dumps([{"log": "s1", "n": 1}]).encode(),
        )
        == 200
    )
    schema = T.StructType(
        [
            T.StructField("log", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    stream = src.stream_logs(spark, schema, max_files_per_trigger=1)
    q = (
        stream.writeStream.format("memory")
        .queryName("http_spool")
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("select * from http_spool").count() == 1


def test_stdin_source(spark):
    """stdin source (StdInSource.java:62-67): lines become message
    events; the 'exit' sentinel stops the read; max_lines bounds a
    batch."""
    import io

    from data_prepper_spark.sources.stdin import read_stdin

    buf = io.StringIO("one\ntwo\nEXIT\nnever\n")
    rows = read_stdin(spark, buf).collect()
    assert [r["message"] for r in rows] == ["one", "two"]

    buf = io.StringIO("a\nb\nc\n")
    assert read_stdin(spark, buf, max_lines=2).count() == 2


def _post_gz(port: int, path: str, raw: bytes):
    import gzip as _gz

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=_gz.compress(raw),
        headers={
            "Content-Type": "application/json",
            "Content-Encoding": "gzip",
        },
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_gzip_body_roundtrip(spark, src):
    evs = [{"log": f"z{i}"} for i in range(5)]
    assert _post_gz(src.port, "/log/ingest", json.dumps(evs).encode()) == 200
    assert src.read_logs(spark).count() == 5


def test_gzip_bomb_413_on_decoded_size(src):
    """max_request_bytes must bound the DECODED payload, not just the
    wire Content-Length: a tiny gzip of 10 MB of zeros passes the
    compressed-size check but must 413 during streaming inflate
    (ADVICE r04)."""
    src.max_request_bytes = 64 * 1024
    bomb = b"[" + b" " * (10 * 1024 * 1024) + b"]"  # ~10 KB gzipped
    assert _post_gz(src.port, "/log/ingest", bomb) == 413
    assert src.metrics["requestsOverMaximumSize"] == 1


def test_truncated_gzip_400(src):
    import gzip as _gz
    import urllib.request as _ur

    wire = _gz.compress(b'[{"a":1}]')[:-4]  # drop part of the trailer
    req = _ur.Request(
        f"http://127.0.0.1:{src.port}/log/ingest",
        data=wire,
        headers={
            "Content-Type": "application/json",
            "Content-Encoding": "gzip",
        },
        method="POST",
    )
    try:
        with _ur.urlopen(req, timeout=10) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400
