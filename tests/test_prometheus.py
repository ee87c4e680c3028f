"""Prometheus remote-write decode (operators/prometheus.py).

Parity targets: RemoteWriteProtobufParser.java type inference +
two-pass grouping, PrometheusMetricUtils service-name/le/quantile
parsing, snappy transport decompression.
"""

from __future__ import annotations

import math

from data_prepper_spark.operators.prometheus import (
    decode_write_request,
    encode_write_request,
    prometheus_remote_write,
    snappy_compress,
    snappy_decompress,
)

NOW = "2026-01-01T00:00:00Z"
TS1 = 1544712660300  # ms
TS2 = 1544712661000

FIXTURE = [
    # histogram: cumulative buckets at two timestamps + count/sum
    {"labels": {"__name__": "http_req_bucket", "le": "0.5",
                "job": "api", "instance": "i1"},
     "samples": [(1.0, TS1), (3.0, TS2)]},
    {"labels": {"__name__": "http_req_bucket", "le": "1",
                "job": "api", "instance": "i1"},
     "samples": [(4.0, TS1), (7.0, TS2)]},
    {"labels": {"__name__": "http_req_bucket", "le": "+Inf",
                "job": "api", "instance": "i1"},
     "samples": [(6.0, TS1), (9.0, TS2)]},
    {"labels": {"__name__": "http_req_bucket", "le": "bogus",
                "job": "api", "instance": "i1"},
     "samples": [(99.0, TS1)]},  # unparseable le: skipped
    {"labels": {"__name__": "http_req_count", "job": "api",
                "instance": "i1"},
     "samples": [(6.0, TS1), (9.0, TS2)]},
    {"labels": {"__name__": "http_req_sum", "job": "api",
                "instance": "i1"},
     "samples": [(3.25, TS1), (5.5, TS2)]},
    # summary: quantiles + count/sum
    {"labels": {"__name__": "rpc_lat", "quantile": "0.5",
                "service.name": "billing"},
     "samples": [(0.12, TS1)]},
    {"labels": {"__name__": "rpc_lat", "quantile": "0.99",
                "service.name": "billing"},
     "samples": [(0.87, TS1)]},
    {"labels": {"__name__": "rpc_lat_count", "service.name": "billing"},
     "samples": [(40.0, TS1)]},
    {"labels": {"__name__": "rpc_lat_sum", "service.name": "billing"},
     "samples": [(7.5, TS1)]},
    # standalone counter (_total stripped, monotonic cumulative SUM)
    {"labels": {"__name__": "errors_total", "service_name": "auth"},
     "samples": [(12.0, TS1)]},
    # plain gauge
    {"labels": {"__name__": "mem_bytes", "host": "h1"},
     "samples": [(512.0, TS1), (640.0, 0)]},  # ts 0 -> now
    # _count with no histogram/summary base -> standalone gauge
    {"labels": {"__name__": "orphan_count"}, "samples": [(5.0, TS1)]},
    # no __name__ label -> unknown_metric gauge
    {"labels": {"x": "y"}, "samples": [(1.5, TS1)]},
]


def test_wire_and_snappy_roundtrip():
    wire = encode_write_request(FIXTURE)
    assert decode_write_request(wire) == [
        {"labels": t["labels"],
         "samples": [(v, ts) for v, ts in t["samples"]]}
        for t in FIXTURE
    ]
    assert snappy_decompress(snappy_compress(wire)) == wire


def _decode(spark, compressed: bool):
    wire = encode_write_request(FIXTURE)
    body = snappy_compress(wire) if compressed else wire
    df = spark.createDataFrame([(body,)], "body binary")
    return prometheus_remote_write(
        df, compressed=compressed, now_iso=NOW
    ).collect()


def test_full_inference(spark):
    rows = _decode(spark, compressed=True)
    by = {}
    for r in rows:
        by.setdefault((r["name"], r["kind"]), []).append(r)

    # histogram: one event per timestamp; cumulative -> per-bucket
    hs = sorted(by[("http_req", "HISTOGRAM")], key=lambda r: r["time"])
    assert len(hs) == 2
    h1 = hs[0]
    assert h1["time"] == "2018-12-13T14:51:00.300Z"
    assert h1["bucketCountsList"] == [1, 3, 2]  # diffs of 1,4,6
    assert h1["explicitBounds"] == [0.5, 1.0]  # +Inf excluded
    assert h1["bucketCount"] == 3 and h1["explicitBoundsCount"] == 2
    assert h1["count"] == 6 and h1["sum"] == 3.25
    assert h1["aggregationTemporality"] == (
        "AGGREGATION_TEMPORALITY_CUMULATIVE"
    )
    assert h1["serviceName"] == "api"  # job fallback
    assert h1["attributes"] == {"job": "api", "instance": "i1"}
    h2 = hs[1]
    assert h2["bucketCountsList"] == [3, 4, 2]
    assert h2["count"] == 9 and h2["sum"] == 5.5

    # summary: quantiles in series order, count/sum attached
    (s1,) = by[("rpc_lat", "SUMMARY")]
    assert [(q["quantile"], q["value"]) for q in s1["quantiles"]] == [
        (0.5, 0.12), (0.99, 0.87)
    ]
    assert s1["quantileValuesCount"] == 2
    assert s1["count"] == 40 and s1["sum"] == 7.5
    assert s1["serviceName"] == "billing"

    # counter: suffix stripped, monotonic cumulative
    (c,) = by[("errors", "SUM")]
    assert c["value"] == 12.0 and c["isMonotonic"] is True
    assert c["serviceName"] == "auth"  # service_name fallback

    # gauge with ts 0 -> injected now
    gs = sorted(by[("mem_bytes", "GAUGE")], key=lambda r: r["value"])
    assert gs[0]["time"] == "2018-12-13T14:51:00.300Z"
    assert gs[1]["time"] == NOW and gs[1]["value"] == 640.0

    # orphan _count falls through to gauge with UNSTRIPPED name
    (o,) = by[("orphan_count", "GAUGE")]
    assert o["value"] == 5.0

    # missing __name__
    (u,) = by[("unknown_metric", "GAUGE")]
    assert u["value"] == 1.5 and u["attributes"] == {"x": "y"}

    # nothing leaked: 2 hist + 1 summ + 1 ctr + 2 gauge + orphan + unk
    assert len(rows) == 8


def test_uncompressed_payload(spark):
    rows = _decode(spark, compressed=False)
    assert len(rows) == 8


def test_malformed_tolerant(spark):
    df = spark.createDataFrame(
        [(b"\xff\xff",), (None,), (b"",)], "body binary"
    )
    assert prometheus_remote_write(df, compressed=False).count() == 0


def test_negative_bucket_clamp(spark):
    # decreasing cumulative counts clamp per-bucket to 0 (:306-311)
    fix = [
        {"labels": {"__name__": "x_bucket", "le": "1"},
         "samples": [(5.0, TS1)]},
        {"labels": {"__name__": "x_bucket", "le": "2"},
         "samples": [(3.0, TS1)]},
    ]
    df = spark.createDataFrame(
        [(encode_write_request(fix),)], "body binary"
    )
    (r,) = prometheus_remote_write(
        df, compressed=False, now_iso=NOW
    ).collect()
    assert r["bucketCountsList"] == [5, 0]
    assert r["count"] == 0 and r["sum"] == 0.0  # no count/sum series


def test_inf_bounds_parse():
    assert math.isinf(float("inf"))  # sanity for the le mapping below
    fix = [
        {"labels": {"__name__": "y_bucket", "le": "-Inf"},
         "samples": [(0.0, TS1)]},
        {"labels": {"__name__": "y_bucket", "le": "+Inf"},
         "samples": [(2.0, TS1)]},
    ]
    wire = encode_write_request(fix)
    assert decode_write_request(wire)[0]["labels"]["le"] == "-Inf"


def test_neg_inf_excluded_from_bounds(spark):
    fix = [
        {"labels": {"__name__": "y_bucket", "le": "-Inf"},
         "samples": [(0.0, TS1)]},
        {"labels": {"__name__": "y_bucket", "le": "3"},
         "samples": [(2.0, TS1)]},
        {"labels": {"__name__": "y_bucket", "le": "+Inf"},
         "samples": [(4.0, TS1)]},
    ]
    df = spark.createDataFrame(
        [(encode_write_request(fix),)], "body binary"
    )
    (r,) = prometheus_remote_write(
        df, compressed=False, now_iso=NOW
    ).collect()
    assert r["explicitBounds"] == [3.0]  # Double.isInfinite: both ends
    assert r["bucketCountsList"] == [0, 2, 2]


SCRAPE = """\
# HELP http_req request latency
# TYPE http_req histogram
http_req_bucket{le="0.5",job="api"} 1 1544712660300
http_req_bucket{le="1",job="api"} 4 1544712660300
http_req_bucket{le="+Inf",job="api"} 6 1544712660300
http_req_count{job="api"} 6 1544712660300
http_req_sum{job="api"} 3.25 1544712660300
# TYPE rpc_lat summary
rpc_lat{quantile="0.5",service_name="billing"} 0.12
rpc_lat{quantile="0.99",service_name="billing"} 0.87
rpc_lat_count{service_name="billing"} 40
rpc_lat_sum{service_name="billing"} 7.5
# TYPE errors counter
errors_total{svc="auth"} 12 1544712660.3
errors_created{svc="auth"} 99
# TYPE mem_bytes gauge
mem_bytes{host="h1",msg="a\\"b\\\\c\\nd"} 512
untyped_metric 1.5
bad_value_metric notanumber
nan_bucket_metric 3
"""


def test_scrape_full(spark):
    from data_prepper_spark.operators.prometheus import prometheus_scrape

    df = spark.createDataFrame([(SCRAPE,)], "body string")
    rows = prometheus_scrape(df, now_iso=NOW).collect()
    by = {(r["name"], r["kind"]): r for r in rows}

    h = by[("http_req", "HISTOGRAM")]
    assert h["time"] == "2018-12-13T14:51:00.300Z"
    assert h["bucketCountsList"] == [1, 3, 2]
    assert h["explicitBounds"] == [0.5, 1.0]
    assert h["count"] == 6 and h["sum"] == 3.25
    assert h["serviceName"] == "api"

    s = by[("rpc_lat", "SUMMARY")]
    assert [(q["quantile"], q["value"]) for q in s["quantiles"]] == [
        (0.5, 0.12), (0.99, 0.87)
    ]
    assert s["count"] == 40 and s["sum"] == 7.5
    assert s["time"] == NOW  # no timestamps anywhere in the group

    c = by[("errors", "SUM")]  # _total stripped; _created DROPPED
    assert c["value"] == 12.0 and c["isMonotonic"] is True
    # float timestamp is seconds -> ms (parse :139-141)
    assert c["time"] == "2018-12-13T14:51:00.300Z"
    assert ("errors_created", "SUM") not in by
    assert ("errors_created", "GAUGE") not in by

    g = by[("mem_bytes", "GAUGE")]
    assert g["value"] == 512.0
    # label escape handling: \" -> ", \\ -> \, \n -> newline
    assert g["attributes"]["msg"] == 'a"b\\c\nd'

    u = by[("untyped_metric", "GAUGE")]  # undeclared -> gauge
    assert u["value"] == 1.5 and u["attributes"] == {}

    # unparseable value line silently skipped
    assert not any(r["name"] == "bad_value_metric" for r in rows)
    assert by[("nan_bucket_metric", "GAUGE")]["value"] == 3.0
    assert len(rows) == 6


def test_scrape_type_resolution_via_suffix(spark):
    """_count/_sum/_bucket resolve through the declared BASE type;
    declared-but-bucketless histogram _count still groups."""
    from data_prepper_spark.operators.prometheus import prometheus_scrape

    body = (
        "# TYPE lat histogram\n"
        "lat_count{j=\"x\"} 5\n"
        "lat_sum{j=\"x\"} 2.5\n"
    )
    df = spark.createDataFrame([(body,)], "body string")
    (r,) = prometheus_scrape(df, now_iso=NOW).collect()
    assert r["kind"] == "HISTOGRAM" and r["name"] == "lat"
    assert r["count"] == 5 and r["sum"] == 2.5
    assert r["bucketCountsList"] == []


def test_scrape_all_zero_group_dropped(spark):
    from data_prepper_spark.operators.prometheus import prometheus_scrape

    body = (
        "# TYPE lat histogram\n"
        "lat_count 0\n"
        "lat_sum 0.0\n"
        "# TYPE ok gauge\n"
        "ok 1\n"
    )
    df = spark.createDataFrame([(body,)], "body string")
    rows = prometheus_scrape(df, now_iso=NOW).collect()
    assert [r["name"] for r in rows] == ["ok"]


def test_scrape_decreasing_cumulative_clamp(spark):
    """Scrape clamp uses a RUNNING MAX as previous (:389-391), unlike
    the remote-write path."""
    from data_prepper_spark.operators.prometheus import prometheus_scrape

    body = (
        "# TYPE x histogram\n"
        'x_bucket{le="1"} 5\n'
        'x_bucket{le="2"} 3\n'
        'x_bucket{le="3"} 6\n'
    )
    df = spark.createDataFrame([(body,)], "body string")
    (r,) = prometheus_scrape(df, now_iso=NOW).collect()
    # per-bucket: 5, max(0, 3-5)=0, 6-max(5,3)=1
    assert r["bucketCountsList"] == [5, 0, 1]


def test_prometheus_sink_roundtrip(spark, tmp_path):
    """Push-sink parity (PrometheusTimeSeries.java conversion): metric
    events -> TimeSeries -> snappy WriteRequest; captured wire decodes
    back through OUR remote-write source primitives."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from data_prepper_spark.operators.prometheus import (
        snappy_decompress as _sd,
    )
    from data_prepper_spark.sinks.prometheus import prometheus_sink

    bodies = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            assert self.headers["Content-Encoding"] == "snappy"
            bodies.append(self.rfile.read(n))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rows = [
            {
                "name": "cpu.load",  # dot sanitized to _
                "kind": "GAUGE",
                "time": "2018-12-13T14:51:00.300Z",
                "value": 0.5,
                "attributes": {"host": "h1", "bad key": "x"},
            },
            {
                "name": "lat",
                "kind": "HISTOGRAM",
                "time": "2018-12-13T14:51:00Z",
                "count": 7,
                "sum": 12.5,
                "bucketCountsList": [1, 2, 4],
                "explicitBounds": [5.0, 10.0],
                "attributes": {"svc": "a"},
            },
            {
                "name": "rpc",
                "kind": "SUMMARY",
                "time": "2018-12-13T14:51:00Z",
                "count": 10,
                "sum": 9.0,
                "quantiles": [
                    {"quantile": 0.5, "value": 1.0},
                    {"quantile": 0.99, "value": 4.0},
                ],
                "attributes": {},
            },
        ]
        schema = (
            "name string, kind string, time string, value double, "
            "count long, sum double, bucketCountsList array<long>, "
            "explicitBounds array<double>, "
            "quantiles array<struct<quantile double, value double>>, "
            "attributes map<string,string>"
        )
        df = spark.createDataFrame(
            [tuple(r.get(k) for k in (
                "name", "kind", "time", "value", "count", "sum",
                "bucketCountsList", "explicitBounds", "quantiles",
                "attributes"))
             for r in rows],
            schema,
        ).coalesce(1)
        audit = prometheus_sink(
            df, f"http://127.0.0.1:{srv.server_address[1]}/write"
        ).collect()
        assert audit[0]["status"] == 200 and audit[0]["n_events"] == 3

        tss = decode_write_request(_sd(bodies[0]))
        by_name = {}
        for ts in tss:
            by_name.setdefault(ts["labels"]["__name__"], []).append(ts)
        g = by_name["cpu_load"][0]  # sanitized
        assert g["samples"] == [(0.5, 1544712660300)]
        assert g["labels"]["host"] == "h1"
        assert g["labels"]["bad_key"] == "x"  # label sanitized
        assert by_name["lat_count"][0]["samples"][0][0] == 7.0
        assert by_name["lat_sum"][0]["samples"][0][0] == 12.5
        les = {
            ts["labels"]["le"]: ts["samples"][0][0]
            for ts in by_name["lat_bucket"]
        }
        # reference posts PER-BUCKET counts, last bucket le=+Inf
        assert les == {"5.0": 1.0, "10.0": 2.0, "+Inf": 4.0}
        qs = {
            ts["labels"]["quantile"]: ts["samples"][0][0]
            for ts in by_name["rpc"]
        }
        assert qs == {"0.5": 1.0, "0.99": 4.0}
        assert by_name["rpc_count"][0]["samples"][0][0] == 10.0
        json  # quiet linters
    finally:
        srv.shutdown()
        srv.server_close()
