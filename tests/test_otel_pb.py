"""Binary OTLP protobuf wire decode: round-trip through the encoder
twin, byte-parity with the JSON decode path, malformed tolerance."""

import json

from data_prepper_spark.operators.otel import otel_traces
from data_prepper_spark.operators.otel_pb import (
    decode_traces_request,
    encode_traces_request,
    otel_traces_pb,
)

PAYLOAD = {
    "resourceSpans": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name",
                     "value": {"stringValue": "cart"}},
                    {"key": "host.name", "value": {"stringValue": "h1"}},
                ]
            },
            "scopeSpans": [
                {
                    "scope": {
                        "name": "io.lib",
                        "version": "1.2",
                        "attributes": [
                            {"key": "sc.a", "value": {"intValue": "7"}}
                        ],
                    },
                    "spans": [
                        {
                            "traceId": "0af7651916cd43dd8448eb211c80319c",
                            "spanId": "b7ad6b7169203331",
                            "parentSpanId": "",
                            "name": "GET /cart",
                            "kind": 2,
                            "startTimeUnixNano": "1544712660000000000",
                            "endTimeUnixNano": "1544712661500123456",
                            "attributes": [
                                {"key": "http.method",
                                 "value": {"stringValue": "GET"}},
                                {"key": "flag",
                                 "value": {"boolValue": True}},
                                {"key": "retries",
                                 "value": {"intValue": "3"}},
                                {"key": "ratio",
                                 "value": {"doubleValue": 0.25}},
                                {"key": "nested",
                                 "value": {"arrayValue": {"values": [
                                     {"intValue": "1"},
                                     {"stringValue": "x"},
                                 ]}}},
                            ],
                            "status": {"code": 2, "message": "boom"},
                            "events": [
                                {
                                    "timeUnixNano": "1544712660500000000",
                                    "name": "exception",
                                    "attributes": [
                                        {"key": "exception.type",
                                         "value": {"stringValue": "IOError"}}
                                    ],
                                    "droppedAttributesCount": 1,
                                }
                            ],
                            "links": [
                                {
                                    "traceId": "0af7651916cd43dd"
                                               "8448eb211c80319c",
                                    "spanId": "1115151611201111",
                                    "traceState": "k=v",
                                    "attributes": [
                                        {"key": "peer",
                                         "value": {"stringValue": "b"}}
                                    ],
                                }
                            ],
                        },
                        {
                            "traceId": "0af7651916cd43dd8448eb211c80319c",
                            "spanId": "00f067aa0ba902b7",
                            "parentSpanId": "b7ad6b7169203331",
                            "name": "SELECT",
                            "kind": 3,
                            "startTimeUnixNano": "1544712660500000000",
                            "endTimeUnixNano": "1544712660800000000",
                            "attributes": [],
                            "status": {},
                        },
                    ],
                }
            ],
        }
    ]
}


def test_wire_roundtrip():
    wire = encode_traces_request(PAYLOAD)
    back = decode_traces_request(wire)
    spans = back["resourceSpans"][0]["scopeSpans"][0]["spans"]
    assert len(spans) == 2
    s0 = spans[0]
    assert s0["traceId"] == "0af7651916cd43dd8448eb211c80319c"
    assert s0["spanId"] == "b7ad6b7169203331"
    assert s0["name"] == "GET /cart"
    assert s0["kind"] == 2
    assert s0["startTimeUnixNano"] == "1544712660000000000"
    assert s0["status"] == {"message": "boom", "code": 2}
    a = {kv["key"]: kv["value"] for kv in s0["attributes"]}
    assert a["http.method"] == {"stringValue": "GET"}
    assert a["flag"] == {"boolValue": True}
    assert a["retries"] == {"intValue": "3"}
    assert a["ratio"] == {"doubleValue": 0.25}
    assert a["nested"]["arrayValue"]["values"][0] == {"intValue": "1"}
    res = back["resourceSpans"][0]["resource"]["attributes"]
    assert {kv["key"] for kv in res} == {"service.name", "host.name"}
    sc = back["resourceSpans"][0]["scopeSpans"][0]["scope"]
    assert sc["name"] == "io.lib" and sc["version"] == "1.2"


def test_pb_path_matches_json_path(spark):
    wire = encode_traces_request(PAYLOAD)
    pb_df = spark.createDataFrame([(wire,)], "body binary")
    js_df = spark.createDataFrame(
        [(json.dumps(PAYLOAD),)], "message string"
    )
    cols = [
        "traceId", "spanId", "parentSpanId", "name", "kind",
        "startTime", "endTime", "durationInNanos", "serviceName",
        "traceGroup", "status_code", "attrs", "evs", "lks",
    ]

    def norm(df):
        import pyspark.sql.functions as F

        return (
            df.withColumn("attrs", F.to_json(F.col("attributes")))
            .withColumn("evs", F.to_json(F.col("events")))
            .withColumn("lks", F.to_json(F.col("links")))
            .withColumn("status_code", F.col("traceGroupFields")["statusCode"])
            .select(*cols)
            .orderBy("spanId")
            .collect()
        )

    a = norm(otel_traces_pb(pb_df, "body"))
    b = norm(otel_traces(js_df, "message"))
    assert a == b
    assert len(a) == 2
    ev = {r["spanId"]: r["evs"] for r in a}["b7ad6b7169203331"]
    assert "exception" in ev and "exception@type" in ev  # dot->@
    lk = {r["spanId"]: r["lks"] for r in a}["b7ad6b7169203331"]
    assert "1115151611201111" in lk and "k=v" in lk


def test_pb_malformed_tolerant(spark):
    rows = [(b"\xff\xff\xff\xff",), (None,), (b"",)]
    df = spark.createDataFrame(rows, "body binary")
    assert otel_traces_pb(df, "body").count() == 0


LOGS_PAYLOAD = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name",
                     "value": {"stringValue": "auth"}}
                ]
            },
            "scopeLogs": [
                {
                    "scope": {"name": "lg"},
                    "schemaUrl": "https://s",
                    "logRecords": [
                        {
                            "timeUnixNano": "1544712660300000000",
                            "observedTimeUnixNano": "1544712660400000000",
                            "severityNumber": "SEVERITY_NUMBER_ERROR",
                            "severityText": "ERROR",
                            "body": {"stringValue": "oops"},
                            "attributes": [
                                {"key": "req.id",
                                 "value": {"intValue": "42"}}
                            ],
                            "flags": 1,
                            "traceId": "aa",
                            "spanId": "bb",
                        },
                        {
                            "timeUnixNano": "0",
                            "observedTimeUnixNano": "0",
                            "severityNumber": 13,
                            "body": {"doubleValue": 2.5},
                        },
                    ],
                }
            ],
        }
    ]
}

METRICS_PAYLOAD = {
    "resourceMetrics": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "db"}}
                ]
            },
            "scopeMetrics": [
                {
                    "scope": {"name": "m"},
                    "metrics": [
                        {
                            "name": "latency", "unit": "ms",
                            "histogram": {
                                "aggregationTemporality": 2,
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "0",
                                        "count": "7",
                                        "sum": 12.5,
                                        "bucketCounts": ["1", "2", "4"],
                                        "explicitBounds": [5.0, 10.0],
                                        "attributes": [
                                            {"key": "route",
                                             "value": {"stringValue": "/x"}}
                                        ],
                                    }
                                ],
                            },
                        },
                        {
                            "name": "reqs",
                            "sum": {
                                "aggregationTemporality":
                                    "AGGREGATION_TEMPORALITY_DELTA",
                                "isMonotonic": True,
                                "dataPoints": [
                                    {"timeUnixNano": "0", "asInt": "9"}
                                ],
                            },
                        },
                        {
                            "name": "cpu",
                            "gauge": {
                                "dataPoints": [
                                    {"timeUnixNano": "0", "asDouble": 0.5}
                                ]
                            },
                        },
                        {
                            "name": "lat_exp",
                            "exponentialHistogram": {
                                "aggregationTemporality": 2,
                                "dataPoints": [
                                    {
                                        "startTimeUnixNano": "1000000000",
                                        "timeUnixNano": "2000000000",
                                        "count": "7",
                                        "sum": 31.5,
                                        "scale": -1,
                                        "zeroCount": "2",
                                        "positive": {
                                            "offset": 3,
                                            "bucketCounts": ["1", "4"],
                                        },
                                        "negative": {
                                            "offset": -2,
                                            "bucketCounts": ["2"],
                                        },
                                    }
                                ],
                            },
                        },
                        {
                            "name": "size",
                            "summary": {
                                "dataPoints": [
                                    {
                                        "startTimeUnixNano": "1000000000",
                                        "timeUnixNano": "3000000000",
                                        "count": "10",
                                        "sum": 99.0,
                                        "quantileValues": [
                                            {"quantile": 0.5, "value": 4.0},
                                            {"quantile": 0.99,
                                             "value": 12.5},
                                        ],
                                    }
                                ]
                            },
                        },
                    ],
                }
            ],
        }
    ]
}


def test_logs_wire_roundtrip():
    from data_prepper_spark.operators.otel_pb import (
        decode_logs_request,
        encode_logs_request,
    )

    back = decode_logs_request(encode_logs_request(LOGS_PAYLOAD))
    sl = back["resourceLogs"][0]["scopeLogs"][0]
    assert sl["schemaUrl"] == "https://s"
    r0, r1 = sl["logRecords"]
    assert r0["timeUnixNano"] == "1544712660300000000"
    assert r0["observedTimeUnixNano"] == "1544712660400000000"
    assert r0["severityNumber"] == 17  # name encoded to wire value
    assert r0["severityText"] == "ERROR"
    assert r0["body"] == {"stringValue": "oops"}
    assert r0["flags"] == 1
    assert r0["traceId"] == "aa" and r0["spanId"] == "bb"
    assert r1["severityNumber"] == 13
    assert r1["body"] == {"doubleValue": 2.5}


def test_metrics_wire_roundtrip():
    from data_prepper_spark.operators.otel_pb import (
        decode_metrics_request,
        encode_metrics_request,
    )

    back = decode_metrics_request(encode_metrics_request(METRICS_PAYLOAD))
    ms = {m["name"]: m
          for m in back["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]}
    h = ms["latency"]["histogram"]
    assert h["aggregationTemporality"] == 2
    dp = h["dataPoints"][0]
    assert dp["count"] == "7" and dp["sum"] == 12.5
    assert dp["bucketCounts"] == ["1", "2", "4"]  # packed fixed64
    assert dp["explicitBounds"] == [5.0, 10.0]  # packed double
    s = ms["reqs"]["sum"]
    assert s["aggregationTemporality"] == 1  # DELTA name -> wire 1
    assert s["isMonotonic"] is True
    assert s["dataPoints"][0]["asInt"] == "9"  # sfixed64
    assert ms["cpu"]["gauge"]["dataPoints"][0]["asDouble"] == 0.5
    e = ms["lat_exp"]["exponentialHistogram"]["dataPoints"][0]
    assert e["scale"] == -1  # sint32 zigzag survives negatives
    assert e["zeroCount"] == "2"
    assert e["positive"] == {"offset": 3, "bucketCounts": ["1", "4"]}
    assert e["negative"] == {"offset": -2, "bucketCounts": ["2"]}
    q = ms["size"]["summary"]["dataPoints"][0]
    assert q["quantileValues"] == [
        {"quantile": 0.5, "value": 4.0},
        {"quantile": 0.99, "value": 12.5},
    ]


def test_logs_pb_path_matches_json_path(spark):
    from data_prepper_spark.operators.otel import otel_logs
    from data_prepper_spark.operators.otel_pb import (
        encode_logs_request,
        otel_logs_pb,
    )

    wire = encode_logs_request(LOGS_PAYLOAD)
    pb_df = spark.createDataFrame([(wire,)], "body binary")
    js_df = spark.createDataFrame(
        [(json.dumps(LOGS_PAYLOAD),)], "message string"
    )

    def norm(df):
        import pyspark.sql.functions as F

        return (
            df.withColumn("attrs", F.to_json(F.col("attributes")))
            .select("time", "observedTime", "serviceName",
                    "severityNumber", "severityText", "body",
                    "schemaUrl", "flags", "traceId", "spanId", "attrs")
            .orderBy("time")
            .collect()
        )

    a = norm(otel_logs_pb(pb_df, "body"))
    b = norm(otel_logs(js_df, "message"))
    assert a == b and len(a) == 2


def test_metrics_pb_path_matches_json_path(spark):
    from data_prepper_spark.operators.otel import otel_metrics
    from data_prepper_spark.operators.otel_pb import (
        encode_metrics_request,
        otel_metrics_pb,
    )

    wire = encode_metrics_request(METRICS_PAYLOAD)
    pb_df = spark.createDataFrame([(wire,)], "body binary")
    js_df = spark.createDataFrame(
        [(json.dumps(METRICS_PAYLOAD),)], "message string"
    )

    def norm(df):
        import pyspark.sql.functions as F

        return (
            df.withColumn("attrs", F.to_json(F.col("attributes")))
            .withColumn("pbkts", F.to_json(F.col("positiveBuckets")))
            .withColumn("nbkts", F.to_json(F.col("negativeBuckets")))
            .withColumn("qs", F.to_json(F.col("quantiles")))
            .select("name", "kind", "unit", "serviceName", "time",
                    "value", "count", "sum", "bucketCountsList",
                    "explicitBounds", "aggregationTemporality",
                    "isMonotonic", "scale", "zeroCount",
                    "positiveOffset", "negativeOffset", "pbkts",
                    "nbkts", "qs", "attrs")
            .orderBy("name")
            .collect()
        )

    a = norm(otel_metrics_pb(pb_df, "body"))
    b = norm(otel_metrics(js_df, "message"))
    assert a == b and len(a) == 5


def test_bytes_value_attribute_is_base64():
    """OTLP/JSON encodes AnyValue.bytesValue as base64 (hex is only
    for trace/span ids) — the pb wire path must produce the same
    string an external JSON client would send (ADVICE r04)."""
    import base64

    payload = {
        "resourceSpans": [{
            "resource": {"attributes": [
                {"key": "blob", "value": {"bytesValue":
                    base64.b64encode(b"\x00\xffhi").decode()}},
            ]},
            "scopeSpans": [{"spans": [{
                "traceId": "0" * 32, "spanId": "0" * 16, "name": "s",
            }]}],
        }]
    }
    back = decode_traces_request(encode_traces_request(payload))
    attr = back["resourceSpans"][0]["resource"]["attributes"][0]
    assert attr["value"]["bytesValue"] == base64.b64encode(
        b"\x00\xffhi"
    ).decode()
