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
        "traceGroup", "status_code", "attrs",
    ]

    def norm(df):
        import pyspark.sql.functions as F

        return (
            df.withColumn("attrs", F.to_json(F.col("attributes")))
            .withColumn("status_code", F.col("traceGroupFields")["statusCode"])
            .select(*cols)
            .orderBy("spanId")
            .collect()
        )

    a = norm(otel_traces_pb(pb_df, "body"))
    b = norm(otel_traces(js_df, "message"))
    assert a == b
    assert len(a) == 2


def test_pb_malformed_tolerant(spark):
    rows = [(b"\xff\xff\xff\xff",), (None,), (b"",)]
    df = spark.createDataFrame(rows, "body binary")
    assert otel_traces_pb(df, "body").count() == 0
