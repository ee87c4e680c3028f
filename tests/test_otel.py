"""OTel OTLP-JSON codec conformance (reference
OTelProtoOpensearchCodec.java decode semantics)."""

import json

import pytest

from data_prepper_spark.operators.otel import (
    otel_logs,
    otel_metrics,
    otel_traces,
)
from data_prepper_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(master="local[4]")


def _one(spark, payload, fn):
    df = spark.createDataFrame([(json.dumps(payload),)], "message string")
    return fn(df, "message").collect()


def test_traces_span_fields_and_attribute_flattening(spark):
    payload = {
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
                                ],
                                "droppedAttributesCount": 3,
                                "status": {"code": 2, "message": "boom"},
                            },
                            {
                                "traceId": "0af7651916cd43dd8448eb211c80319c",
                                "spanId": "cc",
                                "parentSpanId": "b7ad6b7169203331",
                                "name": "child",
                                "kind": "SPAN_KIND_CLIENT",
                                "startTimeUnixNano": "1544712660000000000",
                                "endTimeUnixNano": "1544712660000000000",
                                "status": {},
                            },
                        ],
                    }
                ],
            }
        ]
    }
    rows = _one(spark, payload, otel_traces)
    assert len(rows) == 2
    root, child = rows
    # JacksonSpan field set (parseSpan :330-360)
    assert root.traceId == "0af7651916cd43dd8448eb211c80319c"
    assert root.kind == "SPAN_KIND_SERVER"  # numeric enum -> name
    assert child.kind == "SPAN_KIND_CLIENT"  # name passes through
    assert root.serviceName == "cart"
    # Instant.toString() rendering: 0 and 9 fraction digits
    assert root.startTime == "2018-12-13T14:51:00Z"
    assert root.endTime == "2018-12-13T14:51:01.500123456Z"
    assert root.durationInNanos == 1500123456
    assert root.droppedAttributesCount == 3
    a = dict(root.attributes)
    # '.'->'@' + context prefixes (:108-119), scope entries
    # (:1104-1122), status merge (:478-485)
    assert a["span.attributes.http@method"] == "GET"
    assert a["span.attributes.flag"] == "true"
    assert a["resource.attributes.host@name"] == "h1"
    assert a["resource.attributes.service@name"] == "cart"
    assert a["instrumentationScope.name"] == "io.lib"
    assert a["instrumentationScope.version"] == "1.2"
    assert a["instrumentationScope.attributes.sc@a"] == "7"
    assert a["status.code"] == "2"
    assert a["status.message"] == "boom"
    # traceGroup iff root (:449-451); traceGroupFields root-only
    assert root.traceGroup == "GET /cart"
    assert child.traceGroup is None
    assert root.traceGroupFields.statusCode == 2
    assert root.traceGroupFields.durationInNanos == 1500123456
    assert child.traceGroupFields.endTime is None
    # unset status -> code 0, no message entry
    ca = dict(child.attributes)
    assert ca["status.code"] == "0"
    assert "status.message" not in ca


def test_traces_nested_anyvalue_as_json_strings(spark):
    payload = {
        "resourceSpans": [
            {
                "resource": {"attributes": []},
                "scopeSpans": [
                    {
                        "scope": {},
                        "spans": [
                            {
                                "traceId": "t",
                                "spanId": "s",
                                "name": "n",
                                "startTimeUnixNano": "0",
                                "endTimeUnixNano": "1",
                                "attributes": [
                                    {"key": "arr", "value": {"arrayValue": {
                                        "values": [
                                            {"intValue": "1"},
                                            {"stringValue": 'he said "hi"'},
                                            {"doubleValue": 1.5},
                                        ]}}},
                                    {"key": "kv", "value": {"kvlistValue": {
                                        "values": [
                                            {"key": "a.b",
                                             "value": {"boolValue": False}}
                                        ]}}},
                                ],
                            }
                        ],
                    }
                ],
            }
        ]
    }
    a = dict(_one(spark, payload, otel_traces)[0].attributes)
    # nested values stored as JSON strings (:373-396), keys inside
    # kvlists also '.'->'@', string escapes preserved
    assert json.loads(a["span.attributes.arr"]) == [1, 'he said "hi"', 1.5]
    assert json.loads(a["span.attributes.kv"]) == {"a@b": False}


def test_iso8601_fraction_digit_groups(spark):
    # Instant.toString(): shortest exact group of 0/3/6/9 digits
    cases = {
        "1544712660000000000": "2018-12-13T14:51:00Z",
        "1544712660300000000": "2018-12-13T14:51:00.300Z",
        "1544712660000123000": "2018-12-13T14:51:00.000123Z",
        "1544712660000000007": "2018-12-13T14:51:00.000000007Z",
    }
    spans = [
        {
            "traceId": "t", "spanId": str(i), "name": "n",
            "startTimeUnixNano": nanos, "endTimeUnixNano": nanos,
        }
        for i, nanos in enumerate(cases)
    ]
    payload = {"resourceSpans": [{"scopeSpans": [{"spans": spans}]}]}
    rows = _one(spark, payload, otel_traces)
    got = {r.spanId: r.startTime for r in rows}
    for i, (nanos, want) in enumerate(cases.items()):
        assert got[str(i)] == want, nanos


def test_logs_record_fields(spark):
    payload = {
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
    rows = _one(spark, payload, otel_logs)
    r = rows[0]
    # JacksonOtelLog field set (processLogsList :299-328)
    assert r.time == "2018-12-13T14:51:00.300Z"
    assert r.observedTime == "2018-12-13T14:51:00.400Z"
    assert r.serviceName == "auth"
    assert r.severityNumber == 17  # enum name -> value
    assert r.severityText == "ERROR"
    assert r.body == "oops"
    assert r.schemaUrl == "https://s"
    assert r.flags == 1 and r.traceId == "aa" and r.spanId == "bb"
    a = dict(r.attributes)
    assert a["log.attributes.req@id"] == "42"
    assert a["resource.attributes.service@name"] == "auth"
    assert rows[1].severityNumber == 13  # numeric passes through
    assert rows[1].body == "2.5"


def test_metrics_gauge_sum_histogram(spark):
    payload = {
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
                        ],
                    }
                ],
            }
        ]
    }
    rows = {r.name: r for r in _one(spark, payload, otel_metrics)}
    assert set(rows) == {"latency", "reqs", "cpu"}
    h = rows["latency"]
    # JacksonHistogram (processMetricsList :659-695)
    assert h.kind == "HISTOGRAM"
    assert h["count"] == 7 and h["sum"] == 12.5
    assert h.bucketCountsList == [1, 2, 4]
    assert h.explicitBounds == [5.0, 10.0]
    assert h.explicitBoundsCount == 2
    assert h.aggregationTemporality == "AGGREGATION_TEMPORALITY_CUMULATIVE"
    # createBuckets open ends clamp to +/- Float.MAX_VALUE (:84-85)
    bkts = [(b["min"], b["max"], b["count"]) for b in h.buckets]
    fmax = 3.4028234663852886e38
    assert bkts == [(-fmax, 5.0, 1), (5.0, 10.0, 2), (10.0, fmax, 4)]
    assert dict(h.attributes)["metric.attributes.route"] == "/x"
    s = rows["reqs"]
    # JacksonSum: getValueAsDouble over asInt (:593-602)
    assert s.kind == "SUM" and s.value == 9.0
    assert s.aggregationTemporality == "AGGREGATION_TEMPORALITY_DELTA"
    assert s.isMonotonic is True
    g = rows["cpu"]
    assert g.kind == "GAUGE" and g.value == 0.5
    assert g.aggregationTemporality is None and g.isMonotonic is None
    assert dict(g.attributes)["resource.attributes.service@name"] == "db"


def test_malformed_and_empty_payloads(spark):
    df = spark.createDataFrame(
        [("not json",), ("{}",), ('{"resourceSpans": []}',)],
        "message string",
    )
    assert otel_traces(df, "message").count() == 0
    assert otel_logs(df, "message").count() == 0
    assert otel_metrics(df, "message").count() == 0


def test_duplicate_attribute_keys_last_wins(spark):
    """ADVICE r03: duplicate attribute keys (including keys that
    collide only after the '.'→'@' rewrite) must decode last-wins,
    like the reference codec — not throw DUPLICATED_MAP_KEY and fail
    the whole job on one malformed record."""
    payload = {
        "resourceSpans": [
            {
                "resource": {"attributes": []},
                "scopeSpans": [
                    {
                        "scope": {"name": "s", "version": "1"},
                        "spans": [
                            {
                                "traceId": "0af7651916cd43dd8448eb211c80319c",
                                "spanId": "b7ad6b7169203331",
                                "parentSpanId": "",
                                "name": "op",
                                "kind": 1,
                                "startTimeUnixNano": "1",
                                "endTimeUnixNano": "2",
                                "attributes": [
                                    {"key": "dup",
                                     "value": {"stringValue": "first"}},
                                    {"key": "dup",
                                     "value": {"stringValue": "second"}},
                                    # collides with 'a@b' after rewrite
                                    {"key": "a.b",
                                     "value": {"stringValue": "dotted"}},
                                    {"key": "a@b",
                                     "value": {"stringValue": "atted"}},
                                ],
                            }
                        ],
                    }
                ],
            }
        ]
    }
    rows = _one(spark, payload, otel_traces)
    assert len(rows) == 1
    a = dict(rows[0].attributes)
    assert a["span.attributes.dup"] == "second"
    assert a["span.attributes.a@b"] == "atted"


def test_metrics_exponential_histogram_and_summary(spark):
    """Round-4 completion of the metric type family (reference
    JacksonExponentialHistogram.java / JacksonSummary.java):
    EXPONENTIAL_HISTOGRAM points decode scale/zeroCount/offsets/count
    lists plus computed base-2^(2^-scale) bucket bounds; SUMMARY
    points decode quantiles. GAUGE rows keep nulls in the new cols."""
    import math

    payload = {
        "resourceMetrics": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name",
                         "value": {"stringValue": "m"}}
                    ]
                },
                "scopeMetrics": [
                    {
                        "scope": {"name": "io.lib", "version": "1"},
                        "metrics": [
                            {
                                "name": "lat",
                                "unit": "ms",
                                "exponentialHistogram": {
                                    "aggregationTemporality": 2,
                                    "dataPoints": [
                                        {
                                            "startTimeUnixNano": "1000000000",
                                            "timeUnixNano": "2000000000",
                                            "count": "7",
                                            "sum": 31.5,
                                            "scale": 1,
                                            "zeroCount": "2",
                                            "positive": {
                                                "offset": 3,
                                                "bucketCounts": ["1", "4"],
                                            },
                                            "negative": {
                                                "offset": 0,
                                                "bucketCounts": ["2"],
                                            },
                                            "attributes": [],
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
                                                {"quantile": 0.5,
                                                 "value": 4.0},
                                                {"quantile": 0.99,
                                                 "value": 12.5},
                                            ],
                                            "attributes": [],
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
    rows = {r.kind: r for r in _one(spark, payload, otel_metrics)}
    assert set(rows) == {"EXPONENTIAL_HISTOGRAM", "SUMMARY"}

    eh = rows["EXPONENTIAL_HISTOGRAM"]
    assert eh.scale == 1 and eh.zeroCount == 2
    assert eh["count"] == 7 and eh["sum"] == 31.5
    assert eh.positiveOffset == 3 and eh.negativeOffset == 0
    assert list(eh.positive) == [1, 4] and list(eh.negative) == [2]
    assert eh.aggregationTemporality == "AGGREGATION_TEMPORALITY_CUMULATIVE"
    base = 2 ** (2 ** -1.0)
    pb = eh.positiveBuckets
    assert pb[0]["count"] == 1 and pb[1]["count"] == 4
    assert math.isclose(pb[0]["min"], base ** 3)
    assert math.isclose(pb[0]["max"], base ** 4)
    assert math.isclose(pb[1]["max"], base ** 5)
    nb = eh.negativeBuckets
    assert nb[0]["count"] == 2
    assert math.isclose(nb[0]["min"], -(base ** 1))
    assert math.isclose(nb[0]["max"], -(base ** 0))

    sm = rows["SUMMARY"]
    assert sm["count"] == 10 and sm["sum"] == 99.0
    assert sm.aggregationTemporality is None
    assert sm.quantileValuesCount == 2
    assert [q["quantile"] for q in sm.quantiles] == [0.5, 0.99]
    assert [q["value"] for q in sm.quantiles] == [4.0, 12.5]
