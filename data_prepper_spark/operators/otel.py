"""OTel OTLP-JSON source codecs: traces / logs / metrics.

Re-expresses the reference's OTel decode path (reference
otel-proto-common/.../OTelProtoOpensearchCodec.java — the
"OpenSearch-friendly" decoder its otel_traces/otel_logs/otel_metrics
sources and OTLP codecs share) as pure Catalyst transformations:
`from_json` with explicit OTLP schemas + higher-order functions
(transform / map_from_entries / explode). No UDFs anywhere — the
whole decode stays JVM-side and whole-stage-codegen'd, so it scales
with the scan.

Input is the OTLP/JSON wire form (ExportTraceServiceRequest /
ExportLogsServiceRequest / ExportMetricsServiceRequest encoded with
proto3 JSON): trace/span ids are hex per the OTLP/JSON spec, int64s
may arrive as JSON strings or numbers, enums as names or numbers —
all accepted. The gRPC listener itself is out of scope in this
sandbox (documented, SURVEY §2.1); these codecs are the decode layer
those sources wrap, applied to OTLP-JSON payloads carried in any
DataFrame column (file/kafka/http bodies alike).

Reference semantics mirrored exactly (OTelProtoOpensearchCodec.java):
  * attribute keys flatten with '.'->'@' and context prefixes:
    span.attributes. / resource.attributes. / log.attributes. /
    metric.attributes. (:114-119), instrumentationScope.name /
    .version / .attributes.<key> (:1104-1122);
  * span status merges into attributes as status.code (int value) +
    status.message when non-empty (:478-485);
  * traceGroup = span name iff parentSpanId is empty, else null
    (:449-451); traceGroupFields carry endTime/durationInNanos/
    statusCode for root spans only (:468-476);
  * durationInNanos = endTimeUnixNano - startTimeUnixNano (:356);
  * times render as Instant.toString() ISO-8601 — fraction printed
    with 0/3/6/9 digits, shortest group that is exact (:14-16 of
    OTelProtoCommonUtils.java); implemented tz-free (pure integer
    arithmetic on the nano epoch, no session-timezone dependency);
  * anyValue scalars keep their value; nested array/kvlist values
    are stored as JSON strings (:373-396 — "not OpenSearch
    friendly" flattening).

Divergence (documented): event attribute values are a Spark
map<string,string> (Catalyst maps are homogeneous) — scalars render
via CAST AS STRING ('true'/'false', digits, Java double form),
nested structures as the same JSON strings the reference stores.
Span events/links lists are dropped (their dropped-counts are kept).
Exponential histograms and summaries ARE decoded (round 4):
EXPONENTIAL_HISTOGRAM points carry scale / zeroCount / offsets /
count lists plus computed positiveBuckets/negativeBuckets with
base-2^(2^-scale) bounds (JacksonExponentialHistogram.java,
OTelProtoOpensearchCodec createExponentialBuckets); SUMMARY points
carry quantiles + quantileValuesCount (JacksonSummary.java). Binary
protobuf wire payloads decode through operators/otel_pb.py into this
same pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _anyval(depth: int) -> T.StructType:
    """OTLP AnyValue as a struct of optional typed branches.

    intValue is StringType: proto3 JSON writes int64 as a string and
    many emitters write a number — JacksonParser coerces both to the
    literal text. Nesting is structural (arrayValue/kvlistValue of
    AnyValue) down to `depth` levels; deeper values parse as null and
    render as "" (reference recursion is unbounded; tests stay within
    the shipped depth)."""
    fields = [
        T.StructField("stringValue", T.StringType()),
        T.StructField("boolValue", T.BooleanType()),
        T.StructField("intValue", T.StringType()),
        T.StructField("doubleValue", T.DoubleType()),
    ]
    if depth > 0:
        inner = _anyval(depth - 1)
        fields += [
            T.StructField(
                "arrayValue",
                T.StructType([T.StructField("values", T.ArrayType(inner))]),
            ),
            T.StructField(
                "kvlistValue",
                T.StructType(
                    [
                        T.StructField(
                            "values",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("key", T.StringType()),
                                        T.StructField("value", inner),
                                    ]
                                )
                            ),
                        )
                    ]
                ),
            ),
        ]
    return T.StructType(fields)


def _kvlist(depth: int = 2) -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("value", _anyval(depth)),
            ]
        )
    )


_SCOPE_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("attributes", _kvlist()),
    ]
)
_RESOURCE_T = T.StructType([T.StructField("attributes", _kvlist())])


def _strip_wrap(json_obj: Column) -> Column:
    """to_json(struct(x AS v)) == {"v":<json-of-x>} — slice the fixed
    5-char prefix and closing brace to get the escaped JSON scalar.
    Robust against any content because the wrapper is constant."""
    return json_obj.substr(F.lit(6), F.length(json_obj) - F.lit(6))


def _json_scalar(v: Column) -> Column:
    """Render one AnyValue as a JSON value string (for embedding in
    the array/kvlist JSON the reference stores, :373-396)."""
    return (
        F.when(v["stringValue"].isNotNull(),
               _strip_wrap(F.to_json(F.struct(v["stringValue"].alias("v")))))
        .when(v["boolValue"].isNotNull(),
              F.when(v["boolValue"], F.lit("true")).otherwise(F.lit("false")))
        .when(v["intValue"].isNotNull(), v["intValue"])
        .when(v["doubleValue"].isNotNull(), v["doubleValue"].cast("string"))
        .otherwise(F.lit('""'))
    )


def _conv_value(v: Column, depth: int = 2) -> Column:
    """convertAnyValue (:362-396) with the map<string,string> erasure:
    scalars as their string form, array/kvlist as JSON strings."""
    out = (
        F.when(v["stringValue"].isNotNull(), v["stringValue"])
        .when(v["boolValue"].isNotNull(),
              F.when(v["boolValue"], F.lit("true")).otherwise(F.lit("false")))
        .when(v["intValue"].isNotNull(), v["intValue"])
        .when(v["doubleValue"].isNotNull(), v["doubleValue"].cast("string"))
    )
    if depth > 0:
        arr = F.concat(
            F.lit("["),
            F.array_join(
                F.transform(v["arrayValue"]["values"], _json_scalar), ","
            ),
            F.lit("]"),
        )
        kvl = F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(
                    v["kvlistValue"]["values"],
                    lambda kv: F.concat(
                        _strip_wrap(
                            F.to_json(
                                F.struct(
                                    F.replace(
                                        kv["key"], F.lit("."), F.lit("@")
                                    ).alias("v")
                                )
                            )
                        ),
                        F.lit(":"),
                        _json_scalar(kv["value"]),
                    ),
                ),
                ",",
            ),
            F.lit("}"),
        )
        out = out.when(v["arrayValue"].isNotNull(), arr).when(
            v["kvlistValue"].isNotNull(), kvl
        )
    # VALUE_NOT_SET falls through to getStringValue() == "" (:364-366)
    return out.otherwise(F.lit(""))


def _prefixed_entries(attrs: Column, prefix: str, depth: int = 2) -> Column:
    """[(prefix + key.replace('.','@'), converted value)] — the
    SPAN/RESOURCE/LOG/METRIC_ATTRIBUTES_REPLACE_DOT_WITH_AT family
    (:108-119). Null attribute lists become empty entry lists."""
    return F.coalesce(
        F.transform(
            attrs,
            lambda a: F.struct(
                F.concat(
                    F.lit(prefix),
                    F.replace(a["key"], F.lit("."), F.lit("@")),
                ).alias("key"),
                _conv_value(a["value"], depth).alias("value"),
            ),
        ),
        F.array().cast(
            "array<struct<key string, value string>>"
        ),
    )


def _entries_last_wins(arr: Column) -> Column:
    """Keep only the LAST entry per key before map_from_entries — the
    reference codec overwrites duplicates last-wins, while Spark's
    default mapKeyDedupPolicy=EXCEPTION would fail the whole decode
    job on ONE malformed record carrying duplicate attribute keys (or
    keys that collide after the '.'→'@' rewrite, e.g. 'a.b' vs 'a@b')
    — ADVICE r03. O(n²) in the per-record attribute count (tiny):
    entry i survives iff no later entry shares its key."""
    return F.filter(
        arr,
        lambda x, i: ~F.exists(
            F.slice(arr, i + F.lit(2), F.size(arr)),
            lambda y: y["key"] == x["key"],
        ),
    )


def _scope_entries(scope: Column) -> Column:
    """instrumentationScope.name / .version (only when non-empty) +
    instrumentationScope.attributes.<key@> (:1104-1122; the
    unpackKeyValueList DOT prefix lands between)."""
    ent = "array<struct<key string, value string>>"
    name_e = F.when(
        scope["name"].isNotNull() & (scope["name"] != ""),
        F.array(
            F.struct(
                F.lit("instrumentationScope.name").alias("key"),
                scope["name"].alias("value"),
            )
        ),
    ).otherwise(F.array().cast(ent))
    ver_e = F.when(
        scope["version"].isNotNull() & (scope["version"] != ""),
        F.array(
            F.struct(
                F.lit("instrumentationScope.version").alias("key"),
                scope["version"].alias("value"),
            )
        ),
    ).otherwise(F.array().cast(ent))
    attr_e = _prefixed_entries(
        scope["attributes"], "instrumentationScope.attributes."
    )
    return F.concat(name_e, ver_e, attr_e)


_KIND_NAMES = {
    "0": "SPAN_KIND_UNSPECIFIED",
    "1": "SPAN_KIND_INTERNAL",
    "2": "SPAN_KIND_SERVER",
    "3": "SPAN_KIND_CLIENT",
    "4": "SPAN_KIND_PRODUCER",
    "5": "SPAN_KIND_CONSUMER",
}
_TEMPORALITY_NAMES = {
    "0": "AGGREGATION_TEMPORALITY_UNSPECIFIED",
    "1": "AGGREGATION_TEMPORALITY_DELTA",
    "2": "AGGREGATION_TEMPORALITY_CUMULATIVE",
}
_STATUS_CODES = {
    "STATUS_CODE_UNSET": 0,
    "STATUS_CODE_OK": 1,
    "STATUS_CODE_ERROR": 2,
}
# proto3 JSON may carry severity as the enum name; the numbers are
# systematic: TRACE 1-4, DEBUG 5-8, INFO 9-12, WARN 13-16,
# ERROR 17-20, FATAL 21-24 (getSeverityNumberValue, :321)
_SEVERITY_VALUES = {
    f"SEVERITY_NUMBER_{lvl}{sfx}": str(base + i)
    for base, lvl in (
        (1, "TRACE"), (5, "DEBUG"), (9, "INFO"),
        (13, "WARN"), (17, "ERROR"), (21, "FATAL"),
    )
    for i, sfx in enumerate(["", "2", "3", "4"])
}


def _enum_name(col: Column, names: dict[str, str]) -> Column:
    """proto3 JSON enums arrive as names or numbers; normalize to the
    proto name (sp.getKind().name(), :340)."""
    m = F.create_map(*[F.lit(x) for kv in names.items() for x in kv])
    return F.coalesce(F.element_at(m, col), col)


def _status_code_value(col: Column) -> Column:
    m = F.create_map(
        *[F.lit(x) for kv in _STATUS_CODES.items() for x in (kv[0], str(kv[1]))]
    )
    return F.coalesce(
        F.element_at(m, col), col, F.lit("0")
    ).cast("int")


def _nanos(col: Column) -> Column:
    return F.coalesce(col.cast("long"), F.lit(0))


def _iso8601(nanos: Column) -> Column:
    """Instant.ofEpochSecond(0, nanos).toString() — tz-free: the date
    comes from day arithmetic on the epoch (year/month/day of a DATE
    are timezone-independent), the fraction prints 0/3/6/9 digits
    (shortest exact group), trailing 'Z'.

    Exact arithmetic: frac = nanos % 1e9 is an exact long op, and
    (nanos - frac) is a multiple of 1e9 — ~30 trailing zero bits, so
    its double image is exact below 2^63 and the division yields the
    exact integer second (the epoch_nano double-mantissa pitfall from
    ADVICE r02 cannot occur)."""
    frac = nanos % F.lit(1000000000)
    secs = ((nanos - frac) / F.lit(1000000000)).cast("long")
    days = (secs / 86400).cast("int")
    d = F.date_add(F.lit("1970-01-01").cast("date"), days)
    tod = secs - days.cast("long") * 86400
    hh = F.lpad(((tod / 3600).cast("long")).cast("string"), 2, "0")
    mm = F.lpad((((tod % 3600) / 60).cast("long")).cast("string"), 2, "0")
    ss = F.lpad((tod % 60).cast("string"), 2, "0")
    frac_s = (
        F.when(frac == 0, F.lit(""))
        .when(frac % 1000000 == 0,
              F.concat(F.lit("."), F.lpad((frac / 1000000).cast("long").cast("string"), 3, "0")))
        .when(frac % 1000 == 0,
              F.concat(F.lit("."), F.lpad((frac / 1000).cast("long").cast("string"), 6, "0")))
        .otherwise(F.concat(F.lit("."), F.lpad(frac.cast("string"), 9, "0")))
    )
    return F.concat(
        F.year(d).cast("string"),
        F.lit("-"),
        F.lpad(F.month(d).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(F.dayofmonth(d).cast("string"), 2, "0"),
        F.lit("T"), hh, F.lit(":"), mm, F.lit(":"), ss, frac_s, F.lit("Z"),
    )


def _service_name(res: Column) -> Column:
    """getServiceName: the resource attribute 'service.name' (:41)."""
    hits = F.filter(
        F.coalesce(res["attributes"], F.array().cast(_kvlist())),
        lambda a: a["key"] == F.lit("service.name"),
    )
    return F.when(
        F.size(hits) > 0, _conv_value(F.element_at(hits, 1)["value"])
    )


_SPAN_T = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("traceState", T.StringType()),
        T.StructField("parentSpanId", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("endTimeUnixNano", T.StringType()),
        T.StructField("attributes", _kvlist()),
        T.StructField("droppedAttributesCount", T.IntegerType()),
        T.StructField("droppedEventsCount", T.IntegerType()),
        T.StructField("droppedLinksCount", T.IntegerType()),
        T.StructField(
            "status",
            T.StructType(
                [
                    T.StructField("code", T.StringType()),
                    T.StructField("message", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "events",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("timeUnixNano", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("attributes", _kvlist(0)),
                        T.StructField(
                            "droppedAttributesCount", T.IntegerType()
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("traceId", T.StringType()),
                        T.StructField("spanId", T.StringType()),
                        T.StructField("traceState", T.StringType()),
                        T.StructField("attributes", _kvlist(0)),
                        T.StructField(
                            "droppedAttributesCount", T.IntegerType()
                        ),
                    ]
                )
            ),
        ),
    ]
)

TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("resource", _RESOURCE_T),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("scope", _SCOPE_T),
                                        T.StructField(
                                            "spans", T.ArrayType(_SPAN_T)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def otel_traces(df: DataFrame, source: str = "message") -> DataFrame:
    """Decode OTLP/JSON trace payloads in `source` into one event per
    span with the reference's JacksonSpan shape (parseSpan, :330-360).

    Output columns: traceId, spanId, traceState, parentSpanId, name,
    serviceName, kind, startTime, endTime, durationInNanos,
    attributes (flattened map — span.attributes.* / resource
    .attributes.* / instrumentationScope.* / status.*),
    droppedAttributesCount, droppedEventsCount, droppedLinksCount,
    events / links (full bodies since r4 — ISO times, dot->@ keys:
    getSpanEvent :404-411, getLink :413-421), traceGroup, traceGroupFields(endTime, durationInNanos,
    statusCode). Original columns are preserved."""
    parsed = F.from_json(F.col(source), TRACES_SCHEMA)
    df = df.withColumn("_rs", F.explode(parsed["resourceSpans"]))
    df = df.withColumn("_ss", F.explode(F.col("_rs")["scopeSpans"]))
    df = df.withColumn("_sp", F.explode(F.col("_ss")["spans"]))
    sp, rs, ss = F.col("_sp"), F.col("_rs"), F.col("_ss")

    status_code = _status_code_value(sp["status"]["code"])
    ent = "array<struct<key string, value string>>"
    status_entries = F.concat(
        F.array(
            F.struct(
                F.lit("status.code").alias("key"),
                status_code.cast("string").alias("value"),
            )
        ),
        F.when(
            sp["status"]["message"].isNotNull()
            & (sp["status"]["message"] != ""),
            F.array(
                F.struct(
                    F.lit("status.message").alias("key"),
                    sp["status"]["message"].alias("value"),
                )
            ),
        ).otherwise(F.array().cast(ent)),
    )
    attrs = F.map_from_entries(
        _entries_last_wins(
            F.concat(
                _prefixed_entries(sp["attributes"], "span.attributes."),
                _prefixed_entries(
                    rs["resource"]["attributes"], "resource.attributes."
                ),
                _scope_entries(ss["scope"]),
                status_entries,
            )
        )
    )
    start_n = _nanos(sp["startTimeUnixNano"])
    end_n = _nanos(sp["endTimeUnixNano"])
    is_root = sp["parentSpanId"].isNull() | (sp["parentSpanId"] == "")
    out = (
        df.withColumn("traceId", sp["traceId"])
        .withColumn("spanId", sp["spanId"])
        .withColumn("traceState", F.coalesce(sp["traceState"], F.lit("")))
        .withColumn(
            "parentSpanId", F.coalesce(sp["parentSpanId"], F.lit(""))
        )
        .withColumn("name", sp["name"])
        .withColumn("serviceName", _service_name(rs["resource"]))
        .withColumn(
            "kind",
            _enum_name(
                F.coalesce(sp["kind"], F.lit("0")), _KIND_NAMES
            ),
        )
        .withColumn("startTime", _iso8601(start_n))
        .withColumn("endTime", _iso8601(end_n))
        .withColumn("durationInNanos", end_n - start_n)
        .withColumn("attributes", attrs)
        .withColumn(
            "droppedAttributesCount",
            F.coalesce(sp["droppedAttributesCount"], F.lit(0)),
        )
        .withColumn(
            "droppedEventsCount",
            F.coalesce(sp["droppedEventsCount"], F.lit(0)),
        )
        # span events/links bodies (getSpanEvent :404-411 / getLink
        # :413-421): ISO times, dot->@ attribute keys, no prefix
        .withColumn(
            "events",
            F.coalesce(
                F.transform(
                    sp["events"],
                    lambda e: F.struct(
                        _iso8601(_nanos(e["timeUnixNano"])).alias("time"),
                        F.coalesce(e["name"], F.lit("")).alias("name"),
                        F.map_from_entries(
                            _entries_last_wins(
                                _prefixed_entries(e["attributes"], "", 0)
                            )
                        ).alias("attributes"),
                        F.coalesce(
                            e["droppedAttributesCount"], F.lit(0)
                        ).alias("droppedAttributesCount"),
                    ),
                ),
                F.array().cast(
                    "array<struct<time string, name string, "
                    "attributes map<string,string>, "
                    "droppedAttributesCount int>>"
                ),
            ),
        )
        .withColumn(
            "links",
            F.coalesce(
                F.transform(
                    sp["links"],
                    lambda e: F.struct(
                        F.coalesce(e["traceId"], F.lit("")).alias(
                            "traceId"
                        ),
                        F.coalesce(e["spanId"], F.lit("")).alias("spanId"),
                        F.coalesce(e["traceState"], F.lit("")).alias(
                            "traceState"
                        ),
                        F.map_from_entries(
                            _entries_last_wins(
                                _prefixed_entries(e["attributes"], "", 0)
                            )
                        ).alias("attributes"),
                        F.coalesce(
                            e["droppedAttributesCount"], F.lit(0)
                        ).alias("droppedAttributesCount"),
                    ),
                ),
                F.array().cast(
                    "array<struct<traceId string, spanId string, "
                    "traceState string, attributes map<string,string>, "
                    "droppedAttributesCount int>>"
                ),
            ),
        )
        .withColumn(
            "droppedLinksCount",
            F.coalesce(sp["droppedLinksCount"], F.lit(0)),
        )
        .withColumn("traceGroup", F.when(is_root, sp["name"]))
        .withColumn(
            "traceGroupFields",
            F.struct(
                F.when(is_root, _iso8601(end_n)).alias("endTime"),
                F.when(is_root, end_n - start_n).alias("durationInNanos"),
                F.when(is_root, status_code).alias("statusCode"),
            ),
        )
        .drop("_rs", "_ss", "_sp")
    )
    return out


_LOG_T = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("observedTimeUnixNano", T.StringType()),
        T.StructField("severityNumber", T.StringType()),
        T.StructField("severityText", T.StringType()),
        T.StructField("body", _anyval(2)),
        T.StructField("attributes", _kvlist()),
        T.StructField("droppedAttributesCount", T.IntegerType()),
        T.StructField("flags", T.IntegerType()),
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
    ]
)

LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("resource", _RESOURCE_T),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("scope", _SCOPE_T),
                                        T.StructField("schemaUrl", T.StringType()),
                                        T.StructField(
                                            "logRecords", T.ArrayType(_LOG_T)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def otel_logs(df: DataFrame, source: str = "message") -> DataFrame:
    """Decode OTLP/JSON log payloads into one event per LogRecord with
    the reference's JacksonOtelLog shape (processLogsList, :299-328):
    time, observedTime, serviceName, attributes (log.attributes.* +
    resource.attributes.* + instrumentationScope.*), schemaUrl,
    flags, traceId, spanId, severityNumber (int value), severityText,
    droppedAttributesCount, body (converted anyValue)."""
    parsed = F.from_json(F.col(source), LOGS_SCHEMA)
    df = df.withColumn("_rl", F.explode(parsed["resourceLogs"]))
    df = df.withColumn("_sl", F.explode(F.col("_rl")["scopeLogs"]))
    df = df.withColumn("_lr", F.explode(F.col("_sl")["logRecords"]))
    lr, rl, sl = F.col("_lr"), F.col("_rl"), F.col("_sl")
    attrs = F.map_from_entries(
        _entries_last_wins(
            F.concat(
                _prefixed_entries(lr["attributes"], "log.attributes."),
                _prefixed_entries(
                    rl["resource"]["attributes"], "resource.attributes."
                ),
                _scope_entries(sl["scope"]),
            )
        )
    )
    return (
        df.withColumn("time", _iso8601(_nanos(lr["timeUnixNano"])))
        .withColumn(
            "observedTime", _iso8601(_nanos(lr["observedTimeUnixNano"]))
        )
        .withColumn("serviceName", _service_name(rl["resource"]))
        .withColumn("attributes", attrs)
        .withColumn("schemaUrl", F.coalesce(sl["schemaUrl"], F.lit("")))
        .withColumn("flags", F.coalesce(lr["flags"], F.lit(0)))
        .withColumn("traceId", lr["traceId"])
        .withColumn("spanId", lr["spanId"])
        .withColumn(
            "severityNumber",
            F.coalesce(
                _enum_name(lr["severityNumber"], _SEVERITY_VALUES).cast(
                    "int"
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "severityText", F.coalesce(lr["severityText"], F.lit(""))
        )
        .withColumn(
            "droppedAttributesCount",
            F.coalesce(lr["droppedAttributesCount"], F.lit(0)),
        )
        .withColumn("body", _conv_value(lr["body"]))
        .drop("_rl", "_sl", "_lr")
    )


# metric data-point attributes parse at scalar depth (the two dp
# shapes must share one Spark type through the union-and-explode
# below; span/log attributes keep full nesting depth)
_NUM_DP_T = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("asDouble", T.DoubleType()),
        T.StructField("asInt", T.StringType()),
        T.StructField("attributes", _kvlist(0)),
    ]
)
_HIST_DP_T = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("count", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
        T.StructField("explicitBounds", T.ArrayType(T.DoubleType())),
        T.StructField("attributes", _kvlist(0)),
    ]
)
_EXP_BUCKETS_T = T.StructType(
    [
        T.StructField("offset", T.IntegerType()),
        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
    ]
)
_EXP_DP_T = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("count", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("scale", T.IntegerType()),
        T.StructField("zeroCount", T.StringType()),
        T.StructField("positive", _EXP_BUCKETS_T),
        T.StructField("negative", _EXP_BUCKETS_T),
        T.StructField("attributes", _kvlist(0)),
    ]
)
_SUMM_DP_T = T.StructType(
    [
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("count", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField(
            "quantileValues",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("quantile", T.DoubleType()),
                        T.StructField("value", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField("attributes", _kvlist(0)),
    ]
)
_METRIC_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField(
            "gauge",
            T.StructType(
                [T.StructField("dataPoints", T.ArrayType(_NUM_DP_T))]
            ),
        ),
        T.StructField(
            "sum",
            T.StructType(
                [
                    T.StructField("dataPoints", T.ArrayType(_NUM_DP_T)),
                    T.StructField("aggregationTemporality", T.StringType()),
                    T.StructField("isMonotonic", T.BooleanType()),
                ]
            ),
        ),
        T.StructField(
            "histogram",
            T.StructType(
                [
                    T.StructField("dataPoints", T.ArrayType(_HIST_DP_T)),
                    T.StructField("aggregationTemporality", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "exponentialHistogram",
            T.StructType(
                [
                    T.StructField("dataPoints", T.ArrayType(_EXP_DP_T)),
                    T.StructField("aggregationTemporality", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "summary",
            T.StructType(
                [T.StructField("dataPoints", T.ArrayType(_SUMM_DP_T))]
            ),
        ),
    ]
)

# union shape every data-point kind is normalized into before the
# single explode (a metric sets exactly one dataPoints array)
_DP_UNION_T = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("count", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
        T.StructField("explicitBounds", T.ArrayType(T.DoubleType())),
        T.StructField("scale", T.IntegerType()),
        T.StructField("zeroCount", T.StringType()),
        T.StructField("posOffset", T.IntegerType()),
        T.StructField("posCounts", T.ArrayType(T.StringType())),
        T.StructField("negOffset", T.IntegerType()),
        T.StructField("negCounts", T.ArrayType(T.StringType())),
        T.StructField(
            "quantiles",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("quantile", T.DoubleType()),
                        T.StructField("value", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField("attributes", _kvlist(0)),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("resource", _RESOURCE_T),
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("scope", _SCOPE_T),
                                        T.StructField(
                                            "metrics", T.ArrayType(_METRIC_T)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

# createBuckets' open ends (:84-85): the reference clamps the first
# bucket's min / last bucket's max to ±Float.MAX_VALUE
_FLOAT_MAX = 3.4028234663852886e38


def otel_metrics(df: DataFrame, source: str = "message") -> DataFrame:
    """Decode OTLP/JSON metric payloads into one event per data point
    (processMetricsList, :517-556): kind GAUGE / SUM / HISTOGRAM with
    the JacksonGauge/JacksonSum/JacksonHistogram field sets.

    Common: name, description, unit, serviceName, startTime, time,
    attributes (metric.attributes.* + resource.attributes.* +
    instrumentationScope.*), kind. GAUGE/SUM: value (asDouble or
    asInt, getValueAsDouble), SUM adds aggregationTemporality +
    isMonotonic. HISTOGRAM: count, sum, bucketCountsList,
    explicitBounds, explicitBoundsCount, aggregationTemporality and
    buckets [(min, max, count)] with ±Float.MAX_VALUE open ends
    (createBuckets). EXPONENTIAL_HISTOGRAM: scale, zeroCount,
    positive/negative count lists + offsets and computed
    positiveBuckets/negativeBuckets (base = 2^(2^-scale); bucket i in
    [base^(offset+i), base^(offset+i+1)), negatives sign-mirrored).
    SUMMARY: quantiles [(quantile, value)] + quantileValuesCount."""
    parsed = F.from_json(F.col(source), METRICS_SCHEMA)
    df = df.withColumn("_rm", F.explode(parsed["resourceMetrics"]))
    df = df.withColumn("_sm", F.explode(F.col("_rm")["scopeMetrics"]))
    df = df.withColumn("_m", F.explode(F.col("_sm")["metrics"]))
    m, rm, sm = F.col("_m"), F.col("_rm"), F.col("_sm")

    # one row per data point: tag each with its kind, then explode the
    # union of the five dataPoint arrays (a metric sets exactly one).
    # Numeric points carry no bucket fields, histogram points no
    # scalar value, etc. — the union struct (_DP_UNION_T) holds every
    # shape, nulled where a kind doesn't set it. Attribute structs are
    # unified to scalar depth (nested array/kvlist attr values on
    # METRIC data points render as ""); span/log attrs keep full depth.
    _scalar = lambda dp: F.coalesce(  # noqa: E731
        dp["asDouble"], dp["asInt"].cast("double")
    )

    def dps(kind, arr, **over):
        def build(dp):
            fields = []
            for f in _DP_UNION_T.fields:
                if f.name == "kind":
                    fields.append(F.lit(kind).alias("kind"))
                elif f.name in (
                    "startTimeUnixNano", "timeUnixNano", "attributes"
                ):
                    fields.append(dp[f.name].alias(f.name))
                elif f.name in over:
                    fields.append(over[f.name](dp).alias(f.name))
                else:
                    fields.append(
                        F.lit(None).cast(f.dataType).alias(f.name)
                    )
            return F.struct(*fields)

        return F.coalesce(
            F.transform(arr, build), F.array().cast(T.ArrayType(_DP_UNION_T))
        )

    df = df.withColumn(
        "_dp",
        F.explode(
            F.concat(
                dps("GAUGE", m["gauge"]["dataPoints"], value=_scalar),
                dps("SUM", m["sum"]["dataPoints"], value=_scalar),
                dps(
                    "HISTOGRAM",
                    m["histogram"]["dataPoints"],
                    count=lambda dp: dp["count"],
                    sum=lambda dp: dp["sum"],
                    bucketCounts=lambda dp: dp["bucketCounts"],
                    explicitBounds=lambda dp: dp["explicitBounds"],
                ),
                dps(
                    "EXPONENTIAL_HISTOGRAM",
                    m["exponentialHistogram"]["dataPoints"],
                    count=lambda dp: dp["count"],
                    sum=lambda dp: dp["sum"],
                    scale=lambda dp: dp["scale"],
                    zeroCount=lambda dp: dp["zeroCount"],
                    posOffset=lambda dp: dp["positive"]["offset"],
                    posCounts=lambda dp: dp["positive"]["bucketCounts"],
                    negOffset=lambda dp: dp["negative"]["offset"],
                    negCounts=lambda dp: dp["negative"]["bucketCounts"],
                ),
                dps(
                    "SUMMARY",
                    m["summary"]["dataPoints"],
                    count=lambda dp: dp["count"],
                    sum=lambda dp: dp["sum"],
                    quantiles=lambda dp: dp["quantileValues"],
                ),
            )
        ),
    )
    dp = F.col("_dp")
    attrs = F.map_from_entries(
        _entries_last_wins(
            F.concat(
                _prefixed_entries(
                    dp["attributes"], "metric.attributes.", depth=0
                ),
                _prefixed_entries(
                    rm["resource"]["attributes"], "resource.attributes."
                ),
                _scope_entries(sm["scope"]),
            )
        )
    )
    bounds = dp["explicitBounds"]
    counts = dp["bucketCounts"]
    buckets = F.when(
        counts.isNotNull()
        & bounds.isNotNull()
        & (F.size(counts) == F.size(bounds) + 1),
        F.transform(
            counts,
            lambda c, i: F.struct(
                F.when(i == 0, F.lit(-_FLOAT_MAX))
                .otherwise(F.element_at(bounds, i))
                .alias("min"),
                F.when(i == F.size(bounds), F.lit(_FLOAT_MAX))
                .otherwise(F.element_at(bounds, i + 1))
                .alias("max"),
                c.cast("long").alias("count"),
            ),
        ),
    )
    temporality = _enum_name(
        F.coalesce(
            F.when(dp["kind"] == "SUM", m["sum"]["aggregationTemporality"])
            .when(
                dp["kind"] == "HISTOGRAM",
                m["histogram"]["aggregationTemporality"],
            )
            .when(
                dp["kind"] == "EXPONENTIAL_HISTOGRAM",
                m["exponentialHistogram"]["aggregationTemporality"],
            ),
            F.lit("0"),
        ),
        _TEMPORALITY_NAMES,
    )
    # exponential-histogram bucket bounds (reference
    # JacksonExponentialHistogram.java + OTelProtoOpensearchCodec
    # createExponentialBuckets): base = 2^(2^-scale); positive bucket
    # i spans [base^(offset+i), base^(offset+i+1)), negative buckets
    # mirror with the sign flipped
    _base = F.pow(
        F.lit(2.0), F.pow(F.lit(2.0), -dp["scale"].cast("double"))
    )

    def _exp_buckets(offset, counts, negative: bool):
        def mk(c, i):
            lo = F.pow(_base, (offset + i).cast("double"))
            hi = F.pow(_base, (offset + i + 1).cast("double"))
            if negative:
                return F.struct(
                    (-hi).alias("min"),
                    (-lo).alias("max"),
                    c.cast("long").alias("count"),
                )
            return F.struct(
                lo.alias("min"), hi.alias("max"),
                c.cast("long").alias("count"),
            )

        return F.transform(counts, mk)
    return (
        df.withColumn("name", m["name"])
        .withColumn("description", F.coalesce(m["description"], F.lit("")))
        .withColumn("unit", F.coalesce(m["unit"], F.lit("")))
        .withColumn("serviceName", _service_name(rm["resource"]))
        .withColumn("kind", dp["kind"])
        .withColumn(
            "startTime", _iso8601(_nanos(dp["startTimeUnixNano"]))
        )
        .withColumn("time", _iso8601(_nanos(dp["timeUnixNano"])))
        .withColumn("attributes", attrs)
        .withColumn("value", dp["value"])
        .withColumn(
            "aggregationTemporality",
            F.when(~dp["kind"].isin("GAUGE", "SUMMARY"), temporality),
        )
        .withColumn(
            "isMonotonic",
            F.when(
                dp["kind"] == "SUM",
                F.coalesce(m["sum"]["isMonotonic"], F.lit(False)),
            ),
        )
        .withColumn("count", dp["count"].cast("long"))
        .withColumn("sum", dp["sum"])
        .withColumn(
            "bucketCountsList",
            F.transform(counts, lambda c: c.cast("long")),
        )
        .withColumn("explicitBounds", bounds)
        .withColumn(
            "explicitBoundsCount",
            F.coalesce(F.size(bounds), F.lit(0)),
        )
        .withColumn("buckets", buckets)
        .withColumn("scale", dp["scale"])
        .withColumn("zeroCount", dp["zeroCount"].cast("long"))
        .withColumn("positiveOffset", dp["posOffset"])
        .withColumn("negativeOffset", dp["negOffset"])
        .withColumn(
            "positive",
            F.transform(dp["posCounts"], lambda c: c.cast("long")),
        )
        .withColumn(
            "negative",
            F.transform(dp["negCounts"], lambda c: c.cast("long")),
        )
        .withColumn(
            "positiveBuckets",
            _exp_buckets(dp["posOffset"], dp["posCounts"], False),
        )
        .withColumn(
            "negativeBuckets",
            _exp_buckets(dp["negOffset"], dp["negCounts"], True),
        )
        .withColumn("quantiles", dp["quantiles"])
        .withColumn(
            "quantileValuesCount",
            F.when(
                dp["kind"] == "SUMMARY",
                F.coalesce(F.size(dp["quantiles"]), F.lit(0)),
            ),
        )
        .drop("_rm", "_sm", "_m", "_dp")
    )
