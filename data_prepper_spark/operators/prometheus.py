"""Prometheus remote-write source: wire decode + metric-type inference.

Reference: prometheus-source plugin. Remote Write v1 carries NO type
metadata in the payload, so the reference infers types from Prometheus
naming conventions (RemoteWriteProtobufParser.java:40-67):
`_bucket` + `le` label -> histogram bucket, `quantile` label ->
summary quantile, `_total`/`_created` suffix -> monotonic counter
(Sum), everything else -> Gauge. Histogram/summary series regroup into
ONE event per (base name, common label set, sample timestamp); the
cumulative `le` buckets convert to per-bucket counts (clamped >= 0,
`+Inf` bound excluded from explicitBounds); `_count`/`_sum` series
attach to a group only when their base name is a known histogram or
summary base anywhere in the payload (:163-191), and a group with no
buckets/quantiles emits nothing (:270-276) — count/sum-only groups are
silently dropped, faithfully mirrored here. serviceName resolves
service.name -> service_name -> job -> '' (PrometheusMetricUtils.java:
33-44). Timestamp 0 renders as "now" (:585-590) — injectable here for
determinism.

Spark shape: ONE pandas UDF walks snappy + protobuf wire per payload
(inherently sequential per record — the reference pays the same shape
in generated Java) and emits typed TimeSeries rows; everything after
is Catalyst: the histogram/summary base-name sets are tiny distinct
frames broadcast-joined back (metric-NAME cardinality, not sample
cardinality), grouping is a hash aggregation on (payload, base,
label-set-key, ts), count/sum attach via equi left joins, standalone
counters/gauges are a sample explode. No driver loop, no
single-partition stage; at 100 TB the shuffle keys are bounded by
name x label-set x timestamp cardinality and skew falls on AQE.
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .otel import _entries_last_wins, _iso8601
from .otel_pb import _enc_varint, _fields, _ld, _s, _tag

# ---------------------------------------------------------------------------
# snappy block format (the remote-write transport compression)
# ---------------------------------------------------------------------------


def snappy_decompress(b: bytes) -> bytes:
    """Raw snappy block format via pyarrow: the stream preamble varint
    IS the uncompressed length pyarrow's codec needs."""
    import pyarrow as pa

    n = shift = i = 0
    while True:
        byte = b[i]
        n |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("bad snappy preamble")
    return bytes(pa.Codec("snappy").decompress(b, n))


def snappy_compress(b: bytes) -> bytes:
    import pyarrow as pa

    return bytes(pa.Codec("snappy").compress(b))


# ---------------------------------------------------------------------------
# WriteRequest wire walk (public prometheus remote_write v1 field
# numbers: WriteRequest.timeseries=1; TimeSeries.labels=1,.samples=2;
# Label.name=1,.value=2; Sample.value=1 (double), .timestamp=2 (int64))
# ---------------------------------------------------------------------------


def decode_write_request(b: bytes) -> list:
    """wire bytes -> [{'labels': {..}, 'samples': [(value, ts_ms), ..]}]"""
    out = []
    for fno, _, v in _fields(b, 0, len(b)):
        if fno != 1:
            continue
        labels: dict = {}
        samples: list = []
        for f2, _, v2 in _fields(b, v[0], v[1]):
            if f2 == 1:
                name = val = ""
                for f3, _, v3 in _fields(b, v2[0], v2[1]):
                    if f3 == 1:
                        name = _s(b, v3)
                    elif f3 == 2:
                        val = _s(b, v3)
                labels[name] = val
            elif f2 == 2:
                sv, st = 0.0, 0
                for f3, wt3, v3 in _fields(b, v2[0], v2[1]):
                    if f3 == 1:
                        sv = struct.unpack("<d", v3)[0]
                    elif f3 == 2:
                        st = v3 - (1 << 64) if v3 >= (1 << 63) else v3
                samples.append((sv, st))
        out.append({"labels": labels, "samples": samples})
    return out


def encode_write_request(timeseries: list) -> bytes:
    """encoder twin for fixtures: the inverse of decode_write_request."""
    out = bytearray()
    for ts in timeseries:
        body = bytearray()
        for k, v in ts.get("labels", {}).items():
            lb = _ld(1, k.encode()) + _ld(2, str(v).encode())
            body += _ld(1, lb)
        for sv, st in ts.get("samples", []):
            sb = _tag(1, 1) + struct.pack("<d", float(sv))
            if st:
                u = int(st) & ((1 << 64) - 1)
                sb += _tag(2, 0) + _enc_varint(u)
            body += _ld(2, sb)
        out += _ld(1, bytes(body))
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_TS_SCHEMA = (
    "req_id long, ts_idx int, labels map<string,string>, "
    "samples array<struct<value: double, ts: long>>"
)

_INF = float("inf")


def _ts_rows(df: DataFrame, source: str, compressed: bool) -> DataFrame:
    df = df.withColumn("__req_id", F.monotonically_increasing_id())

    def walk(batches):
        for pdf in batches:
            rows = []
            for rid, body in zip(pdf["__req_id"], pdf[source]):
                if body is None:
                    continue
                try:
                    raw = bytes(body)
                    if compressed:
                        raw = snappy_decompress(raw)
                    tss = decode_write_request(raw)
                except Exception:
                    continue  # malformed payload -> no rows (tolerant)
                for i, ts in enumerate(tss):
                    rows.append((
                        rid, i, ts["labels"],
                        [{"value": v, "ts": t} for v, t in ts["samples"]],
                    ))
            yield pd.DataFrame(
                rows, columns=["req_id", "ts_idx", "labels", "samples"]
            )

    return df.select("__req_id", source).mapInPandas(walk, schema=_TS_SCHEMA)


def _common_key(m):
    """deterministic sorted 'k;v;k;v' key over a label map
    (buildSortedLabelKey, RemoteWriteProtobufParser.java:248-262)."""
    return F.array_join(
        F.flatten(
            F.transform(
                F.array_sort(F.map_entries(m)),
                lambda e: F.array(e["key"], e["value"].cast("string")),
            )
        ),
        ";",
    )


def _service_name(attrs):
    return F.coalesce(
        F.element_at(attrs, "service.name"),
        F.element_at(attrs, "service_name"),
        F.element_at(attrs, "job"),
        F.lit(""),
    )


def _time_col(ts_ms, now_iso: str):
    """Instant.ofEpochMilli rendering; ts==0 -> injected 'now'
    (resolveTimestamp, :585-590)."""
    return F.when(ts_ms == 0, F.lit(now_iso)).otherwise(
        _iso8601(ts_ms * F.lit(1000000))
    )


_OUT_COLS = [
    "req_id", "name", "kind", "time", "value", "count", "sum",
    "bucketCountsList", "explicitBounds", "bucketCount",
    "explicitBoundsCount", "quantiles", "quantileValuesCount",
    "aggregationTemporality", "isMonotonic", "serviceName", "attributes",
]

_CUMULATIVE = "AGGREGATION_TEMPORALITY_CUMULATIVE"


def _pad(df: DataFrame) -> DataFrame:
    """align a partial frame to the unified output schema."""
    types = {
        "value": "double", "count": "long", "sum": "double",
        "bucketCountsList": "array<long>",
        "explicitBounds": "array<double>", "bucketCount": "int",
        "explicitBoundsCount": "int",
        "quantiles": "array<struct<quantile: double, value: double>>",
        "quantileValuesCount": "int", "aggregationTemporality": "string",
        "isMonotonic": "boolean",
    }
    for c in _OUT_COLS:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(types[c]))
    return df.select(*_OUT_COLS)


def prometheus_remote_write(
    df: DataFrame,
    source: str = "body",
    *,
    compressed: bool = True,
    now_iso: str = "1970-01-01T00:00:00Z",
) -> DataFrame:
    """Decode snappy'd WriteRequest payloads in `df[source]` into the
    reference's metric-event rows (one per histogram/summary group x
    timestamp, one per standalone sample). `now_iso` substitutes for
    timestamp 0 (the reference uses Instant.now(); injectable here so
    runs are deterministic)."""
    ts = _ts_rows(df, source, compressed).cache()

    lbl = F.col("labels")
    name = F.coalesce(F.element_at(lbl, "__name__"), F.lit("unknown_metric"))
    attrs = F.map_filter(lbl, lambda k, v: k != "__name__")
    has_le = F.array_contains(F.map_keys(lbl), "le")
    has_q = F.array_contains(F.map_keys(lbl), "quantile")
    common = F.map_filter(
        attrs, lambda k, v: ~k.isin("le", "quantile")
    )

    base = ts.select(
        "req_id", "ts_idx", "samples",
        name.alias("name"),
        attrs.alias("attrs"),
        common.alias("common"),
        _common_key(common).alias("ckey"),
        has_le.alias("has_le"),
        has_q.alias("has_q"),
        F.element_at(lbl, "le").alias("le_str"),
        F.element_at(lbl, "quantile").alias("q_str"),
    )

    is_bucket = F.col("name").endswith("_bucket") & F.col("has_le")
    bucket_base = F.expr("substring(name, 1, length(name) - 7)")
    count_base = F.expr("substring(name, 1, length(name) - 6)")
    sum_base = F.expr("substring(name, 1, length(name) - 4)")

    # pass 1 (:134-141): payload-wide histogram / summary base sets —
    # metric-name cardinality, broadcast back as membership flags
    hist_bases = F.broadcast(
        base.where(is_bucket)
        .select("req_id", bucket_base.alias("base"))
        .distinct()
    )
    summ_bases = F.broadcast(
        base.where(F.col("has_q") & ~is_bucket)
        .select("req_id", F.col("name").alias("base"))
        .distinct()
    )

    def _parse_special(col):  # le / quantile -> double, unparseable NULL
        return (
            F.when(col == "+Inf", F.lit(_INF))
            .when(col == "-Inf", F.lit(-_INF))
            .otherwise(col.try_cast("double"))
        )

    s = F.explode("samples").alias("s")

    # -- histogram groups ---------------------------------------------------
    brows = (
        base.where(is_bucket)
        .select("req_id", bucket_base.alias("base"), "ckey", "common",
                _parse_special(F.col("le_str")).alias("le"), "samples")
        .where(F.col("le").isNotNull())  # parseLeValue skip (:295-297)
        .select("req_id", "base", "ckey", "common", "le", s)
        .select("req_id", "base", "ckey", "common", "le",
                F.col("s.value").alias("v"), F.col("s.ts").alias("ts"))
    )

    def _cs_rows(suffix_base, bases_df, suffix_len):
        return (
            base.where(
                F.col("name").endswith(suffix_base)
                & ~is_bucket & ~F.col("has_q")
            )
            .select(
                "req_id",
                F.expr(
                    f"substring(name, 1, length(name) - {suffix_len})"
                ).alias("base"),
                "ckey", "samples",
            )
            .join(bases_df, ["req_id", "base"], "left_semi")
            .select("req_id", "base", "ckey", s)
            .groupBy("req_id", "base", "ckey", F.col("s.ts").alias("ts"))
            .agg(F.last(F.col("s.value")).alias("v"))
        )

    all_bases = hist_bases.unionByName(summ_bases).distinct()
    cnt_rows = _cs_rows("_count", all_bases, 6)
    sum_rows = _cs_rows("_sum", all_bases, 4)

    hg = (
        brows.groupBy("req_id", "base", "ckey", "ts")
        .agg(
            F.array_sort(F.collect_list(F.struct("le", "v"))).alias("bk"),
            F.first("common").alias("attributes"),
        )
        .join(cnt_rows.withColumnRenamed("v", "cnt_v"),
              ["req_id", "base", "ckey", "ts"], "left")
        .join(sum_rows.withColumnRenamed("v", "sum_v"),
              ["req_id", "base", "ckey", "ts"], "left")
    )
    bk = F.col("bk")
    per_bucket = F.transform(
        bk,
        lambda x, i: F.greatest(
            F.lit(0.0),
            x["v"] - F.when(i == 0, F.lit(0.0)).otherwise(
                F.element_at(bk, i)["v"]  # 1-based = 0-based i-1
            ),
        ).cast("long"),
    )
    bounds = F.transform(  # Double.isInfinite excludes BOTH infinities
        F.filter(bk, lambda x: F.abs(x["le"]) != _INF), lambda x: x["le"]
    )
    hist = _pad(
        hg.select(
            "req_id",
            F.col("base").alias("name"),
            F.lit("HISTOGRAM").alias("kind"),
            _time_col(F.col("ts"), now_iso).alias("time"),
            F.coalesce(F.col("cnt_v").cast("long"), F.lit(0)).alias("count"),
            F.coalesce(F.col("sum_v"), F.lit(0.0)).alias("sum"),
            per_bucket.alias("bucketCountsList"),
            bounds.alias("explicitBounds"),
            F.size(bk).alias("bucketCount"),
            F.size(bounds).alias("explicitBoundsCount"),
            F.lit(_CUMULATIVE).alias("aggregationTemporality"),
            _service_name(F.col("attributes")).alias("serviceName"),
            "attributes",
        )
    )

    # -- summary groups -----------------------------------------------------
    qrows = (
        base.where(F.col("has_q") & ~is_bucket)
        .select("req_id", F.col("name").alias("base"), "ckey", "common",
                "ts_idx", _parse_special(F.col("q_str")).alias("q"),
                "samples")
        .where(F.col("q").isNotNull())  # parseQuantileValue skip
        .select("req_id", "base", "ckey", "common", "ts_idx", "q", s)
        .select("req_id", "base", "ckey", "common", "ts_idx", "q",
                F.col("s.value").alias("v"), F.col("s.ts").alias("ts"))
    )
    sg = (
        qrows.groupBy("req_id", "base", "ckey", "ts")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts_idx", "q", "v"))
            ).alias("qs"),  # ts_idx first => TimeSeries insertion order
            F.first("common").alias("attributes"),
        )
        .join(cnt_rows.withColumnRenamed("v", "cnt_v"),
              ["req_id", "base", "ckey", "ts"], "left")
        .join(sum_rows.withColumnRenamed("v", "sum_v"),
              ["req_id", "base", "ckey", "ts"], "left")
    )
    quantiles = F.transform(
        F.col("qs"),
        lambda x: F.struct(
            x["q"].alias("quantile"), x["v"].alias("value")
        ),
    )
    summ = _pad(
        sg.select(
            "req_id",
            F.col("base").alias("name"),
            F.lit("SUMMARY").alias("kind"),
            _time_col(F.col("ts"), now_iso).alias("time"),
            F.coalesce(F.col("cnt_v").cast("long"), F.lit(0)).alias("count"),
            F.coalesce(F.col("sum_v"), F.lit(0.0)).alias("sum"),
            quantiles.alias("quantiles"),
            F.size(F.col("qs")).alias("quantileValuesCount"),
            _service_name(F.col("attributes")).alias("serviceName"),
            "attributes",
        )
    )

    # -- standalone counters / gauges ---------------------------------------
    # _count/_sum whose base is a known histogram or summary base were
    # consumed above; everything else not bucket/quantile explodes to
    # one event per sample (:186-199, 427-462)
    attached = (
        base.where(
            (F.col("name").endswith("_count")
             | F.col("name").endswith("_sum"))
            & ~is_bucket & ~F.col("has_q")
        )
        .select(
            "req_id", "ts_idx",
            F.when(
                F.col("name").endswith("_count"), count_base
            ).otherwise(sum_base).alias("base"),
        )
        .join(all_bases, ["req_id", "base"], "left_semi")
        .select("req_id", "ts_idx")
    )
    rest = base.where(~is_bucket & ~F.col("has_q")).join(
        attached, ["req_id", "ts_idx"], "left_anti"
    )
    is_counter = (
        F.col("name").endswith("_total") | F.col("name").endswith("_created")
    )
    strip_counter = F.when(
        F.col("name").endswith("_total"),
        F.expr("substring(name, 1, length(name) - 6)"),
    ).when(
        F.col("name").endswith("_created"),
        F.expr("substring(name, 1, length(name) - 8)"),
    ).otherwise(F.col("name"))
    lone = _pad(
        rest.select(
            "req_id",
            F.when(is_counter, strip_counter).otherwise(
                F.col("name")
            ).alias("name"),
            F.when(is_counter, F.lit("SUM")).otherwise(
                F.lit("GAUGE")
            ).alias("kind"),
            is_counter.alias("__ctr"),
            F.col("attrs").alias("attributes"),
            s,
        )
        .select(
            "req_id", "name", "kind", "attributes",
            _time_col(F.col("s.ts"), now_iso).alias("time"),
            F.col("s.value").alias("value"),
            F.when(F.col("__ctr"), F.lit(_CUMULATIVE)).alias(
                "aggregationTemporality"
            ),
            F.when(F.col("__ctr"), F.lit(True)).alias("isMonotonic"),
            _service_name(F.col("attributes")).alias("serviceName"),
        )
    )

    return hist.unionByName(summ).unionByName(lone)


# ---------------------------------------------------------------------------
# scrape path: text exposition format (TextExpositionParser.java)
# ---------------------------------------------------------------------------

_SAMPLE_RE = r"^([^\s{]+)(\{.*\})?\s+(\S+)(?:\s+(\S+))?\s*$"
_LABEL_RE = r'([^=,{}\s]+)\s*=\s*"((?:\\.|[^"\\])*)"'
_TYPE_SUFFIXES = ["_bucket", "_count", "_sum", "_total", "_created"]


def _unescape_label(v):
    """Exposition label escapes \\\\ \\\" \\n (parseLabels, :188-213):
    placeholder two-step so '\\\\n' stays a literal backslash + n."""
    v = F.regexp_replace(v, r"\\\\", "\x00")
    v = F.regexp_replace(v, r'\\"', '"')
    v = F.regexp_replace(v, r"\\n", "\n")
    return F.regexp_replace(v, "\x00", r"\\")


def _parse_num(col):
    """NaN / +Inf / -Inf / decimal (parseValue, :449-460)."""
    return (
        F.when(F.lower(col) == "nan", F.lit(float("nan")))
        .when(col == "+Inf", F.lit(_INF))
        .when(col == "-Inf", F.lit(-_INF))
        .otherwise(col.try_cast("double"))
    )


def prometheus_scrape(
    df: DataFrame,
    source: str = "body",
    *,
    now_iso: str = "1970-01-01T00:00:00Z",
) -> DataFrame:
    """Prometheus scrape-path decode: text exposition bodies in
    `df[source]` -> the same metric-event rows as the remote-write
    path, but with `# TYPE` declarations resolving the metric type
    (resolveType: exact name first, then each known suffix stripped —
    TextExpositionParser.java:268-283; undeclared -> gauge). Histogram
    and summary samples accumulate per (base, label-set) — ONE event
    per group stamped with the group's FIRST sample timestamp — with
    the cumulative->per-bucket conversion, `_created` counter drop,
    counter suffix strip, NaN-bucket skip, and all-zero-group drop
    mirrored. Pure Catalyst end to end: line explode, one regex per
    field family, broadcast type-table join, hash-aggregated groups."""
    df = df.withColumn("__req_id", F.monotonically_increasing_id())
    lines = df.select(
        F.col("__req_id").alias("req_id"),
        F.posexplode(F.split(F.col(source), "\n")).alias("ln", "raw"),
    ).select("req_id", "ln", F.trim(F.col("raw")).alias("line"))

    types = F.broadcast(
        lines.where(F.col("line").startswith("# TYPE "))
        .select(
            "req_id",
            "ln",
            F.regexp_extract("line", r"^# TYPE\s+(\S+)\s+(\S+)", 1).alias(
                "tname"
            ),
            F.lower(
                F.regexp_extract("line", r"^# TYPE\s+(\S+)\s+(\S+)", 2)
            ).alias("ttype"),
        )
        .where(F.col("tname") != "")
        .groupBy("req_id", "tname")
        .agg(F.max_by("ttype", "ln").alias("ttype"))
    )

    m = lambda i: F.regexp_extract("line", _SAMPLE_RE, i)  # noqa: E731
    samples = (
        lines.where(
            (F.col("line") != "") & ~F.col("line").startswith("#")
        )
        .select(
            "req_id", "ln",
            m(1).alias("name"),
            m(2).alias("lbl_blk"),
            _parse_num(m(3)).alias("value"),
            m(4).alias("ts_str"),
        )
        .where((F.col("name") != "") & F.col("value").isNotNull())
        .withColumn(
            "labels",
            F.map_from_entries(
                _entries_last_wins(F.transform(
                    F.regexp_extract_all(
                        F.col("lbl_blk"), F.lit(_LABEL_RE), 0
                    ),
                    lambda kv: F.struct(
                        F.trim(
                            F.regexp_extract(kv, _LABEL_RE, 1)
                        ).alias("key"),
                        _unescape_label(
                            F.regexp_extract(kv, _LABEL_RE, 2)
                        ).alias("value"),
                    ),
                ))
            ),
        )
        .withColumn(
            "ts_ms",
            F.when(
                F.col("ts_str").contains("."),
                (F.col("ts_str").try_cast("double") * 1000).cast("long"),
            ).otherwise(F.col("ts_str").try_cast("long")),
        )
    )

    # type resolution: exact name, then each suffix-stripped base, in
    # order; first declared wins; default gauge
    cand = samples.select(
        "req_id", "ln",
        F.posexplode(
            F.array_compact(
                F.array(
                    F.col("name"),
                    *[
                        F.when(
                            F.col("name").endswith(sfx),
                            F.expr(
                                f"substring(name, 1, length(name) - {len(sfx)})"
                            ),
                        )
                        for sfx in _TYPE_SUFFIXES
                    ],
                )
            )
        ).alias("prio", "tname"),
    )
    resolved = (
        cand.join(types, ["req_id", "tname"])
        .groupBy("req_id", "ln")
        .agg(F.min_by("ttype", "prio").alias("mtype"))
    )
    s = (
        samples.join(resolved, ["req_id", "ln"], "left")
        .withColumn("mtype", F.coalesce(F.col("mtype"), F.lit("gauge")))
    )

    # -- counters / gauges / untyped ---------------------------------------
    is_ctr = F.col("mtype") == "counter"
    lone = _pad(
        s.where(
            (is_ctr & ~F.col("name").endswith("_created"))
            | (~is_ctr & ~F.col("mtype").isin("histogram", "summary"))
        ).select(
            "req_id",
            F.when(
                is_ctr,
                F.regexp_replace(
                    F.col("name"), "(_total|_created)$", ""
                ),
            ).otherwise(F.col("name")).alias("name"),
            F.when(is_ctr, F.lit("SUM")).otherwise(
                F.lit("GAUGE")
            ).alias("kind"),
            F.when(
                F.col("ts_ms").isNotNull(),
                _iso8601(F.col("ts_ms") * F.lit(1000000)),
            ).otherwise(F.lit(now_iso)).alias("time"),
            F.col("value"),
            F.when(is_ctr, F.lit(_CUMULATIVE)).alias(
                "aggregationTemporality"
            ),
            F.when(is_ctr, F.lit(True)).alias("isMonotonic"),
            _service_name(F.col("labels")).alias("serviceName"),
            F.col("labels").alias("attributes"),
        )
    )

    # -- histogram / summary accumulators ----------------------------------
    def _acc(kind: str, drop_label: str, base_expr):
        rows = s.where(F.col("mtype") == kind).select(
            "req_id", "ln", "name", "value", "ts_ms", "labels",
            base_expr.alias("base"),
            F.map_filter(
                F.col("labels"), lambda k, v: k != drop_label
            ).alias("common"),
        )
        return rows.withColumn("ckey", _common_key(F.col("common")))

    hsfx = F.col("name")
    hist_base = (
        F.when(hsfx.endswith("_bucket"),
               F.expr("substring(name, 1, length(name) - 7)"))
        .when(hsfx.endswith("_count"),
              F.expr("substring(name, 1, length(name) - 6)"))
        .when(hsfx.endswith("_sum"),
              F.expr("substring(name, 1, length(name) - 4)"))
        .otherwise(F.col("name"))
    )
    summ_base = (
        F.when(hsfx.endswith("_count"),
               F.expr("substring(name, 1, length(name) - 6)"))
        .when(hsfx.endswith("_sum"),
              F.expr("substring(name, 1, length(name) - 4)"))
        .otherwise(F.col("name"))
    )

    hr = _acc("histogram", "le", hist_base).withColumn(
        "le",
        F.when(
            F.col("name").endswith("_bucket"),
            _parse_special_scrape(F.element_at(F.col("labels"), "le")),
        ),
    )
    hg = (
        hr.groupBy("req_id", "base", "ckey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("le").isNotNull() & ~F.isnan("value"),
                        F.struct(F.col("le"), F.col("value").alias("v")),
                    )
                )
            ).alias("bk"),
            F.max(
                F.when(
                    F.col("name").endswith("_count") & ~F.isnan("value"),
                    F.col("value"),
                )
            ).alias("cnt_v"),
            F.max(
                F.when(F.col("name").endswith("_sum"), F.col("value"))
            ).alias("sum_v"),
            F.min_by("ts_ms", "ln").alias("ts_ms"),
            F.first("common").alias("attributes"),
        )
        # all-zero accumulator drop (buildHistogramRecord :374-376)
        .where(
            (F.size("bk") > 0)
            | (F.coalesce(F.col("cnt_v"), F.lit(0.0)) != 0)
            | (F.coalesce(F.col("sum_v"), F.lit(0.0)) != 0.0)
        )
    )
    bk = F.col("bk")
    # prevCum = max(prev, cur) is the scrape-path clamp rule (:389-391)
    run_max = F.transform(
        bk,
        lambda x, i: F.array_max(
            F.transform(
                F.slice(bk, 1, i + 1), lambda y: y["v"]
            )
        ),
    )
    per_bucket = F.transform(
        bk,
        lambda x, i: F.greatest(
            F.lit(0.0),
            x["v"] - F.when(i == 0, F.lit(0.0)).otherwise(
                F.element_at(run_max, i)
            ),
        ).cast("long"),
    )
    bounds = F.transform(
        F.filter(bk, lambda x: F.abs(x["le"]) != _INF), lambda x: x["le"]
    )
    hist = _pad(
        hg.select(
            "req_id",
            F.col("base").alias("name"),
            F.lit("HISTOGRAM").alias("kind"),
            F.when(
                F.col("ts_ms").isNotNull(),
                _iso8601(F.col("ts_ms") * F.lit(1000000)),
            ).otherwise(F.lit(now_iso)).alias("time"),
            F.coalesce(F.col("cnt_v").cast("long"), F.lit(0)).alias(
                "count"
            ),
            F.coalesce(F.col("sum_v"), F.lit(0.0)).alias("sum"),
            per_bucket.alias("bucketCountsList"),
            bounds.alias("explicitBounds"),
            F.size(bk).alias("bucketCount"),
            F.size(bounds).alias("explicitBoundsCount"),
            F.lit(_CUMULATIVE).alias("aggregationTemporality"),
            _service_name(F.col("attributes")).alias("serviceName"),
            "attributes",
        )
    )

    sr = _acc("summary", "quantile", summ_base).withColumn(
        "q",
        _parse_special_scrape(F.element_at(F.col("labels"), "quantile")),
    )
    sg = (
        sr.groupBy("req_id", "base", "ckey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("q").isNotNull(),
                        F.struct("ln", F.col("q"), F.col("value").alias("v")),
                    )
                )
            ).alias("qs"),
            F.max(
                F.when(
                    F.col("name").endswith("_count") & ~F.isnan("value"),
                    F.col("value"),
                )
            ).alias("cnt_v"),
            F.max(
                F.when(F.col("name").endswith("_sum"), F.col("value"))
            ).alias("sum_v"),
            F.min_by("ts_ms", "ln").alias("ts_ms"),
            F.first("common").alias("attributes"),
        )
        .where(
            (F.size("qs") > 0)
            | (F.coalesce(F.col("cnt_v"), F.lit(0.0)) != 0)
            | (F.coalesce(F.col("sum_v"), F.lit(0.0)) != 0.0)
        )
    )
    quantiles = F.transform(
        F.col("qs"),
        lambda x: F.struct(
            x["q"].alias("quantile"), x["v"].alias("value")
        ),
    )
    summ = _pad(
        sg.select(
            "req_id",
            F.col("base").alias("name"),
            F.lit("SUMMARY").alias("kind"),
            F.when(
                F.col("ts_ms").isNotNull(),
                _iso8601(F.col("ts_ms") * F.lit(1000000)),
            ).otherwise(F.lit(now_iso)).alias("time"),
            F.coalesce(F.col("cnt_v").cast("long"), F.lit(0)).alias(
                "count"
            ),
            F.coalesce(F.col("sum_v"), F.lit(0.0)).alias("sum"),
            quantiles.alias("quantiles"),
            F.size(F.col("qs")).alias("quantileValuesCount"),
            _service_name(F.col("attributes")).alias("serviceName"),
            "attributes",
        )
    )

    return hist.unionByName(summ).unionByName(lone)


def _parse_special_scrape(col):
    return (
        F.when(col == "+Inf", F.lit(_INF))
        .when(col == "-Inf", F.lit(-_INF))
        .otherwise(col.try_cast("double"))
    )
