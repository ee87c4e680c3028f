"""Binary OTLP protobuf wire decode (VERDICT r03 item 4).

The reference sources receive OTLP over gRPC as binary protobuf and
decode with generated Java classes (reference
otel-trace-source/.../OTelTraceSource.java:42,
otel-proto-common/.../OTelProtoOpensearchCodec.java). No protobuf
runtime or descriptors exist in this sandbox, so — exactly like the
hand-rolled avro reader (codecs.py) — this module walks the public
protobuf WIRE FORMAT directly: varint / fixed64 / length-delimited
records keyed by (field_number << 3 | wire_type), against the public
opentelemetry-proto field numbers for ExportTraceServiceRequest.

Design: the wire walker converts each binary payload to the OTLP/JSON
form (the official proto3-JSON mapping: lowerCamelCase names, bytes
ids as lowercase hex, 64-bit ints as decimal strings) and the
existing pure-Catalyst decoders (operators/otel.py) take it from
there — ONE semantic implementation of the attribute flattening /
status merge / traceGroup rules, two wire formats in front of it.

The walk itself is per-record Python inside an Arrow-batched
mapInPandas — the honest cost of an inherently sequential format (the
reference pays the same shape in generated Java per record); all
downstream relational work stays in Catalyst. An `encode_*` twin
produces wire bytes from the same dict form for fixtures and
round-trip tests (there is no other protobuf writer in-sandbox).

Wire-format reference: the public protobuf encoding spec; field
numbers from opentelemetry-proto trace/v1/trace.proto,
common/v1/common.proto, resource/v1/resource.proto.
"""

from __future__ import annotations

import json
import struct

import pandas as pd  # module-level: pandas_udf resolves the PEP-563
# string annotations of its decorated function from these globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def _varint(b: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        byte = b[i]
        out |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _fields(b: bytes, lo: int, hi: int):
    """Yield (field_number, wire_type, value) over b[lo:hi]. Wire
    type 0 yields the varint int; 1/5 yield the raw 8/4 bytes; 2
    yields the (start, end) span (no copy)."""
    i = lo
    while i < hi:
        key, i = _varint(b, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(b, i)
        elif wt == 1:
            v = b[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(b, i)
            v = (i, i + ln)
            i += ln
        elif wt == 5:
            v = b[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v
    if i != hi:
        raise ValueError("truncated message")


def _s(b: bytes, span) -> str:
    return b[span[0]:span[1]].decode("utf-8")


def _hexs(b: bytes, span) -> str:
    return b[span[0]:span[1]].hex()


def _fixed64_u(v: bytes) -> int:
    return struct.unpack("<Q", v)[0]


def _fixed64_d(v: bytes) -> float:
    return struct.unpack("<d", v)[0]


def _i64(u: int) -> int:
    """two's-complement int64 from a varint payload."""
    return u - (1 << 64) if u >= (1 << 63) else u


# ---------------------------------------------------------------------------
# OTLP message decoders -> OTLP/JSON-form dicts
# ---------------------------------------------------------------------------


def _any_value(b: bytes, lo: int, hi: int) -> dict:
    for fno, wt, v in _fields(b, lo, hi):
        if fno == 1:
            return {"stringValue": _s(b, v)}
        if fno == 2:
            return {"boolValue": bool(v)}
        if fno == 3:
            return {"intValue": str(_i64(v))}
        if fno == 4:
            return {"doubleValue": _fixed64_d(v)}
        if fno == 5:  # ArrayValue { repeated AnyValue values = 1; }
            vals = [
                _any_value(b, s[0], s[1])
                for f2, _, s in _fields(b, v[0], v[1])
                if f2 == 1
            ]
            return {"arrayValue": {"values": vals}}
        if fno == 6:  # KeyValueList { repeated KeyValue values = 1; }
            kvs = [
                _key_value(b, s[0], s[1])
                for f2, _, s in _fields(b, v[0], v[1])
                if f2 == 1
            ]
            return {"kvlistValue": {"values": kvs}}
        if fno == 7:
            return {"bytesValue": _hexs(b, v)}
    return {}


def _key_value(b: bytes, lo: int, hi: int) -> dict:
    out: dict = {"key": "", "value": {}}
    for fno, wt, v in _fields(b, lo, hi):
        if fno == 1:
            out["key"] = _s(b, v)
        elif fno == 2:
            out["value"] = _any_value(b, v[0], v[1])
    return out


def _attrs(b: bytes, spans: list) -> list:
    return [_key_value(b, s[0], s[1]) for s in spans]


def _status(b: bytes, lo: int, hi: int) -> dict:
    out: dict = {}
    for fno, wt, v in _fields(b, lo, hi):
        if fno == 2:
            out["message"] = _s(b, v)
        elif fno == 3:
            out["code"] = v
    return out


def _span(b: bytes, lo: int, hi: int) -> dict:
    out: dict = {}
    attrs: list = []
    n_events = n_links = 0
    for fno, wt, v in _fields(b, lo, hi):
        if fno == 1:
            out["traceId"] = _hexs(b, v)
        elif fno == 2:
            out["spanId"] = _hexs(b, v)
        elif fno == 3:
            out["traceState"] = _s(b, v)
        elif fno == 4:
            out["parentSpanId"] = _hexs(b, v)
        elif fno == 5:
            out["name"] = _s(b, v)
        elif fno == 6:
            out["kind"] = v
        elif fno == 7:
            out["startTimeUnixNano"] = str(_fixed64_u(v))
        elif fno == 8:
            out["endTimeUnixNano"] = str(_fixed64_u(v))
        elif fno == 9:
            attrs.append(v)
        elif fno == 10:
            out["droppedAttributesCount"] = v
        elif fno == 11:
            n_events += 1
        elif fno == 12:
            out["droppedEventsCount"] = v
        elif fno == 13:
            n_links += 1
        elif fno == 14:
            out["droppedLinksCount"] = v
        elif fno == 15:
            out["status"] = _status(b, v[0], v[1])
    if attrs:
        out["attributes"] = _attrs(b, attrs)
    # events/links bodies are dropped by the Catalyst decoder too; the
    # wire still has to be WALKED (length-prefixed) — counts retained
    if n_events:
        out["eventsCount"] = n_events
    if n_links:
        out["linksCount"] = n_links
    return out


def _scope(b: bytes, lo: int, hi: int) -> dict:
    out: dict = {}
    attrs: list = []
    for fno, wt, v in _fields(b, lo, hi):
        if fno == 1:
            out["name"] = _s(b, v)
        elif fno == 2:
            out["version"] = _s(b, v)
        elif fno == 3:
            attrs.append(v)
    if attrs:
        out["attributes"] = _attrs(b, attrs)
    return out


def _resource(b: bytes, lo: int, hi: int) -> dict:
    attrs = [
        v for fno, _, v in _fields(b, lo, hi) if fno == 1
    ]
    return {"attributes": _attrs(b, attrs)}


def decode_traces_request(b: bytes) -> dict:
    """ExportTraceServiceRequest wire bytes -> OTLP/JSON-form dict."""
    rss = []
    for fno, wt, v in _fields(b, 0, len(b)):
        if fno != 1:
            continue
        rs: dict = {}
        sss = []
        for f2, _, v2 in _fields(b, v[0], v[1]):
            if f2 == 1:
                rs["resource"] = _resource(b, v2[0], v2[1])
            elif f2 == 2:
                ss: dict = {}
                spans = []
                for f3, _, v3 in _fields(b, v2[0], v2[1]):
                    if f3 == 1:
                        ss["scope"] = _scope(b, v3[0], v3[1])
                    elif f3 == 2:
                        spans.append(_span(b, v3[0], v3[1]))
                ss["spans"] = spans
                sss.append(ss)
        rs["scopeSpans"] = sss
        rss.append(rs)
    return {"resourceSpans": rss}


# ---------------------------------------------------------------------------
# encoder twin (fixtures / round-trip tests)
# ---------------------------------------------------------------------------


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out.append(b7 | 0x80)
        else:
            out.append(b7)
            return bytes(out)


def _tag(fno: int, wt: int) -> bytes:
    return _enc_varint((fno << 3) | wt)


def _ld(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _enc_varint(len(payload)) + payload


def _enc_str(fno: int, s: str) -> bytes:
    return _ld(fno, s.encode("utf-8")) if s is not None else b""


def _enc_any(v: dict) -> bytes:
    if "stringValue" in v:
        return _enc_str(1, v["stringValue"])
    if "boolValue" in v:
        return _tag(2, 0) + _enc_varint(1 if v["boolValue"] else 0)
    if "intValue" in v:
        n = int(v["intValue"])
        return _tag(3, 0) + _enc_varint(n & ((1 << 64) - 1))
    if "doubleValue" in v:
        return _tag(4, 1) + struct.pack("<d", float(v["doubleValue"]))
    if "arrayValue" in v:
        inner = b"".join(
            _ld(1, _enc_any(x)) for x in v["arrayValue"].get("values", [])
        )
        return _ld(5, inner)
    if "kvlistValue" in v:
        inner = b"".join(
            _ld(1, _enc_kv(x)) for x in v["kvlistValue"].get("values", [])
        )
        return _ld(6, inner)
    if "bytesValue" in v:
        return _ld(7, bytes.fromhex(v["bytesValue"]))
    return b""


def _enc_kv(kv: dict) -> bytes:
    return _enc_str(1, kv.get("key", "")) + _ld(2, _enc_any(kv.get("value", {})))


def _enc_attrs(fno: int, attrs: list | None) -> bytes:
    return b"".join(_ld(fno, _enc_kv(a)) for a in (attrs or []))


def encode_traces_request(payload: dict) -> bytes:
    """OTLP/JSON-form dict -> ExportTraceServiceRequest wire bytes."""
    out = bytearray()
    for rs in payload.get("resourceSpans", []):
        body = bytearray()
        res = rs.get("resource")
        if res is not None:
            body += _ld(1, _enc_attrs(1, res.get("attributes")))
        for ss in rs.get("scopeSpans", []):
            sbody = bytearray()
            sc = ss.get("scope")
            if sc is not None:
                scb = (
                    _enc_str(1, sc.get("name", ""))
                    + _enc_str(2, sc.get("version", ""))
                    + _enc_attrs(3, sc.get("attributes"))
                )
                sbody += _ld(1, scb)
            for sp in ss.get("spans", []):
                pb = bytearray()
                for fno, key in ((1, "traceId"), (2, "spanId"),
                                 (4, "parentSpanId")):
                    hx = sp.get(key)
                    if hx:
                        pb += _ld(fno, bytes.fromhex(hx))
                if sp.get("traceState"):
                    pb += _enc_str(3, sp["traceState"])
                if sp.get("name") is not None:
                    pb += _enc_str(5, sp["name"])
                if sp.get("kind"):
                    pb += _tag(6, 0) + _enc_varint(int(sp["kind"]))
                for fno, key in ((7, "startTimeUnixNano"),
                                 (8, "endTimeUnixNano")):
                    if sp.get(key) is not None:
                        pb += _tag(fno, 1) + struct.pack(
                            "<Q", int(sp[key])
                        )
                pb += _enc_attrs(9, sp.get("attributes"))
                st = sp.get("status")
                if st is not None:
                    stb = bytearray()
                    if st.get("message"):
                        stb += _enc_str(2, st["message"])
                    if st.get("code"):
                        stb += _tag(3, 0) + _enc_varint(int(st["code"]))
                    pb += _ld(15, bytes(stb))
                sbody += _ld(2, bytes(pb))
            body += _ld(2, bytes(sbody))
        out += _ld(1, bytes(body))
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def otlp_pb_traces_to_json(df: DataFrame, source: str = "body",
                           out_col: str = "message") -> DataFrame:
    """binary protobuf column -> OTLP/JSON string column. Malformed
    payloads yield NULL (the downstream from_json then produces no
    spans — the same tolerant posture as the JSON decode path)."""
    @F.pandas_udf("string")
    def _conv(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            try:
                return json.dumps(
                    decode_traces_request(bytes(b)), separators=(",", ":")
                )
            except Exception:
                return None

        return s.map(one)

    return df.withColumn(out_col, _conv(F.col(source)))


def otel_traces_pb(df: DataFrame, source: str = "body") -> DataFrame:
    """Binary-protobuf twin of operators.otel.otel_traces: wire decode
    to the JSON form, then the SAME Catalyst pipeline (attribute
    flattening, status merge, ISO-8601, traceGroup) — byte-for-byte
    identical output to the JSON path on equivalent payloads
    (asserted in tests/test_otel_pb.py)."""
    from .otel import otel_traces

    return otel_traces(
        otlp_pb_traces_to_json(df, source, out_col="__otlp_json"),
        source="__otlp_json",
    ).drop("__otlp_json")
