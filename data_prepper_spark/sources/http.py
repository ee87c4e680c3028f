"""HTTP / OTLP-HTTP listener source.

Reference semantics mirrored (http-source plugin):
- POST <log_uri> (reference default /log/ingest, port 2021) with a
  JSON ARRAY body; each element becomes one log event
  (LogHTTPService.java:131-151 — JsonCodec.parse then one
  JacksonLog per element). A non-array body is a 400 with "Needs to
  be json array" (LogHTTPService.java:143).
- application/x-ndjson bodies parse line-per-event
  (MultiLineJsonCodec.java:27).
- Oversized payloads are rejected (requestsOverMaximumSize metric;
  Armeria enforces the cap) -> 413 here via max_request_bytes.
- Configured metadata headers (lowercased) attach to every event of
  the request; a fixed sensitive-header denylist is never forwarded
  (HttpHeaderExtractor.java:27-40). The reference stores them in
  event *metadata*; Catalyst rows have no metadata sidecar, so they
  land in the reserved `_meta_headers` column — the same `_meta_*`
  convention operators/expression.py's getMetadata() reads.
- Counters requestsReceived / successRequests / payloadSize mirror
  LogHTTPService's PluginMetrics names.

OTLP over HTTP (otel-trace/logs/metrics-source plugins, which listen
for ExportServiceRequest payloads): POST /v1/traces | /v1/logs |
/v1/metrics (the public OTLP/HTTP paths). application/json bodies
spool one request-document per line and decode through
operators/otel.py; application/x-protobuf trace bodies spool as raw
.pb files and decode through operators/otel_pb.py — one semantic
decode pipeline behind both wire formats, exactly like the reference
funnels gRPC and HTTP into OTelProtoOpensearchCodec.

Architecture (Spark is a pull engine; the reference's server IS the
pipeline entry): the listener is an edge process that appends
ATOMIC spool files (write to _tmp/, os.replace into the signal dir —
readers never observe partial files). Spark consumes the spool as
   spark.read.json(dir)                      (batch)
   spark.readStream.schema(s).json(dir)      (streaming; a file is
     one ingest batch, maxFilesPerTrigger is the bounded-blocking
     buffer analog — streaming/pipeline.py uses the same knob)
At fleet scale each ingest node runs one listener writing to a
shared object-store prefix (fsio paths work as spool_dir); the
Spark job is unchanged — the file-source ledger gives exactly-once
pickup, the reference's end-to-end ack analog at this boundary.
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# Mirror of HttpHeaderExtractor.SENSITIVE_HEADERS (reference
# http-source/.../HttpHeaderExtractor.java:27): these never reach
# event metadata even when explicitly configured.
SENSITIVE_HEADERS = frozenset(
    {
        "authorization",
        "proxy-authorization",
        "cookie",
        "set-cookie",
        "www-authenticate",
        "proxy-authenticate",
        "x-api-key",
        "x-csrf-token",
        "x-xsrf-token",
        "x-auth-token",
        "x-amz-security-token",
        "x-amz-credential",
    }
)

_OTLP_PATHS = {
    "/v1/traces": "otlp_traces",
    "/v1/logs": "otlp_logs",
    "/v1/metrics": "otlp_metrics",
}


class HttpSource:
    """A spool-writing HTTP listener. start() binds and serves on a
    daemon thread; port=0 picks an ephemeral port (read .port after
    start). Log events land under <spool_dir>/logs as ndjson; OTLP
    JSON under otlp_traces|otlp_logs|otlp_metrics; OTLP protobuf
    trace payloads under otlp_traces_pb as .pb files."""

    def __init__(
        self,
        spool_dir: str,
        port: int = 0,
        log_uri: str = "/log/ingest",
        max_request_bytes: int = 10 * 1024 * 1024,
        metadata_headers: tuple[str, ...] = (),
    ):
        self.spool_dir = spool_dir
        self._want_port = port
        self.log_uri = log_uri
        self.max_request_bytes = max_request_bytes
        self.metadata_headers = tuple(h.lower() for h in metadata_headers)
        self.metrics = {
            "requestsReceived": 0,
            "successRequests": 0,
            "requestsOverMaximumSize": 0,
            "badRequests": 0,
            "payloadSize": 0,
        }
        self._seq = 0
        self._lock = threading.Lock()
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        for sub in ("_tmp", "logs", "bulk", *_OTLP_PATHS.values(),
                    *[f"{v}_pb" for v in _OTLP_PATHS.values()]):
            os.makedirs(os.path.join(spool_dir, sub), exist_ok=True)

    # -- spool ------------------------------------------------------------
    def _spool(self, sub: str, payload: bytes, ext: str) -> str:
        with self._lock:
            self._seq += 1
            seq = self._seq
        name = f"{time.time_ns():020d}-{seq:06d}.{ext}"
        tmp = os.path.join(self.spool_dir, "_tmp", name)
        final = os.path.join(self.spool_dir, sub, name)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, final)  # atomic: readers never see partials
        return final

    # -- request handling (runs on server threads) ------------------------
    def _headers_meta(self, headers) -> dict[str, str]:
        if not self.metadata_headers:
            return {}
        out = {}
        for h in self.metadata_headers:
            if h in SENSITIVE_HEADERS:
                continue
            v = headers.get(h)
            if v is not None:
                out[h] = v
        return out

    def _handle_logs(self, body: bytes, headers, content_type: str):
        if "x-ndjson" in content_type:
            try:
                events = [
                    json.loads(ln)
                    for ln in body.decode("utf-8").splitlines()
                    if ln.strip()
                ]
            except (ValueError, UnicodeDecodeError):
                return 400, b"Bad request data format. Needs to be ndjson."
        else:
            try:
                events = json.loads(body)
            except (ValueError, UnicodeDecodeError):
                events = None
            if not isinstance(events, list):
                return 400, b"Bad request data format. Needs to be json array."
        meta = self._headers_meta(headers)
        lines = []
        for ev in events:
            if not isinstance(ev, dict):
                return 400, b"Bad request data format. Needs to be json array."
            if meta:
                ev = {**ev, "_meta_headers": meta}
            lines.append(json.dumps(ev, separators=(",", ":")))
        if lines:
            self._spool("logs", ("\n".join(lines) + "\n").encode(), "ndjson")
        return 200, b"OK"

    def _handle_bulk(self, body: bytes, default_index: str | None):
        """OpenSearch `_bulk` facade (sources/bulk_api.py): parse the
        action NDJSON, spool accepted ops, answer the standard
        per-item response. A malformed action/document line is the
        one request-level 400 (matching OpenSearch's
        json_parse_exception); everything else is per-item."""
        from .bulk_api import parse_bulk

        try:
            items, ops, errors = parse_bulk(body, default_index)
        except ValueError as e:
            return 400, json.dumps(
                {"error": {"type": "illegal_argument_exception",
                           "reason": str(e)}}
            ).encode()
        if ops:
            lines = "\n".join(
                json.dumps(o, separators=(",", ":")) for o in ops
            )
            self._spool("bulk", (lines + "\n").encode(), "ndjson")
        return 200, json.dumps(
            {"took": 0, "errors": errors, "items": items},
            separators=(",", ":"),
        ).encode()

    def _handle_otlp(self, sub: str, body: bytes, content_type: str):
        if "protobuf" in content_type:
            self._spool(sub + "_pb", body, "pb")
            return 200, b"OK"
        try:
            json.loads(body)
        except (ValueError, UnicodeDecodeError):
            return 400, b"Bad request data format."
        compact = json.dumps(
            json.loads(body), separators=(",", ":")
        ).encode()
        self._spool(sub, compact + b"\n", "ndjson")
        return 200, b"OK"

    # -- server -----------------------------------------------------------
    def start(self) -> "HttpSource":
        src = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr
                pass

            def do_POST(self):
                src.metrics["requestsReceived"] += 1
                n = int(self.headers.get("Content-Length") or 0)
                src.metrics["payloadSize"] += n
                if n > src.max_request_bytes:
                    src.metrics["requestsOverMaximumSize"] += 1
                    self._reply(413, b"Payload Too Large")
                    return
                body = self.rfile.read(n)
                enc = (self.headers.get("Content-Encoding") or "").lower()
                if enc == "gzip":
                    # streaming inflate with a DECODED-size cap: the
                    # Content-Length check above bounds only the wire
                    # bytes, so a small gzip bomb (10 MB -> ~10 GB)
                    # would otherwise inflate unbounded before any size
                    # check applies (ADVICE r04). Cap = the same
                    # max_request_bytes budget the raw path enforces.
                    import zlib as _zl

                    d = _zl.decompressobj(16 + _zl.MAX_WBITS)
                    try:
                        body = d.decompress(
                            body, src.max_request_bytes + 1
                        )
                    except _zl.error:
                        src.metrics["badRequests"] += 1
                        self._reply(400, b"Bad gzip payload")
                        return
                    if len(body) > src.max_request_bytes or (
                        d.unconsumed_tail
                    ):
                        src.metrics["requestsOverMaximumSize"] += 1
                        self._reply(413, b"Payload Too Large")
                        return
                    if not d.eof:  # truncated stream / missing trailer
                        src.metrics["badRequests"] += 1
                        self._reply(400, b"Bad gzip payload")
                        return
                ctype = (self.headers.get("Content-Type") or "").lower()
                if self.path == src.log_uri:
                    code, msg = src._handle_logs(body, self.headers, ctype)
                elif self.path == "/_bulk" or self.path.endswith("/_bulk"):
                    default_index = (
                        self.path[1:-len("/_bulk")] or None
                        if self.path != "/_bulk" else None
                    )
                    code, msg = src._handle_bulk(body, default_index)
                elif self.path in _OTLP_PATHS:
                    code, msg = src._handle_otlp(
                        _OTLP_PATHS[self.path], body, ctype
                    )
                else:
                    code, msg = 404, b"Not Found"
                if code == 200:
                    src.metrics["successRequests"] += 1
                elif code == 400:
                    src.metrics["badRequests"] += 1
                self._reply(code, msg)

            def _reply(self, code: int, msg: bytes):
                self.send_response(code)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

        self._server = ThreadingHTTPServer(
            ("127.0.0.1", self._want_port), Handler
        )
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        assert self._server is not None, "call start() first"
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def __enter__(self) -> "HttpSource":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- Spark read surfaces ----------------------------------------------
    def logs_dir(self) -> str:
        return os.path.join(self.spool_dir, "logs")

    def read_logs(self, spark, schema=None):
        """Batch read of everything ingested so far. Pass a schema at
        scale — schema inference re-reads the spool."""
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(self.logs_dir())

    def stream_logs(self, spark, schema, max_files_per_trigger: int | None = None):
        """Structured Streaming view of the spool; one file = one
        ingest batch. maxFilesPerTrigger bounds per-micro-batch work
        (the bounded_blocking buffer analog)."""
        r = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.json(self.logs_dir())

    def read_otlp_traces(self, spark):
        """Decoded span rows from BOTH wire formats: JSON spool via
        otel_traces, protobuf spool via otel_traces_pb, unioned by
        name. Either side may be empty."""
        from pyspark.sql import functions as F

        from data_prepper_spark.operators.otel import otel_traces
        from data_prepper_spark.operators.otel_pb import otel_traces_pb

        parts = []
        jdir = os.path.join(self.spool_dir, "otlp_traces")
        if any(f.endswith(".ndjson") for f in os.listdir(jdir)):
            jdf = (
                spark.read.text(jdir)
                .withColumnRenamed("value", "message")
            )
            parts.append(otel_traces(jdf, source="message").drop("message"))
        pdir = os.path.join(self.spool_dir, "otlp_traces_pb")
        if any(f.endswith(".pb") for f in os.listdir(pdir)):
            bdf = (
                spark.read.format("binaryFile")
                .load(pdir)
                .select(F.col("content").alias("body"))
            )
            parts.append(otel_traces_pb(bdf, source="body").drop("body"))
        if not parts:
            raise ValueError("no OTLP trace payloads spooled yet")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_otlp(self, spark, signal: str):
        """Decoded OTLP rows for 'logs' or 'metrics', BOTH wire forms
        (JSON ndjson spool + protobuf .pb spool), unioned by name."""
        from pyspark.sql import functions as F

        from data_prepper_spark.operators import otel, otel_pb

        fn = {"logs": otel.otel_logs, "metrics": otel.otel_metrics}[signal]
        fn_pb = {
            "logs": otel_pb.otel_logs_pb,
            "metrics": otel_pb.otel_metrics_pb,
        }[signal]
        parts = []
        d = os.path.join(self.spool_dir, f"otlp_{signal}")
        if any(f.endswith(".ndjson") for f in os.listdir(d)):
            df = spark.read.text(d).withColumnRenamed("value", "message")
            parts.append(fn(df, source="message").drop("message"))
        pdir = os.path.join(self.spool_dir, f"otlp_{signal}_pb")
        if any(f.endswith(".pb") for f in os.listdir(pdir)):
            bdf = (
                spark.read.format("binaryFile")
                .load(pdir)
                # NOT "body": log records decode their own body column
                .select(F.col("content").alias("__pb_body"))
            )
            parts.append(fn_pb(bdf, source="__pb_body").drop("__pb_body"))
        if not parts:
            raise ValueError(f"no OTLP {signal} payloads spooled yet")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
