"""Input codecs beyond Spark's native readers (SURVEY.md §2.11).

* Avro Object Container Files — pure-Python decoder (no spark-avro jar
  / fastavro in the sandbox): reference
  avro-codecs/.../AvroInputCodec.java:41. Files are whole-file work
  units (an OCF splits only at sync markers; one file per task is the
  same granularity the reference uses), distributed via
  `binaryFile` + mapInPandas so decode runs on executors.
* multiline — record assembly by start-pattern: reference
  multiline-codecs/.../MultilineInputCodec.java:50. Pure Catalyst:
  wholetext read, posexplode lines, running sum of start-matches as the
  record id (window per file — files are the parallel unit), group +
  re-join.
* event_json — the reference's own event envelope
  {version, events: [{data, metadata}]}: reference
  event-json-codecs/.../EventJsonInputCodec.java:39. Native multiLine
  JSON read + explode.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import fsio

_AVRO_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------
# Avro binary primitives
# --------------------------------------------------------------------


class _Cursor:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.i : self.i + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.i += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_value(c: _Cursor, sch):
    """Decode one value per the (parsed-JSON) Avro schema. Logical
    types (date / timestamp-millis / timestamp-micros / decimal)
    convert to the Python objects their Spark types expect."""
    if isinstance(sch, str):
        t = sch
    elif isinstance(sch, list):  # union: long index then value
        idx = c.read_long()
        return _decode_value(c, sch[idx])
    else:
        t = sch["type"]
        lt = sch.get("logicalType")
        if lt:
            import datetime as _dt
            import decimal as _dec

            if lt == "date" and t == "int":
                return _dt.date(1970, 1, 1) + _dt.timedelta(days=c.read_long())
            if lt == "timestamp-millis" and t == "long":
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(
                    milliseconds=c.read_long()
                )
            if lt == "timestamp-micros" and t == "long":
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(
                    microseconds=c.read_long()
                )
            if lt == "decimal" and t in ("bytes", "fixed"):
                raw = (
                    c.read_bytes() if t == "bytes" else c.read(sch["size"])
                )
                unscaled = int.from_bytes(raw, "big", signed=True)
                return _dec.Decimal(unscaled).scaleb(-sch.get("scale", 0))
    if t == "null":
        return None
    if t == "boolean":
        return c.read(1) != b"\x00"
    if t in ("int", "long"):
        return c.read_long()
    if t == "float":
        return struct.unpack("<f", c.read(4))[0]
    if t == "double":
        return struct.unpack("<d", c.read(8))[0]
    if t == "bytes":
        return c.read_bytes()
    if t == "string":
        return c.read_bytes().decode("utf-8")
    if t == "record":
        return {f["name"]: _decode_value(c, f["type"]) for f in sch["fields"]}
    if t == "enum":
        return sch["symbols"][c.read_long()]
    if t == "fixed":
        return c.read(sch["size"])
    if t == "array":
        out = []
        while True:
            n = c.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                c.read_long()  # byte size of block, unused
            for _ in range(n):
                out.append(_decode_value(c, sch["items"]))
    if t == "map":
        out = {}
        while True:
            n = c.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                c.read_long()
            for _ in range(n):
                k = c.read_bytes().decode("utf-8")
                out[k] = _decode_value(c, sch["values"])
    raise ValueError(f"unsupported avro type {t!r}")


def avro_to_spark_type(sch) -> T.DataType:
    if isinstance(sch, str):
        return {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
            "null": T.NullType(),
        }[sch]
    if isinstance(sch, list):  # [null, X] nullable union
        non_null = [s for s in sch if s != "null"]
        if len(non_null) != 1:
            raise ValueError("only [null, X] unions are supported")
        return avro_to_spark_type(non_null[0])
    t = sch["type"]
    lt = sch.get("logicalType")
    if lt:
        # Avro logical types (spec §Logical Types): annotated primitives
        if lt == "date" and t == "int":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros") and t == "long":
            return T.TimestampType()
        if lt == "decimal" and t in ("bytes", "fixed"):
            return T.DecimalType(sch["precision"], sch.get("scale", 0))
        # unknown logical type: fall through to the raw primitive
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
                for f in sch["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(sch["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(sch["values"]))
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    return avro_to_spark_type(t)


def _read_avro_header(c: _Cursor) -> tuple[dict, str, bytes]:
    if c.read(4) != _AVRO_MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = c.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            c.read_long()
        for _ in range(n):
            k = c.read_bytes().decode("utf-8")
            meta[k] = c.read_bytes()
    sync = c.read(16)
    schema = json.loads(meta[b"avro.schema".decode()].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync


def decode_avro_file(data: bytes) -> tuple[list[dict], dict]:
    """All records of one OCF + the parsed schema."""
    c = _Cursor(data)
    schema, codec, sync = _read_avro_header(c)
    records: list[dict] = []
    while c.i < len(c.b):
        n_rec = c.read_long()
        blob = c.read_bytes()
        if c.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt avro block)")
        if codec == "deflate":
            blob = zlib.decompress(blob, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bc = _Cursor(blob)
        for _ in range(n_rec):
            records.append(_decode_value(bc, schema))
    return records, schema


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: schema from one header (driver-side, a
    few hundred bytes), per-file decode on executors.

    The per-record decode is pure Python — the right call in this
    jar-less sandbox, and parallel per file, but a real deployment
    should load the spark-avro package and use
    spark.read.format("avro") (JVM-side, vectorized) instead."""
    files = _avro_files(path)
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with fsio.open_input_file(files[0]) as f:
        head = f.read(1 << 16)
    schema, _, _ = _read_avro_header(_Cursor(head))
    spark_schema = avro_to_spark_type(schema)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    cols = [f.name for f in spark_schema.fields]

    def decode(it):
        import pandas as pd

        for pdf in it:
            for blob in pdf["content"]:
                recs, _ = decode_avro_file(bytes(blob))
                yield pd.DataFrame(
                    {c: [r.get(c) for r in recs] for c in cols}
                )

    bf = spark.read.format("binaryFile").load(
        [f if "://" in f else f"file://{f}" for f in files]
    )
    return bf.select("content").mapInPandas(decode, schema=spark_schema)


def _avro_files(path: str) -> list[str]:
    """File listing through fsio so s3:// / file:// URIs list the same
    way the manifest layer does (VERDICT r02: os.listdir pinned this
    codec to the driver's local disk)."""
    if fsio.isdir(path):
        return fsio.listdir(path, suffix=".avro")
    return [path]


def write_avro(
    rows: list[dict], schema: dict, path: str, codec: str = "null"
) -> None:
    """Minimal OCF writer (fixture/round-trip support; deterministic
    sync marker derived from the schema so outputs are reproducible)."""
    import hashlib

    def enc(v, sch) -> bytes:
        if isinstance(sch, list):
            non_null = [s for s in sch if s != "null"]
            if v is None:
                return _zigzag(sch.index("null"))
            return _zigzag(sch.index(non_null[0])) + enc(v, non_null[0])
        if isinstance(sch, dict) and sch.get("logicalType"):
            import datetime as _dt

            lt = sch["logicalType"]
            if lt == "date":
                return _zigzag((v - _dt.date(1970, 1, 1)).days)
            if lt == "timestamp-millis":
                delta = v - _dt.datetime(1970, 1, 1)
                return _zigzag(round(delta.total_seconds() * 1000))
            if lt == "timestamp-micros":
                delta = v - _dt.datetime(1970, 1, 1)
                return _zigzag(
                    (delta.days * 86_400 + delta.seconds) * 1_000_000
                    + delta.microseconds
                )
            if lt == "decimal":
                unscaled = int(v.scaleb(sch.get("scale", 0)))
                nbytes = max(1, (unscaled.bit_length() + 8) // 8)
                raw = unscaled.to_bytes(nbytes, "big", signed=True)
                return _zigzag(len(raw)) + raw
        t = sch if isinstance(sch, str) else sch["type"]
        if t == "null":
            return b""
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t in ("int", "long"):
            return _zigzag(int(v))
        if t == "float":
            return struct.pack("<f", v)
        if t == "double":
            return struct.pack("<d", v)
        if t == "bytes":
            return _zigzag(len(v)) + bytes(v)
        if t == "string":
            b = v.encode("utf-8")
            return _zigzag(len(b)) + b
        if t == "record":
            return b"".join(enc(v[f["name"]], f["type"]) for f in sch["fields"])
        if t == "array":
            if not v:
                return _zigzag(0)
            return (
                _zigzag(len(v))
                + b"".join(enc(x, sch["items"]) for x in v)
                + _zigzag(0)
            )
        if t == "map":
            if not v:
                return _zigzag(0)
            body = b"".join(
                enc(k, "string") + enc(x, sch["values"]) for k, x in v.items()
            )
            return _zigzag(len(v)) + body + _zigzag(0)
        if t == "enum":
            return _zigzag(sch["symbols"].index(v))
        raise ValueError(f"unsupported avro type {t!r}")

    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()).digest()
    buf = io.BytesIO()
    buf.write(_AVRO_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    buf.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        buf.write(_zigzag(len(kb)) + kb + _zigzag(len(v)) + v)
    buf.write(_zigzag(0))
    buf.write(sync)
    body = b"".join(enc(r, schema) for r in rows)
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    buf.write(_zigzag(len(rows)) + _zigzag(len(body)) + body + sync)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


# --------------------------------------------------------------------
# multiline
# --------------------------------------------------------------------


def read_multiline(
    spark: SparkSession, path: str, start_pattern: str
) -> DataFrame:
    """Assemble multi-line records: a line matching start_pattern opens
    a new record; following non-matching lines append to it. Returns
    (file, record_id, record). Header lines before the first match form
    record 0 (the reference buffers them the same way)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    lines = raw.select(
        "file", F.posexplode(F.split("value", r"\r?\n")).alias("pos", "line")
    )
    w = (
        Window.partitionBy("file")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rec = lines.withColumn(
        "record_id",
        F.sum(F.when(F.col("line").rlike(start_pattern), 1).otherwise(0)).over(w),
    )
    return (
        rec.filter(F.col("line") != "")
        .groupBy("file", "record_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ).getField("line"),
                "\n",
            ).alias("record")
        )
    )


# --------------------------------------------------------------------
# event_json
# --------------------------------------------------------------------


def read_event_json(
    spark: SparkSession, path: str, data_schema: str
) -> DataFrame:
    """Reference event envelope: {version, events: [{data, metadata}]}.
    data_schema is the Spark DDL of the `data` payload; metadata
    attributes land in `_meta_*` columns, tags in `_tags`."""
    env = spark.read.option("multiLine", True).json(
        path,
        schema=(
            "version string, events array<struct<"
            f"data: struct<{data_schema}>, "
            "metadata: struct<attributes: map<string,string>, "
            "tags: array<string>, timeReceived: string>>>"
        ),
    )
    ev = env.select(F.explode("events").alias("e"))
    return ev.select(
        F.col("e.data.*"),
        F.coalesce(
            F.col("e.metadata.tags"), F.array().cast("array<string>")
        ).alias("_tags"),
        F.col("e.metadata.attributes").alias("_meta_attributes"),
        F.col("e.metadata.timeReceived").alias("_meta_time_received"),
    )


def write_event_json(df: DataFrame, path: str, version: str = "2.0") -> None:
    """Inverse codec (EventJsonOutputCodec): one envelope per output
    partition file.

    WARNING — debug/interchange codec, not a data path: the envelope
    format wants ALL events inside one JSON object, so this funnels
    the whole DataFrame through collect_list + coalesce(1) (one task,
    driver-scale memory). Use parquet/ndjson sinks for real volumes."""
    data_cols = [c for c in df.columns if not c.startswith("_")]
    ev = df.select(
        F.struct(
            F.struct(*[F.col(c) for c in data_cols]).alias("data"),
            F.struct(
                (
                    F.col("_tags")
                    if "_tags" in df.columns
                    else F.array().cast("array<string>")
                ).alias("tags"),
            ).alias("metadata"),
        ).alias("e")
    )
    env = ev.agg(F.collect_list("e").alias("events")).select(
        F.lit(version).alias("version"), "events"
    )
    env.coalesce(1).write.mode("overwrite").json(path)
