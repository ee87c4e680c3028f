"""geoip processor: a real MaxMind-DB (.mmdb) binary reader.

Reference: geoip-processor plugin (GeoIPProcessor.java; field set
GeoIPField.java:19-44) — enrich events with city/country/ASN fields
resolved from MaxMind databases. The reference ships the vendor's
Java reader; no mmdb library exists in this sandbox, so — like the
avro and protobuf-wire readers before it — this module implements the
PUBLIC MaxMind DB file format spec (v2.0) directly:

  [search tree: node_count nodes x 2 records of record_size bits]
  [16 zero bytes separating tree from data]
  [data section: type-tagged values — pointer/utf8/double/bytes/
   uint16/32/64/128, int32, map, array, bool, float]
  [metadata marker \\xab\\xcd\\xefMaxMind.com + metadata map]

plus an encoder twin (`build_mmdb`) that writes valid little
databases for fixtures — there is no other mmdb writer in-sandbox,
and round-tripping through our own reader + spot-decoding with the
spec by hand keeps it honest.

Spark shape: the database bytes broadcast once (SparkContext
broadcast — mmdb city DBs are tens of MB, far under executor
memory); lookups run in an Arrow-batched pandas UDF with one reader
per executor (the bit-walk per IP is exactly what the vendor reader
does per call). At 1000 executors this is a narrow map with zero
shuffle — the enrichment join every log pipeline wants.
"""

from __future__ import annotations

import ipaddress
import struct

import pandas as pd  # module-level: pandas_udf resolves PEP-563
# string annotations of decorated functions from these globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_SEPARATOR_SIZE = 16


# ---------------------------------------------------------------------------
# data-section decoder
# ---------------------------------------------------------------------------


class _Decoder:
    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # absolute offset of the data section

    def decode(self, offset: int):
        """Decode the value at data-section-relative `offset`;
        returns (value, next_offset)."""
        buf = self.buf
        i = self.base + offset
        ctrl = buf[i]
        i += 1
        typ = ctrl >> 5
        if typ == 1:  # pointer
            size = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if size == 0:
                ptr = (v << 8) | buf[i]
                i += 1
            elif size == 1:
                ptr = ((v << 16) | (buf[i] << 8) | buf[i + 1]) + 2048
                i += 2
            elif size == 2:
                ptr = (
                    (v << 24) | (buf[i] << 16) | (buf[i + 1] << 8)
                    | buf[i + 2]
                ) + 526336
                i += 3
            else:
                ptr = struct.unpack(">I", buf[i:i + 4])[0]
                i += 4
            val, _ = self.decode(ptr)
            return val, i - self.base
        if typ == 0:  # extended type
            typ = 7 + buf[i]
            i += 1
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[i]
            i += 1
        elif size == 30:
            size = 285 + struct.unpack(">H", buf[i:i + 2])[0]
            i += 2
        elif size == 31:
            size = 65821 + (
                (buf[i] << 16) | (buf[i + 1] << 8) | buf[i + 2]
            )
            i += 3

        rel = i - self.base
        if typ == 2:  # utf8
            return buf[i:i + size].decode("utf-8"), rel + size
        if typ == 3:  # double (size always 8)
            return struct.unpack(">d", buf[i:i + 8])[0], rel + 8
        if typ == 4:  # bytes
            return buf[i:i + size], rel + size
        if typ in (5, 6, 9, 10):  # uint16/32/64/128: size bytes, BE
            return int.from_bytes(buf[i:i + size], "big"), rel + size
        if typ == 7:  # map
            out = {}
            off = rel
            for _ in range(size):
                k, off = self.decode(off)
                v, off = self.decode(off)
                out[k] = v
            return out, off
        if typ == 8:  # int32
            # spec: stored bytes are zero-padded to 4 before signed
            # interpretation, so only full-width (4-byte) encodings can
            # be negative — a 1-byte 0xC8 is +200, not -56 (ADVICE r04)
            padded = b"\x00" * (4 - size) + buf[i:i + size]
            return int.from_bytes(padded, "big", signed=True), rel + size
        if typ == 11:  # array
            out = []
            off = rel
            for _ in range(size):
                v, off = self.decode(off)
                out.append(v)
            return out, off
        if typ == 14:  # boolean: value IS the size field
            return bool(size), rel
        if typ == 15:  # float (size 4)
            return struct.unpack(">f", buf[i:i + 4])[0], rel + 4
        raise ValueError(f"unsupported mmdb type {typ}")


class MMDBReader:
    """Minimal spec-complete reader: metadata parse + per-IP tree
    walk + data decode (MaxMind DB spec v2.0)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        mpos = buf.rfind(_METADATA_MARKER)
        if mpos < 0:
            raise ValueError("not an mmdb file (metadata marker missing)")
        meta, _ = _Decoder(buf, mpos + len(_METADATA_MARKER)).decode(0)
        self.metadata = meta
        self.node_count = meta["node_count"]
        self.record_size = meta["record_size"]
        self.ip_version = meta["ip_version"]
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self._data = _Decoder(buf, self.tree_size + _SEPARATOR_SIZE)

    def _record(self, node: int, side: int) -> int:
        buf = self.buf
        base = node * self.node_bytes
        rs = self.record_size
        if rs == 24:
            o = base + side * 3
            return (buf[o] << 16) | (buf[o + 1] << 8) | buf[o + 2]
        if rs == 28:
            mid = buf[base + 3]
            if side == 0:
                return ((mid >> 4) << 24) | (buf[base] << 16) | \
                    (buf[base + 1] << 8) | buf[base + 2]
            return ((mid & 0xF) << 24) | (buf[base + 4] << 16) | \
                (buf[base + 5] << 8) | buf[base + 6]
        if rs == 32:
            o = base + side * 4
            return struct.unpack(">I", buf[o:o + 4])[0]
        raise ValueError(f"unsupported record size {rs}")

    def get(self, ip: str):
        """dict for the longest-prefix network containing ip, or None."""
        try:
            addr = ipaddress.ip_address(ip)
        except ValueError:
            return None
        if addr.version == 6 and self.ip_version == 4:
            return None
        bits = addr.packed
        nbits = len(bits) * 8
        node = 0
        if addr.version == 4 and self.ip_version == 6:
            # v4 addresses sit under ::/96 in a v6 tree
            for _ in range(96):
                node = self._record(node, 0)
                if node >= self.node_count:
                    return None
        for b in range(nbits):
            if node >= self.node_count:
                break
            bit = (bits[b >> 3] >> (7 - (b & 7))) & 1
            node = self._record(node, bit)
        if node == self.node_count:
            return None  # explicit not-found record
        if node < self.node_count:
            return None
        offset = node - self.node_count - _SEPARATOR_SIZE
        val, _ = self._data.decode(offset)
        return val


# ---------------------------------------------------------------------------
# encoder twin (fixtures)
# ---------------------------------------------------------------------------


def _enc_value(v) -> bytes:
    """Inline (pointer-free) data-format encoding of a python value."""
    def ctrl(typ: int, size: int) -> bytes:
        ext = b""
        if typ > 7:
            ext = bytes([typ - 7])
            typ = 0
        if size < 29:
            return bytes([(typ << 5) | size]) + ext
        if size < 285:
            return bytes([(typ << 5) | 29]) + ext + bytes([size - 29])
        return bytes([(typ << 5) | 30]) + ext + struct.pack(
            ">H", size - 285
        )

    if isinstance(v, bool):
        return bytes([(0 << 5) | (1 if v else 0), 14 - 7])
    if isinstance(v, str):
        b = v.encode("utf-8")
        return ctrl(2, len(b)) + b
    if isinstance(v, float):
        return ctrl(3, 8) + struct.pack(">d", v)
    if isinstance(v, bytes):
        return ctrl(4, len(v)) + v
    if isinstance(v, int):
        if v < 0:
            return ctrl(8, 4) + struct.pack(">i", v)
        n = max(1, (v.bit_length() + 7) // 8)
        if v == 0:
            n = 0
        typ = 5 if n <= 2 else 6 if n <= 4 else 9
        return ctrl(typ, n) + v.to_bytes(n, "big")
    if isinstance(v, dict):
        out = ctrl(7, len(v))
        for k, val in v.items():
            out += _enc_value(str(k)) + _enc_value(val)
        return out
    if isinstance(v, list):
        out = ctrl(11, len(v))
        for val in v:
            out += _enc_value(val)
        return out
    raise TypeError(f"cannot encode {type(v)}")


def build_mmdb(
    networks: list,
    ip_version: int = 4,
    database_type: str = "GeoIP2-City",
) -> bytes:
    """[(cidr_str, record_dict), ...] -> valid mmdb bytes (record
    size 32, inline values, deduped identical records)."""
    nbits = 32 if ip_version == 4 else 128

    # build the binary trie
    nodes: list = [[None, None]]  # each side: int child | ("leaf", key)

    def insert(net, key):
        node = 0
        prefix = int(net.network_address)
        for b in range(net.prefixlen):
            bit = (prefix >> (nbits - 1 - b)) & 1
            if b == net.prefixlen - 1:
                nodes[node][bit] = ("leaf", key)
            else:
                nxt = nodes[node][bit]
                if not isinstance(nxt, int):
                    covering = nxt  # a broader network's leaf (or None)
                    nodes.append([covering, covering])
                    nxt = len(nodes) - 1
                    nodes[node][bit] = nxt
                node = nxt

    data_blobs: dict = {}
    data_order: list = []
    keys = []
    for cidr, record in networks:
        blob = _enc_value(record)
        if blob not in data_blobs:
            data_blobs[blob] = sum(len(b) for b in data_order)
            data_order.append(blob)
        keys.append(blob)
    for (cidr, _), blob in zip(networks, keys):
        insert(ipaddress.ip_network(cidr), blob)

    node_count = len(nodes)

    def record_value(side):
        if side is None:
            return node_count  # not found
        if isinstance(side, int):
            return side
        _, blob = side
        return node_count + _SEPARATOR_SIZE + data_blobs[blob]

    tree = bytearray()
    for left, right in nodes:
        tree += struct.pack(">II", record_value(left), record_value(right))

    meta = {
        "node_count": node_count,
        "record_size": 32,
        "ip_version": ip_version,
        "database_type": database_type,
        "languages": ["en"],
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": 1700000000,
        "description": {"en": "synthetic fixture"},
    }
    return bytes(
        tree
        + b"\x00" * _SEPARATOR_SIZE
        + b"".join(data_order)
        + _METADATA_MARKER
        + _enc_value(meta)
    )


# ---------------------------------------------------------------------------
# field extraction (GeoIPField.java names -> mmdb record paths)
# ---------------------------------------------------------------------------

DEFAULT_FIELDS = (
    "continent_code", "continent_name", "country_name",
    "country_iso_code", "is_country_in_european_union", "city_name",
    "latitude", "longitude", "time_zone", "postal_code",
    "region_name", "region_iso_code", "asn", "asn_organization",
)

_FIELD_TYPES = {
    "latitude": "double", "longitude": "double",
    "is_country_in_european_union": "boolean", "asn": "long",
}


def _extract_field(rec: dict, name: str):
    def names(d):
        return (d or {}).get("names", {}).get("en")

    if name == "continent_code":
        return (rec.get("continent") or {}).get("code")
    if name == "continent_name":
        return names(rec.get("continent"))
    if name == "country_name":
        return names(rec.get("country"))
    if name == "country_iso_code":
        return (rec.get("country") or {}).get("iso_code")
    if name == "is_country_in_european_union":
        return (rec.get("country") or {}).get("is_in_european_union")
    if name == "city_name":
        return names(rec.get("city"))
    if name == "latitude":
        return (rec.get("location") or {}).get("latitude")
    if name == "longitude":
        return (rec.get("location") or {}).get("longitude")
    if name == "time_zone":
        return (rec.get("location") or {}).get("time_zone")
    if name == "metro_code":
        return (rec.get("location") or {}).get("metro_code")
    if name == "postal_code":
        return (rec.get("postal") or {}).get("code")
    if name == "region_name":
        subs = rec.get("subdivisions") or []
        return names(subs[-1]) if subs else None
    if name == "region_iso_code":
        subs = rec.get("subdivisions") or []
        return (subs[-1] or {}).get("iso_code") if subs else None
    if name == "asn":
        return rec.get("autonomous_system_number")
    if name == "asn_organization":
        return rec.get("autonomous_system_organization")
    return None


def geoip(
    df: DataFrame,
    source: str,
    db: bytes,
    target: str = "geo",
    fields: tuple = DEFAULT_FIELDS,
    tags_on_no_valid_ip: tuple = (),
) -> DataFrame:
    """Enrich `df[source]` IP strings from an mmdb database: `target`
    becomes a struct of the requested GeoIPField names (EntryConfig
    source/target/include_fields). Unresolvable or invalid IPs yield
    a NULL struct and, when configured, the reference's
    tags_on_no_valid_ip."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(db)
    schema = ", ".join(
        f"`{f}` {_FIELD_TYPES.get(f, 'string')}" for f in fields
    ) + ", `__miss` boolean"

    @F.pandas_udf(schema)
    def _lookup(ips: pd.Series) -> pd.DataFrame:
        reader = MMDBReader(bc.value)
        rows = []
        for ip in ips:
            rec = reader.get(ip) if ip is not None else None
            if rec is None:
                rows.append([None] * len(fields) + [True])
            else:
                rows.append(
                    [_extract_field(rec, f) for f in fields] + [False]
                )
        return pd.DataFrame(rows, columns=list(fields) + ["__miss"])

    out = df.withColumn("__geo", _lookup(F.col(source)))
    miss = out["__geo"]["__miss"]
    geo_struct = F.when(
        ~miss,
        F.struct(*[out["__geo"][f].alias(f) for f in fields]),
    )
    out = out.withColumn(target, geo_struct)
    if tags_on_no_valid_ip:
        from .mutate import TAGS_COL, ensure_tags

        out = ensure_tags(out)
        out = out.withColumn(
            TAGS_COL,
            F.when(
                miss,
                F.array_union(
                    F.col(TAGS_COL),
                    F.array(*[F.lit(t) for t in tags_on_no_valid_ip]),
                ),
            ).otherwise(F.col(TAGS_COL)),
        )
    return out.drop("__geo")
