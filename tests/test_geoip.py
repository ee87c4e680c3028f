"""MaxMind-DB reader + geoip processor (operators/geoip.py).

Parity targets: the public MaxMind DB spec v2.0 (tree walk, data
types, metadata), GeoIPProcessor field extraction
(GeoIPField.java:19-44), tags_on_no_valid_ip."""

from __future__ import annotations

import struct

from data_prepper_spark.operators.geoip import (
    MMDBReader,
    build_mmdb,
    geoip,
)

CITY_DB = build_mmdb(
    [
        (
            "10.0.0.0/8",
            {
                "continent": {"code": "EU", "names": {"en": "Europe"}},
                "country": {
                    "iso_code": "DE",
                    "names": {"en": "Germany"},
                    "is_in_european_union": True,
                },
                "city": {"names": {"en": "Berlin"}},
                "location": {
                    "latitude": 52.5,
                    "longitude": 13.375,
                    "time_zone": "Europe/Berlin",
                },
                "postal": {"code": "10115"},
                "subdivisions": [
                    {"iso_code": "BE", "names": {"en": "Berlin"}}
                ],
            },
        ),
        (
            "192.168.4.0/24",
            {
                "continent": {"code": "NA",
                              "names": {"en": "North America"}},
                "country": {
                    "iso_code": "US",
                    "names": {"en": "United States"},
                    "is_in_european_union": False,
                },
                "city": {"names": {"en": "Reno"}},
                "location": {"latitude": 39.5, "longitude": -119.8125},
            },
        ),
        (
            "192.168.4.128/25",  # longest prefix wins inside /24? no —
            # disjoint trie slot: more-specific leaf replaces subtree;
            # used to assert longest-prefix behavior
            {"country": {"iso_code": "XX", "names": {"en": "Longer"}}},
        ),
    ]
)


def test_reader_roundtrip_and_longest_prefix():
    r = MMDBReader(CITY_DB)
    assert r.metadata["database_type"] == "GeoIP2-City"
    assert r.metadata["record_size"] == 32
    got = r.get("10.200.3.4")
    assert got["country"]["names"]["en"] == "Germany"
    assert got["country"]["is_in_european_union"] is True
    assert got["location"]["latitude"] == 52.5
    # longest prefix: /25 shadows the /24 for its half
    assert r.get("192.168.4.7")["country"]["iso_code"] == "US"
    assert r.get("192.168.4.200")["country"]["iso_code"] == "XX"
    # outside every network / invalid input
    assert r.get("172.16.0.1") is None
    assert r.get("not-an-ip") is None


def test_data_type_coverage():
    db = build_mmdb(
        [(
            "1.2.3.4/32",
            {
                "s": "héllo",
                "d": 2.5,
                "neg": -7,
                "big": 1 << 40,
                "flag": False,
                "arr": ["a", 3],
                "nested": {"k": {"k2": "v"}},
            },
        )]
    )
    rec = MMDBReader(db).get("1.2.3.4")
    assert rec == {
        "s": "héllo", "d": 2.5, "neg": -7, "big": 1 << 40,
        "flag": False, "arr": ["a", 3], "nested": {"k": {"k2": "v"}},
    }


def test_pointer_decode():
    """Real DBs dedupe via pointers; the decoder must follow them.
    Hand-craft a data section: value at offset 0, pointer at its
    end."""
    from data_prepper_spark.operators.geoip import _Decoder, _enc_value

    target = _enc_value("pointed")
    # size-0 pointer (11-bit value): ctrl 0b001_00_000 | high bits
    ptr = bytes([0b00100000, 0x00])  # points at offset 0
    buf = target + ptr
    d = _Decoder(buf, 0)
    val, nxt = d.decode(len(target))
    assert val == "pointed" and nxt == len(buf)


def test_geoip_processor(spark):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("192.168.4.9",), ("8.8.8.8",), (None,)],
        "client_ip string",
    )
    out = geoip(
        df, "client_ip", CITY_DB,
        tags_on_no_valid_ip=("_geoip_miss",),
    ).collect()
    by = {r["client_ip"]: r for r in out}
    g = by["10.1.2.3"]["geo"]
    assert g["country_name"] == "Germany"
    assert g["country_iso_code"] == "DE"
    assert g["continent_code"] == "EU"
    assert g["city_name"] == "Berlin"
    assert g["latitude"] == 52.5 and g["longitude"] == 13.375
    assert g["time_zone"] == "Europe/Berlin"
    assert g["postal_code"] == "10115"
    assert g["region_name"] == "Berlin" and g["region_iso_code"] == "BE"
    assert g["is_country_in_european_union"] is True
    us = by["192.168.4.9"]["geo"]
    assert us["country_iso_code"] == "US" and us["postal_code"] is None
    # miss + invalid rows: NULL struct + tag
    for ip in ("8.8.8.8", None):
        assert by[ip]["geo"] is None
        assert "_geoip_miss" in by[ip]["_tags"]
    assert by["10.1.2.3"]["_tags"] == []


def test_asn_db_fields(spark):
    asn_db = build_mmdb(
        [(
            "10.0.0.0/8",
            {
                "autonomous_system_number": 64512,
                "autonomous_system_organization": "EXAMPLE-NET",
            },
        )],
        database_type="GeoLite2-ASN",
    )
    df = spark.createDataFrame([("10.9.9.9",)], "ip string")
    (r,) = geoip(
        df, "ip", asn_db, fields=("asn", "asn_organization")
    ).collect()
    assert r["geo"]["asn"] == 64512
    assert r["geo"]["asn_organization"] == "EXAMPLE-NET"


def test_record_sizes_24_28():
    """The reader must handle the vendor's 24- and 28-bit record
    sizes too (real GeoLite DBs use 24/28); hand-build tiny trees."""
    # one node, record A(left)=not-found(=1), B(right)=data at off 0
    data = b""
    from data_prepper_spark.operators.geoip import (
        _METADATA_MARKER,
        _SEPARATOR_SIZE,
        _enc_value,
    )

    rec = _enc_value({"x": "y"})
    meta24 = _enc_value(
        {
            "node_count": 1, "record_size": 24, "ip_version": 4,
            "database_type": "t", "languages": ["en"],
            "binary_format_major_version": 2,
            "binary_format_minor_version": 0,
            "build_epoch": 0, "description": {"en": "d"},
        }
    )
    left, right = 1, 1 + _SEPARATOR_SIZE + 0
    tree24 = bytes(
        [left >> 16, (left >> 8) & 255, left & 255,
         right >> 16, (right >> 8) & 255, right & 255]
    )
    db24 = tree24 + b"\x00" * _SEPARATOR_SIZE + rec + \
        _METADATA_MARKER + meta24
    r = MMDBReader(db24)
    assert r.get("128.0.0.1") == {"x": "y"}  # first bit 1 -> data
    assert r.get("1.0.0.1") is None  # first bit 0 -> not found

    meta28 = meta24.replace(
        _enc_value(24), _enc_value(28), 1
    )
    # 28-bit: bytes L0 L1 L2 | mid(hiL<<4 | hiR) | R0 R1 R2
    tree28 = bytes([0, 0, left, 0, 0, 0, right])
    db28 = tree28 + b"\x00" * _SEPARATOR_SIZE + rec + \
        _METADATA_MARKER + meta28
    r28 = MMDBReader(db28)
    assert r28.get("128.0.0.1") == {"x": "y"}
    assert r28.get("1.0.0.1") is None


def test_int32_short_encoding_is_unsigned_padded():
    """Spec: int32 stored in <4 bytes zero-pads to 4 before signed
    interpretation — only full-width encodings can be negative. A
    1-byte 0xC8 is +200, not -56 (ADVICE r04; the in-repo encoder
    always writes negatives as 4 bytes so round-trips can't catch
    this, but vendor DBs use short encodings)."""
    from data_prepper_spark.operators.geoip import _Decoder

    one_byte = bytes([(0 << 5) | 1, 8 - 7, 0xC8])  # int32, size 1
    val, nxt = _Decoder(one_byte, 0).decode(0)
    assert (val, nxt) == (200, 3)
    two_byte = bytes([(0 << 5) | 2, 8 - 7, 0xFF, 0xFE])  # size 2
    val, _ = _Decoder(two_byte, 0).decode(0)
    assert val == 0xFFFE
    import struct as _st

    four = bytes([(0 << 5) | 4, 8 - 7]) + _st.pack(">i", -7)
    val, _ = _Decoder(four, 0).decode(0)
    assert val == -7
