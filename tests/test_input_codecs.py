"""Input codecs: avro (pure-Python OCF), multiline assembly,
event_json envelope, parse_ion downconvert (SURVEY.md §2.11)."""

import json

import pyspark.sql.functions as F

from data_prepper_spark.codecs import (
    decode_avro_file,
    read_avro,
    read_event_json,
    read_multiline,
    write_avro,
    write_event_json,
)

AVRO_SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "opt", "type": ["null", "int"]},
        {"name": "arr", "type": {"type": "array", "items": "double"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "flag", "type": "boolean"},
    ],
}
AVRO_ROWS = [
    {"k": 1, "s": "héllo", "opt": None, "arr": [1.5, -2.25],
     "m": {"a": "b"}, "flag": True},
    {"k": -99, "s": "", "opt": 42, "arr": [], "m": {}, "flag": False},
    {"k": 1 << 40, "s": "x" * 300, "opt": 0, "arr": [0.0],
     "m": {"k1": "v1", "k2": "v2"}, "flag": True},
]


def test_avro_roundtrip_both_codecs(tmp_path):
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_avro(AVRO_ROWS, AVRO_SCHEMA, p, codec=codec)
        got, sch = decode_avro_file(open(p, "rb").read())
        assert got == AVRO_ROWS
        assert sch == AVRO_SCHEMA


def test_avro_spark_read(spark, tmp_path):
    d = tmp_path / "avrodir"
    d.mkdir()
    write_avro(AVRO_ROWS[:2], AVRO_SCHEMA, str(d / "a.avro"), codec="deflate")
    write_avro(AVRO_ROWS[2:], AVRO_SCHEMA, str(d / "b.avro"))
    df = read_avro(spark, str(d))
    rows = sorted(df.collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [-99, 1, 1 << 40]
    assert rows[1]["s"] == "héllo" and rows[1]["m"] == {"a": "b"}
    assert rows[0]["opt"] == 42 and rows[1]["opt"] is None
    assert df.schema["k"].dataType.simpleString() == "bigint"


def test_multiline_assembly(spark, tmp_path):
    p = tmp_path / "log.txt"
    p.write_text(
        "2024-01-01 ERROR boom\n  at Foo.java:1\n  at Bar.java:2\n"
        "2024-01-02 INFO ok\n"
        "2024-01-03 WARN hm\n  detail line\n"
    )
    out = read_multiline(
        spark, str(p), start_pattern=r"^\d{4}-\d{2}-\d{2}"
    ).orderBy("record_id")
    recs = [r["record"] for r in out.collect()]
    assert len(recs) == 3
    assert recs[0] == "2024-01-01 ERROR boom\n  at Foo.java:1\n  at Bar.java:2"
    assert recs[1] == "2024-01-02 INFO ok"
    assert recs[2] == "2024-01-03 WARN hm\n  detail line"


def test_event_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).withColumn("_tags", F.array(F.lit("t1")))
    p = str(tmp_path / "ej")
    write_event_json(df, p)
    back = read_event_json(spark, p, "id bigint, name string")
    rows = sorted(back.collect(), key=lambda r: r["id"])
    assert [(r["id"], r["name"], r["_tags"]) for r in rows] == [
        (1, "a", ["t1"]), (2, "b", ["t1"]),
    ]


def test_event_json_reference_shape(spark, tmp_path):
    """A hand-written reference-style envelope parses (data+metadata)."""
    doc = {
        "version": "2.0",
        "events": [
            {
                "data": {"id": 7, "name": "x"},
                "metadata": {
                    "attributes": {"src": "s3"},
                    "tags": ["warn"],
                    "timeReceived": "2024-05-01T00:00:00Z",
                },
            }
        ],
    }
    p = tmp_path / "one.json"
    p.write_text(json.dumps(doc))
    out = read_event_json(spark, str(p), "id bigint, name string").collect()
    assert out[0]["id"] == 7 and out[0]["_tags"] == ["warn"]
    assert out[0]["_meta_attributes"]["src"] == "s3"


def test_parse_ion(spark):
    from data_prepper_spark.operators.parse import parse_ion

    df = spark.createDataFrame(
        [
            ("ann::{k: 1, status: open, ts: 2024-01-02T10:00:00Z, "
             "d: 1.5d, n: null.int}",),
            ('{"k": 2, "status": "json", "ts": "t", "d": 0.25, "n": 9}',),
            (None,),
        ],
        "line string",
    )
    out = parse_ion(
        df, "line",
        "k bigint, status string, ts string, d double, n bigint",
    ).select("parsed.*").collect()
    assert (out[0]["k"], out[0]["status"], out[0]["d"], out[0]["n"]) == (
        1, "open", 1.5, None,
    )
    assert out[0]["ts"] == "2024-01-02T10:00:00Z"
    assert (out[1]["k"], out[1]["status"], out[1]["n"]) == (2, "json", 9)
    assert out[2]["k"] is None


def test_avro_logical_types(spark, tmp_path):
    """date / timestamp-millis / timestamp-micros / decimal logical
    types round-trip into proper Spark types."""
    import datetime as dt
    from decimal import Decimal

    sch = {
        "type": "record",
        "name": "lt",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tm", "type": {"type": "long",
                                    "logicalType": "timestamp-millis"}},
            {"name": "tu", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "amt", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 10, "scale": 2}},
        ],
    }
    rows = [
        {
            "d": dt.date(2024, 3, 5),
            "tm": dt.datetime(2024, 3, 5, 12, 30, 15, 250000),
            "tu": dt.datetime(2024, 3, 5, 12, 30, 15, 123456),
            "amt": Decimal("-1234.56"),
        }
    ]
    d = tmp_path / "lt"
    d.mkdir()
    write_avro(rows, sch, str(d / "a.avro"))
    got, _ = decode_avro_file(open(d / "a.avro", "rb").read())
    assert got == rows
    df = read_avro(spark, str(d))
    t = dict(df.dtypes)
    assert t == {"d": "date", "tm": "timestamp", "tu": "timestamp",
                 "amt": "decimal(10,2)"}
    r = df.collect()[0]
    assert r["d"] == rows[0]["d"] and r["amt"] == Decimal("-1234.56")
    assert r["tu"].microsecond == 123456


def test_read_avro_file_uri(spark, tmp_path):
    # the listing + header read go through fsio, so URI paths work the
    # same as bare paths (VERDICT r02 #8)
    d = tmp_path / "avdir"
    d.mkdir()
    write_avro(AVRO_ROWS, AVRO_SCHEMA, str(d / "a.avro"))
    df = read_avro(spark, f"file://{d}")
    assert df.count() == len(AVRO_ROWS)
