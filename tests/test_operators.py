"""Operator-layer unit tests (reference processor parity shapes)."""

import pyspark.sql.functions as F
import pytest

from data_prepper_spark.operators import dp_expr, translate_expr
from data_prepper_spark.operators.aggregate import (
    aggregate_histogram,
    remove_duplicates,
)
from data_prepper_spark.operators.enrich import translate, translate_regex
from data_prepper_spark.operators.mutate import (
    add_entries,
    convert_type,
    flatten,
    list_to_map,
    split_event,
    wrap_entries,
)
from data_prepper_spark.operators.parse import (
    COMMON_APACHE_LOG,
    date_parse,
    detect_format,
    dissect,
    grok,
    key_value,
)
from data_prepper_spark.operators.route import apply_routes, drop_events


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (1, "error", 200.0, '{"k": 1}'),
            (2, "click", 50.0, '{"k": 2}'),
            (3, "view", 180.0, '{"k": 3}'),
            (4, "click", 10.0, '{"k": 4}'),
        ],
        "event_id long, event_type string, value double, props string",
    )


def test_translate_expr_strings():
    assert translate_expr('/a/b == "x"') == "a.b == 'x'"
    # != null is an existence test in the reference, not SQL 3VL
    assert (
        translate_expr("/v > 10 and /t != null") == "v > 10 and t IS NOT NULL"
    )
    assert "RLIKE" in translate_expr('/name =~ "^ab.*"')
    assert translate_expr('/t in {"a", "b"}') == "t in ('a', 'b')"
    assert "array_contains(_tags, 'x')" in translate_expr('hasTags("x")')


def test_substring_functions(spark):
    from data_prepper_spark.operators import dp_expr

    df = spark.createDataFrame([("a.b.c",)], "s string")
    row = df.select(
        dp_expr('substringBefore(/s, ".")').alias("b"),
        dp_expr('substringAfter(/s, ".")').alias("a"),
        dp_expr('substringBeforeLast(/s, ".")').alias("bl"),
        dp_expr('substringAfterLast(/s, ".")').alias("al"),
    ).collect()[0]
    assert (row.b, row.a, row.bl, row.al) == ("a", "b.c", "a.b", "c")


def test_dp_expr_evaluates(ev):
    got = ev.filter(dp_expr('/value > 100.0 and /event_type != "error"'))
    assert {r.event_id for r in got.collect()} == {3}


def test_routes_copy_and_default(ev):
    routes = apply_routes(
        ev, {"err": '/event_type == "error"', "big": "/value > 100.0"}
    )
    assert {r.event_id for r in routes["err"].collect()} == {1}
    # event 1 matches BOTH routes -> copied to each (reference
    # RouterCopyRecordStrategy semantics)
    assert {r.event_id for r in routes["big"].collect()} == {1, 3}
    assert {r.event_id for r in routes["_default"].collect()} == {2, 4}


def test_drop_events(ev):
    assert drop_events(ev, '/event_type == "click"').count() == 2


def test_grok_apache(spark):
    df = spark.createDataFrame(
        [
            (
                '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
                '"GET /apache_pb.gif HTTP/1.0" 200 2326',
            )
        ],
        "log string",
    )
    out = grok(df, "log", COMMON_APACHE_LOG).collect()[0]
    assert out.clientip == "127.0.0.1"
    assert out.verb == "GET"
    assert out.request == "/apache_pb.gif"
    assert out.response == "200"
    assert out.bytes == "2326"


def test_grok_multi_pattern_break_on_match(spark):
    df = spark.createDataFrame(
        [("code=42",), ("name=bob",), ("???",)], "msg string"
    )
    out = grok(
        df,
        "msg",
        ["code=%{INT:code}", "name=%{WORD:who}", "%{WORD:anything}"],
        tags_on_match_failure=["_grokparsefailure"],
    ).collect()
    assert out[0].code == "42" and out[0].who is None
    assert out[1].who == "bob" and out[1].code is None
    # third pattern would match 'code' rows too, but break_on_match
    # means only unmatched rows reach it; '???' matches nothing
    assert out[2].anything is None
    assert out[2]._tags == ["_grokparsefailure"]
    assert out[0]._tags == [] and out[1]._tags == []


def test_grok_builtin_pattern_sets(spark):
    """Bundled ecosystem sets (java/haproxy/nagios/aws/postgresql)
    load into the library and parse representative lines; duplicate
    capture names across alternation branches coalesce to the
    participating branch's value."""
    from data_prepper_spark.operators.parse import load_builtin_pattern_sets

    assert load_builtin_pattern_sets(
        "java", "haproxy", "postgresql", "nagios", "aws"
    ) > 40
    df = spark.createDataFrame(
        [
            (
                "2014-01-09 20:03:28 | ERROR | com.example.service.Main"
                " - Connection refused",
            )
        ],
        "log string",
    )
    out = grok(df, "log", "%{TOMCATLOG}").collect()[0]
    assert out.level == "ERROR"
    assert out["class"] == "com.example.service.Main"
    assert out.logmessage == "Connection refused"

    df = spark.createDataFrame(
        [
            (
                "[1427925600] SERVICE ALERT: varnish;Backend Conns;"
                "CRITICAL;SOFT;1;anomaly detected",
            ),
            (
                "[1427925700] CURRENT HOST STATE: web01;UP;HARD;1;"
                "PING OK",
            ),
        ],
        "log string",
    )
    rows = grok(df, "log", "%{NAGIOSLOGLINE}").collect()
    # nagios_state appears in several alternation branches — the
    # participating branch's capture must win
    assert rows[0].nagios_type == "SERVICE ALERT"
    assert rows[0].nagios_state == "CRITICAL"
    assert rows[0].nagios_service == "Backend Conns"
    assert rows[1].nagios_type == "CURRENT HOST STATE"
    assert rows[1].nagios_state == "UP"
    assert rows[1].nagios_hostname == "web01"

    df = spark.createDataFrame(
        [
            (
                'Dec  9 13:01:26 lb haproxy[23724]: 127.0.0.1:39759 '
                '[09/Dec/2013:12:59:46.633] lb default/instance8 '
                '0/51536/1/48082/99627 200 83285 - - ---- 87/87/87/1/0 '
                '0/67 "GET /index.html HTTP/1.1"',
            )
        ],
        "log string",
    )
    out = grok(df, "log", "%{HAPROXYHTTP}").collect()[0]
    assert out.client_ip == "127.0.0.1"
    assert out.http_status_code == "200"
    assert out.http_verb == "GET"
    assert out.backend_name == "default"


def test_grok_pattern_sets_exim_mongodb_rails_bro(spark):
    """Round-5 ecosystem sets (VERDICT r04 #9) parse representative
    lines through the Catalyst (Java-regex) grok path: Exim mainlog
    arrival with optional named fields, MongoDB 3.x structured lines,
    Rails request head/foot, and Zeek/Bro TSV conn records."""
    from data_prepper_spark.operators.parse import load_builtin_pattern_sets

    assert load_builtin_pattern_sets("exim", "mongodb", "rails", "bro") >= 25

    df = spark.createDataFrame(
        [
            (
                "2026-08-19 10:01:02 1rNfPq-0001Ab-C3 <= alice@example.com"
                " H=mail.example.com (helo.example.com) [192.0.2.10]:587"
                " P=esmtps S=2344 id=abc123@example.com",
            )
        ],
        "log string",
    )
    out = grok(df, "log", "%{EXIM_MESSAGE_ARRIVAL}").collect()[0]
    assert out.exim_msgid == "1rNfPq-0001Ab-C3"
    assert out.exim_sender == "alice@example.com"
    assert out.remote_host == "192.0.2.10"
    assert out.exim_msg_size == "2344"

    df = spark.createDataFrame(
        [
            (
                "2026-08-19T10:01:02.123+0000 I NETWORK  [conn123]"
                " end connection 192.0.2.5:51234",
            )
        ],
        "log string",
    )
    out = grok(df, "log", "%{MONGO3_LOG}").collect()[0]
    assert out.severity == "I"
    assert out.component == "NETWORK"
    assert out.context == "conn123"

    df = spark.createDataFrame(
        [
            ('Started GET "/users/5?x=1" for 192.0.2.7 at'
             ' 2026-08-19 10:01:02 +0000',),
        ],
        "log string",
    )
    out = grok(df, "log", "%{RAILS3HEAD}").collect()[0]
    assert out.verb == "GET"
    assert out.request == "/users/5?x=1"
    assert out.clientip == "192.0.2.7"

    df = spark.createDataFrame(
        [("Completed 200 OK in 10.2ms (Views: 5.0ms | ActiveRecord: 2.0ms)",)],
        "log string",
    )
    out = grok(df, "log", "%{RAILS3FOOT}").collect()[0]
    assert out.response == "200"
    assert out.totalms == "10.2"
    assert out.activerecordms == "2.0"

    df = spark.createDataFrame(
        [
            (
                "1470000000.123456\tCab3Xc1\t192.0.2.1\t51234\t"
                "198.51.100.9\t443\ttcp\tssl\t1.5\t1024\t2048\tSF\tT\t"
                "0\tShADad\t10\t1500\t12\t2600\t-",
            )
        ],
        "log string",
    )
    out = grok(df, "log", "%{BRO_CONN}").collect()[0]
    assert out.uid == "Cab3Xc1"
    assert out.resp_p == "443"
    assert out.proto == "tcp"
    assert out.conn_state == "SF"


def test_dissect(spark):
    df = spark.createDataFrame([("alice-42@host",)], "s string")
    out = dissect(df, "s", "%{user}-%{id}@%{host}").collect()[0]
    assert (out.user, out.id, out.host) == ("alice", "42", "host")


def test_key_value_and_detect_format(spark):
    df = spark.createDataFrame([("a=1&b=2",), ('{"x":1}',)], "msg string")
    kv = key_value(df, "msg", dest="m").collect()[0]
    assert kv.m == {"a": "1", "b": "2"}
    fmts = [r.detected_format for r in detect_format(df, "msg").collect()]
    assert fmts == ["keyvalue", "json"]


def test_date_parse_multi_pattern(spark):
    df = spark.createDataFrame(
        [("2024-03-01 10:00:00",), ("1709287200",)], "t string"
    )
    out = date_parse(df, "t", ["yyyy-MM-dd HH:mm:ss", "epoch_second"])
    vals = [r["@timestamp"] for r in out.collect()]
    assert all(v is not None for v in vals)
    assert vals[0].year == 2024 and vals[1].year == 2024


def test_add_entries_format_and_expression(ev):
    out = add_entries(
        ev,
        [
            {"key": "tag", "value": "fixed"},
            {"key": "label", "format": "${event_type}-${event_id}"},
            {"key": "double_val", "value_expression": "/value * 2"},
        ],
    ).collect()[0]
    assert out.tag == "fixed"
    assert out.label == "error-1"
    assert out.double_val == 400.0


def test_convert_type_failure_tags(spark):
    df = spark.createDataFrame([("12",), ("oops",)], "v string")
    out = convert_type(df, "v", "integer", tags_on_failure=["cast_fail"])
    rows = out.collect()
    assert rows[0].v == 12 and rows[0]._tags == []
    assert rows[1].v is None and rows[1]._tags == ["cast_fail"]


def test_wrap_flatten_roundtrip(ev):
    wrapped = wrap_entries(ev, ["event_type", "value"], "payload")
    assert "payload" in wrapped.columns and "value" not in wrapped.columns
    flat = flatten(wrapped, "payload")
    assert set(flat.columns) == set(ev.columns)


def test_list_to_map(spark):
    df = spark.createDataFrame(
        [([{"k": "a", "v": "1"}, {"k": "b", "v": "2"}],)],
        "lst array<struct<k string, v string>>",
    )
    out = list_to_map(df, "lst", "k", "v", "m").collect()[0]
    assert out.m == {"a": "1", "b": "2"}


def test_split_event_multiplies_rows(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x y")], "id long, s string")
    out = split_event(df, "s", r"\s+")
    assert out.count() == 5


def test_translate_with_default(ev):
    out = translate(ev, "event_type", "label", {"click": "c"}, default="d")
    got = {r.event_id: r.label for r in out.collect()}
    assert got == {1: "d", 2: "c", 3: "d", 4: "c"}


def test_translate_regex_first_match(spark):
    df = spark.createDataFrame([("abc",), ("axc",), ("zzz",)], "s string")
    out = translate_regex(
        df, "s", "m", [("^a.c$", "A"), ("^z", "Z")], default="-"
    )
    assert [r.m for r in out.collect()] == ["A", "A", "Z"]


def test_parse_xml(spark):
    df = spark.createDataFrame(
        [("<p><a>1</a><b>x</b></p>",)], "x string"
    )
    from data_prepper_spark.operators.parse import parse_xml

    out = parse_xml(df, "x", "a int, b string").select("parsed.*").collect()[0]
    assert (out.a, out.b) == (1, "x")


def test_filter_list(spark):
    from data_prepper_spark.operators.mutate import filter_list

    df = spark.createDataFrame(
        [([{"s": "ok", "v": 1}, {"s": "bad", "v": 2}],)],
        "lst array<struct<s string, v int>>",
    )
    out = filter_list(df, "lst", "kept", lambda x: x["s"] == "ok").collect()[0]
    assert len(out.kept) == 1 and out.kept[0].v == 1


def test_cidr_contains(spark):
    from data_prepper_spark.operators import dp_expr

    df = spark.createDataFrame(
        [("10.1.2.3",), ("192.168.0.9",), ("10.255.0.1",)], "ip string"
    )
    got = df.filter(dp_expr('cidrContains(/ip, "10.0.0.0/8")')).collect()
    assert {r.ip for r in got} == {"10.1.2.3", "10.255.0.1"}


def test_histogram_buckets(spark):
    df = spark.createDataFrame(
        [("g", 5.0), ("g", 15.0), ("g", 25.0), ("g", 45.0)], "k string, v double"
    )
    out = aggregate_histogram(df, ["k"], "v", [10.0, 20.0, 30.0, 40.0])
    got = {r.bucket: r.bucket_count for r in out.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 4: 1}


def test_remove_duplicates_deterministic(ev):
    df2 = ev.union(ev)
    out = remove_duplicates(df2, ["event_type"], order_by="event_id")
    got = {r.event_type: r.event_id for r in out.collect()}
    assert got == {"error": 1, "click": 2, "view": 3}


def test_translate_range_and_list_keys(spark):
    from data_prepper_spark.operators.enrich import translate

    df = spark.createDataFrame(
        [(10.0, "click"), (55.0, "view"), (200.0, "purchase"), (-3.0, "x")],
        "value double, et string",
    )
    out = translate(
        df, "value", "band",
        {"0-49": "low", "50-149": "mid", "150-1000": "high"},
        default="other",
    )
    out = translate(
        out, "et", "label", {"click,view": "i", "purchase": "c"}, default="o"
    )
    rows = {(r["value"], r["band"], r["label"]) for r in out.collect()}
    assert rows == {
        (10.0, "low", "i"), (55.0, "mid", "i"),
        (200.0, "high", "c"), (-3.0, "other", "o"),
    }


def test_translate_overlap_validation():
    import pytest

    from data_prepper_spark.operators.enrich import _parse_translate_keys

    with pytest.raises(ValueError):
        _parse_translate_keys({"0-10": "a", "5-20": "b"})
    with pytest.raises(ValueError):
        _parse_translate_keys({"0-10": "a", "7": "b"})
    ind, rng = _parse_translate_keys({"a,b": "x", "1-2": "y"})
    assert ind == {"a": "x", "b": "x"} and rng == [(1.0, 2.0, "y")]


def test_translate_file_reference_doc_shape(spark, tmp_path):
    from data_prepper_spark.operators.enrich import translate_file

    p = tmp_path / "m.yaml"
    p.write_text(
        "mappings:\n"
        "  - source: status\n"
        "    targets:\n"
        "      - target: label\n"
        "        map:\n"
        "          '200-299': ok\n"
        "          '500-599': err\n"
        "        default: other\n"
    )
    df = spark.createDataFrame([(200,), (503,), (404,)], "status int")
    out = translate_file(df, "status", "label", str(p))
    assert [r["label"] for r in out.orderBy("status").collect()] == [
        "ok", "other", "err"
    ]


def test_obfuscate_predefined_patterns(spark):
    from data_prepper_spark.operators.mutate import obfuscate

    df = spark.createDataFrame(
        [("mail bob@example.com from 10.1.2.3 ssn 123-45-6789",)],
        "msg string",
    )
    out = obfuscate(
        df, "msg",
        pattern=["%{EMAIL_ADDRESS}", "%{IP_ADDRESS_V4}", "%{US_SSN_NUMBER}"],
        mask_character="#", mask_character_length=4,
    ).collect()[0]["msg"]
    assert out == "mail #### from #### ssn ####"


def test_flatten_recursive_and_json_map(spark):
    from pyspark.sql import functions as F

    from data_prepper_spark.operators.mutate import flatten, flatten_json_map

    df = spark.createDataFrame([(1, ("x", (2, [5, 6])))],
                               "id long, s struct<a:string, b:struct<c:long, d:array<long>>>")
    flat = flatten(df, "s", recursive=True)
    r = flat.collect()[0]
    assert r["a"] == "x" and r["b.c"] == 2 and r["b.d"] == [5, 6]
    jm = flatten_json_map(df, "s", bracket_notation=True).collect()[0][
        "flattened"
    ]
    assert jm == {"a": "x", "b.c": "2", "b.d[0]": "5", "b.d[1]": "6"}


def test_csv_auto_and_header_modes(spark):
    from data_prepper_spark.operators.parse import csv_parse

    df = spark.createDataFrame(
        [("1,two,3", "k,name,n")], "line string, hdr string"
    )
    auto = csv_parse(df, "line", n_columns=3).collect()[0]["parsed"]
    assert (auto["column1"], auto["column2"], auto["column3"]) == (
        "1", "two", "3",
    )
    named = csv_parse(df, "line", header_source="hdr").collect()[0]["parsed"]
    assert named == {"k": "1", "name": "two", "n": "3"}


def test_date_from_time_received_and_output_format(spark):
    from pyspark.sql import functions as F

    from data_prepper_spark.operators.parse import date_parse

    df = spark.createDataFrame(
        [("ignored", "2024-02-03 04:05:06")],
        "src string, _time_received string",
    )
    out = date_parse(
        df, from_time_received=True, output_format="yyyy/MM/dd"
    ).collect()[0]["@timestamp"]
    assert out == "2024/02/03"
    df2 = spark.createDataFrame([("1700000000",)], "src string")
    r = date_parse(df2, "src", ["epoch_second"], output_format="yyyy").collect()
    assert r[0]["@timestamp"] == "2023"


def test_dp_typeof_runtime(spark):
    from pyspark.sql import functions as F

    from data_prepper_spark.operators.expression import dp_typeof

    df = spark.createDataFrame(
        [('{"v": 1}',), ('{"v": "s"}',), ('{"v": 2.5}',),
         ('{"v": [1]}',), ('{"v": {"w": 1}}',), ('{"v": 99999999999}',),
         ('{"v": null}',), ('{"v": true}',)],
        "j string",
    )
    got = [r[0] for r in df.select(dp_typeof("j", "/v")).collect()]
    assert got == ["integer", "string", "double", "array", "map",
                   "long", "null", "boolean"]


def test_add_entries_append_and_metadata(spark):
    from data_prepper_spark.operators.mutate import add_entries

    df = spark.createDataFrame([("x", None)], "a string, b string")
    out = add_entries(
        df,
        [
            {"key": "a", "value": "y", "append_if_key_exists": True},
            {"key": "b", "value": "z", "append_if_key_exists": True},
            {"metadata_key": "/origin", "value": "s3"},
            {"key": "a", "value": "w", "append_if_key_exists": True},
        ],
    ).collect()[0]
    assert out["a"] == ["x", "y", "w"]  # scalar -> list -> extended
    assert out["b"] == ["z"]            # null -> fresh single-el list
    assert out["_meta_origin"] == "s3"


def test_delete_entries_regex(spark):
    from data_prepper_spark.operators.mutate import delete_entries

    df = spark.createDataFrame(
        [(1, 2, 3, 4)], "keep long, tmp_a long, tmp_b long, other long"
    )
    out = delete_entries(df, keys=["other"], regex=r"^tmp_")
    assert out.columns == ["keep"]


def test_substring_nested_and_absent(spark):
    from data_prepper_spark.operators import dp_expr

    df = spark.createDataFrame(
        [("seg:alpha.beta",), ("nodelims",)], "s string"
    )
    out = df.select(
        dp_expr('substringBefore(substringAfter(/s, ":"), ".")').alias("x"),
        dp_expr('substringAfter(/s, "#")').alias("absent"),
        dp_expr('substringBeforeLast(/s, "#")').alias("absent2"),
    ).collect()
    assert out[0]["x"] == "alpha"
    # delimiter absent -> full source (reference contract)
    assert out[0]["absent"] == "seg:alpha.beta"
    assert out[1]["absent"] == "nodelims"
    assert out[1]["absent2"] == "nodelims"


def test_grok_keys_to_overwrite(spark):
    from data_prepper_spark.operators.parse import grok

    df = spark.createDataFrame(
        [("code 42", "keepme", None)],
        "msg string, num string, other string",
    )
    out = grok(df, "msg", "code %{INT:num}").collect()[0]
    assert out["num"] == "keepme"  # existing value wins by default
    out2 = grok(
        df, "msg", "code %{INT:num}", keys_to_overwrite=["num"]
    ).collect()[0]
    assert out2["num"] == "42"


def test_grok_pattern_file_loading(spark, tmp_path):
    from data_prepper_spark.operators.parse import (
        GROK_PATTERNS,
        compile_grok,
        load_grok_patterns,
    )

    p = tmp_path / "custom.patterns"
    p.write_text("# custom set\nTICKET [A-Z]{2,5}-[0-9]+\n"
                 "TICKETLINE ticket %{TICKET:tid} by %{USER:who}\n")
    n = load_grok_patterns(str(p))
    assert n == 2 and "TICKET" in GROK_PATTERNS
    import re as _re

    rx, names, gidx = compile_grok("%{TICKETLINE}")
    m = _re.search(rx, "ticket ABC-123 by alice")
    assert {n: m.group(g) for n, g in zip(names, gidx)} == {
        "tid": "ABC-123",
        "who": "alice",
    }
    for k in ("TICKET", "TICKETLINE"):
        GROK_PATTERNS.pop(k, None)


def test_dissect_modifiers(spark):
    from data_prepper_spark.operators.parse import dissect

    df = spark.createDataFrame(
        [("alice smith 10.0.0.1 - GET   /idx",)], "line string"
    )
    out = dissect(
        df, "line",
        "%{+name} %{+name} %{ip} %{?dash} %{verb->} %{path}",
    ).collect()[0]
    assert out["name"] == "alice smith"
    assert out["ip"] == "10.0.0.1"
    assert "dash" not in out.asDict()
    assert out["verb"] == "GET" and out["path"] == "/idx"


def test_convert_type_boolean_and_null_values(spark):
    from data_prepper_spark.operators.mutate import convert_type

    df = spark.createDataFrame(
        [("TRUE",), ("false",), ("1",), ("yes",), ("-",), (None,)],
        "v string",
    )
    # reference BooleanConverter: parseBoolean — only "true" is true,
    # everything else false, nothing fails
    out = [r["v"] for r in convert_type(df, "v", "boolean").collect()]
    assert out == [True, False, False, False, False, None]
    df2 = spark.createDataFrame([("5",), ("-",), ("x",)], "v string")
    out2 = [
        r["v"]
        for r in convert_type(
            df2, "v", "integer", null_values=["-"]
        ).collect()
    ]
    assert out2 == [5, None, None]
    nums = spark.createDataFrame([(0.0,), (2.5,)], "v double")
    out3 = [r["v"] for r in convert_type(nums, "v", "boolean").collect()]
    assert out3 == [False, True]


def test_truncate_array_elements(spark):
    from data_prepper_spark.operators.mutate import truncate

    df = spark.createDataFrame(
        [(["hello_one", "hello_two", "hello_three"],)], "v array<string>"
    )
    out = truncate(df, "v", length=5).collect()[0]["v"]
    assert out == ["hello", "hello", "hello"]
    df2 = spark.createDataFrame([("hello_world",)], "v string")
    assert truncate(df2, "v", start_at=6).collect()[0]["v"] == "world"


def test_grok_nested_named_refs(spark):
    # ADVICE r02: a named ref whose expansion itself contains named
    # refs (%{SYSLOGPROG:prog} -> %{PROG:program} + %{POSINT:pid})
    # must align every capture with its group number
    from data_prepper_spark.operators.parse import grok

    df = spark.createDataFrame([("proc nginx[123] up",)], "msg string")
    out = grok(df, "msg", "proc %{SYSLOGPROG:prog} %{WORD:state}").collect()[0]
    assert out.prog == "nginx[123]"
    assert out.program == "nginx"
    assert out.pid == "123"
    assert out.state == "up"


def test_grok_raw_group_in_pattern_body(spark):
    # raw capturing parens inside a pattern body shift Java group
    # numbers; compile_grok must count them (incl. class/escape forms)
    from data_prepper_spark.operators.parse import (
        GROK_PATTERNS,
        grok,
    )

    GROK_PATTERNS["RAWGRP"] = r"(x+)y"
    try:
        df = spark.createDataFrame([("zz xxy 42",)], "msg string")
        out = grok(df, "msg", "zz %{RAWGRP:g} %{INT:n}").collect()[0]
        assert out.g == "xxy" and out.n == "42"
    finally:
        GROK_PATTERNS.pop("RAWGRP", None)


def test_grok_target_key_and_unnamed_captures(spark):
    from data_prepper_spark.operators.parse import grok

    df = spark.createDataFrame([("code 42",)], "msg string")
    out = grok(df, "msg", "code %{INT:num}", target_key="parsed").collect()[0]
    assert out.parsed.num == "42"
    # named_captures_only=False captures %{INT} under its syntax name
    out2 = grok(
        df, "msg", "code %{INT}", named_captures_only=False
    ).collect()[0]
    assert out2.INT == "42"
    # tags_on_timeout accepted for config parity (never fires)
    out3 = grok(
        df, "msg", "code %{INT:num}", tags_on_timeout=["_timeout"]
    ).collect()[0]
    assert out3.num == "42"


def test_date_epoch_nano_precision(spark):
    # integer division: 1.8e18 ns epochs exceed double's 53-bit
    # mantissa; float math drifts by up to ~1 us (ADVICE r02)
    ns = 1800000000000000123  # -> 1800000000000000 us exactly
    df = spark.createDataFrame([(str(ns),)], "t string")
    out = (
        date_parse(df, "t", ["epoch_nano"])
        .select(F.unix_micros("@timestamp").alias("us"))
        .collect()[0]
    )
    assert out.us == ns // 1000


def test_date_parse_locale_fr_de(spark):
    # DateProcessorConfig.locale: localized month names normalize to
    # month numbers before parsing
    df = spark.createDataFrame(
        [("5 janvier 2024",), ("17 août 2023",)], "t string"
    )
    out = date_parse(
        df, "t", ["d MMMM yyyy"], locale="fr",
        output_format="yyyy-MM-dd",
    ).collect()
    assert [r["@timestamp"] for r in out] == ["2024-01-05", "2023-08-17"]
    df2 = spark.createDataFrame([("3. Dez. 2022",)], "t string")
    out2 = date_parse(
        df2, "t", ["d. MMM yyyy"], locale="de_DE",
        output_format="yyyy-MM-dd",
    ).collect()
    assert out2[0]["@timestamp"] == "2022-12-03"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        date_parse(df, "t", ["d MMMM yyyy"], locale="xx")


def test_get_event_type_expression(spark):
    from data_prepper_spark.operators import dp_expr
    from data_prepper_spark.operators.mutate import ensure_event_type

    df = ensure_event_type(
        spark.createDataFrame([("a",), ("b",)], "v string"), "LOG"
    )
    got = df.filter(dp_expr('getEventType() == "LOG"')).count()
    assert got == 2
    df2 = ensure_event_type(spark.createDataFrame([("a",)], "v string"))
    assert df2.select(dp_expr("getEventType()").alias("t")).first().t == "EVENT"


def test_grok_java_named_group_counts_and_captures(spark):
    """ADVICE r03: a Java named group '(?<name>...)' inside a pattern
    body consumes a regex group number — compile_grok must count it
    (later captures would silently shift otherwise) AND surface it as
    a named capture, like the reference's Java grok. Lookbehinds
    '(?<=' / '(?<!' stay non-capturing."""
    from data_prepper_spark.operators.parse import GROK_PATTERNS, grok

    GROK_PATTERNS["NAMEDGRP"] = r"(?<inner>x+)y"
    GROK_PATTERNS["LOOKBEHIND"] = r"(?<=@)\w+"
    try:
        df = spark.createDataFrame([("zz xxy 42",)], "msg string")
        out = grok(df, "msg", "zz %{NAMEDGRP:g} %{INT:n}").collect()[0]
        assert out.g == "xxy" and out.n == "42"  # no index shift
        assert out.inner == "xx"  # named group surfaced

        df2 = spark.createDataFrame([("hi @bob 7",)], "msg string")
        out2 = grok(df2, "msg", "hi @%{LOOKBEHIND:who} %{INT:n}").collect()[0]
        assert out2.who == "bob" and out2.n == "7"
    finally:
        GROK_PATTERNS.pop("NAMEDGRP", None)
        GROK_PATTERNS.pop("LOOKBEHIND", None)


def test_grok_match_timeout_parity_and_budget(spark):
    """match_timeout_ms routes through the regex-module UDF: same
    captures as the Catalyst fast path on benign input, and a REAL
    per-match budget on catastrophic patterns (GrokProcessor.java
    match_timeout_ms + tags_on_timeout)."""
    from data_prepper_spark.operators.parse import COMMON_APACHE_LOG, grok

    line = (
        '10.1.2.3 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /x.gif HTTP/1.0" 200 2326'
    )
    df = spark.createDataFrame([(line,)], "message string")
    cols = ["clientip", "verb", "request", "response", "bytes"]
    fast = grok(df, "message", COMMON_APACHE_LOG).select(*cols).collect()
    slow = grok(
        df, "message", COMMON_APACHE_LOG, match_timeout_ms=30000
    ).select(*cols).collect()
    assert fast == slow
    assert slow[0]["clientip"] == "10.1.2.3"

    # catastrophic backtracking: (a|aa)+$ against a^n + z is
    # exponential; the budget must fire instead of hanging
    evil = spark.createDataFrame(
        [("a" * 40 + "z",), ("hello 7",)], "message string"
    )
    out = grok(
        evil,
        "message",
        ["(?<pfx>(?:a|aa)+)$", "%{WORD:w} %{INT:n}"],
        match_timeout_ms=200,
        tags_on_timeout=["_groktimeout"],
        tags_on_match_failure=["_grokparsefailure"],
    ).collect()
    by = {r["message"][:8]: r for r in out}
    timed = by["aaaaaaaa"]
    assert "_groktimeout" in timed["_tags"]
    assert "_grokparsefailure" not in timed["_tags"]  # abort, not fail
    assert timed["pfx"] is None and timed["w"] is None  # later skipped
    ok = by["hello 7"]
    assert ok["w"] == "hello" and ok["n"] == "7"
    assert ok["_tags"] == []


def test_key_value_recursive(spark):
    """recursive: true (KeyValueProcessor.java:420-487): bracket-aware
    pair split, nested-object recursion for [], (), <>, blank-key
    non_match, unbalanced-bracket drop."""
    import json

    from data_prepper_spark.operators.parse import key_value_recursive

    rows = [
        ("a=1&b=(c=2&d=[e=3&f=4])&g=<h=5>",),
        ("plain=v&noval",),
        ("bad=[x=1&done=ok",),  # unbalanced bracket swallows the rest
    ]
    df = spark.createDataFrame(rows, "message string")
    out = {
        r["message"]: json.loads(r["parsed"])
        for r in key_value_recursive(
            df, "message", non_match_value="miss"
        ).collect()
    }
    assert out[rows[0][0]] == {
        "a": "1",
        "b": {"c": "2", "d": {"e": "3", "f": "4"}},
        "g": {"h": "5"},
    }
    assert out[rows[1][0]] == {"plain": "v", "noval": "miss"}
    # depth never returns to 0, so no field split happens and the
    # single unbalanced pair is dropped (reference :474-481)
    assert out[rows[2][0]] == {}

    # single-char + non-bracket delimiter guards (reference :103-115)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        key_value_recursive(df, "message", field_split="&&")
    with _pytest.raises(ValueError):
        key_value_recursive(df, "message", value_split="[")

    # VARIANT interop: the JSON lands in parse_json cleanly
    from pyspark.sql import functions as F

    v = (
        key_value_recursive(df.limit(1), "message")
        .select(
            F.try_variant_get(
                F.parse_json("parsed"), "$.b.d.e", "string"
            ).alias("e")
        )
        .collect()
    )
    assert v[0]["e"] == "3"
