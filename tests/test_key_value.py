"""key_value processor: reference option surface
(KeyValueProcessor.java:43; canonical cases from
key-value-processor/src/test/.../KeyValueProcessorTests.java
getKeyValueGroupingTestdata)."""

import pyspark.sql.functions as F
import pytest

from data_prepper_spark.operators.parse import _kv_parse_grouped, key_value

GROUPING_CASES = [
    (", ", "key1=value1,key2=value2", {"key1": "value1", "key2": "value2"}),
    (", ", "key1=value1 key2=value2", {"key1": "value1", "key2": "value2"}),
    (", ", "key1=value1 ,key2=value2", {"key1": "value1", "key2": "value2"}),
    (", ", "key1=value1, key2=value2", {"key1": "value1", "key2": "value2"}),
    (
        ", ",
        "text1 text2 key1=value1, key2=value2 text3 text4",
        {"key1": "value1", "key2": "value2"},
    ),
    (
        ", ",
        'text1 text2 foo key1=value1 url=http://foo.com?bar=text,text&foo=zoo'
        ' bar k2="http://bar.com?a=b&c=foo bar" barr',
        {
            "key1": "value1",
            "url": "http://foo.com?bar=text,text&foo=zoo",
            "k2": '"http://bar.com?a=b&c=foo bar"',
        },
    ),
    (
        ", ",
        "vendorMessage=VendorMessage(uid=1, feedValue=https://x/15.html,"
        " regions=[APAC], externalId=)",
        {
            "vendorMessage": "VendorMessage(uid=1,"
            " feedValue=https://x/15.html, regions=[APAC], externalId=)"
        },
    ),
]


@pytest.mark.parametrize("fd,inp,want", GROUPING_CASES)
def test_grouped_scanner_reference_cases(fd, inp, want):
    got = _kv_parse_grouped(inp, set(fd), {"="}, None, '"')
    assert {k: v for k, v in got.items() if v is not None} == want


def test_string_literal_spans_not_parsed():
    msg = '"ignore this " key1=value1&key2=value2 "ignore=this&too"'
    got = _kv_parse_grouped(msg, set(" &"), {"="}, None, '"')
    assert got["key1"] == "value1" and got["key2"] == "value2"
    assert '"ignore=this&too"' in got  # literal kept whole, not split


def test_native_path_options(spark):
    df = spark.createDataFrame(
        [("a=1&b=2&secret=x&c = 3 ",), ("dangling&a=9",)], "line string"
    )
    out = key_value(
        df,
        "line",
        field_split="&",
        value_split="=",
        exclude_keys=["secret"],
        prefix="kv_",
        transform_key="uppercase",
        default_values={"KV_Z": "zz"},
        non_match_value="none",
    ).select(F.col("parsed"))
    rows = [r[0] for r in out.collect()]
    assert rows[0] == {"kv_A": "1", "kv_B": "2", "kv_C": "3", "KV_Z": "zz"}
    assert rows[1] == {"kv_DANGLING": "none", "kv_A": "9", "KV_Z": "zz"}


def test_include_delete_drop(spark):
    df = spark.createDataFrame([("a!=1&b=2&c=",)], "line string")
    out = key_value(
        df,
        "line",
        include_keys=["a", "b"],
        delete_key_regex="[!]",
        drop_keys_with_no_value=True,
    ).select("parsed")
    # include filter runs on raw keys: 'a!' is excluded by include_keys
    assert out.collect()[0][0] == {"b": "2"}


def test_grouped_spark_path(spark):
    df = spark.createDataFrame(
        [('k="a&b c"&n=1',), (None,)], "line string"
    )
    out = key_value(
        df,
        "line",
        value_grouping=True,
        string_literal_character='"',
    ).select("parsed")
    rows = [r[0] for r in out.collect()]
    assert rows[0] == {"k": '"a&b c"', "n": "1"}
    assert rows[1] == {}


def test_drop_no_value_with_non_match_value(spark):
    # ADVICE r02: the drop must run BEFORE non_match_value fills nulls
    from data_prepper_spark.operators.parse import key_value

    df = spark.createDataFrame([("a=1&b&c=3",)], "msg string")
    out = key_value(
        df,
        "msg",
        dest="m",
        drop_keys_with_no_value=True,
        non_match_value="none",
    ).collect()[0]
    assert out.m == {"a": "1", "c": "3"}


def test_key_value_list_promotion(spark):
    # reference KeyValueProcessor promotes duplicate keys to a list;
    # key_value_list is the typed twin (every value a list)
    from data_prepper_spark.operators.parse import key_value_list

    df = spark.createDataFrame(
        [("a=1&b=2&a=3&c",)], "msg string"
    )
    out = key_value_list(df, "msg", dest="m").collect()[0]
    assert out.m == {"a": ["1", "3"], "b": ["2"], "c": [None]}
    out2 = key_value_list(
        df, "msg", dest="m", drop_keys_with_no_value=True
    ).collect()[0]
    assert out2.m == {"a": ["1", "3"], "b": ["2"]}
    out3 = key_value_list(
        df, "msg", dest="m", non_match_value="none"
    ).collect()[0]
    assert out3.m["c"] == ["none"]
    out4 = key_value_list(
        df, "msg", dest="m", include_keys=["a"], prefix="p_",
        transform_key="uppercase",
    ).collect()[0]
    assert out4.m == {"p_A": ["1", "3"]}
