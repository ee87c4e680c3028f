"""Reference expression-language conformance vectors, ported from
data-prepper-expression GenericExpressionEvaluator_ConditionalIT
(the supported columnar subset — dynamic-key absence maps to null
columns; `\"\"\"...\"\"\"` string syntax is not ported)."""

import pyspark.sql.functions as F
import pytest

from data_prepper_spark.operators import dp_expr

ROW = {
    "success": True,
    "status_code": 200,
    "pi": 3.14159,
    "value": 12345.678,
    "is_cool": True,
    "should_drop": True,
    "path": "/path/to/route",
    "response": "OK",
    "durationInNanos": 6_000_000_000,
    "status": "abcdef",
    "message": "abcdefabcdef",
}

VECTORS = [
    ("/pi == 3.14159", True),
    ("/value == 12345.678", True),
    ("true == (/is_cool == true)", True),
    ("not /is_cool", False),
    ("/status_code < 300", True),
    ("/status_code != null", True),
    ("null != /status_code", True),
    ("/response2 == null", True),
    ("null == /response2", True),
    ("/response2 != null", False),
    ("/status_code <= 0", False),
    ("/status_code > 0", True),
    ("/status_code >= 300", False),
    ("-/status_code == -200", True),
    ("/success and /status_code == 200", True),
    ("/success2 or /status_code == 200", True),
    ("(/success2 == true) or (/status_code == 200)", True),
    ("/should_drop", True),
    ("/logs/2/should_drop", True),
    ('/path == "/path/to/route"', True),
    ('/path == "/incorrect/path"', False),
    ("/durationInNanos > 5000000000", True),
    ('/response == "OK"', True),
    ("length(/response) == 2", True),
    ('hasTags("t1")', True),
    ('hasTags("t1", "t2")', True),
    ('hasTags("t4")', False),
    ('hasTags("t1", "t4")', False),
    ('contains("abcdef", "bcde")', True),
    ('contains(/status, "ab")', True),
    ("contains(/message, /status)", True),
    ('getMetadata("/key1") == "meta1"', True),
    ('getMetadata("/key1") == "nope"', False),
    ("/status_code in {200, 202}", True),
    ("/status_code in {404, 500}", False),
    ("/status_code not in {404, 500}", True),
    ('/path =~ "^/path/.*"', True),
    ('/path !~ "^/other/.*"', True),
    ("/status_code + 1 == 201", True),
    ("/status_code * 2 - 100 == 300", True),
    ("/status_code % 30 == 20", True),
]


@pytest.fixture(scope="module")
def event_df(spark):
    df = spark.createDataFrame(
        [
            (
                ROW["success"], ROW["status_code"], ROW["pi"],
                ROW["value"], ROW["is_cool"], ROW["should_drop"],
                ROW["path"], ROW["response"], ROW["durationInNanos"],
                ROW["status"], ROW["message"],
            )
        ],
        "success boolean, status_code long, pi double, value double,"
        " is_cool boolean, should_drop boolean, path string,"
        " response string, durationInNanos long, status string,"
        " message string",
    )
    return (
        df.withColumn("response2", F.lit(None).cast("string"))
        .withColumn("success2", F.lit(False))
        .withColumn(
            "logs",
            F.array(
                F.struct(F.lit(False).alias("should_drop")),
                F.struct(F.lit(False).alias("should_drop")),
                F.struct(F.lit(True).alias("should_drop")),
            ),
        )
        .withColumn("_tags", F.array(F.lit("t1"), F.lit("t2"), F.lit("t3")))
        .withColumn("_meta_key1", F.lit("meta1"))
    )


@pytest.mark.parametrize("expr,want", VECTORS)
def test_reference_conditional_vector(event_df, expr, want):
    got = event_df.select(
        F.coalesce(dp_expr(expr).cast("boolean"), F.lit(False)).alias("r")
    ).collect()[0]["r"]
    assert got is want, f"{expr!r}: got {got}, want {want}"


ARITH = [
    # reference GenericExpressionEvaluator_ArithmeticIT: / on integers
    # is true division (Java (double)a/b); +-*% promote numerically;
    # left-assoc chains
    ("7 / 2", 3.5),
    ("/status_code / 3", 200 / 3),
    ("/status_code + 1 - 2 * 3", 195),
    ("-/status_code - 1", -201),
    ("/status_code % 7", 200 % 7),
    ("-7 % 3", -1),  # Java/Spark % follows the dividend's sign
    ("/pi * 2", 6.28318),
    ("/status_code - /durationInNanos", 200 - 6_000_000_000),
]


@pytest.mark.parametrize("expr,want", ARITH)
def test_reference_arithmetic_vector(event_df, expr, want):
    got = event_df.select(
        dp_expr(expr).cast("double").alias("r")
    ).collect()[0]["r"]
    assert got == pytest.approx(want, rel=1e-12), expr
