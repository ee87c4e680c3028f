"""The three tokenizer implementations must agree token-for-token."""

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from data_prepper_spark.tokenizer import tokenize_col, tokenize_series, tokenize_sql

CASES = [
    "getFooBar HTTPServer snake_case_id x1Y2z init();",
    "",
    None,
    "parseJSONResponse foo_bar2Baz __init__ a.b.c MiXeD123abcDEF",
    "def get_user_id(self): return self.userId  # comment",
    "SELECT * FROM tbl WHERE x = 'y'",
    "ALLCAPS lowercase Capitalized aB Ba",
    "tab\tnewline\nquote\"brace{**kw}",
]


def test_three_way_parity(spark):
    p = tokenize_series(pd.Series(CASES)).tolist()
    sdf = spark.createDataFrame([(t,) for t in CASES], "t string")
    s = [r[0] for r in sdf.select(tokenize_col(F.col("t"))).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            f"select {tokenize_sql('t')} from (select unnest($1) as t)",
            params=[[x if x is not None else "" for x in CASES]],
        ).fetchall()
    ]
    assert p == s == d


def test_camel_splitting_matches_snake():
    out = tokenize_series(pd.Series(["getFooBar", "get_foo_bar"])).tolist()
    assert out[0] == out[1] == ["get", "foo", "bar"]


def test_three_way_parity_fuzz(spark):
    """Hypothesis-style fuzz over ASCII printable strings: pandas,
    Spark-native and DuckDB tokenizers must agree on every input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    collected: list[str] = []

    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60,
        )
    )
    @settings(max_examples=300, deadline=None)
    def gather(s):
        collected.append(s)

    gather()
    cases = collected or [""]
    p = tokenize_series(pd.Series(cases)).tolist()
    sdf = spark.createDataFrame([(t,) for t in cases], "t string")
    s = [r[0] for r in sdf.select(tokenize_col(F.col("t"))).collect()]
    d = [
        r[0]
        for r in duckdb.sql(
            f"select {tokenize_sql('t')} from (select unnest($1) as t)",
            params=[cases],
        ).fetchall()
    ]
    assert p == s, next(
        (c, a, b) for c, a, b in zip(cases, p, s) if a != b
    )
    assert p == d, next(
        (c, a, b) for c, a, b in zip(cases, p, d) if a != b
    )
