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


def test_flat_arrow_matches_series():
    """The Arrow hot-path tokenizer is token-identical to the pandas
    reference over edge cases + fuzz (the docstring's promised test)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_prepper_spark.tokenizer import tokenize_flat_arrow

    collected: list[str] = []

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def gather(s):
        collected.append(s)

    gather()
    cases = [c if c is not None else "" for c in CASES] + collected
    want = tokenize_series(pd.Series(cases)).tolist()
    flat, doc_idx, counts = tokenize_flat_arrow(pa.array(cases, type=pa.string()))
    toks = flat.to_pylist()
    got, j = [], 0
    for n in counts:
        got.append(toks[j : j + int(n)])
        j += int(n)
    assert got == want, next(
        (c, a, b) for c, a, b in zip(cases, got, want) if a != b
    )
    # doc_idx maps each flat token to its row, consistent with counts
    import numpy as np

    assert (np.bincount(doc_idx, minlength=len(cases)) == counts).all()


def test_varbyte_roundtrip():
    """varbyte encode/decode round-trip + varbyte_lengths consistency
    over adversarial values (7-bit boundaries, uint64 extremes)."""
    import numpy as np

    from data_prepper_spark.index.codec import (
        varbyte_decode,
        varbyte_encode,
        varbyte_lengths,
    )

    rng = np.random.default_rng(7)
    boundaries = []
    for k in range(1, 10):
        b = 1 << (7 * k)
        boundaries += [b - 1, b, b + 1]
    vals = np.array(
        [0, 1, 127, 128, (1 << 64) - 1, (1 << 63)] + boundaries
        + rng.integers(0, 1 << 62, size=500).tolist(),
        dtype=np.uint64,
    )
    enc = varbyte_encode(vals)
    assert len(enc) == int(varbyte_lengths(vals).sum())
    dec = varbyte_decode(enc)
    assert (dec == vals).all()
    assert varbyte_decode(b"").size == 0
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""


def test_stemmer_four_way_parity(spark):
    """The minimal-english s-stemmer's four forms (Column, Arrow,
    Python, DuckDB SQL) agree on edge cases + fuzz."""
    import duckdb
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_prepper_spark.tokenizer import (
        stem_minimal_english_arrow,
        stem_minimal_english_elem,
        stem_minimal_english_py,
        stem_minimal_english_sql,
    )

    toks = [
        "columns", "class", "bus", "axis", "as", "is", "us", "ss",
        "does", "miss", "gas", "files", "tests", "strings", "s", "",
        "boss", "virus", "basis", "atlas", "yes", "its", "posts",
    ]

    @given(st.text(alphabet="abcdefgsiu0123456789", max_size=8))
    @settings(max_examples=200, deadline=None)
    def gather(s):
        toks.append(s)

    gather()
    want = [stem_minimal_english_py(t) for t in toks]
    a = stem_minimal_english_arrow(pa.array(toks, type=pa.string())).to_pylist()
    sdf = spark.createDataFrame([(t,) for t in toks], "t string")
    s = [
        r[0]
        for r in sdf.select(stem_minimal_english_elem(F.col("t"))).collect()
    ]
    d = [
        r[0]
        for r in duckdb.sql(
            f"select {stem_minimal_english_sql('t')} "
            "from (select unnest($1) as t)",
            params=[toks],
        ).fetchall()
    ]
    assert want == a == s == d
