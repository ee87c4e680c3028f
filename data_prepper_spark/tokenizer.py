"""The canonical code tokenizer — defined ONCE, expressible three ways.

Semantics (load-bearing for rank-identity, FIXTURES.md §2):
  1. split CamelCase boundaries:  "HTTPServer" -> "HTTP Server",
     "getFooBar" -> "get Foo Bar"  (two regex rules, ABBA first)
  2. lowercase
  3. split on runs of anything outside [a-z0-9]  (so snake_case and
     punctuation both separate tokens)
  4. drop empty tokens

The three implementations (pandas vectorized str ops for the
Arrow-batched UDF path, Spark-native Column expression for pure-SQL
plans, and a DuckDB SQL fragment for the driver's oracle) are asserted
token-identical in tests/test_tokenizer.py.

Reference ancestry: grok-style field extraction + split_string
(reference grok-processor/.../GrokProcessor.java:63,
mutate-string-processors/.../SplitStringProcessor.java) done
vectorized instead of per-event Java.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# rule 1a: ABBA boundary (HTTPServer -> HTTP Server)
_RE_ABBA = re.compile(r"([A-Z]+)([A-Z][a-z])")
# rule 1b: lower/digit -> Upper boundary (getFoo -> get Foo)
_RE_LU = re.compile(r"([a-z0-9])([A-Z])")
# rule 3: token separator
_RE_SEP = re.compile(r"[^a-z0-9]+")


def tokenize_series(s: pd.Series) -> pd.Series:
    """pandas Series[str] -> Series[list[str]] (vectorized, no row loop)."""
    t = s.fillna("")
    t = t.str.replace(_RE_ABBA, r"\1 \2", regex=True)
    t = t.str.replace(_RE_LU, r"\1 \2", regex=True)
    t = t.str.lower()
    toks = t.str.split(_RE_SEP)
    # str.split on a regex leaves '' at the ends; strip them without a
    # python-level per-token loop where possible
    return toks.map(lambda xs: [x for x in xs if x])


def tokenize_flat_arrow(arr) -> tuple:
    """Arrow-native tokenize (the hot build path): pyarrow.compute RE2
    kernels on contiguous Arrow buffers — no Python string objects, far
    less allocator/bandwidth pressure than pandas object dtype (the
    sandbox profile showed object-string processing saturates memory
    bandwidth well below 32 cores; see BASELINE.md §scaling).

    Input: pa.Array/ChunkedArray of non-null strings (one per doc).
    Returns (flat_tokens: pa.Array[string], doc_idx: np.int64 array
    mapping each flat token to its input row, counts: np.int64 array of
    per-doc token counts). Token-identical to tokenize_series
    (asserted in tests/test_tokenizer.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string()), np.zeros(0, np.int64), np.zeros(
            0, np.int64
        )
    t = pc.replace_substring_regex(
        arr, pattern=r"([A-Z]+)([A-Z][a-z])", replacement=r"\1 \2"
    )
    t = pc.replace_substring_regex(
        t, pattern=r"([a-z0-9])([A-Z])", replacement=r"\1 \2"
    )
    t = pc.utf8_lower(t)
    lists = pc.split_pattern_regex(t, pattern="[^a-z0-9]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()  # honors any array offset, unlike .values
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    per_doc_total = np.diff(offsets - offsets[0])
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), per_doc_total)
    keep = nonempty
    counts = np.bincount(doc_idx[keep], minlength=n).astype(np.int64)
    flat_f = flat.filter(pa.array(keep))
    return flat_f, doc_idx[keep], counts


def tokenize_col(col: Column) -> Column:
    """Spark-native expression returning array<string> of tokens."""
    c = F.regexp_replace(F.coalesce(col, F.lit("")), r"([A-Z]+)([A-Z][a-z])", r"$1 $2")
    c = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1 $2")
    c = F.lower(c)
    arr = F.split(c, r"[^a-z0-9]+")
    return F.filter(arr, lambda x: x != F.lit(""))


# ---------------------------------------------------------------------------
# Minimal-english s-stemmer (the Lucene `minimal_english` stem filter's
# core rule, simplified): strip one trailing 's' from tokens longer
# than 3 chars unless they end in ss/us/is. Like the tokenizer itself
# it is defined once and expressed four ways (Column, Arrow, Python,
# DuckDB SQL) asserted identical in tests/test_tokenizer.py. Used by
# the analyzer chain when BuildConfig.stemmer == "minimal_english"
# (reference ancestry: OpenSearch analysis-common `stemmer` token
# filter with language=minimal_english).
# ---------------------------------------------------------------------------

_STEM_EXEMPT = ("ss", "us", "is")


def stem_minimal_english_elem(t: Column) -> Column:
    """Element-level Column form: token string -> stemmed token."""
    keep = (
        (F.length(t) <= 3)
        | ~t.endswith("s")
        | t.endswith("ss")
        | t.endswith("us")
        | t.endswith("is")
    )
    return F.when(keep, t).otherwise(F.substring(t, 1, F.length(t) - 1))


def stem_minimal_english_arrow(flat):
    """Arrow form: pa.Array[string] -> pa.Array[string] (vectorized,
    RE2 strip + boolean mask — no Python per token)."""
    import pyarrow.compute as pc

    ln = pc.utf8_length(flat)
    mask = pc.and_(pc.greater(ln, 3), pc.ends_with(flat, pattern="s"))
    for suf in _STEM_EXEMPT:
        mask = pc.and_(mask, pc.invert(pc.ends_with(flat, pattern=suf)))
    stripped = pc.replace_substring_regex(flat, pattern="s$", replacement="")
    return pc.if_else(mask, stripped, flat)


def stem_minimal_english_py(tok: str) -> str:
    """Plain-Python form (driver-side query analysis)."""
    if len(tok) > 3 and tok.endswith("s") and not tok.endswith(_STEM_EXEMPT):
        return tok[:-1]
    return tok


def stem_minimal_english_sql(expr: str) -> str:
    """DuckDB SQL fragment: element expression -> stemmed element."""
    return (
        f"CASE WHEN length({expr}) > 3 AND {expr} LIKE '%s' "
        f"AND {expr} NOT LIKE '%ss' AND {expr} NOT LIKE '%us' "
        f"AND {expr} NOT LIKE '%is' "
        f"THEN substring({expr}, 1, length({expr}) - 1) ELSE {expr} END"
    )


def tokenize_sql(expr: str) -> str:
    """DuckDB SQL fragment producing the same list<varchar> of tokens."""
    return (
        "list_filter(regexp_split_to_array(lower("
        f"regexp_replace(regexp_replace({expr}, '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),"
        " '([a-z0-9])([A-Z])', '\\1 \\2', 'g')), '[^a-z0-9]+'), x -> x != '')"
    )
