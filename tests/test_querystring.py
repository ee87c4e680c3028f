"""query_string mini-syntax parser (index/querystring.py) — pure
parser units; end-to-end execution is covered in test_booltree.py
(the parser emits the same trees the bool-tree compiler executes)."""

from __future__ import annotations

import pytest

from data_prepper_spark.index.querystring import parse_query_string


def test_bare_terms_default_or():
    assert parse_query_string("foo bar") == {
        "bool": {
            "should": [
                {"match": {"content": "foo"}},
                {"match": {"content": "bar"}},
            ],
            "minimum_should_match": 1,
        }
    }


def test_default_operator_and():
    assert parse_query_string("foo bar", default_operator="AND") == {
        "bool": {"must": [
            {"match": {"content": "foo"}},
            {"match": {"content": "bar"}},
        ]}
    }


def test_and_binds_tighter_than_or():
    got = parse_query_string("a AND b OR c")
    assert got == {
        "bool": {
            "should": [
                {"bool": {"must": [
                    {"match": {"content": "a"}},
                    {"match": {"content": "b"}},
                ]}},
                {"match": {"content": "c"}},
            ],
            "minimum_should_match": 1,
        }
    }


def test_not_and_parens():
    got = parse_query_string("a AND NOT (b OR c)")
    assert got == {
        "bool": {"must": [
            {"match": {"content": "a"}},
            {"bool": {"must_not": [{
                "bool": {
                    "should": [
                        {"match": {"content": "b"}},
                        {"match": {"content": "c"}},
                    ],
                    "minimum_should_match": 1,
                }
            }]}},
        ]}
    }


def test_plus_minus_flat_group():
    got = parse_query_string("+req opt -banned")
    assert got == {
        "bool": {
            "must": [{"match": {"content": "req"}}],
            "must_not": [{"match": {"content": "banned"}}],
            "should": [{"match": {"content": "opt"}}],
        }
    }


def test_plus_minus_all_optional_without_plus():
    got = parse_query_string("opt -banned")
    assert got == {
        "bool": {
            "must_not": [{"match": {"content": "banned"}}],
            "should": [{"match": {"content": "opt"}}],
            "minimum_should_match": 1,
        }
    }


def test_quoted_phrase_and_field_clauses():
    got = parse_query_string(
        'lang:py n_chars:300 other:"two words" "a phrase"',
        dv_cols={"lang", "n_chars"},
    )
    assert got == {
        "bool": {
            "should": [
                {"term": {"lang": "py"}},
                {"term": {"n_chars": 300}},
                {"match_phrase": {"other": "two words"}},
                {"match_phrase": {"content": "a phrase"}},
            ],
            "minimum_should_match": 1,
        }
    }


def test_dv_field_quoted_is_term():
    got = parse_query_string('lang:"py"', dv_cols={"lang"})
    assert got == {"term": {"lang": "py"}}


def test_single_term_unwrapped():
    assert parse_query_string("foo") == {"match": {"content": "foo"}}


def test_empty_is_match_all():
    assert parse_query_string("   ") == {"match_all": {}}


def test_minus_with_explicit_ops_is_not():
    got = parse_query_string("a AND -b")
    assert got == {
        "bool": {"must": [
            {"match": {"content": "a"}},
            {"bool": {"must_not": [{"match": {"content": "b"}}]}},
        ]}
    }


def test_unsupported_syntax_raises():
    # multi-edit fuzzy, regex, and range on a field with no doc-values
    # column stay loud failures
    for bad in ("fuzzy~2", "/rege.x/", "n:[1 TO 2]"):
        with pytest.raises(ValueError):
            parse_query_string(bad)


def test_prefix_and_wildcard_terms():
    assert parse_query_string("spar*") == {"prefix": {"content": "spar"}}
    assert parse_query_string("wild*card") == {
        "wildcard": {"content": "wild*card"}
    }
    assert parse_query_string("wi?d") == {"wildcard": {"content": "wi?d"}}
    # field-scoped, including on a doc-values (keyword) field
    assert parse_query_string("lang:p*", dv_cols={"lang"}) == {
        "prefix": {"lang": "p"}
    }


def test_fuzzy_terms():
    want = {"fuzzy": {"content": {"value": "term"}}}
    assert parse_query_string("term~") == want
    assert parse_query_string("term~1") == want


def test_boost_forms():
    assert parse_query_string("boosted^3") == {
        "bool": {"must": [{"match": {"content": "boosted"}}],
                 "boost": 3.0}
    }
    assert parse_query_string('"a b"^2') == {
        "bool": {"must": [{"match_phrase": {"content": "a b"}}],
                 "boost": 2.0}
    }
    assert parse_query_string("(a b)^2") == {
        "bool": {"must": [{"bool": {
            "should": [
                {"match": {"content": "a"}},
                {"match": {"content": "b"}},
            ],
            "minimum_should_match": 1,
        }}], "boost": 2.0}
    }


def test_range_syntax():
    dv = {"n_chars"}
    assert parse_query_string("n_chars:[100 TO 200]", dv_cols=dv) == {
        "range": {"n_chars": {"gte": 100, "lte": 200}}
    }
    assert parse_query_string("n_chars:{100 TO *}", dv_cols=dv) == {
        "range": {"n_chars": {"gt": 100}}
    }
    assert parse_query_string("n_chars:[* TO 50}", dv_cols=dv) == {
        "range": {"n_chars": {"lt": 50}}
    }
    assert parse_query_string("n_chars:>=100", dv_cols=dv) == {
        "range": {"n_chars": {"gte": 100}}
    }
    assert parse_query_string("n_chars:<7", dv_cols=dv) == {
        "range": {"n_chars": {"lt": 7}}
    }
    # composes with boolean operators
    got = parse_query_string(
        "data AND n_chars:[100 TO 200]", dv_cols=dv
    )
    assert got == {"bool": {"must": [
        {"match": {"content": "data"}},
        {"range": {"n_chars": {"gte": 100, "lte": 200}}},
    ]}}


def test_unbalanced_parens_raise():
    with pytest.raises(ValueError):
        parse_query_string("(a OR b")
    with pytest.raises(ValueError):
        parse_query_string("a OR b)")
