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
    for bad in ("fuzzy~2", "boosted^3", "wild*card", "n:[1 TO 2]"):
        with pytest.raises(ValueError):
            parse_query_string(bad)


def test_unbalanced_parens_raise():
    with pytest.raises(ValueError):
        parse_query_string("(a OR b")
    with pytest.raises(ValueError):
        parse_query_string("a OR b)")
