"""Lucene `query_string` mini-syntax -> bool-tree compiler input.

The reference's opensearch users reach for `query_string` when they
want the Kibana search-bar syntax inside a `_search` body; this
module parses the widely-used core of that syntax into the SAME
query-dict trees `index/booltree.py` compiles, so execution (one
bucket-pruned postings scan + set algebra) and its oracle coverage
are shared, not duplicated.

Supported syntax:

* bare terms          -> {"match": {<default_field>: term}}
* "quoted phrase"     -> {"match_phrase": {<default_field>: ...}}
* field:value         -> doc-values field: {"term": {field: value}}
                         (numeric literals coerced); text field:
                         {"match": {field: value}}
* field:"a phrase"    -> {"match_phrase": {field: ...}}
* AND / && , OR / ||  -> explicit operators, AND binds tighter
* NOT x / !x          -> {"bool": {"must_not": [x]}}
* ( ... )             -> grouping
* + / - prefixes      -> in a flat implicit-OR group, classic Lucene
                         semantics: '+' clauses are required, '-'
                         clauses excluded, bare clauses optional
                         score-only. Mixed with explicit operators,
                         '+x' reduces to x and '-x' to NOT x.
* adjacency           -> the body's default_operator (OR unless set)
* trailing-* term     -> {"prefix": ...}; any other * / ? pattern
                         -> {"wildcard": ...} (booltree expands both
                         against the term dictionary, scoring_boolean)
* term~ / term~1      -> {"fuzzy": ...} (edit distance 1)
* clause^N            -> boost N on the clause (leaf, phrase, or
                         parenthesized group)
* field:[a TO b]      -> {"range": {field: {gte/lte}}} on a
                         doc-values field; {a TO b} is exclusive per
                         side, '*' leaves a side unbounded; the
                         shorthands field:>n / >=n / <n / <=n too

Out of scope (raise ValueError naming the construct): regex /../,
fuzzy distances other than 1.

Reference parity: org.opensearch.index.query.QueryStringQueryBuilder
as exercised by data-prepper's opensearch sink consumers (the
reference passes `_search` bodies through verbatim).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r'"[^"]*"'            # quoted phrase
    r"|\(|\)"             # parens
    r"|\|\||&&"           # || &&
    r'|[^\s()"]+'         # bare term / field:value / operators
)

_UNSUPPORTED = re.compile(r"[/^~\[\]{}]")
_FUZZY = re.compile(r"^(.+?)~(\d*)$")
_RANGE_OP = re.compile(r"^(>=|<=|>|<)(.+)$")
_BOOST = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")


def _num(val: str):
    try:
        return int(val)
    except ValueError:
        try:
            return float(val)
        except ValueError:
            return val


def _multiterm(val: str, field: str) -> dict | None:
    """Route fuzzy / prefix / wildcard value syntax to the matching
    booltree expansion leaf; None when `val` is a plain term."""
    m = _FUZZY.match(val)
    if m and "*" not in val and "?" not in val:
        if m.group(2) not in ("", "1"):
            raise ValueError(
                f"query_string: fuzzy distance '{m.group(2)}' in "
                f"'{val}~' (only edit distance 1 is compiled)"
            )
        return {"fuzzy": {field: {"value": m.group(1)}}}
    if "*" in val or "?" in val:
        if val.endswith("*") and "*" not in val[:-1] and "?" not in val:
            return {"prefix": {field: val[:-1]}}
        return {"wildcard": {field: val}}
    return None


def _range_leaf(field: str, val: str, dv_cols: set) -> dict:
    """`[a TO b]` / `{a TO b}` (and mixed bracket) range syntax."""
    if field not in dv_cols:
        raise ValueError(
            f"query_string: range on '{field}' needs a doc-values "
            "sidecar column (attach_doc_values first)"
        )
    parts = re.split(r"\s+TO\s+", val[1:-1].strip(), flags=re.IGNORECASE)
    if len(parts) != 2:
        raise ValueError(f"query_string: bad range syntax '{val}'")
    lo, hi = (p.strip() for p in parts)
    spec: dict = {}
    if lo != "*":
        spec["gte" if val[0] == "[" else "gt"] = _num(lo)
    if hi != "*":
        spec["lte" if val[-1] == "]" else "lt"] = _num(hi)
    return {"range": {field: spec}}


def _leaf(tok: str, default_field: str, dv_cols: set) -> dict:
    if tok.startswith('"') and tok.endswith('"'):
        return {"match_phrase": {default_field: tok[1:-1]}}
    if ":" in tok:
        field, _, val = tok.partition(":")
        if val.startswith('"') and val.endswith('"'):
            val = val[1:-1]
            if field in dv_cols:
                return {"term": {field: val}}
            return {"match_phrase": {field: val}}
        if val[:1] in "[{" and val[-1:] in "]}":
            return _range_leaf(field, val, dv_cols)
        m = _RANGE_OP.match(val)
        if m and field in dv_cols:
            op = {">=": "gte", ">": "gt", "<=": "lte", "<": "lt"}[
                m.group(1)
            ]
            return {"range": {field: {op: _num(m.group(2))}}}
        mt = _multiterm(val, field)
        if mt is not None:
            return mt
        if _UNSUPPORTED.search(val):
            raise ValueError(
                f"query_string: unsupported construct in '{tok}' "
                "(regex and multi-edit fuzzy syntax are not compiled)"
            )
        if field in dv_cols:
            return {"term": {field: _num(val)}}
        return {"match": {field: val}}
    mt = _multiterm(tok, default_field)
    if mt is not None:
        return mt
    if _UNSUPPORTED.search(tok):
        raise ValueError(
            f"query_string: unsupported construct in '{tok}' "
            "(regex and multi-edit fuzzy syntax are not compiled)"
        )
    return {"match": {default_field: tok}}


def parse_query_string(
    qs: str,
    default_field: str = "content",
    dv_cols: set | None = None,
    default_operator: str = "OR",
) -> dict:
    """Parse `qs` into a booltree-compatible query dict."""
    dv_cols = dv_cols or set()
    default_operator = default_operator.upper()
    toks = _TOKEN.findall(qs)

    def _open_range(s: str) -> bool:
        return (
            (":[" in s or ":{" in s)
            and not s.endswith("]")
            and not s.endswith("}")
        )

    # re-join field:"quoted phrase" and field:[a TO b] constructs the
    # whitespace tokenizer split apart
    joined: list[str] = []
    for t in toks:
        if (
            joined
            and joined[-1].endswith(":")
            and t.startswith('"')
        ):
            joined[-1] += t
        elif joined and _open_range(joined[-1]):
            joined[-1] += " " + t
        else:
            joined.append(t)
    toks = joined
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def maybe_boost(node: dict) -> dict:
        """Consume a dangling `^N` token (after a group or quoted
        phrase) and wrap the clause in a boosted bool."""
        t = peek()
        if t is not None and re.fullmatch(r"\^\d+(?:\.\d+)?", t):
            take()
            return {"bool": {"must": [node], "boost": float(t[1:])}}
        return node

    def parse_unary() -> tuple[str, dict]:
        """-> (prefix, clause) where prefix is '+', '-', or ''."""
        t = peek()
        if t is None:
            raise ValueError("query_string: dangling operator")
        if t in ("NOT", "!"):
            take()
            _, inner = parse_unary()
            return "", {"bool": {"must_not": [inner]}}
        if t == "(":
            take()
            node = parse_expr()
            if peek() != ")":
                raise ValueError("query_string: unbalanced '('")
            take()
            return "", maybe_boost(node)
        take()
        prefix = ""
        if t[0] in "+-" and len(t) > 1:
            prefix, t = t[0], t[1:]
        boost = None
        if not t.startswith('"'):
            mb = _BOOST.match(t)
            if mb:
                t, boost = mb.group(1), float(mb.group(2))
        node = _leaf(t, default_field, dv_cols)
        if boost is not None:
            node = {"bool": {"must": [node], "boost": boost}}
        return prefix, maybe_boost(node)

    def parse_expr() -> dict:
        prefixes: list[str] = []
        clauses: list[dict] = []
        ops: list[str] = []
        p, c = parse_unary()
        prefixes.append(p)
        clauses.append(c)
        while peek() is not None and peek() != ")":
            t = peek()
            if t in ("OR", "||"):
                take()
                ops.append("OR")
            elif t in ("AND", "&&"):
                take()
                ops.append("AND")
            else:
                ops.append(default_operator)
            p, c = parse_unary()
            prefixes.append(p)
            clauses.append(c)
        explicit = any(
            o != default_operator for o in ops
        ) or default_operator == "AND"
        if not explicit and any(prefixes):
            # classic flat Lucene +/-: required / excluded / optional
            must = [c for p, c in zip(prefixes, clauses) if p == "+"]
            nots = [c for p, c in zip(prefixes, clauses) if p == "-"]
            bare = [c for p, c in zip(prefixes, clauses) if not p]
            b: dict = {}
            if must:
                b["must"] = must
            if nots:
                b["must_not"] = nots
            if bare:
                b["should"] = bare
                if not must:
                    b["minimum_should_match"] = 1
            return {"bool": b}
        # explicit-operator shape: '+x' -> x, '-x' -> NOT x, then
        # fold with AND binding tighter than OR. Lucene treats
        # prohibited clauses as conjunctive exclusions no matter what
        # operator links them ('a AND b -c' excludes c from the
        # conjunction), so a '-' clause always joins its neighbor's
        # AND group.
        folded = [
            {"bool": {"must_not": [c]}} if p == "-" else c
            for p, c in zip(prefixes, clauses)
        ]
        groups: list[list[dict]] = [[folded[0]]]
        for op, (p, c) in zip(ops, zip(prefixes[1:], folded[1:])):
            if op == "AND" or p == "-":
                groups[-1].append(c)
            else:
                groups.append([c])
        ors = [
            g[0] if len(g) == 1 else {"bool": {"must": g}}
            for g in groups
        ]
        if len(ors) == 1:
            return ors[0]
        return {"bool": {"should": ors, "minimum_should_match": 1}}

    if not toks:
        return {"match_all": {}}
    out = parse_expr()
    if pos != len(toks):
        raise ValueError("query_string: unbalanced ')'")
    return out
