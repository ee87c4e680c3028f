"""Data Prepper expression language -> Spark SQL translator.

The reference evaluates route conditions and `*_when` gates per event
through an ANTLR grammar + tree walk
(data-prepper-expression/src/main/antlr/DataPrepperExpression.g4,
GenericExpressionEvaluator.java:22-56). Here the same surface compiles
to a Catalyst expression once per query — evaluated vectorized, not
per event (SURVEY.md §2.7 maps every construct).

Supported: and/or/not, ==/!=, </<=/>/>=, =~ / !~ (regex), in {a,b} /
not in {...}, arithmetic + - * / %, JsonPointer operands (/a/b ->
nested column a.b), null literal, and the function library
(length, contains, startsWith, substringBefore/After[Last], join,
formatDateTime, now, generateUuid, hasTags, getMetadata, toJsonString,
cidrContains). `typeof` over declared columns is schema-static in
Spark; `dp_typeof` below is the runtime variant for dynamic JSON
payloads (VARIANT schema_of_variant).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_FN_MAP = {
    "length": "length",
    "contains": "contains",
    "startsWith": "startswith",
    "join": "array_join",
    "formatDateTime": "date_format",
    "now": "current_timestamp",
    "generateUuid": "uuid",
    "toJsonString": "to_json",
}

_PTR = re.compile(r'(?<![\w"])/([A-Za-z_][\w]*(?:/[\w]+)*)')


def _ptr_to_col(path: str) -> str:
    """JsonPointer path -> Spark column reference. Numeric segments are
    array indexes (0-based in both JsonPointer and Spark SQL []):
    logs/2/flag -> logs[2].flag."""
    out = []
    for seg in path.split("/"):
        if seg.isdigit():
            out.append(f"[{seg}]")
        else:
            out.append(("." if out else "") + seg)
    return "".join(out)


_IN_SET = re.compile(r"\b(not\s+in|in)\s*\{([^}]*)\}", re.IGNORECASE)
_REGEX_OP = re.compile(r"(=~|!~)")


def _replace_fn_calls(s: str, name: str, build) -> str:
    """Replace every `name(arg1, arg2, ...)` call in s, matching
    balanced parentheses and splitting args at TOP-LEVEL commas only
    (quotes respected) — so nested calls like
    substringBefore(substringAfter(/a, "x"), "y") translate correctly.
    Innermost calls are rewritten first (recursion on the argument
    text). `build(args: list[str]) -> str` emits the replacement."""
    out = []
    i, n = 0, len(s)
    pat = re.compile(r"\b" + name + r"\(")
    while True:
        m = pat.search(s, i)
        if not m:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i : m.start()])
        j = m.end()
        depth = 1
        args, cur = [], []
        quote = None
        while j < n and depth:
            ch = s[j]
            if quote:
                cur.append(ch)
                if ch == quote and s[j - 1] != "\\":
                    quote = None
            elif ch in "\"'":
                quote = ch
                cur.append(ch)
            elif ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                if depth:
                    cur.append(ch)
            elif ch == "," and depth == 1:
                args.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            j += 1
        args.append("".join(cur))
        # rewrite nested calls inside each argument first
        args = [_replace_fn_calls(a, name, build).strip() for a in args]
        out.append(build(args))
        i = j


def translate_expr(expr: str) -> str:
    """Data Prepper expression string -> Spark SQL string."""
    s = expr

    # substringBefore/After[Last] family -> substring_index, with the
    # reference's delimiter-absent contract (indexOf == -1 -> full
    # source; substring_index already behaves that way for Before /
    # AfterLast, the other two get an explicit CASE guard). Balanced-
    # paren matching so nested calls translate correctly.
    s = _replace_fn_calls(
        s, "substringBefore", lambda a: f"substring_index({a[0]},{a[1]}, 1)"
    )
    s = _replace_fn_calls(
        s, "substringAfterLast",
        lambda a: f"substring_index({a[0]},{a[1]}, -1)",
    )
    s = _replace_fn_calls(
        s, "substringAfter",
        lambda a: (
            f"CASE WHEN instr({a[0]},{a[1]}) = 0 THEN {a[0]} ELSE "
            f"substr({a[0]}, length(substring_index({a[0]},{a[1]}, 1))"
            f" + length({a[1]}) + 1) END"
        ),
    )
    s = _replace_fn_calls(
        s, "substringBeforeLast",
        lambda a: (
            f"CASE WHEN instr({a[0]},{a[1]}) = 0 THEN {a[0]} ELSE "
            f"substr({a[0]}, 1, length({a[0]})"
            f" - length(substring_index({a[0]},{a[1]}, -1))"
            f" - length({a[1]})) END"
        ),
    )
    # hasTags("a", "b", ...) -> event has ALL the tags (reference
    # HasTagsExpressionFunction): AND-chain of array_contains
    def _has_tags(m):
        args = [a.strip() for a in m.group(1).split(",")]
        return "(" + " AND ".join(
            f"array_contains(_tags, {a})" for a in args
        ) + ")"

    s = re.sub(r"\bhasTags\(([^)]+)\)", _has_tags, s)
    # getEventType() -> the _event_type metadata column (reference
    # GetEventTypeExpressionFunction reads JacksonEvent's EventType;
    # sources set the column via mutate.ensure_event_type, and rows
    # without one are plain "EVENT")
    s = re.sub(
        r"\bgetEventType\(\s*\)",
        "coalesce(_event_type, 'EVENT')",
        s,
    )
    # getMetadata("/attr") -> metadata column _meta_attr
    s = re.sub(
        r'\bgetMetadata\("/?([\w/]+)"\)',
        lambda m: "_meta_" + m.group(1).replace("/", "_"),
        s,
    )
    # cidrContains(/ip, "10.0.0.0/8") — inline bit math on IPv4
    def _cidr(m):
        col, cidr = m.group(1), m.group(2)
        net, bits = cidr.split("/")
        return (
            f"(cast(split({col}, '\\\\.')[0] as bigint) * 16777216 + "
            f"cast(split({col}, '\\\\.')[1] as bigint) * 65536 + "
            f"cast(split({col}, '\\\\.')[2] as bigint) * 256 + "
            f"cast(split({col}, '\\\\.')[3] as bigint)) div "
            f"{2 ** (32 - int(bits))} = "
            f"{_ipv4_int(net) // (2 ** (32 - int(bits)))}"
        )

    s = re.sub(r'\bcidrContains\(([^,]+),\s*"([^"]+)"\)', _cidr, s)

    # simple function renames
    for dp, sql in _FN_MAP.items():
        if dp != sql:
            s = re.sub(rf"\b{dp}\s*\(", sql + "(", s)

    # null comparisons: the reference's ==/!= against the null literal
    # is an existence test (GenericEqualOperator), NOT SQL three-valued
    # logic — `/x != null` must become IS NOT NULL (plain `!= null`
    # evaluates to NULL and never passes a filter)
    s = re.sub(r"(\S+)\s*!=\s*null\b", r"\1 IS NOT NULL", s)
    s = re.sub(r"(\S+)\s*==\s*null\b", r"\1 IS NULL", s)
    s = re.sub(r"\bnull\s*!=\s*(\S+)", r"\1 IS NOT NULL", s)
    s = re.sub(r"\bnull\s*==\s*(\S+)", r"\1 IS NULL", s)

    # in {a, b} / not in {a, b} -> IN (a, b)
    s = _IN_SET.sub(lambda m: f"{m.group(1)} ({m.group(2)})", s)
    # =~ / !~ -> RLIKE
    s = re.sub(r"([^\s]+|\([^)]*\))\s*=~\s*", r"\1 RLIKE ", s)
    s = re.sub(r"([^\s]+|\([^)]*\))\s*!~\s*", r"\1 NOT RLIKE ", s)
    # JsonPointer /a/b -> a.b, numeric segments -> [i]. Applied only
    # OUTSIDE double-quoted string literals, so regex/string literals
    # containing slashes ("^/path/.*") survive untouched.
    parts = re.split(r'("(?:[^"\\]|\\.)*")', s)
    s = "".join(
        p if p.startswith('"') else _PTR.sub(
            lambda m: _ptr_to_col(m.group(1)), p
        )
        for p in parts
    )
    # double-quoted literals -> single-quoted SQL strings
    s = re.sub(r'"((?:[^"\\]|\\.)*)"', lambda m: "'" + m.group(1) + "'", s)
    return s


def _ipv4_int(ip: str) -> int:
    a, b, c, d = (int(x) for x in ip.split("."))
    return a * 16777216 + b * 65536 + c * 256 + d


def dp_expr(expr: str) -> Column:
    """Compile a Data Prepper expression to a Spark Column."""
    return F.expr(translate_expr(expr))


def dp_typeof(json_col, pointer: str | None = None) -> Column:
    """Runtime `typeof` over a JSON-string payload column — the one
    expression operator that is schema-static on declared columns but
    data-dependent on dynamic payloads (reference
    GenericTypeOfOperator / DataPrepperExpression.g4:93-95;
    DataType.java:25-76 names). Uses Spark 4 VARIANT: per-row
    schema_of_variant, mapped to Data Prepper type names; BIGINT splits
    into integer/long on the int32 boundary the way Jackson does."""
    v = F.try_parse_json(F.col(json_col) if isinstance(json_col, str) else json_col)
    if pointer:
        path = "$." + pointer.strip("/").replace("/", ".")
        v = F.try_variant_get(v, path, "variant")
    sch = F.schema_of_variant(v)
    as_long = F.try_variant_get(v, "$", "long")
    int32 = as_long.between(-(1 << 31), (1 << 31) - 1)
    return (
        F.when(v.isNull() | (sch == "VOID"), "null")
        .when(sch == "STRING", "string")
        .when(sch == "BOOLEAN", "boolean")
        .when(sch == "BIGINT", F.when(int32, "integer").otherwise("long"))
        .when(sch.startswith("DECIMAL") | (sch == "DOUBLE") | (sch == "FLOAT"), "double")
        .when(sch.startswith("OBJECT"), "map")
        .when(sch.startswith("ARRAY"), "array")
        .otherwise("unknown")
    )
