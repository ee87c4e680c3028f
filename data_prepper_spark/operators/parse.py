"""Parse-family processor analogs: grok, key_value, csv, json, date,
dissect, detect_format (SURVEY.md §2.4).

All are native Catalyst expressions (regexp_extract / str_to_map /
from_csv / from_json / to_timestamp) — the reference interprets these
per event in Java (GrokProcessor.java:63, KeyValueProcessor.java:43,
CsvProcessor.java:44, ParseJsonProcessor.java:30, DateProcessor.java:40,
DissectProcessor.java:33, DetectFormatProcessor.java:24).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A small built-in grok pattern library (the reference bundles
# grok-patterns/patterns; we include the ones its perf/e2e suites use)
GROK_PATTERNS = {
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "USER": r"[a-zA-Z0-9._-]+",
    "WORD": r"\w+",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "NOTSPACE": r"\S+",
    "GREEDYDATA": r".*",
}

_GROK_REF = re.compile(r"%\{(\w+):(\w+)\}")


def compile_grok(pattern: str) -> tuple[str, list[str]]:
    """Expand %{SYNTAX:name} refs into a regex with numbered groups;
    returns (regex, field names in group order)."""
    names: list[str] = []

    def sub(m):
        syntax, name = m.group(1), m.group(2)
        names.append(name)
        return "(" + GROK_PATTERNS[syntax] + ")"

    return _GROK_REF.sub(sub, pattern), names


def grok(
    df: DataFrame,
    source: str,
    pattern: str | list[str],
    tags_on_match_failure: list[str] | None = None,
) -> DataFrame:
    """grok: named-capture extraction into top-level columns.

    A list of patterns is tried in order with break_on_match semantics
    (first matching pattern populates its fields; later patterns only
    apply to rows no earlier pattern matched — GrokProcessor.java:63).
    Rows matching no pattern get tags_on_match_failure."""
    patterns = [pattern] if isinstance(pattern, str) else pattern
    compiled = [compile_grok(p) for p in patterns]
    matched_prev = F.lit(False)
    field_exprs: dict[str, object] = {}
    for regex, names in compiled:
        m = F.col(source).rlike(regex) & ~matched_prev
        for i, name in enumerate(names, start=1):
            ext = F.regexp_extract(F.col(source), regex, i)
            prev = field_exprs.get(name, F.lit(None).cast("string"))
            field_exprs[name] = F.when(m, ext).otherwise(prev)
        matched_prev = matched_prev | F.col(source).rlike(regex)
    df = df.withColumns(field_exprs)
    if tags_on_match_failure:
        from .mutate import TAGS_COL, ensure_tags

        df = ensure_tags(df)
        df = df.withColumn(
            TAGS_COL,
            F.when(
                ~matched_prev,
                F.array_union(
                    F.col(TAGS_COL),
                    F.array(*[F.lit(t) for t in tags_on_match_failure]),
                ),
            ).otherwise(F.col(TAGS_COL)),
        )
    return df


# the 11-processor reference perf pipeline starts with this pattern
# (docs/latest_performance_test_results.md:117-191)
COMMON_APACHE_LOG = (
    "%{IP:clientip} %{USER:ident} %{USER:auth} \\[%{HTTPDATE:timestamp}\\] "
    '"%{WORD:verb} %{NOTSPACE:request} %{NOTSPACE:httpversion}" '
    "%{INT:response} %{INT:bytes}"
)


def key_value(
    df: DataFrame,
    source: str,
    dest: str = "parsed",
    field_split: str = "&",
    value_split: str = "=",
) -> DataFrame:
    """key_value: string -> map<string,string> (KeyValueProcessor)."""
    return df.withColumn(
        dest, F.str_to_map(F.col(source), F.lit(field_split), F.lit(value_split))
    )


def csv_parse(
    df: DataFrame,
    source: str,
    schema: str,
    dest: str = "parsed",
    delimiter: str = ",",
    quote: str = '"',
) -> DataFrame:
    return df.withColumn(
        dest,
        F.from_csv(
            F.col(source), schema, {"sep": delimiter, "quote": quote}
        ),
    )


def parse_json(df: DataFrame, source: str, schema: str, dest: str = "parsed") -> DataFrame:
    return df.withColumn(dest, F.from_json(F.col(source), schema))


def parse_xml(df: DataFrame, source: str, schema: str, dest: str = "parsed") -> DataFrame:
    """parse_xml (ParseXmlProcessor.java:24) — native from_xml."""
    return df.withColumn(dest, F.from_xml(F.col(source), schema))


def date_parse(
    df: DataFrame,
    source: str,
    patterns: list[str],
    dest: str = "@timestamp",
) -> DataFrame:
    """date: first-matching pattern wins (DateProcessor match.patterns,
    DateProcessorConfig.java:61-68). Special patterns epoch_second /
    epoch_milli accept numeric strings."""
    attempts = []
    for p in patterns:
        if p == "epoch_second":
            attempts.append(F.timestamp_seconds(F.col(source).cast("long")))
        elif p == "epoch_milli":
            attempts.append(F.timestamp_millis(F.col(source).cast("long")))
        else:
            attempts.append(F.try_to_timestamp(F.col(source), F.lit(p)))
    return df.withColumn(dest, F.coalesce(*attempts))


def dissect(df: DataFrame, source: str, pattern: str) -> DataFrame:
    """dissect: positional %{field}sep%{field} tokenization compiled to
    one anchored regex (DissectProcessor.java:33)."""
    regex_parts: list[str] = []
    names: list[str] = []
    pos = 0
    for m in re.finditer(r"%\{(\w*)\}", pattern):
        sep = re.escape(pattern[pos : m.start()])
        regex_parts.append(sep)
        name = m.group(1)
        if name:
            names.append(name)
            regex_parts.append("(.*?)" if m.end() < len(pattern) else "(.*)")
        else:
            regex_parts.append(".*?")
        pos = m.end()
    # prefix-match semantics: anchor the end only when the pattern ends
    # with a field (which then captures the rest of the line)
    trailing = pattern[pos:]
    regex_parts.append(re.escape(trailing))
    regex = "^" + "".join(regex_parts) + ("$" if not trailing else "")
    for i, name in enumerate(names, start=1):
        df = df.withColumn(name, F.regexp_extract(F.col(source), regex, i))
    return df


def detect_format(df: DataFrame, source: str, dest: str = "detected_format") -> DataFrame:
    """detect_format: sniff json/xml/csv/kv from leading chars +
    delimiter counts (DetectFormatProcessor.java:24)."""
    c = F.trim(F.col(source))
    return df.withColumn(
        dest,
        F.when(c.startswith("{") | c.startswith("["), "json")
        .when(c.startswith("<"), "xml")
        .when(c.contains("=") & c.contains("&"), "keyvalue")
        .when(c.contains(","), "csv")
        .otherwise("unknown"),
    )
