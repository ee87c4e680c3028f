"""Lookup-join processors: translate, geoip-style range lookup
(SURVEY.md §2.6 — the reference has no general join; its joins are all
broadcast-style lookups: TranslateProcessor.java:41,
GeoIPProcessor.java:43, S3EnrichProcessor.java:52)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def translate(
    df: DataFrame,
    source: str,
    target: str,
    mappings: dict[str, str],
    default: str | None = None,
) -> DataFrame:
    """translate with an inline map: value -> value, default on miss.
    Compiled to element_at on a map literal (constant-folded, no join)."""
    pairs = [x for kv in mappings.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    m = F.create_map(*pairs)
    out = F.element_at(m, F.col(source).cast("string"))
    if default is not None:
        out = F.coalesce(out, F.lit(default))
    return df.withColumn(target, out)


def translate_table(
    df: DataFrame,
    source: str,
    target: str,
    lookup: DataFrame,
    lookup_key: str,
    lookup_value: str,
    default: str | None = None,
) -> DataFrame:
    """translate with a mappings table (file/S3 in the reference) —
    broadcast left join."""
    lk = lookup.select(
        F.col(lookup_key).alias(source), F.col(lookup_value).alias(target)
    )
    out = df.join(broadcast(lk), source, "left")
    if default is not None:
        out = out.withColumn(target, F.coalesce(F.col(target), F.lit(default)))
    return out


def translate_regex(
    df: DataFrame,
    source: str,
    target: str,
    regex_mappings: list[tuple[str, str]],
    default: str | None = None,
) -> DataFrame:
    """translate regex rows -> first-match-wins when-chain."""
    expr = None
    for pat, val in regex_mappings:
        cond = F.col(source).rlike(pat)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    expr = expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
    return df.withColumn(target, expr)


def range_lookup(
    df: DataFrame,
    key: str,
    ranges: DataFrame,
    start: str,
    end: str,
    value_cols: list[str],
) -> DataFrame:
    """geoip-style interval lookup: broadcast non-equi join on
    start <= key < end. The ranges side must be small (the reference
    broadcasts the whole MaxMind db to every node)."""
    cond = (F.col(key) >= ranges[start]) & (F.col(key) < ranges[end])
    return df.join(broadcast(ranges.select(start, end, *value_cols)), cond, "left").drop(
        start, end
    )
