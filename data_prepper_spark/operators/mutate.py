"""Mutate-event / mutate-string processor analogs — pure projections.

Reference plugins (SURVEY.md §2.4): mutate-event-processors/
(AddEntryProcessor.java:39, CopyValueProcessor.java:29,
RenameKeyProcessor.java:29, DeleteEntryProcessor.java:33,
SelectEntriesProcessor.java:26, ConvertEntryTypeProcessor.java:40,
ListToMapProcessor.java:29, MapToListProcessor.java:33), mutate-string-
processors/ (SplitString/SubstituteString/ReplaceString/Uppercase/
Lowercase/Trim), truncate-processor, obfuscate-processor,
flatten-processor, write-json-processor, split-event-processor.

Every function takes and returns a DataFrame; `*_when` gates become
F.when(cond, new).otherwise(old) so unmatched rows pass through
unchanged, matching the reference's per-event conditional semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .expression import dp_expr

TAGS_COL = "_tags"


def ensure_tags(df: DataFrame) -> DataFrame:
    """Materialize the EventMetadata tag set as an array<string> column
    (reference DefaultEventMetadata.java:33-45)."""
    if TAGS_COL in df.columns:
        return df
    return df.withColumn(TAGS_COL, F.array().cast("array<string>"))


def add_tags(df: DataFrame, tags: list[str], when: str | None = None) -> DataFrame:
    df = ensure_tags(df)
    new = F.array_union(F.col(TAGS_COL), F.array(*[F.lit(t) for t in tags]))
    if when is None:
        return df.withColumn(TAGS_COL, new)
    return df.withColumn(
        TAGS_COL, F.when(dp_expr(when), new).otherwise(F.col(TAGS_COL))
    )


def add_entries(df: DataFrame, entries: list[dict]) -> DataFrame:
    """add_entries: each entry has `key` plus one of `value` (literal),
    `format` ("${col}-suffix" template), `value_expression`; optional
    `add_when`, `overwrite_if_key_exists` (default True here)."""
    for e in entries:
        key = e["key"]
        if "value" in e:
            new = F.lit(e["value"])
        elif "format" in e:
            new = _format_string(e["format"])
        else:
            new = dp_expr(e["value_expression"])
        if not e.get("overwrite_if_key_exists", True) and key in df.columns:
            new = F.coalesce(F.col(key), new)
        when = e.get("add_when")
        if when is not None:
            old = F.col(key) if key in df.columns else F.lit(None)
            new = F.when(dp_expr(when), new).otherwise(old)
        df = df.withColumn(key, new)
    return df


def _format_string(fmt: str) -> Column:
    """Event formatString "${/key}" templates (reference
    JacksonEvent.java:520-539) -> concat of literals and columns."""
    import re

    parts: list[Column] = []
    pos = 0
    for m in re.finditer(r"\$\{/?([\w/]+)\}", fmt):
        if m.start() > pos:
            parts.append(F.lit(fmt[pos : m.start()]))
        parts.append(F.col(m.group(1).replace("/", ".")).cast("string"))
        pos = m.end()
    if pos < len(fmt):
        parts.append(F.lit(fmt[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def copy_values(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    for src, dst in pairs:
        df = df.withColumn(dst, F.col(src))
    return df


def rename_keys(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    return df.withColumnsRenamed(mapping)


def delete_entries(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.drop(*keys)


def select_entries(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.select(*keys)


def convert_type(
    df: DataFrame,
    key: str,
    target: str,
    scale: int | None = None,
    tags_on_failure: list[str] | None = None,
) -> DataFrame:
    """convert_type: cast with failure tagging (ConvertEntryTypeProcessor
    TargetType.java:23 — integer/long/double/big_decimal/string/boolean).
    A value that fails to cast becomes NULL and the row gets the failure
    tags, mirroring tags_on_failure."""
    t = {"integer": "int", "big_decimal": f"decimal(38,{scale or 18})"}.get(
        target, target
    )
    # try_cast: malformed values become NULL (+ tags) instead of failing
    # the task under ANSI mode — the reference tags and keeps the event
    casted = F.col(key).try_cast(t)
    if tags_on_failure:
        df = ensure_tags(df)
        fail = F.col(key).isNotNull() & casted.isNull()
        df = df.withColumn(
            TAGS_COL,
            F.when(
                fail,
                F.array_union(
                    F.col(TAGS_COL), F.array(*[F.lit(x) for x in tags_on_failure])
                ),
            ).otherwise(F.col(TAGS_COL)),
        )
    return df.withColumn(key, casted)


# ---- string mutations (with_keys semantics: apply to each listed key) --


def _per_key(df: DataFrame, keys: list[str], fn) -> DataFrame:
    return df.withColumns({k: fn(F.col(k)) for k in keys})


def uppercase_string(df: DataFrame, with_keys: list[str]) -> DataFrame:
    return _per_key(df, with_keys, F.upper)


def lowercase_string(df: DataFrame, with_keys: list[str]) -> DataFrame:
    return _per_key(df, with_keys, F.lower)


def trim_string(df: DataFrame, with_keys: list[str]) -> DataFrame:
    return _per_key(df, with_keys, F.trim)


def split_string(df: DataFrame, key: str, delimiter: str) -> DataFrame:
    """split_string: field -> array in place (regex delimiter)."""
    return df.withColumn(key, F.split(F.col(key), delimiter))


def substitute_string(df: DataFrame, key: str, frm: str, to: str) -> DataFrame:
    return df.withColumn(key, F.regexp_replace(F.col(key), frm, to))


def replace_string(df: DataFrame, key: str, frm: str, to: str) -> DataFrame:
    """Literal (non-regex) replace."""
    return df.withColumn(key, F.replace(F.col(key), F.lit(frm), F.lit(to)))


def truncate(
    df: DataFrame, key: str, start_at: int = 0, length: int | None = None
) -> DataFrame:
    n = F.lit(length) if length is not None else F.length(F.col(key))
    return df.withColumn(key, F.substring(F.col(key), start_at + 1, n))


def obfuscate(
    df: DataFrame,
    key: str,
    action: str = "mask",
    pattern: str | None = None,
    salt: str = "",
    bits: int = 512,
) -> DataFrame:
    """obfuscate: mask (***) or one-way salted hash
    (ObfuscationProcessor.java:34, MaskAction.java:16,
    OneWayHashAction.java:28 — the reference uses SHA-512; `bits`
    selects the SHA-2 width)."""
    c = F.col(key)
    if action == "mask":
        new = (
            F.regexp_replace(c, pattern, "***") if pattern else F.lit("***")
        )
    elif action == "hash":
        new = F.sha2(F.concat(c.cast("string"), F.lit(salt)), bits)
    else:
        raise ValueError(action)
    return df.withColumn(key, new)


def write_json(df: DataFrame, key: str, dest: str) -> DataFrame:
    return df.withColumn(dest, F.to_json(F.col(key)))


def flatten(df: DataFrame, key: str, prefix: str = "") -> DataFrame:
    """flatten: promote struct fields to top level dotted-ish columns
    (FlattenProcessor.java:28)."""
    fields = [f.name for f in df.schema[key].dataType.fields]
    cols = [c for c in df.columns if c != key]
    return df.select(
        *cols,
        *[F.col(f"{key}.{f}").alias(f"{prefix}{f}") for f in fields],
    )


def wrap_entries(df: DataFrame, keys: list[str], wrapper: str) -> DataFrame:
    """wrap_entries: nest selected keys under a struct."""
    rest = [c for c in df.columns if c not in keys]
    return df.select(*rest, F.struct(*keys).alias(wrapper))


def list_to_map(
    df: DataFrame, source: str, key_field: str, value_field: str, dest: str
) -> DataFrame:
    """list-of-structs -> map keyed by a field (ListToMapProcessor)."""
    return df.withColumn(
        dest,
        F.map_from_entries(
            F.transform(
                F.col(source),
                lambda x: F.struct(
                    x[key_field].alias("key"), x[value_field].alias("value")
                ),
            )
        ),
    )


def map_to_list(df: DataFrame, source: str, dest: str) -> DataFrame:
    """map -> list of {key, value} structs (MapToListProcessor)."""
    return df.withColumn(dest, F.map_entries(F.col(source)))


def filter_list(
    df: DataFrame, source: str, dest: str, condition
) -> DataFrame:
    """filter_list (FilterListProcessor.java:35): keep elements of a
    list-of-structs matching a per-element condition. `condition` is a
    lambda Column -> Column (e.g. lambda x: x["status"] == "ok")."""
    return df.withColumn(dest, F.filter(F.col(source), condition))


def split_event(df: DataFrame, key: str, delimiter_regex: str) -> DataFrame:
    """1->N: one row per split part, other columns cloned
    (SplitEventProcessor.java:33 clones metadata/handle per child)."""
    rest = [c for c in df.columns if c != key]
    return df.select(
        *rest, F.explode(F.split(F.col(key), delimiter_regex)).alias(key)
    )
