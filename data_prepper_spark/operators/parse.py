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

import pandas as pd  # module-level: pandas_udf resolves the PEP-563
# string annotations of decorated functions from these globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Built-in grok pattern library, mirroring the classic Logstash/Data
# Prepper base set the reference bundles (grok-patterns/patterns;
# GrokProcessor.java:63 loads it by default). Patterns are standard
# public grok definitions, adapted where the originals rely on
# lookbehind/atomic groups so they stay valid Java regex; every
# internal group is NON-capturing so compile_grok's numbered capture
# groups stay aligned with %{X:name} order. `%{NAME}` (no capture) and
# nested pattern refs are supported.
GROK_PATTERNS = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"(?:%{EMAILADDRESS}|%{USER})",
    "INT": r"[+-]?[0-9]+",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "POSINT": r"[1-9][0-9]*",
    "NONNEGINT": r"[0-9]+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"])*\"|'(?:\\.|[^\\'])*')",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    # network
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    ),
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|%{IPV4})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"
    ),
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    # URI
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+\-.]+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # dates/times
    "MONTH": (
        r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?"
        r"|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?"
        r"|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?"
        r"|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    # logging
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE"
        r"|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?"
        r"|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?"
        r"|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?"
        r"|[Ee]merg(?:ency)?)"
    ),
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    # composites
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": (
        r"%{COMMONAPACHELOG} %{QUOTEDSTRING:referrer} %{QUOTEDSTRING:agent}"
    ),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w\[\]@.-]+))?\}")
_MAX_GROK_DEPTH = 20


def load_grok_patterns(paths: str | list[str]) -> int:
    """Merge user pattern files into the library (reference
    GrokProcessorConfig `patterns_directories` / `patterns_files_glob`):
    classic grok file format — `NAME regex` per line, '#' comments.
    Later files win on name clashes. Returns patterns loaded."""
    import glob as _glob

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        files.extend(sorted(_glob.glob(p)) if any(c in p for c in "*?[") else [p])
    n = 0
    for fpath in files:
        with open(fpath) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                name, _, rx = line.partition(" ")
                if name and rx:
                    GROK_PATTERNS[name] = rx.strip()
                    n += 1
    return n


def load_builtin_pattern_sets(*sets: str) -> int:
    """Load bundled ecosystem pattern files into the library
    (grok_pattern_sets/<name>.grok — the Logstash-ecosystem sets the
    reference's grok plugin can consume as extra pattern dirs,
    GrokProcessorConfig `patterns_directories`). Available: extras,
    java, haproxy, postgresql, nagios, aws, exim, mongodb, rails,
    bro. The `extras` set (date/tz
    helpers several others reference) always loads first. Returns the
    number of patterns loaded."""
    import os as _os

    base = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "grok_pattern_sets",
    )
    names = ["extras"] + [s for s in sets if s != "extras"]
    paths = []
    for s in names:
        p = _os.path.join(base, f"{s}.grok")
        if not _os.path.exists(p):
            raise KeyError(f"unknown bundled grok pattern set {s!r}")
        paths.append(p)
    return load_grok_patterns(paths)


def compile_grok(
    pattern: str, capture_unnamed: bool = False
) -> tuple[str, list[str], list[int]]:
    """Expand %{SYNTAX:name} / %{SYNTAX} refs (recursively — library
    entries may reference other patterns) into a regex. Returns
    (regex, names, group_idx) where group_idx[i] is the CAPTURE-GROUP
    NUMBER of names[i] in the expanded regex — tracked by counting
    left parens in left-to-right order (outer named refs open their
    group before any nested refs, and raw `(...)` groups inside
    pattern bodies are counted too), so nested named refs like
    %{SYSLOGPROG:prog} (whose body contains %{PROG:program} and
    %{POSINT:pid}) assign every capture to the right group.

    capture_unnamed=True captures unnamed refs under their syntax name
    (reference GrokProcessorConfig named_captures_only=false)."""
    names: list[str] = []
    gidx: list[int] = []
    counter = 0

    def count_raw_groups(text: str) -> None:
        # raw capturing '(' in literal regex text shift group numbers:
        # skip escapes, char classes, and '(?' constructs — EXCEPT
        # Java named groups '(?<name>...)', which DO consume a group
        # number (ADVICE r03: treating them as non-capturing silently
        # shifted every later capture index). A named group is also
        # surfaced as a capture (the reference's Java grok emits
        # inline named groups); '(?<=' / '(?<!' lookbehinds stay
        # non-capturing.
        nonlocal counter
        i, in_class = 0, False
        while i < len(text):
            ch = text[i]
            if ch == "\\":
                i += 2
                continue
            if in_class:
                if ch == "]":
                    in_class = False
            elif ch == "[":
                in_class = True
            elif ch == "(":
                if text[i + 1 : i + 2] != "?":
                    counter += 1
                elif (
                    text[i + 2 : i + 3] == "<"
                    and text[i + 3 : i + 4] not in ("=", "!", "")
                ):
                    counter += 1
                    end = text.find(">", i + 3)
                    if end != -1:
                        names.append(text[i + 3 : end])
                        gidx.append(counter)
            i += 1

    def expand(p: str, depth: int) -> str:
        nonlocal counter
        if depth > _MAX_GROK_DEPTH:
            raise ValueError("grok pattern recursion too deep")
        out: list[str] = []
        pos = 0
        for m in _GROK_REF.finditer(p):
            lit = p[pos : m.start()]
            count_raw_groups(lit)
            out.append(lit)
            syntax, name = m.group(1), m.group(2)
            if syntax not in GROK_PATTERNS:
                raise KeyError(f"unknown grok pattern %{{{syntax}}}")
            if name is None and capture_unnamed:
                name = syntax
            if name:
                counter += 1
                names.append(name)
                gidx.append(counter)
                out.append("(")
                out.append(expand(GROK_PATTERNS[syntax], depth + 1))
                out.append(")")
            else:
                out.append("(?:")
                out.append(expand(GROK_PATTERNS[syntax], depth + 1))
                out.append(")")
            pos = m.end()
        tail = p[pos:]
        count_raw_groups(tail)
        out.append(tail)
        return "".join(out)

    return expand(pattern, 0), names, gidx


# separator between captured groups in the single-pass extraction; two
# control chars never seen adjacent in log/code text
_GROK_SEP = "\x01\x02"


def _grok_match_udf(regex_src: str, gidx: list, timeout_s: float):
    """Arrow-batched match with a REAL per-match budget (the
    reference's match_timeout_ms, GrokProcessor.java runWithTimeout):
    the `regex` module enforces a deadline inside the engine, which
    Catalyst's rlike cannot. Emits the same (matched, parts) shape as
    the fast path plus a timed-out flag. Java grok syntax — (?<name>)
    groups, possessive quantifiers — compiles under `regex` as-is."""
    @F.pandas_udf("m boolean, t boolean, p array<string>")
    def fn(s: pd.Series) -> pd.DataFrame:
        import regex as _rx

        rx = _rx.compile(regex_src)
        ms, ts, ps = [], [], []
        for v in s:
            if v is None:
                ms.append(False), ts.append(False), ps.append(None)
                continue
            try:
                m = rx.search(v, timeout=timeout_s)
            except TimeoutError:
                ms.append(False), ts.append(True), ps.append(None)
                continue
            if m is None:
                ms.append(False), ts.append(False), ps.append(None)
            else:
                ms.append(True), ts.append(False)
                # non-participating group -> "" (regexp_replace parity)
                ps.append([m.group(g) or "" for g in gidx])
        return pd.DataFrame({"m": ms, "t": ts, "p": ps})

    return fn


def grok(
    df: DataFrame,
    source: str,
    pattern: str | list[str],
    tags_on_match_failure: list[str] | None = None,
    keys_to_overwrite: list[str] | None = None,
    target_key: str | None = None,
    tags_on_timeout: list[str] | None = None,
    named_captures_only: bool = True,
    match_timeout_ms: int | None = None,
) -> DataFrame:
    """grok: named-capture extraction into top-level columns.

    A list of patterns is tried in order with break_on_match semantics
    (first matching pattern populates its fields; later patterns only
    apply to rows no earlier pattern matched — GrokProcessor.java:63).
    Rows matching no pattern get tags_on_match_failure. Captures whose
    name collides with an EXISTING column keep the existing non-null
    value unless listed in keys_to_overwrite (reference default).

    Each pattern costs exactly TWO regex evaluations per row (one
    rlike match test + one regexp_replace emitting every capture group
    in a single pass, split on a control-char separator) — not one
    evaluation per capture group.

    target_key nests the captures under one struct column instead of
    top-level columns (GrokProcessorConfig.target_key).
    named_captures_only=False also captures unnamed %{SYNTAX} refs
    under their syntax name (GrokProcessorConfig.named_captures_only).

    match_timeout_ms enables the reference's per-match budget
    (GrokProcessorConfig.match_timeout_ms, default 30000 there;
    default None HERE because the Catalyst fast path — which cannot
    time out but is JVM-vectorized — is the right default at scale;
    measured cost of the budget path: ~1.25x the fast path on 200k
    apache-log rows at local[8], so opting in for untrusted patterns
    is cheap).
    When set, matching runs through an Arrow-batched `regex`-module
    UDF with a hard deadline per match; rows that blow the budget
    get tags_on_timeout, no captures, and later patterns skipped
    (the reference aborts the whole match loop on timeout)."""
    patterns = [pattern] if isinstance(pattern, str) else pattern
    overwrite = set(keys_to_overwrite or [])
    compiled = [
        compile_grok(p, capture_unnamed=not named_captures_only)
        for p in patterns
    ]
    # one temp match column and one temp capture-parts column per
    # pattern: guarantees a single rlike + a single regexp_replace
    # evaluation each, shared by every capture below
    tmp: dict[str, object] = {}
    if match_timeout_ms:
        for j, (regex, names, gidx) in enumerate(compiled):
            st = _grok_match_udf(regex, gidx, match_timeout_ms / 1000.0)(
                F.col(source)
            )
            tmp[f"__grok_s{j}"] = st
        df = df.withColumns(tmp)
        tmp = {}
        for j in range(len(compiled)):
            st = F.col(f"__grok_s{j}")
            tmp[f"__grok_m{j}"] = st["m"]
            tmp[f"__grok_t{j}"] = st["t"]
            tmp[f"__grok_p{j}"] = st["p"]
    else:
        for j, (regex, names, gidx) in enumerate(compiled):
            tmp[f"__grok_m{j}"] = F.col(source).rlike(regex)
            if names:
                # anchor so regexp_replace rewrites the WHOLE string
                # once, emitting all groups of the first match (find()
                # semantics via the reluctant prefix); (?s:...) keeps
                # the wrappers newline-safe without changing the user
                # pattern's flags
                wrapped = "^(?s:.*?)(?:" + regex + ")(?s:.*)$"
                repl = _GROK_SEP.join("$" + str(g) for g in gidx)
                tmp[f"__grok_p{j}"] = F.split(
                    F.regexp_replace(F.col(source), wrapped, repl),
                    _GROK_SEP,
                    -1,
                )
    df = df.withColumns(tmp)
    matched_prev = F.lit(False)
    timed_any = F.lit(False)
    field_exprs: dict[str, object] = {}
    for j, (regex, names, gidx) in enumerate(compiled):
        m = F.col(f"__grok_m{j}") & ~matched_prev & ~timed_any
        # a name can appear in several alternation branches of one
        # pattern (e.g. NAGIOSLOGLINE's nagios_state): the branch that
        # participated is the non-empty capture — first non-empty wins.
        # Unique names keep the raw capture (empty string when the
        # group matched empty — established oracle-checked semantics).
        occs: dict[str, list[int]] = {}
        for i, name in enumerate(names):
            occs.setdefault(name, []).append(i)
        for name, idxs in occs.items():
            if len(idxs) == 1:
                ext = F.element_at(F.col(f"__grok_p{j}"), idxs[0] + 1)
            else:
                ext = F.coalesce(
                    *[
                        F.nullif(
                            F.element_at(F.col(f"__grok_p{j}"), i + 1),
                            F.lit(""),
                        )
                        for i in idxs
                    ]
                )
            if name in df.columns and name not in overwrite:
                ext = F.coalesce(F.col(name), ext)
            prev = field_exprs.get(name)
            if prev is None:
                prev = (
                    F.col(name)
                    if name in df.columns and not target_key
                    else F.lit(None).cast("string")
                )
            field_exprs[name] = F.when(m, ext).otherwise(prev)
        matched_prev = matched_prev | F.col(f"__grok_m{j}")
        if match_timeout_ms:
            timed_any = timed_any | F.col(f"__grok_t{j}")
    if target_key:
        df = df.withColumn(
            target_key,
            F.struct(*[e.alias(n) for n, e in field_exprs.items()]),
        )
    else:
        df = df.withColumns(field_exprs)
    if tags_on_match_failure or (tags_on_timeout and match_timeout_ms):
        from .mutate import TAGS_COL, ensure_tags

        df = ensure_tags(df)
        tags = F.col(TAGS_COL)
        if tags_on_match_failure:
            tags = F.when(
                ~matched_prev & ~timed_any,
                F.array_union(
                    tags,
                    F.array(*[F.lit(t) for t in tags_on_match_failure]),
                ),
            ).otherwise(tags)
        if tags_on_timeout and match_timeout_ms:
            tags = F.when(
                timed_any,
                F.array_union(
                    tags,
                    F.array(*[F.lit(t) for t in tags_on_timeout]),
                ),
            ).otherwise(tags)
        df = df.withColumn(TAGS_COL, tags)
    drops = [c for c in tmp]
    if match_timeout_ms:
        drops += [f"__grok_s{j}" for j in range(len(compiled))]
    return df.drop(*drops)


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
    field_delimiter_regex: str | None = None,
    key_value_delimiter_regex: str | None = None,
    include_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
    default_values: dict[str, str] | None = None,
    prefix: str = "",
    delete_key_regex: str | None = None,
    delete_value_regex: str | None = None,
    transform_key: str | None = None,
    whitespace: str = "lenient",
    drop_keys_with_no_value: bool = False,
    non_match_value: str | None = None,
    value_grouping: bool = False,
    remove_brackets: bool = False,
    string_literal_character: str | None = None,
) -> DataFrame:
    """key_value: string -> map<string,string> with the reference's
    option surface (KeyValueProcessor.java:43 / KeyValueProcessorConfig
    — field/value split chars or regex, value grouping via quotes and
    ()/[]/<> brackets, include/exclude keys, defaults, prefix,
    delete_key/value_regex, transform_key, whitespace strict|lenient,
    drop_keys_with_no_value, non_match_value, remove_brackets).

    Split + post-processing stay native Catalyst (str_to_map +
    transform_keys/values + map_filter) whenever value_grouping is off;
    grouping needs a quote/bracket-aware scanner, done in an
    Arrow-batched pandas UDF (the reference interprets the same loop
    per event in Java, KeyValueProcessor.parseWithValueGrouping).
    Typed-engine divergences (documented, not hidden): `recursive`
    mode is unsupported (nested maps need a fixed schema; flatten +
    prefix covers the common uses), and DUPLICATE keys keep the last
    value (map<string,string>) where the reference promotes them to a
    list — key_value_list() is the list-promotion twin
    (map<string,array<string>>)."""
    c = F.col(source)
    # no-value keys must be DROPPED before non_match_value fills them
    # in, or the drop is a no-op (keys with no value_split parse to
    # NULL values in both paths)
    if value_grouping or string_literal_character:
        parsed = _kv_grouped_udf(
            field_split,
            value_split,
            None if drop_keys_with_no_value else non_match_value,
            string_literal_character,
        )(c)
        if drop_keys_with_no_value:
            parsed = F.map_filter(parsed, lambda k, v: v.isNotNull())
    else:
        fd = field_delimiter_regex or "[" + re.escape(field_split) + "]"
        kvd = key_value_delimiter_regex or "[" + re.escape(value_split) + "]"
        parsed = F.str_to_map(c, F.lit(fd), F.lit(kvd))
        if drop_keys_with_no_value:
            parsed = F.map_filter(parsed, lambda k, v: v.isNotNull())
        if non_match_value is not None:
            # str_to_map maps non-matching parts to NULL values
            parsed = F.transform_values(
                parsed, lambda k, v: F.coalesce(v, F.lit(non_match_value))
            )
    if whitespace == "lenient":
        parsed = F.map_from_entries(
            F.transform(
                F.map_entries(parsed),
                lambda e: F.struct(
                    F.trim(e["key"]).alias("key"),
                    F.trim(e["value"]).alias("value"),
                ),
            )
        )
    if include_keys:
        inc = F.array(*[F.lit(k) for k in include_keys])
        parsed = F.map_filter(parsed, lambda k, v: F.array_contains(inc, k))
    if exclude_keys:
        exc = F.array(*[F.lit(k) for k in exclude_keys])
        parsed = F.map_filter(parsed, lambda k, v: ~F.array_contains(exc, k))
    if delete_key_regex:
        parsed = F.transform_keys(
            parsed, lambda k, v: F.regexp_replace(k, delete_key_regex, "")
        )
    if delete_value_regex:
        parsed = F.transform_values(
            parsed, lambda k, v: F.regexp_replace(v, delete_value_regex, "")
        )
    if remove_brackets:
        parsed = F.transform_values(
            parsed, lambda k, v: F.regexp_replace(v, r"[\[\]()<>]", "")
        )
    if transform_key in ("lowercase", "uppercase", "capitalize"):
        fn = {
            "lowercase": F.lower,
            "uppercase": F.upper,
            "capitalize": F.initcap,
        }[transform_key]
        parsed = F.transform_keys(parsed, lambda k, v: fn(k))
    if prefix:
        parsed = F.transform_keys(
            parsed, lambda k, v: F.concat(F.lit(prefix), k)
        )
    if default_values:
        dmap = F.create_map(
            *[F.lit(x) for kv in default_values.items() for x in kv]
        )
        parsed = F.map_concat(
            parsed,
            F.map_filter(
                dmap, lambda k, v: ~F.map_contains_key(parsed, k)
            ),
        )
    return df.withColumn(dest, parsed)


_KV_BRACKETS = {"[": "]", "(": ")", "<": ">"}


def _kv_recurse(
    text: str, field_split: str, value_split: str, non_match: str | None
) -> dict:
    """Faithful port of the reference's bracket-aware recursive parse
    (KeyValueProcessor.java:420-487 recurse): pairs split at
    bracket-depth-0 field delimiters; a value wholly enclosed in
    [] / () / <> recurses into a nested object; blank key -> the raw
    pair keyed to non_match_value; keys strip trailing and values
    leading whitespace."""
    pairs, depth, start = [], [], 0
    for i, c in enumerate(text):
        if c in _KV_BRACKETS:
            depth.append(c)
        elif depth and c == _KV_BRACKETS[depth[-1]]:
            depth.pop()
        elif not depth and c == field_split:
            pairs.append(text[start:i])
            start = i + 1
    pairs.append(text[start:])

    out: dict = {}
    for pair in pairs:
        key, vstart, depth = "", -1, []
        for i, c in enumerate(pair):
            if c in _KV_BRACKETS:
                depth.append(c)
            elif depth and c == _KV_BRACKETS[depth[-1]]:
                depth.pop()
            elif not depth and c == value_split:
                key = pair[:i].rstrip()
                vstart = i + 1
                while vstart < len(pair) and pair[vstart] == " ":
                    vstart += 1
                break
        if not key.strip():
            out[pair] = non_match
        elif vstart < len(pair) and pair[vstart] in _KV_BRACKETS:
            if pair and pair[-1] == _KV_BRACKETS[pair[vstart]]:
                out[key] = _kv_recurse(
                    pair[vstart + 1:-1].lstrip(),
                    field_split, value_split, non_match,
                )
            # unbalanced bracket value: dropped (reference :474-481
            # falls through without a put)
        else:
            out[key] = pair[vstart:].lstrip() if vstart >= 0 else non_match
    return out


def key_value_recursive(
    df: DataFrame,
    source: str,
    dest: str = "parsed",
    field_split: str = "&",
    value_split: str = "=",
    non_match_value: str | None = None,
) -> DataFrame:
    """key_value with `recursive: true` (KeyValueProcessorConfig —
    single-char delimiters enforced there too). The result nesting
    depth is data-dependent, which no static Spark map/struct type can
    carry, so `dest` is the parse as a JSON STRING — feed it to
    F.parse_json for a VARIANT or F.from_json with a known schema.
    Arrow-batched UDF: a recursive bracket grammar is inherently
    per-record (the reference walks it per event in Java too); at
    scale this is a narrow map, no shuffle."""
    if len(field_split) != 1 or len(value_split) != 1:
        raise ValueError(
            "recursive key_value requires single-char delimiters "
            "(KeyValueProcessor.java:103-105)"
        )
    if field_split in "[]()<>" or value_split in "[]()<>":
        raise ValueError(
            "recursive key_value delimiters cannot be brackets "
            "(KeyValueProcessor.java:112-115)"
        )
    import json as _json

    @F.pandas_udf("string")
    def _parse(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else _json.dumps(
                _kv_recurse(v, field_split, value_split, non_match_value),
                separators=(",", ":"),
            )
        )

    return df.withColumn(dest, _parse(F.col(source)))


def key_value_list(
    df: DataFrame,
    source: str,
    dest: str = "parsed",
    field_split: str = "&",
    value_split: str = "=",
    field_delimiter_regex: str | None = None,
    key_value_delimiter_regex: str | None = None,
    include_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
    prefix: str = "",
    transform_key: str | None = None,
    whitespace: str = "lenient",
    drop_keys_with_no_value: bool = False,
    non_match_value: str | None = None,
) -> DataFrame:
    """key_value with the reference's DUPLICATE-KEY LIST PROMOTION
    (KeyValueProcessor.java:43 promotes a repeated key's values to a
    list): output is map<string,array<string>> where each key maps to
    ALL its values in appearance order. The typed twin of key_value's
    keep-last map<string,string> (a typed engine cannot produce the
    reference's heterogeneous scalar-or-list values, so EVERY value is
    a list here — single-valued keys get one-element lists).

    Pure Catalyst: split -> (k, v) structs -> distinct keys ->
    per-key filtered value lists. Supports the core option surface
    (split chars/regex, whitespace, include/exclude, prefix,
    transform_key, drop_keys_with_no_value, non_match_value);
    value_grouping needs the scanner UDF and stays keep-last."""
    fd = field_delimiter_regex or "[" + re.escape(field_split) + "]"
    kvd = key_value_delimiter_regex or "[" + re.escape(value_split) + "]"
    parts = F.split(F.col(source), fd)
    entries = F.transform(
        parts,
        lambda p: F.struct(
            F.try_element_at(F.split(p, kvd, 2), F.lit(1)).alias("k"),
            # parts with no delimiter have only one split element ->
            # NULL value (try_element_at, not element_at, which throws)
            F.try_element_at(F.split(p, kvd, 2), F.lit(2)).alias("v"),
        ),
    )
    if whitespace == "lenient":
        entries = F.transform(
            entries,
            lambda e: F.struct(
                F.trim(e["k"]).alias("k"), F.trim(e["v"]).alias("v")
            ),
        )
    if drop_keys_with_no_value:
        entries = F.filter(entries, lambda e: e["v"].isNotNull())
    elif non_match_value is not None:
        entries = F.transform(
            entries,
            lambda e: F.struct(
                e["k"].alias("k"),
                F.coalesce(e["v"], F.lit(non_match_value)).alias("v"),
            ),
        )
    dkeys = F.array_distinct(F.transform(entries, lambda e: e["k"]))
    if include_keys:
        inc = F.array(*[F.lit(k) for k in include_keys])
        dkeys = F.filter(dkeys, lambda k: F.array_contains(inc, k))
    if exclude_keys:
        exc = F.array(*[F.lit(k) for k in exclude_keys])
        dkeys = F.filter(dkeys, lambda k: ~F.array_contains(exc, k))
    vals = F.transform(
        dkeys,
        lambda k: F.transform(
            F.filter(entries, lambda e: e["k"] == k), lambda e: e["v"]
        ),
    )
    out_keys = dkeys
    if transform_key in ("lowercase", "uppercase", "capitalize"):
        fn = {
            "lowercase": F.lower,
            "uppercase": F.upper,
            "capitalize": F.initcap,
        }[transform_key]
        out_keys = F.transform(out_keys, fn)
    if prefix:
        out_keys = F.transform(out_keys, lambda k: F.concat(F.lit(prefix), k))
    return df.withColumn(dest, F.map_from_arrays(out_keys, vals))


_KV_BRACKETS = {"(": ")", "[": "]", "<": ">", "{": "}"}
# multi-char group openers run to the next space (reference
# startGroupStrings http:// and https:// with ' ' end chars)
_KV_URL_OPENERS = ("http://", "https://")


def _kv_parse_grouped(
    s: str,
    field_chars: set,
    value_chars: set,
    non_match_value,
    literal: str | None,
) -> dict:
    """Quote/bracket-aware key=value scanner (mechanism-equivalent to
    reference KeyValueProcessor.parseWithValueGrouping: group openers
    are honored in VALUES, a group runs to its end char, field
    delimiters inside a group do not split)."""
    parts = []
    i, start, n = 0, 0, len(s)
    seen_kv = False

    def close_part(end_idx: int) -> None:
        part = s[start:end_idx].strip()
        if part:
            parts.append(part)

    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n and s[i + 1] in "\"'":
            i += 2
            continue
        end = None
        if ch in "\"'":
            end = ch
        elif ch in _KV_BRACKETS:
            end = _KV_BRACKETS[ch]
        elif any(s.startswith(u, i) for u in _KV_URL_OPENERS):
            end = " "
        if end is not None and (seen_kv or (literal and ch == literal)):
            j = i + 1
            while j < n:
                if s[j] == "\\" and j + 1 < n and s[j + 1] in "\"'":
                    j += 2
                    continue
                if s[j] == end:
                    break
                j += 1
            if j >= n:  # unterminated group: rest of string is the part
                i = n
                break
            if s[j] in field_chars:
                # group end char doubles as a field delimiter (URL
                # groups end at space): it closes the part
                close_part(j + 1)
                i = j + 1
                start = i
                seen_kv = False
            else:
                i = j + 1  # quote/bracket stays inside the part
            continue
        if ch in value_chars:
            seen_kv = True
        if ch in field_chars:
            close_part(i)
            i += 1
            start = i
            seen_kv = False
        else:
            i += 1
    close_part(n)
    out = {}
    for part in parts:
        if (
            literal
            and len(part) > 1
            and part[0] == literal
            and part[-1] == literal
        ):
            # string-literal part: never split into key=value
            out[part] = non_match_value
            continue
        ki = next(
            (x for x, ch in enumerate(part) if ch in value_chars), None
        )
        if ki is None:
            out[part] = non_match_value
        else:
            out[part[:ki]] = part[ki + 1 :]
    return out


def _kv_grouped_udf(
    field_split: str,
    value_split: str,
    non_match_value,
    literal: str | None,
):
    from pyspark.sql.functions import pandas_udf

    fc, vc = set(field_split), set(value_split)

    def fn(s):
        return s.fillna("").map(
            lambda x: _kv_parse_grouped(x, fc, vc, non_match_value, literal)
        )

    return pandas_udf(fn, "map<string,string>")


def csv_parse(
    df: DataFrame,
    source: str,
    schema: str | None = None,
    dest: str = "parsed",
    delimiter: str = ",",
    quote: str = '"',
    n_columns: int | None = None,
    header_source: str | None = None,
) -> DataFrame:
    """csv processor (CsvProcessor.java:44). Three column-name modes:
    explicit `schema` DDL; auto `column1..N` string columns when only
    `n_columns` is given (CsvProcessor.java:181-183); or
    `header_source` — a per-row column holding that row's header line
    (column_names_source_key): names zip against values into a map
    (the per-row schema the reference builds dynamically)."""
    if header_source is not None:
        keys = F.split(F.col(header_source), re.escape(delimiter))
        vals = F.split(F.col(source), re.escape(delimiter))
        n = F.least(F.size(keys), F.size(vals))
        return df.withColumn(
            dest,
            F.map_from_arrays(F.slice(keys, 1, n), F.slice(vals, 1, n)),
        )
    if schema is None:
        if n_columns is None:
            raise ValueError("one of schema / n_columns / header_source")
        schema = ", ".join(f"column{i + 1} string" for i in range(n_columns))
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


_ION_ANNOT = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*::")
_ION_TOKEN = re.compile(
    r"""("(?:[^"\\]|\\.)*")      # double-quoted string
      | ('(?:[^'\\]|\\.)*')      # single-quoted symbol
      | ([A-Za-z_$][A-Za-z0-9_$]*\s*:)   # unquoted field name
      | (null\.\w+)              # typed null
      | (nan|[+-]inf)            # non-finite
      | ([A-Za-z_$][A-Za-z0-9_$]*)       # bare symbol value
      | (\d{4}-\d{2}-\d{2}(?:T[\d:.+Z-]*)?(?=[,\}\]\s]|$))  # timestamp
      | ([+-]?\d[\d_]*(?:\.[\d_]+)?(?:[eE][+-]?\d+)?d?)     # number
      | (\S)                     # any other char
    """,
    re.VERBOSE,
)


def ion_to_json(text: str) -> str:
    """Convert (a practical subset of) Ion TEXT to JSON: type
    annotations dropped, unquoted/quoted symbols -> JSON strings,
    timestamps -> strings, typed nulls -> null, decimal 'd' suffix and
    numeric underscores removed, nan/inf -> null. Ion is a JSON
    superset, so plain JSON passes through unchanged (the reference
    downconverts through the Ion Java library the same way,
    ParseIonProcessor.java:30)."""
    text = _ION_ANNOT.sub("", text)
    out = []

    def sub(m):
        dq, sq, field, tnull, nonfin, bare, ts, num, other = m.groups()
        if dq is not None:
            return dq
        if sq is not None:
            return '"' + sq[1:-1].replace('"', '\\"') + '"'
        if field is not None:
            name = field[:-1].strip()
            return f'"{name}":'
        if tnull is not None:
            return "null"
        if nonfin is not None:
            return "null"
        if bare is not None:
            if bare in ("true", "false", "null"):
                return bare
            return f'"{bare}"'
        if ts is not None:
            return f'"{ts}"'
        if num is not None:
            n = num.replace("_", "")
            return n[:-1] if n.endswith("d") else n
        return other

    return _ION_TOKEN.sub(sub, text)


def parse_ion(
    df: DataFrame, source: str, schema: str, dest: str = "parsed"
) -> DataFrame:
    """parse_ion (ParseIonProcessor.java:30): Ion text -> JSON
    downconvert (vectorized pandas UDF; the subset grammar covers
    structs, lists, annotations, symbols, timestamps, decimals) ->
    native from_json."""
    from pyspark.sql.functions import pandas_udf

    def fn(s):
        return s.map(lambda x: ion_to_json(x) if x is not None else None)

    conv = pandas_udf(fn, "string")
    return df.withColumn(dest, F.from_json(conv(F.col(source)), schema))


# locale month tables for DateProcessorConfig.locale
# (DateProcessorConfig.java:61-68 hands the Java Locale to
# DateTimeFormatter; here localized month names normalize to month
# NUMBERS — longest name first so e.g. French "juillet" wins over
# "juil" — and the pattern's M{3,} token drops to numeric MM)
_LOCALE_MONTHS: dict[str, list[list[str]]] = {
    "fr": [
        ["janvier", "janv"], ["février", "fevrier", "févr", "fevr"],
        ["mars"], ["avril", "avr"], ["mai"], ["juin"],
        ["juillet", "juil"], ["août", "aout"],
        ["septembre", "sept"], ["octobre", "oct"],
        ["novembre", "nov"], ["décembre", "decembre", "déc", "dec"],
    ],
    "de": [
        ["januar", "jan"], ["februar", "feb"], ["märz", "maerz", "mär"],
        ["april", "apr"], ["mai"], ["juni", "jun"], ["juli", "jul"],
        ["august", "aug"], ["september", "sep"], ["oktober", "okt"],
        ["november", "nov"], ["dezember", "dez"],
    ],
    "es": [
        ["enero", "ene"], ["febrero", "feb"], ["marzo", "mar"],
        ["abril", "abr"], ["mayo", "may"], ["junio", "jun"],
        ["julio", "jul"], ["agosto", "ago"],
        ["septiembre", "sept", "sep"], ["octubre", "oct"],
        ["noviembre", "nov"], ["diciembre", "dic"],
    ],
}


def _localize_months(col, locale: str):
    """Rewrite localized month names in a string column to zero-padded
    month numbers (case-insensitive, optional trailing abbreviation
    dot), longest name first."""
    lang = locale.split("_")[0].split("-")[0].lower()
    if lang == "en":
        return col, False
    if lang not in _LOCALE_MONTHS:
        raise ValueError(f"unsupported date locale {locale!r}")
    pairs = [
        (name, month)
        for month, names in enumerate(_LOCALE_MONTHS[lang], start=1)
        for name in names
    ]
    pairs.sort(key=lambda p: -len(p[0]))
    for name, month in pairs:
        col = F.regexp_replace(
            col, f"(?iu)\\b{re.escape(name)}\\.?", f"{month:02d}"
        )
    return col, True


def date_parse(
    df: DataFrame,
    source: str | None = None,
    patterns: list[str] | None = None,
    dest: str = "@timestamp",
    from_time_received: bool = False,
    time_received_col: str = "_time_received",
    source_zone: str | None = None,
    output_format: str | None = None,
    locale: str | None = None,
) -> DataFrame:
    """date: first-matching pattern wins (DateProcessor match.patterns,
    DateProcessorConfig.java:61-68). Special patterns epoch_second /
    epoch_milli / epoch_nano accept numeric strings.

    from_time_received copies the ingest-time metadata column instead
    of parsing (DateProcessorConfig.from_time_received). source_zone
    interprets pattern-parsed wall-clock values in that zone
    (DateProcessorConfig source_timezone); output_format renders the
    result back to a formatted string instead of a timestamp. locale
    ("fr", "de_DE", ...) parses localized month names by normalizing
    them to month numbers first (built-in tables; English needs no
    table)."""
    if from_time_received:
        out = F.col(time_received_col).cast("timestamp")
    else:
        if source is None or not patterns:
            raise ValueError("source + patterns required")
        src_col = F.col(source)
        localized = False
        if locale:
            src_col, localized = _localize_months(src_col, locale)
        attempts = []
        for p in patterns:
            if localized and "MMM" in p:
                p = re.sub("M{3,}", "MM", p)
            if p == "epoch_second":
                attempts.append(F.timestamp_seconds(F.col(source).cast("long")))
            elif p == "epoch_milli":
                attempts.append(F.timestamp_millis(F.col(source).cast("long")))
            elif p == "epoch_nano":
                # integer division — float `/ 1000` would round-trip
                # ~1.8e18 ns epochs through double's 53-bit mantissa
                # and drift by up to a microsecond
                attempts.append(
                    F.timestamp_micros(
                        F.expr(f"CAST(`{source}` AS LONG) DIV 1000")
                    )
                )
            else:
                parsed = F.try_to_timestamp(src_col, F.lit(p))
                if source_zone:
                    parsed = F.to_utc_timestamp(parsed, source_zone)
                attempts.append(parsed)
        out = F.coalesce(*attempts)
    if output_format:
        out = F.date_format(out, output_format)
    return df.withColumn(dest, out)


def dissect(df: DataFrame, source: str, pattern: str) -> DataFrame:
    """dissect: positional %{field}sep%{field} tokenization compiled to
    one anchored regex (DissectProcessor.java:33). Dissect modifiers
    (Logstash grammar the reference implements):
      %{}, %{?name}  — skip field (matched, not captured)
      %{+name}       — APPEND to an earlier %{name} capture (joined
                       with a space, appearance order)
      %{name->}      — ignore right padding (separator may repeat)
    """
    regex_parts: list[str] = []
    captures: list[str] = []  # raw capture slots, in group order
    pos = 0
    pad_next = False
    for m in re.finditer(r"%\{([+?]?)(\w*)(->)?\}", pattern):
        sep = pattern[pos : m.start()]
        esc = re.escape(sep)
        if pad_next and sep:
            # previous field had ->: its trailing separator may repeat
            esc = esc + f"(?:{re.escape(sep[0])})*"
        regex_parts.append(esc)
        mod, name, pad = m.group(1), m.group(2), m.group(3)
        pad_next = pad is not None
        if name and mod != "?":
            captures.append(("+" if mod == "+" else "") + name)
            regex_parts.append("(.*?)" if m.end() < len(pattern) else "(.*)")
        else:
            regex_parts.append(".*?")
        pos = m.end()
    # prefix-match semantics: anchor the end only when the pattern ends
    # with a field (which then captures the rest of the line)
    trailing = pattern[pos:]
    regex_parts.append(re.escape(trailing))
    regex = "^" + "".join(regex_parts) + ("$" if not trailing else "")
    # single-pass extraction: ONE rlike + ONE regexp_replace per row
    # (not one regexp_extract per capture); the wrapped regex consumes
    # the whole line so every group lands in one replacement, split on
    # the control-char separator. Non-matching rows keep "" captures
    # (regexp_extract's contract), gated by the match flag.
    wrapped = regex if not trailing else regex + "(?s:.*)$"
    repl = _GROK_SEP.join(f"${i}" for i in range(1, len(captures) + 1))
    parts = F.split(
        F.regexp_replace(F.col(source), wrapped, repl), _GROK_SEP, -1
    )
    df = df.withColumns(
        {
            "__dissect_m": F.col(source).rlike(regex),
            "__dissect_p": parts,
        }
    )
    exprs: dict[str, object] = {}
    for i, slot in enumerate(captures, start=1):
        ext = F.when(
            F.col("__dissect_m"),
            F.element_at(F.col("__dissect_p"), i),
        ).otherwise(F.lit(""))
        if slot.startswith("+"):
            name = slot[1:]
            prev = exprs.get(name)
            exprs[name] = (
                F.concat_ws(" ", prev, ext) if prev is not None else ext
            )
        else:
            exprs[slot] = ext
    return df.withColumns(exprs).drop("__dissect_m", "__dissect_p")


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
