"""Logstash `.conf` -> pipeline-YAML converter — the migration on-ramp.

The reference ships a full translator from the public Logstash config
DSL to its pipeline YAML (reference
data-prepper-logstash-configuration/src/main/java/org/opensearch/
dataprepper/logstash/LogstashConfigConverter.java:32, with per-plugin
attribute-mapping resources under src/main/resources/.../mapping/).
This module re-expresses that on-ramp for THIS engine: parse the
Logstash DSL (hand-rolled recursive descent over the public syntax —
sections, plugins, `=>` attributes, strings/numbers/bools/barewords/
arrays/hashes, `#` comments), then map each plugin onto the pipeline
surface `pipeline.build_pipelines` executes (pipeline.py), using the
same plugin-name and attribute-name translations the reference's
mapping resources define:

* inputs:  file -> `file` source (line -> message, optional json
  codec), http -> `http` source config (listener attrs mapped:
  threads->thread_count, ssl_key->ssl_key_file, + the reference's
  additional defaults max_connection_count/request_timeout),
  stdin -> `stdin`.
* filters: grok (repeated `match` merged per field, array and hash
  forms, overwrite->keys_to_overwrite, timeout_millis->
  match_timeout_ms), date (match [field, fmts...] -> source+match,
  target->destination, + from_time_received/destination_timezone
  defaults), mutate (split into ordered add_entries / rename_keys /
  copy_values / delete_entries [repeats merged] / uppercase_string /
  lowercase_string / trim_string / substitute_string [gsub triplets] /
  split_string / convert_type), kv -> key_value, csv, json ->
  parse_json, dissect, useragent -> user_agent, translate,
  drop -> drop_events(drop_when true).
* outputs: elasticsearch / opensearch / amazon_es -> `opensearch`
  sink (user->username, region->aws_region; `index` defaulted like
  the reference's defaultSettings), stdout -> stdout, file -> json.

Logstash's `[a][b]` nested-field references become JsonPointer-style
`/a/b` keys, exactly as the reference converter rewrites them.
Conditionals (`if [field] { ... }`) raise NotImplementedError — loud,
not silently dropped.
"""

from __future__ import annotations

import re

import yaml

# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<arrow>=>)
  | (?P<lbrace>\{) | (?P<rbrace>\})
  | (?P<lbrack>\[) | (?P<rbrack>\])
  | (?P<comma>,)
  | (?P<dqstr>"(?:\\.|[^"\\])*")
  | (?P<sqstr>'(?:\\.|[^'\\])*')
  | (?P<number>-?\d+(?:\.\d+)?(?!\w))
  | (?P<bareword>[\w.\-/@\[\]%{}$]+)
    """,
    re.VERBOSE,
)


def _lex(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None:
            raise ValueError(
                f"logstash config: unexpected character {text[i]!r} at {i}"
            )
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
        i = m.end()
    return out


class _P:
    def __init__(self, toks):
        self.toks, self.i = toks, 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind):
        t = self.next()
        if t[0] != kind:
            raise ValueError(f"logstash config: expected {kind}, got {t}")
        return t


def _unquote(tok: tuple[str, str]):
    kind, v = tok
    if kind == "dqstr":
        return v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    if kind == "sqstr":
        return v[1:-1].replace("\\'", "'").replace("\\\\", "\\")
    if kind == "number":
        return float(v) if "." in v else int(v)
    if kind == "bareword":
        if v == "true":
            return True
        if v == "false":
            return False
        return v
    raise ValueError(f"logstash config: bad value token {tok}")


def _value(p: _P):
    kind, _v = p.peek()
    if kind == "lbrack":  # array
        p.next()
        out = []
        while p.peek()[0] != "rbrack":
            out.append(_value(p))
            if p.peek()[0] == "comma":
                p.next()
        p.next()
        return out
    if kind == "lbrace":  # hash: entries are `key => value`
        p.next()
        out = {}
        while p.peek()[0] != "rbrace":
            k = _unquote(p.next())
            p.expect("arrow")
            out[str(k)] = _value(p)
        p.next()
        return out
    return _unquote(p.next())


def _plugin(p: _P) -> tuple[str, dict]:
    name = p.expect("bareword")[1]
    if name in ("if", "else"):
        raise NotImplementedError(
            "logstash conditionals (if/else) — route with the pipeline "
            "YAML `route:` section instead"
        )
    p.expect("lbrace")
    # attributes; repeated attribute names accumulate into a list of
    # values (Logstash allows e.g. repeated `match =>` / `remove_field`)
    attrs: dict = {}
    while p.peek()[0] != "rbrace":
        key = p.next()
        if key[0] not in ("bareword", "dqstr", "sqstr"):
            raise ValueError(f"logstash config: bad attribute name {key}")
        k = str(_unquote(key))
        p.expect("arrow")
        v = _value(p)
        if k in attrs:
            prev = attrs[k]
            attrs[k] = (prev if isinstance(prev, list) and
                        isinstance(prev[0], tuple) else [("v", prev)])
            attrs[k].append(("v", v))
        else:
            attrs[k] = v
    p.next()
    return name, attrs


def _attr_values(attrs: dict, key: str) -> list:
    """All values given for a (possibly repeated) attribute, in order."""
    if key not in attrs:
        return []
    v = attrs[key]
    if isinstance(v, list) and v and isinstance(v[0], tuple):
        return [x for _, x in v]
    return [v]


def parse_conf(text: str) -> dict:
    """Logstash config text -> {'input': [(name, attrs)], 'filter':
    [...], 'output': [...]}, plugin order preserved."""
    p = _P(_lex(text))
    out: dict = {"input": [], "filter": [], "output": []}
    while p.peek()[0] != "eof":
        section = p.expect("bareword")[1]
        if section not in out:
            raise ValueError(f"logstash config: unknown section {section!r}")
        p.expect("lbrace")
        while p.peek()[0] != "rbrace":
            out[section].append(_plugin(p))
        p.next()
    return out


# ------------------------------------------------------------- mapping

_NESTED = re.compile(r"^(\[[^\[\]]+\])+$")


def _field(name) -> str:
    """Logstash `[a][b]` nested reference -> JsonPointer `/a/b` (the
    reference's NestedSyntaxConverter); plain names pass through."""
    s = str(name)
    if _NESTED.match(s):
        return "/" + "/".join(re.findall(r"\[([^\[\]]+)\]", s))
    return s


def _field_in_pattern(pat: str) -> str:
    """Rewrite nested capture names INSIDE grok patterns:
    %{SYNTAX:[a][b]} -> %{SYNTAX:/a/b} (reference
    GrokLogstashPluginAttributesMapper)."""
    return re.sub(
        r"(%\{[A-Z0-9_]+:)((?:\[[^\[\]]+\])+)",
        lambda m: m.group(1) + _field(m.group(2)),
        pat,
    )


def _map_grok(attrs: dict) -> list[dict]:
    merged: dict[str, list[str]] = {}
    for m in _attr_values(attrs, "match"):
        if isinstance(m, dict):
            items = m.items()
        elif isinstance(m, list):  # ["field", "pat1", "pat2", ...]
            items = [(m[0], m[1:])]
        else:
            raise ValueError(f"grok match: bad form {m!r}")
        for fld, pats in items:
            pats = pats if isinstance(pats, list) else [pats]
            merged.setdefault(_field(fld), []).extend(
                _field_in_pattern(str(p)) for p in pats
            )
    cfg: dict = {"match": merged}
    if "break_on_match" in attrs:
        cfg["break_on_match"] = attrs["break_on_match"]
    if "overwrite" in attrs:
        cfg["keys_to_overwrite"] = [
            _field(f) for f in _attr_values(attrs, "overwrite")[0]
        ]
    if "named_captures_only" in attrs:
        cfg["named_captures_only"] = attrs["named_captures_only"]
    if "timeout_millis" in attrs:
        cfg["match_timeout_ms"] = attrs["timeout_millis"]
    if "pattern_definitions" in attrs:
        cfg["pattern_definitions"] = attrs["pattern_definitions"]
    if "tag_on_failure" in attrs:
        cfg["tags_on_match_failure"] = attrs["tag_on_failure"]
    return [{"grok": cfg}]


def _map_date(attrs: dict) -> list[dict]:
    cfg: dict = {"from_time_received": False, "destination_timezone": "UTC"}
    m = attrs.get("match", [])
    if m:
        cfg["match"] = [{"key": _field(m[0]),
                         "patterns": [str(x) for x in m[1:]]}]
    if "target" in attrs:
        cfg["destination"] = _field(attrs["target"])
    if "timezone" in attrs:
        cfg["source_timezone"] = attrs["timezone"]
    if "locale" in attrs:
        cfg["locale"] = attrs["locale"]
    return [{"date": cfg}]


def _map_mutate(attrs: dict) -> list[dict]:
    """One Logstash mutate block -> ordered list of this engine's
    single-purpose mutate processors (reference MutateMapper). Repeats
    of the same sub-attribute merge into one processor."""
    out: list[dict] = []

    adds = [e for v in _attr_values(attrs, "add_field")
            for e in v.items()]
    if adds:
        out.append({"add_entries": {"entries": [
            {"key": _field(k), "value": v} for k, v in adds
        ]}})
    rens = [e for v in _attr_values(attrs, "rename") for e in v.items()]
    if rens:
        out.append({"rename_keys": {"entries": [
            {"from_key": _field(a), "to_key": _field(b)} for a, b in rens
        ]}})
    cops = [e for v in _attr_values(attrs, "copy") for e in v.items()]
    if cops:
        out.append({"copy_values": {"entries": [
            {"from_key": _field(a), "to_key": _field(b)} for a, b in cops
        ]}})
    rems = [f for v in _attr_values(attrs, "remove_field") for f in v]
    if rems:
        out.append({"delete_entries": {"with_keys":
                                       [_field(f) for f in rems]}})
    for ls_name, dp_name in (
        ("uppercase", "uppercase_string"),
        ("lowercase", "lowercase_string"),
        ("trim", "trim_string"),
        ("strip", "trim_string"),
    ):
        keys = [f for v in _attr_values(attrs, ls_name) for f in v]
        if keys:
            out.append({dp_name: {"with_keys": [_field(f) for f in keys]}})
    gsubs = [t for v in _attr_values(attrs, "gsub") for t in v]
    if gsubs:
        if len(gsubs) % 3:
            raise ValueError("mutate gsub: expected (field, from, to) triplets")
        out.append({"substitute_string": {"entries": [
            {"source": _field(gsubs[i]), "from": gsubs[i + 1],
             "to": gsubs[i + 2]}
            for i in range(0, len(gsubs), 3)
        ]}})
    splits = [e for v in _attr_values(attrs, "split") for e in v.items()]
    if splits:
        out.append({"split_string": {"entries": [
            {"source": _field(k), "delimiter": d} for k, d in splits
        ]}})
    convs = [e for v in _attr_values(attrs, "convert") for e in v.items()]
    for k, t in convs:  # one processor per field (the adapter's shape)
        out.append({"convert_type": {
            "key": _field(k),
            "type": {"float": "double"}.get(str(t), str(t)),
        }})
    return out


_KV_ATTRS = {
    "source": "source", "target": "destination",
    "field_split": "field_split_characters",
    "field_split_pattern": "field_delimiter_regex",
    "value_split": "value_split_characters",
    "value_split_pattern": "key_value_delimiter_regex",
    "remove_char_key": "delete_key_regex",
    "remove_char_value": "delete_value_regex",
    "include_keys": "include_keys", "exclude_keys": "exclude_keys",
    "default_keys": "default_values", "recursive": "recursive",
}
_CSV_ATTRS = {
    "source": "source", "columns": "column_names",
    "separator": "delimiter", "quote_char": "quote_character",
}
_HTTP_IN_ATTRS = {
    "port": "port", "threads": "thread_count", "ssl": "ssl",
    "max_pending_requests": "max_pending_requests",
    "ssl_key": "ssl_key_file", "ssl_certificate": "ssl_certificate_file",
}
_OS_OUT_ATTRS = {
    "hosts": "hosts", "user": "username", "password": "password",
    "index": "index", "cacert": "cert", "proxy": "proxy",
    "region": "aws_region",
}


def _remap(attrs: dict, table: dict, field_keys: set = frozenset()) -> dict:
    out = {}
    for k, v in attrs.items():
        if k in table:
            out[table[k]] = _field(v) if k in field_keys else v
    return out


def _map_filter(name: str, attrs: dict) -> list[dict]:
    if name == "grok":
        return _map_grok(attrs)
    if name == "date":
        return _map_date(attrs)
    if name == "mutate":
        return _map_mutate(attrs)
    if name == "kv":
        return [{"key_value":
                 _remap(attrs, _KV_ATTRS, {"source", "target"})}]
    if name == "csv":
        return [{"csv": _remap(attrs, _CSV_ATTRS, {"source"})}]
    if name == "json":
        cfg = {"source": _field(attrs.get("source", "message"))}
        if "target" in attrs:
            cfg["destination"] = _field(attrs["target"])
        return [{"parse_json": cfg}]
    if name == "drop":
        # unconditional inside its placement (conditional drops need
        # Logstash `if`, which converts to the route: section instead)
        return [{"drop_events": {"drop_when": "true"}}]
    if name == "dissect":
        ((fld, pat),) = attrs.get("mapping", {}).items()
        return [{"dissect": {"source": _field(fld), "pattern": pat}}]
    if name == "useragent":
        cfg = {"source": _field(attrs.get("source", "message"))}
        if "target" in attrs:
            cfg["destination"] = _field(attrs["target"])
        return [{"user_agent": cfg}]
    if name == "translate":
        cfg = {
            "source": _field(attrs.get("source", attrs.get("field"))),
            "target": _field(attrs.get("target", "translated")),
            "map": attrs.get("dictionary", {}),
        }
        return [{"translate": cfg}]
    if name == "geoip":
        # logstash geoip { source database target fields } -> the
        # engine's geoip processor (hand-rolled mmdb reader)
        cfg = {"source": _field(attrs["source"])}
        if "database" in attrs:
            cfg["database_path"] = attrs["database"]
        if "target" in attrs:
            cfg["target"] = _field(attrs["target"])
        if "fields" in attrs:
            cfg["include_fields"] = [
                _field(f) for f in _attr_values(attrs, "fields")[0]
            ]
        return [{"geoip": cfg}]
    if name == "truncate":
        return [{"truncate": {
            "source_keys": [_field(f) for f in
                            _attr_values(attrs, "fields")[0]]
            if "fields" in attrs else None,
            "length": attrs.get("length_bytes"),
        }}]
    raise NotImplementedError(f"logstash filter plugin '{name}'")


def _map_input(name: str, attrs: dict) -> dict:
    if name == "http":
        cfg = {"max_connection_count": 500, "request_timeout": 10000}
        cfg.update(_remap(attrs, _HTTP_IN_ATTRS))
        return {"http": cfg}
    if name == "file":
        cfg = {"path": attrs["path"]}
        codec = str(attrs.get("codec", "plain"))
        if codec.startswith("json"):
            cfg["codec"] = "json"
        return {"file": cfg}
    if name == "stdin":
        return {"stdin": {}}
    raise NotImplementedError(f"logstash input plugin '{name}'")


def _map_output(name: str, attrs: dict) -> dict:
    if name in ("elasticsearch", "opensearch", "amazon_es"):
        cfg = _remap(attrs, _OS_OUT_ATTRS)
        if name == "amazon_es":
            cfg.setdefault("aws_sigv4", True)
        if "insecure" in attrs:
            cfg["ssl_certificate_verification"] = not attrs["insecure"]
        cfg.setdefault("index", "logstash-%{uuuu.MM.dd}")
        if "index_dir" in attrs:  # this engine's local-index extension
            cfg["index_dir"] = attrs["index_dir"]
        return {"opensearch": cfg}
    if name == "stdout":
        return {"stdout": {}}
    if name == "file":
        return {"json": {"path": attrs["path"]}}
    raise NotImplementedError(f"logstash output plugin '{name}'")


def convert(
    text: str, pipeline_name: str = "logstash-converted-pipeline"
) -> dict:
    """Logstash config text -> pipeline config dict (the exact shape
    `pipeline.build_pipelines` executes). Multiple inputs/outputs keep
    the reference's behavior: first input wins as `source`, every
    output becomes a sink."""
    conf = parse_conf(text)
    if not conf["input"]:
        raise ValueError("logstash config: no input section/plugin")
    source = _map_input(*conf["input"][0])
    processors: list[dict] = []
    for name, attrs in conf["filter"]:
        processors.extend(_map_filter(name, attrs))
    sinks = [_map_output(n, a) for n, a in conf["output"]]
    return {pipeline_name: {
        "source": source,
        "processor": processors,
        "sink": sinks or [{"noop": {}}],
    }}


def convert_to_yaml(text: str, **kw) -> str:
    return yaml.safe_dump(convert(text, **kw), sort_keys=False)
