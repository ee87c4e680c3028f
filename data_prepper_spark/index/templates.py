"""Index templates — the `_index_template` API analog.

The reference's opensearch sink ships index templates with every
index family it manages (template_file/template_type config on the
sink; the server applies the highest-priority template whose
index_patterns match at index-creation time — OpenSearch composable
templates). Here the same contract runs at BUILD time: a registry of
JSON templates, and `config_for_index(name)` resolves the single
winning template and folds its settings into a BuildConfig, so
`build_index` (or `bulk_apply`) creates the index with the
template's analyzer chain / bucketing / scoring constants without
the caller hand-writing configs per index family.

Resolution follows the composable-template rule: ONLY the highest
`priority` matching template applies (no merging across templates —
the OpenSearch semantics that replaced legacy merged templates);
ties break on template name so resolution is deterministic.

Registry mutations are atomic (write-temp + rename, the aliases
registry's protocol). Settings whitelist maps 1:1 onto BuildConfig
fields — unknown keys fail loudly at put time, not silently at
build time.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import json
import os

from .build import BuildConfig

# BuildConfig fields a template may set (the index-semantics subset:
# analyzer chain, scoring constants, physical layout knobs; the
# execution-strategy toggles like sideband_encode stay caller-owned)
SETTINGS_KEYS = {
    "k1", "b", "n_buckets", "block_size", "hot_group_target",
    "stopwords", "stemmer", "positions", "ordinal_order",
}


def _load(path: str) -> dict:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _store(path: str, reg: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def put_template(
    registry_path: str,
    name: str,
    index_patterns: list[str],
    settings: dict,
    priority: int = 0,
) -> None:
    """PUT _index_template/<name> — idempotent overwrite."""
    if not index_patterns:
        raise ValueError("index_patterns must be non-empty")
    bad = set(settings) - SETTINGS_KEYS
    if bad:
        raise ValueError(
            f"unknown template settings {sorted(bad)} "
            f"(supported: {sorted(SETTINGS_KEYS)})"
        )
    reg = _load(registry_path)
    reg[name] = {
        "index_patterns": list(index_patterns),
        "priority": int(priority),
        "settings": dict(settings),
    }
    _store(registry_path, reg)


def get_template(registry_path: str, name: str) -> dict:
    reg = _load(registry_path)
    if name not in reg:
        raise ValueError(f"unknown index template {name!r}")
    return reg[name]


def delete_template(registry_path: str, name: str) -> None:
    reg = _load(registry_path)
    if name not in reg:
        raise ValueError(f"unknown index template {name!r}")
    del reg[name]
    _store(registry_path, reg)


def resolve_settings(registry_path: str, index_name: str) -> dict:
    """The winning template's settings for an index name (highest
    priority among pattern matches, name tie-break), or {} when
    nothing matches — creation then uses pure defaults, exactly the
    no-template path."""
    reg = _load(registry_path)
    best = None
    for name, tpl in sorted(reg.items()):
        if any(
            fnmatch.fnmatchcase(index_name, p)
            for p in tpl["index_patterns"]
        ):
            if best is None or tpl["priority"] > best[1]["priority"]:
                best = (name, tpl)
    return dict(best[1]["settings"]) if best else {}


def config_for_index(
    registry_path: str,
    index_name: str,
    base: BuildConfig | None = None,
) -> BuildConfig:
    """BuildConfig for a new index: `base` (or defaults) overlaid
    with the winning template's settings. Lists coerce to the tuple
    fields BuildConfig expects (JSON has no tuples)."""
    settings = resolve_settings(registry_path, index_name)
    if "stopwords" in settings and settings["stopwords"] is not None:
        settings["stopwords"] = tuple(settings["stopwords"])
    return dataclasses.replace(base or BuildConfig(), **settings)
