"""Stored scripts — the `_scripts/<id>` cluster-state API.

OpenSearch lets users PUT a named painless script once and reference
it from any search body as `{"script": {"id": ...}}` instead of
re-sending the source (script_score / script query / script_fields /
scripted_metric / bucket_script / bucket_selector / runtime_mappings
/ update_by_query all accept the id form). The reference stack's
users lean on this for shared scoring functions.

Here the registry is a directory of tiny JSON files next to the
index (`<index_dir>/scripts/<id>.json` — the same file-level
cluster-state philosophy as aliases and PIT tokens: no server, any
session resolves them). Resolution happens ONCE per request in
`resolve_stored_scripts`: a recursive body walk replaces every
`{"id": ...}` script spec with the stored `{"source", "lang"}`,
keeping the REQUEST's params (OpenSearch contract: params always
come from the caller; the stored object holds only source + lang).
Downstream compilers (`aggs.painless_expr`, `booltree`) then see
exactly what an inline script would have sent — zero per-call-site
changes, no behavior fork between inline and stored.

Scale: pure metadata (one small JSON read per distinct id per
request, driver-side); nothing touches the data path.
"""

from __future__ import annotations

import json
import os

from .. import fsio


def _dir(index_dir: str) -> str:
    return os.path.join(index_dir, "scripts")


def put_script(index_dir: str, script_id: str, source: str,
               lang: str = "painless") -> None:
    """PUT _scripts/<id> — idempotent overwrite (atomic publish)."""
    if not script_id or "/" in script_id:
        raise ValueError(f"invalid script id {script_id!r}")
    fsio.makedirs(_dir(index_dir))
    fsio.write_bytes_atomic(
        os.path.join(_dir(index_dir), f"{script_id}.json"),
        json.dumps(
            {"script": {"lang": lang, "source": source}},
            sort_keys=True,
        ).encode(),
    )


def get_script(index_dir: str, script_id: str) -> dict:
    """GET _scripts/<id> — {"lang": ..., "source": ...}; raises on
    unknown ids (a silent empty script would mis-score quietly)."""
    p = os.path.join(_dir(index_dir), f"{script_id}.json")
    if not fsio.exists(p):
        raise ValueError(f"unknown stored script {script_id!r}")
    return json.loads(fsio.read_text(p))["script"]


def delete_script(index_dir: str, script_id: str) -> None:
    p = os.path.join(_dir(index_dir), f"{script_id}.json")
    if not fsio.exists(p):
        raise ValueError(f"unknown stored script {script_id!r}")
    fsio.remove(p)


def resolve_stored_scripts(index_dir: str, body):
    """Recursively replace `{"id": X}` script specs with the stored
    source (request params win — OpenSearch passes params per call,
    never from the store). Returns a NEW structure; the input body is
    never mutated. No-op (and no I/O) for bodies without ids."""
    if isinstance(body, dict):
        out = {}
        for key, val in body.items():
            if (
                key == "script"
                and isinstance(val, dict)
                and "id" in val
                and "source" not in val
            ):
                stored = get_script(index_dir, val["id"])
                new = {
                    "lang": stored.get("lang", "painless"),
                    "source": stored["source"],
                }
                if "params" in val:
                    new["params"] = val["params"]
                out[key] = new
            else:
                out[key] = resolve_stored_scripts(index_dir, val)
        return out
    if isinstance(body, list):
        return [resolve_stored_scripts(index_dir, v) for v in body]
    return body
