"""Build manifest: per-partition checkpoint / lineage / metrics rows.

Spark-side analog of Data Prepper's reliability contracts
(SURVEY.md §2.10): the source-coordination lease store
(reference core/sourcecoordination/LeaseBasedSourceCoordinator.java:157,
saveProgressStateForPartition :305, completePartition :243), end-to-end
acknowledgments (core/acknowledgements/DefaultAcknowledgementSet.java),
and the DLQ (failures-common/.../dlq/DlqWriter.java).

The manifest is an append-only parquet directory: each commit writes a
new part file via write-tmp-then-rename (atomic on POSIX). On restart
the builder anti-joins pending work units against COMPLETE rows — an
interrupted build resumes without re-tokenizing completed units.
"""

from __future__ import annotations

import io
import json
import os
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import fsio

MANIFEST_COLUMNS = [
    "partition_id",
    "stage",
    "status",
    "rows_in",
    "rows_out",
    "bytes",
    "sha256_ok",
    "started_at",
    "finished_at",
    "attempt",
    "lineage_json",
]

_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("stage", pa.string()),
        ("status", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("bytes", pa.int64()),
        ("sha256_ok", pa.bool_()),
        ("started_at", pa.float64()),
        ("finished_at", pa.float64()),
        ("attempt", pa.int32()),
        ("lineage_json", pa.string()),
    ]
)


def _manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def read_manifest(index_dir: str) -> pd.DataFrame:
    d = _manifest_dir(index_dir)
    parts = fsio.listdir(d, suffix=".parquet")
    if not parts:
        return pd.DataFrame(columns=MANIFEST_COLUMNS)
    fs, _ = fsio.resolve(d)
    return pq.read_table(
        [fsio.resolve(p)[1] for p in parts], filesystem=fs
    ).to_pandas()


def completed(index_dir: str, stage: str) -> set[str]:
    m = read_manifest(index_dir)
    if m.empty:
        return set()
    sel = m[(m["stage"] == stage) & (m["status"] == "COMPLETE")]
    return set(sel["partition_id"])


def attempts(index_dir: str, stage: str) -> dict[str, int]:
    m = read_manifest(index_dir)
    if m.empty:
        return {}
    sel = m[m["stage"] == stage]
    return sel.groupby("partition_id")["attempt"].max().to_dict()


def append_rows(index_dir: str, rows: list[dict]) -> None:
    """Atomically append manifest rows (one new part file per commit).
    Routed through the fsio shim: write-tmp-then-move on any
    pyarrow.fs filesystem (POSIX rename locally; all-or-nothing PUT
    semantics on object stores)."""
    if not rows:
        return
    d = _manifest_dir(index_dir)
    fsio.makedirs(d)
    pdf = pd.DataFrame(rows)
    for c in MANIFEST_COLUMNS:
        if c not in pdf.columns:
            pdf[c] = None
    pdf = pdf[MANIFEST_COLUMNS]
    tbl = pa.Table.from_pandas(pdf, schema=_SCHEMA, preserve_index=False)
    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    name = f"commit-{uuid.uuid4().hex}.parquet"
    fsio.write_bytes_atomic(os.path.join(d, name), buf.getvalue())


def make_row(
    partition_id: str,
    stage: str,
    *,
    status: str = "COMPLETE",
    rows_in: int = 0,
    rows_out: int = 0,
    nbytes: int = 0,
    sha256_ok: bool = True,
    started_at: float | None = None,
    attempt: int = 1,
    lineage: dict | None = None,
) -> dict:
    now = time.time()
    return {
        "partition_id": partition_id,
        "stage": stage,
        "status": status,
        "rows_in": int(rows_in),
        "rows_out": int(rows_out),
        "bytes": int(nbytes),
        "sha256_ok": bool(sha256_ok),
        "started_at": started_at if started_at is not None else now,
        "finished_at": now,
        "attempt": int(attempt),
        "lineage_json": json.dumps(lineage or {}, sort_keys=True),
    }
