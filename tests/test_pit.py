"""Point-in-time search (index/pit.py): a PIT token pins the delta
listing AND the per-delta tombstone file set, so later ingests,
deletes, and compactions are invisible to it — OpenSearch's
`_search/point_in_time` frozen-view contract on the delta tree."""

from __future__ import annotations

import json
import os

import pytest

from data_prepper_spark.index.pit import (
    close_pit,
    open_pit,
    resolve_pit,
    topk_pit,
)
from data_prepper_spark.sources.bulk_api import bulk_apply


def _apply(spark, tmp_path, root, tag, lines):
    spool = str(tmp_path / f"spool_{tag}" / "bulk")
    os.makedirs(spool, exist_ok=True)
    with open(os.path.join(spool, "0.ndjson"), "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
    return bulk_apply(spark, str(tmp_path / f"spool_{tag}"), root)


def _q(spark, text):
    return spark.createDataFrame(
        [(0, text)], "query_id long, query string"
    )


def test_pit_frozen_view(spark, tmp_path):
    """Docs ingested and docs deleted AFTER open are invisible to /
    still visible to the PIT respectively; the live view moves on."""
    from data_prepper_spark.index.query import topk_deltas

    root = str(tmp_path / "root")
    _apply(spark, tmp_path, root, "a", [
        {"op": "index", "index": "logs", "id": "1",
         "content": "alpha bravo", "doc_json": None},
        {"op": "index", "index": "logs", "id": "2",
         "content": "alpha charlie", "doc_json": None},
    ])
    pit = open_pit(root)
    frozen_before = topk_pit(spark, root, pit, _q(spark, "alpha"), k=10)
    ids_at_open = sorted(r.doc_id for r in frozen_before.collect())

    # later writes: one new doc, one delete of doc "1"
    _apply(spark, tmp_path, root, "b", [
        {"op": "index", "index": "logs", "id": "3",
         "content": "alpha delta", "doc_json": None},
        {"op": "delete", "index": "logs", "id": "1",
         "content": None, "doc_json": None},
    ])
    live = sorted(
        r.doc_id
        for r in topk_deltas(spark, root, _q(spark, "alpha"), k=10)
        .collect()
    )
    pinned = sorted(
        r.doc_id
        for r in topk_pit(spark, root, pit, _q(spark, "alpha"), k=10)
        .collect()
    )
    assert pinned == ids_at_open  # 2 docs: ingest + delete invisible
    assert len(pinned) == 2
    assert len(live) == 2  # doc 3 arrived, doc 1 tombstoned
    assert set(live) != set(pinned)

    close_pit(root, pit)
    with pytest.raises(ValueError, match="unknown or closed"):
        resolve_pit(root, pit)
    with pytest.raises(ValueError, match="unknown or closed"):
        close_pit(root, pit)


def test_pit_survives_compaction_and_gc(spark, tmp_path):
    """Leveled compaction RETIRES victims a live PIT pins (moves to
    retired/) instead of deleting; the PIT stays rank-identical to
    its open-time snapshot; close_pit garbage-collects the retirees;
    retired names stay reserved so new deltas can't shadow them."""
    from data_prepper_spark.index.build import BuildConfig
    from data_prepper_spark.streaming.pipeline import (
        maybe_compact,
        next_delta_seq,
    )

    root = str(tmp_path / "root")
    words = ["alpha bravo", "alpha charlie", "alpha delta echo"]
    for i, w in enumerate(words):
        _apply(spark, tmp_path, root, f"d{i}", [
            {"op": "index", "index": "logs", "id": str(i),
             "content": w, "doc_json": None},
        ])
    pit = open_pit(root)
    snap = [
        (r.rank, r.doc_id, round(r.score, 9))
        for r in topk_pit(spark, root, pit, _q(spark, "alpha"), k=10)
        .collect()
    ]
    cfg = BuildConfig(n_buckets=2, hot_group_target=1000)
    st = maybe_compact(
        spark, root, str(tmp_path / "out"), max_deltas=2, cfg=cfg,
        policy="leveled", fan_in=2,
    )
    assert st is not None  # compaction ran
    retired = os.listdir(os.path.join(root, "retired"))
    assert retired and all(n.startswith("delta=") for n in retired)
    after = [
        (r.rank, r.doc_id, round(r.score, 9))
        for r in topk_pit(spark, root, pit, _q(spark, "alpha"), k=10)
        .collect()
    ]
    assert after == snap  # frozen view rank-identical across merge

    # retired names stay reserved for new-delta naming
    nums = [
        int(n.split("=")[1]) for n in retired
        if not n.split("=")[1].startswith("c")
    ]
    if nums:
        assert next_delta_seq(root) > max(nums)

    close_pit(root, pit)
    rd = os.path.join(root, "retired")
    assert not os.path.exists(rd) or os.listdir(rd) == []


def test_pit_broken_by_external_delete_fails_loudly(spark, tmp_path):
    import shutil

    root = str(tmp_path / "root")
    for i in range(2):
        _apply(spark, tmp_path, root, f"d{i}", [
            {"op": "index", "index": "logs", "id": str(i),
             "content": f"word{i} alpha", "doc_json": None},
        ])
    pit = open_pit(root)
    victim = [d for d in os.listdir(root) if d.startswith("delta=")][0]
    shutil.rmtree(os.path.join(root, victim))
    with pytest.raises(ValueError, match="no longer exists"):
        resolve_pit(root, pit)
