"""OpenSearch `_bulk` API facade (sources/bulk_api.py + the listener
route in sources/http.py): the accepting side of the wire contract
the reference's opensearch sink speaks (BulkRetryStrategy /
AccumulatingBulkRequest NDJSON action+document pairs), applied to the
delta-index store with per-delta tombstone deletes and merge-time
expunge."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from data_prepper_spark.sources.bulk_api import bulk_apply, parse_bulk
from data_prepper_spark.sources.http import HttpSource


def _post(port: int, path: str, body: bytes):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=body,
        headers={"Content-Type": "application/x-ndjson"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _nd(*lines) -> bytes:
    return ("\n".join(json.dumps(x) for x in lines) + "\n").encode()


def test_parse_bulk_grammar():
    items, ops, errors = parse_bulk(
        _nd(
            {"index": {"_index": "logs", "_id": "a"}},
            {"content": "alpha beta"},
            {"create": {"_index": "logs", "_id": "b"}},
            {"message": "no content field"},
            {"delete": {"_index": "logs", "_id": "a"}},
            {"update": {"_index": "logs", "_id": "b"}},
            {"doc": {"x": 1}},
            {"delete": {"_index": "logs"}},  # missing _id -> item error
        )
    )
    assert [next(iter(i)) for i in items] == [
        "index", "create", "delete", "update", "delete",
    ]
    assert items[0]["index"]["status"] == 201
    assert items[2]["delete"]["result"] == "deleted"
    assert items[3]["update"]["status"] == 400
    assert items[4]["delete"]["status"] == 400
    assert errors is True
    assert [o["op"] for o in ops] == ["index", "index", "delete"]
    # schemaless doc indexes its compact JSON
    assert ops[1]["content"] == '{"message":"no content field"}'
    # default index + auto id
    items2, ops2, _ = parse_bulk(
        _nd({"index": {}}, {"content": "x"}), default_index="dflt"
    )
    assert ops2[0]["index"] == "dflt" and ops2[0]["id"].startswith("_auto_")
    with pytest.raises(ValueError):
        parse_bulk(b'{"index": {}}\nnot json\n')
    with pytest.raises(ValueError):
        parse_bulk(_nd({"frobnicate": {}}))


def test_bulk_endpoint_and_delta_lifecycle(spark, tmp_path):
    """POST /_bulk -> spool -> bulk_apply builds a delta; queries see
    the docs via topk_deltas; a bulk delete tombstones them out; and
    compaction EXPUNGES the dead docs (still-gone after merge, stats
    of the live corpus only)."""
    from data_prepper_spark.index.query import topk, topk_deltas
    from data_prepper_spark.streaming.pipeline import compact_deltas

    root = str(tmp_path / "idxroot")
    with HttpSource(str(tmp_path / "spool")) as src:
        code, resp = _post(
            src.port, "/_bulk",
            _nd(
                {"index": {"_index": "logs", "_id": "1"}},
                {"content": "spark shuffle spill"},
                {"index": {"_index": "logs", "_id": "2"}},
                {"content": "grok pattern timeout"},
            ),
        )
        assert code == 200 and resp["errors"] is False
        assert [i["index"]["status"] for i in resp["items"]] == [201, 201]
        # per-index default path form
        code, resp = _post(
            src.port, "/logs/_bulk",
            _nd({"index": {"_id": "3"}}, {"content": "spark executor lost"}),
        )
        assert code == 200 and resp["items"][0]["index"]["_index"] == "logs"

        st = bulk_apply(spark, src.spool_dir, root)
        assert st["indexed"] == 3 and st["deleted"] == 0

        q = spark.createDataFrame(
            [(0, "spark")], "query_id long, query string"
        )
        hits = topk_deltas(spark, root, q, k=10).collect()
        assert len(hits) == 2  # docs 1 and 3 contain "spark"

        # second bulk: one more doc + delete doc 1
        code, resp = _post(
            src.port, "/_bulk",
            _nd(
                {"index": {"_index": "logs", "_id": "4"}},
                {"content": "spark catalyst codegen"},
                {"delete": {"_index": "logs", "_id": "1"}},
            ),
        )
        assert code == 200 and resp["errors"] is False
        st = bulk_apply(spark, src.spool_dir, root)
        assert st["indexed"] == 1 and st["deleted"] == 1
        # idempotent re-apply: spool files were retired
        st2 = bulk_apply(spark, src.spool_dir, root)
        assert st2["indexed"] == 0 and st2["deleted"] == 0

        hits = topk_deltas(spark, root, q, k=10).collect()
        ids = set()
        for r in hits:
            ids.add(r.doc_id)
        assert len(hits) == 2  # docs 3 and 4; doc 1 tombstoned

        # compaction expunges: the merged single index must not
        # resurrect doc 1, and its stats are the live corpus's
        out = str(tmp_path / "compacted")
        compact_deltas(spark, root, out)
        chits = topk(spark, out, q, k=10).collect()
        assert len(chits) == 2
        import json as _json

        stats = _json.loads(open(f"{out}/stats.json").read())
        assert stats["n_docs"] == 3  # 4 indexed - 1 deleted
