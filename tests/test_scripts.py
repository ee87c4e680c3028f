"""Stored scripts (index/scripts.py): the `_scripts/<id>` registry +
`{"script": {"id": ...}}` resolution inside any _search body. The
contract: a stored-id body behaves EXACTLY like the same body with
the source inlined (request params win), unknown ids fail loudly,
delete revokes."""

from __future__ import annotations

import os

import pytest

from data_prepper_spark.index.dsl import search
from data_prepper_spark.index.scripts import (
    delete_script,
    get_script,
    put_script,
    resolve_stored_scripts,
)

SRC = "_score * saturation(doc['n_chars'].value, params.k)"


@pytest.fixture(scope="module")
def env(spark, index_dir, fixture_dir, corpus_pdf, tmp_path_factory):
    from data_prepper_spark.index.query import attach_doc_values

    aug = corpus_pdf.reset_index(drop=True).copy()
    aug["n_chars"] = aug.content.str.len().astype("int64")
    d = tmp_path_factory.mktemp("scripts")
    apath = str(d / "aug.parquet")
    aug.to_parquet(apath)
    attach_doc_values(spark, index_dir, apath, cols=("n_chars",))
    return index_dir, os.path.join(fixture_dir, "corpus.parquet")


def _hits(spark, idx, body):
    return sorted(
        (r.rank, r.doc_id, round(r.score, 6))
        for r in search(spark, idx, body).hits.collect()
    )


def test_stored_script_equals_inline(spark, env):
    idx, cpath = env
    put_script(idx, "sat_chars", SRC)
    assert get_script(idx, "sat_chars") == {
        "lang": "painless", "source": SRC,
    }
    inline = {
        "query": {"script_score": {
            "query": {"match": {"content": "gunaba"}},
            "script": {"source": SRC, "params": {"k": 300}},
        }},
        "size": 20,
    }
    stored = {
        "query": {"script_score": {
            "query": {"match": {"content": "gunaba"}},
            "script": {"id": "sat_chars", "params": {"k": 300}},
        }},
        "size": 20,
    }
    hi = _hits(spark, idx, inline)
    hs = _hits(spark, idx, stored)
    assert hi == hs and hi
    # request params win: a different k must change the scores
    stored_k = {
        "query": {"script_score": {
            "query": {"match": {"content": "gunaba"}},
            "script": {"id": "sat_chars", "params": {"k": 10}},
        }},
        "size": 20,
    }
    assert _hits(spark, idx, stored_k) != hs


def test_resolve_walk_and_lifecycle(spark, env):
    idx, _ = env
    put_script(idx, "tmp_s", "doc['n_chars'].value * 2")
    body = {
        "query": {"bool": {"must": [
            {"script_score": {
                "query": {"match_all": {}},
                "script": {"id": "tmp_s"},
            }},
        ]}},
        "aggs": {"x": {"bucket_script": {
            "script": {"id": "tmp_s"}, "paths": {},
        }}},
    }
    resolved = resolve_stored_scripts(idx, body)
    # every id replaced by the stored source, original body unmutated
    ss = resolved["query"]["bool"]["must"][0]["script_score"]["script"]
    assert ss["source"] == "doc['n_chars'].value * 2"
    assert resolved["aggs"]["x"]["bucket_script"]["script"][
        "source"
    ] == "doc['n_chars'].value * 2"
    assert body["aggs"]["x"]["bucket_script"]["script"] == {"id": "tmp_s"}
    # inline specs pass through untouched
    inline_body = {"script": {"source": "1 + 1", "id_like": 1}}
    assert resolve_stored_scripts(idx, inline_body) == inline_body
    delete_script(idx, "tmp_s")
    with pytest.raises(ValueError, match="unknown stored script"):
        get_script(idx, "tmp_s")
    with pytest.raises(ValueError, match="unknown stored script"):
        resolve_stored_scripts(idx, body)
    with pytest.raises(ValueError, match="unknown stored script"):
        delete_script(idx, "tmp_s")
    with pytest.raises(ValueError, match="invalid script id"):
        put_script(idx, "a/b", "1")


def test_unknown_id_in_search_fails_loudly(spark, env):
    idx, _ = env
    with pytest.raises(ValueError, match="unknown stored script"):
        search(spark, idx, {
            "query": {"script_score": {
                "query": {"match_all": {}},
                "script": {"id": "never_put"},
            }},
        })


def test_search_shards_layout(spark, env):
    """_search_shards analog: one row per postings bucket partition
    with file count/bytes + per-bucket dictionary term counts; term
    counts sum to the dictionary size, bucket ids match the physical
    dirs, n_buckets echoes stats.json."""
    import os

    from data_prepper_spark.index.query import load_stats, search_shards

    idx, _ = env
    got = search_shards(spark, idx).toPandas()
    stats = load_stats(idx)
    phys = sorted(
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(idx, "postings"))
        if d.startswith("bucket=")
    )
    assert got.bucket.tolist() == phys
    assert (got.files >= 1).all() and (got["bytes"] > 0).all()
    n_terms_total = spark.read.parquet(
        os.path.join(idx, "terms")
    ).count()
    assert int(got.n_terms.sum()) == n_terms_total
    assert (got.n_buckets == stats["n_buckets"]).all()


def test_profile_section(spark, env):
    """body {"profile": true}: DSLResult.profile carries the compiled
    post-rewrite query tree (OpenSearch profile query-section shape),
    the Catalyst physical plan for hits, per-aggregation plans, and
    the measured driver compile time; absent without the flag."""
    idx, cpath = env
    body = {
        "query": {"bool": {
            "must": [{"match": {"content": "gunaba"}}],
            "filter": [{"range": {"n_chars": {"gte": 0}}}],
        }},
        "aggs": {"hist": {"histogram": {
            "field": "n_chars", "interval": 5000,
        }}},
        "profile": True,
    }
    res = search(spark, idx, body, corpus_path=cpath)
    prof = res.profile
    assert prof is not None and prof["compile_ms"] > 0
    (qt,) = prof["query"]
    assert qt["type"] == "bool"
    kinds = sorted(c["type"] for c in qt["children"])
    assert kinds == ["match", "range"]
    assert all(
        isinstance(c["description"], str) for c in qt["children"]
    )
    assert "== Physical Plan ==" in prof["hits_plan"]
    assert "hist" in prof["aggregation_plans"]
    assert prof["aggregation_plans"]["hist"].strip()
    # no flag -> no profile
    assert search(
        spark, idx, {"query": {"match": {"content": "gunaba"}}}
    ).profile is None


def test_rollover_lifecycle(spark, env, tmp_path):
    """_rollover analog (index/rollover.py): conditions evaluate
    against the write generation (built index stats.json OR summed
    delta-tree stats), dry_run reports without mutating, a met
    condition atomically appends the next generation + moves the
    write pointer, duplicates and filtered aliases refuse."""
    import json
    import os

    from data_prepper_spark.index.aliases import get_aliases, put_alias
    from data_prepper_spark.index.rollover import (
        _count_docs,
        rollover,
        write_target,
    )

    idx, _ = env
    reg = str(tmp_path / "aliases.json")
    put_alias(reg, "logs", [idx])
    n = json.load(open(os.path.join(idx, "stats.json")))["n_docs"]
    gen2 = str(tmp_path / "gen2")

    # not met -> no-op
    st = rollover(reg, "logs", gen2, max_docs=n + 1)
    assert st["rolled_over"] is False
    assert write_target(reg, "logs") == idx

    # met but dry_run -> reported, not applied
    st = rollover(reg, "logs", gen2, max_docs=n, dry_run=True)
    assert st["rolled_over"] is False
    assert st["conditions"][f"[max_docs: {n}]"] is True
    assert write_target(reg, "logs") == idx

    # met -> rolls, registry updated atomically
    st = rollover(reg, "logs", gen2, max_docs=n)
    assert st["rolled_over"] is True and st["new_index"] == gen2
    assert get_aliases(reg)["logs"]["index"] == [idx, gen2]
    assert write_target(reg, "logs") == gen2

    # fresh write generation counts 0 docs -> size/docs not met
    st = rollover(reg, "logs", str(tmp_path / "gen3"), max_docs=1,
                  max_size_bytes=1)
    assert st["rolled_over"] is False

    # delta-tree generation: per-delta stats sum
    droot = str(tmp_path / "droot")
    for i, nd in enumerate((3, 2)):
        os.makedirs(os.path.join(droot, f"delta={i}"))
        with open(os.path.join(droot, f"delta={i}", "stats.json"),
                  "w") as f:
            json.dump({"n_docs": nd, "avgdl": 1.0}, f)
    assert _count_docs(droot) == 5

    # duplicate generation refuses
    with pytest.raises(ValueError, match="already a generation"):
        rollover(reg, "logs", gen2, max_docs=0)
    # filtered alias refuses
    put_alias(reg, "tenant", idx,
              filter={"term": {"content": "x"}})
    with pytest.raises(NotImplementedError, match="filtered"):
        rollover(reg, "tenant", gen2, max_docs=0)
    # no conditions refuses
    with pytest.raises(ValueError, match="condition"):
        rollover(reg, "logs", str(tmp_path / "gen4"))


def test_cat_indices(spark, env, index_dir):
    """_cat/indices facade: one stats+bytes row per index; named
    dict and dir-list forms agree."""
    from data_prepper_spark.index.query import cat_indices, index_stats

    idx, _ = env
    got = cat_indices(spark, {"main": idx}).collect()
    assert len(got) == 1
    row = got[0]
    ref = index_stats(spark, idx).collect()[0]
    assert row["index"] == "main"
    assert row.n_docs == ref.n_docs and row.n_terms == ref.n_terms
    assert row["bytes"] > 0
    aslist = cat_indices(spark, [idx]).collect()[0]
    assert aslist.n_docs == row.n_docs
    with pytest.raises(ValueError, match="at least one"):
        cat_indices(spark, [])
