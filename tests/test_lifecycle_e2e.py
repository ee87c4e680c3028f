"""Capstone lifecycle narrative — the composed story an operator
runs: index template -> template-driven build -> alias ->
rollover -> multi-generation search -> snapshot -> retention ->
restore. Every step uses the real modules on real (small) indexes."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from data_prepper_spark.index.aliases import get_aliases, put_alias
from data_prepper_spark.index.build import build_index
from data_prepper_spark.index.lifecycle import apply_lifecycle
from data_prepper_spark.index.query import cat_indices, topk_multi
from data_prepper_spark.index.rollover import rollover, write_target
from data_prepper_spark.index.snapshot import restore_index
from data_prepper_spark.index.templates import (
    config_for_index,
    put_template,
)


@pytest.fixture(scope="module")
def halves(corpus_pdf, tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("lifec")
    pdf = corpus_pdf.reset_index(drop=True)
    a = pdf.iloc[: len(pdf) // 2]
    b = pdf.iloc[len(pdf) // 2:]
    pa, pb = str(d / "a.parquet"), str(d / "b.parquet")
    a.to_parquet(pa)
    b.to_parquet(pb)
    return str(d), pa, pb, a, b


def test_full_lifecycle_story(spark, halves, tmp_path):
    base, pa, pb, a, b = halves
    treg = str(tmp_path / "templates.json")
    areg = str(tmp_path / "aliases.json")
    repo = str(tmp_path / "snaprepo")

    # 1. template-driven build of generation 0 (first half)
    put_template(
        treg, "code", ["code-*"],
        {"stopwords": ["the", "a"], "n_buckets": 8},
        priority=1,
    )
    gen0 = os.path.join(str(tmp_path), "code-gen0")
    cfg = config_for_index(treg, "code-gen0")
    assert cfg.stopwords == ("the", "a") and cfg.n_buckets == 8
    build_index(spark, pa, gen0, cfg)
    stats0 = json.loads(open(os.path.join(gen0, "stats.json")).read())
    assert sorted(stats0["stopwords"]) == ["a", "the"]

    # 2. alias + rollover once gen0 is full
    put_alias(areg, "code", [gen0])
    st = rollover(areg, "code",
                  os.path.join(str(tmp_path), "code-gen1"),
                  max_docs=len(a))
    assert st["rolled_over"]
    gen1 = write_target(areg, "code")

    # 3. ingest the second half into the new write generation
    build_index(spark, pb, gen1, config_for_index(treg, "code-gen1"))

    # 4. search spans the generations (per-index idf, global merge)
    gens = get_aliases(areg)["code"]["index"]
    q = spark.createDataFrame(
        [(0, "class")], "query_id long, query string"
    )
    hits = topk_multi(spark, gens, q, k=20).collect()
    assert hits
    seen = {r["_index"] for r in hits}
    assert len(seen) == 2  # both generations contribute

    # 5. _cat over the family agrees with the per-half doc counts
    cat = {
        r["index"]: r.n_docs
        for r in cat_indices(spark, gens).collect()
    }
    assert cat[os.path.basename(gen0)] == len(a)
    assert cat[os.path.basename(gen1)] == len(b)

    # 6. lifecycle cycle: snapshot gen0 (1 rollover behind), then a
    #    second cycle with retention drops it (snapshot exists)
    log = apply_lifecycle(
        areg, "code", str(tmp_path),
        snapshot_repo=repo, snapshot_after=1,
    )
    assert [e["action"] for e in log] == ["snapshot"]
    log = apply_lifecycle(
        areg, "code", str(tmp_path),
        snapshot_repo=repo, snapshot_after=1,
        retain_generations=1,
    )
    assert [e["action"] for e in log] == ["delete"]
    assert not os.path.exists(gen0)
    assert get_aliases(areg)["code"]["index"] == [gen1]

    # 7. the dropped generation restores from its snapshot and
    #    answers queries again
    restored = str(tmp_path / "gen0_restored")
    restore_index(repo, os.path.basename(gen0), restored)
    hits2 = topk_multi(spark, [restored, gen1], q, k=20).collect()
    assert sorted(
        (r.query_id, r.rank, r.doc_id) for r in hits2
    ) == sorted((r.query_id, r.rank, r.doc_id) for r in hits)
