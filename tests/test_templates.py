"""Index templates (index/templates.py): composable-template
resolution (highest priority wins, no cross-template merging, name
tie-break) + BuildConfig application, verified end-to-end by
building an index whose analyzer chain comes from a template."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from data_prepper_spark.index.build import BuildConfig, build_index
from data_prepper_spark.index.templates import (
    config_for_index,
    delete_template,
    get_template,
    put_template,
    resolve_settings,
)


def test_resolution_rules(tmp_path):
    reg = str(tmp_path / "templates.json")
    put_template(reg, "logs-base", ["logs-*"], {"n_buckets": 8},
                 priority=10)
    put_template(reg, "logs-hot", ["logs-hot-*"],
                 {"n_buckets": 64, "block_size": 256}, priority=50)
    put_template(reg, "catchall", ["*"], {"n_buckets": 4}, priority=0)

    # highest priority wins, NO merging across templates
    assert resolve_settings(reg, "logs-hot-2024") == {
        "n_buckets": 64, "block_size": 256,
    }
    assert resolve_settings(reg, "logs-app") == {"n_buckets": 8}
    assert resolve_settings(reg, "metrics") == {"n_buckets": 4}

    # name tie-break at equal priority is deterministic
    put_template(reg, "a-tpl", ["tie-*"], {"n_buckets": 2}, priority=5)
    put_template(reg, "b-tpl", ["tie-*"], {"n_buckets": 3}, priority=5)
    assert resolve_settings(reg, "tie-x") == {"n_buckets": 2}

    assert get_template(reg, "logs-base")["priority"] == 10
    delete_template(reg, "catchall")
    with pytest.raises(ValueError, match="unknown index template"):
        get_template(reg, "catchall")
    with pytest.raises(ValueError, match="unknown template settings"):
        put_template(reg, "bad", ["x-*"], {"replicas": 2})
    with pytest.raises(ValueError, match="index_patterns"):
        put_template(reg, "bad", [], {"n_buckets": 2})


def test_config_application_and_build(spark, tmp_path):
    """config_for_index overlays the winning settings on a base and
    a real build honors them: stats.json carries the template's
    analyzer chain, stopwords never reach the dictionary."""
    reg = str(tmp_path / "templates.json")
    put_template(
        reg, "code", ["code-*"],
        {"stopwords": ["the", "of"], "stemmer": "minimal_english",
         "n_buckets": 4},
        priority=1,
    )
    cfg = config_for_index(reg, "code-main",
                           base=BuildConfig(block_size=64))
    assert cfg.stopwords == ("the", "of")
    assert cfg.stemmer == "minimal_english"
    assert cfg.n_buckets == 4
    assert cfg.block_size == 64  # base survives where unset
    # no match -> pure base
    assert config_for_index(reg, "other").n_buckets == \
        BuildConfig().n_buckets

    docs = pd.DataFrame({
        "repo": ["r"] * 3,
        "path": ["a", "b", "c"],
        "commit": ["c0"] * 3,
        "lang": ["en"] * 3,
        "content": [
            "the quick tables of values",
            "the lazy tables sleep",
            "quick value sorting",
        ],
    })
    import hashlib

    docs["content_sha256"] = [
        hashlib.sha256(t.encode()).hexdigest() for t in docs.content
    ]
    cpath = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(docs).coalesce(1).write.parquet(cpath)
    idx = str(tmp_path / "idx")
    build_index(spark, cpath, idx, cfg)
    stats = json.loads(open(os.path.join(idx, "stats.json")).read())
    assert sorted(stats["stopwords"]) == ["of", "the"]
    assert stats["stemmer"] == "minimal_english"
    terms = {
        r.term
        for r in spark.read.parquet(os.path.join(idx, "terms"))
        .collect()
    }
    assert "the" not in terms and "of" not in terms
    assert "table" in terms  # stemmed plural shares one term
    assert "tables" not in terms
