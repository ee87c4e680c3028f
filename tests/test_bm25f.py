"""BM25F weighted multi-field ranking (index/bm25f.py): fielded index
built through the NORMAL build (one corpus row per (doc, field)),
queried with one postings scan; per-field length normalization,
weighted tf folding BEFORE saturation, combined idf. Oracle: direct
numpy recompute from the raw fields."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.index.bm25f import bm25f_topk, build_fielded_index
from data_prepper_spark.index.build import BuildConfig
from data_prepper_spark.tokenizer import tokenize_series

K1, B = 1.2, 0.75
WEIGHTS = {"title": 2.0, "body": 1.0}


@pytest.fixture(scope="module")
def fielded(spark, corpus_pdf, tmp_path_factory):
    """Fielded index over the fixture corpus: body = content, title =
    the first 10 tokens (deterministic, retokenizes to itself)."""
    idx = str(tmp_path_factory.mktemp("bm25f_idx"))
    docs = spark.createDataFrame(
        corpus_pdf[["path", "content"]].rename(columns={"path": "doc"})
    )
    from data_prepper_spark.tokenizer import tokenize_col

    docs = docs.select(
        "doc",
        F.col("content").alias("body"),
        F.array_join(F.slice(tokenize_col(F.col("content")), 1, 10), " ")
        .alias("title"),
    )
    build_fielded_index(
        spark, docs, idx, key_col="doc",
        field_cols={"body": "body", "title": "title"},
        cfg=BuildConfig(n_buckets=8),
    )
    return idx


def _oracle(corpus_pdf: pd.DataFrame, qtext: str, k: int = 10):
    toks = tokenize_series(corpus_pdf["content"])
    fields = {
        "body": toks,
        "title": toks.map(lambda xs: xs[:10]),
    }
    keys = corpus_pdf["path"].tolist()
    qterms = sorted(set(tokenize_series(pd.Series([qtext]))[0]))
    per_field = {}
    for fname, col in fields.items():
        dl = col.map(len).to_numpy(float)
        has = dl > 0
        per_field[fname] = (col, dl, dl[has].mean())
    n_base = len(keys)
    scores: dict[str, float] = {}
    for t in qterms:
        tft: dict[int, float] = {}
        for fname, (col, dl, avg) in per_field.items():
            w = WEIGHTS[fname]
            for i, xs in enumerate(col):
                tf = xs.count(t)
                if tf:
                    tft[i] = tft.get(i, 0.0) + (
                        w * tf / (1 - B + B * dl[i] / avg)
                    )
        if not tft:
            continue
        df_c = len(tft)
        idf = math.log(1 + (n_base - df_c + 0.5) / (df_c + 0.5))
        for i, v in tft.items():
            scores[keys[i]] = scores.get(keys[i], 0.0) + (
                idf * v * (K1 + 1) / (K1 + v)
            )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def test_bm25f_matches_oracle(spark, fielded, corpus_pdf):
    cases = [(0, "dibaba bababa"), (1, "def class"), (2, "init")]
    q = spark.createDataFrame(cases, "query_id long, query string")
    res = (
        bm25f_topk(spark, fielded, q, weights=WEIGHTS, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    assert len(res) == 30  # every query must actually match docs
    for qid, qtext in cases:
        gold = _oracle(corpus_pdf, qtext)
        got = res[res.query_id == qid]
        assert got["doc_key"].tolist() == [d for d, _ in gold], qtext
        assert np.allclose(
            got["score"].to_numpy(), [s for _, s in gold], atol=1e-6
        ), qtext


def test_title_boost_changes_ranking(spark, fielded, corpus_pdf):
    """A term in a doc's first-10-tokens must outrank the same tf
    buried in a long body when the title weight dominates — the point
    of field boosts."""
    q = spark.createDataFrame(
        [(0, "dibaba")], "query_id long, query string"
    )
    heavy = bm25f_topk(
        spark, fielded, q, weights={"title": 10.0, "body": 0.01}, k=50
    ).toPandas()
    toks = tokenize_series(corpus_pdf["content"])
    title_has = {
        p for p, xs in zip(corpus_pdf["path"], toks) if "dibaba" in xs[:10]
    }
    assert title_has  # the fixture must exercise the boost
    top = heavy.sort_values("rank").head(10)["doc_key"].tolist()
    assert len(top) == 10
    assert all(d in title_has for d in top)


def test_single_postings_scan(spark, fielded):
    """The VERDICT r04 #5 plan contract: ONE scan of the postings
    parquet (both fields share the dictionary and decode pass), never
    a per-field scan."""
    q = spark.createDataFrame(
        [(0, "dibaba bababa")], "query_id long, query string"
    )
    res = bm25f_topk(spark, fielded, q, weights=WEIGHTS, k=10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    post_path = os.path.join(fielded, "postings")
    scans = [
        ln for ln in plan.splitlines()
        if "Scan parquet" in ln and "postings" in ln
    ]
    assert len(scans) == 1, f"expected ONE postings scan, got:\n{plan}"
    assert post_path.rsplit("/", 1)[-1] in scans[0]


def test_zero_weight_field_excluded(spark, fielded, corpus_pdf):
    """weights {'body': 1.0} alone must equal plain BM25F with the
    title field absent — title postings decode but weigh zero via the
    weights-join filter (absent fields drop in the inner join)."""
    q = spark.createDataFrame(
        [(0, "cebaba")], "query_id long, query string"
    )
    res = bm25f_topk(
        spark, fielded, q, weights={"body": 1.0}, k=10
    ).toPandas()
    assert len(res) == 10
    # recompute single-field BM25F == body-only
    toks = tokenize_series(corpus_pdf["content"])
    dl = toks.map(len).to_numpy(float)
    avg = dl[dl > 0].mean()
    n = len(corpus_pdf)
    tfs = np.array([xs.count("cebaba") for xs in toks], float)
    hit = tfs > 0
    dfc = int(hit.sum())
    idf = math.log(1 + (n - dfc + 0.5) / (dfc + 0.5))
    tft = tfs[hit] / (1 - B + B * dl[hit] / avg)
    sc = idf * tft * (K1 + 1) / (K1 + tft)
    keys = corpus_pdf["path"].to_numpy()[hit]
    gold = sorted(zip(keys, sc), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert res.sort_values("rank")["doc_key"].tolist() == [
        d for d, _ in gold
    ]
