"""HNSW-lite layered ANN (datapipe/hnsw.py): the Spark walk must
reproduce the numpy mirror EXACTLY (same graph, same beam schedule),
and at an equal scored-candidate budget its recall@10 must meet or
beat IVF's — the VERDICT-r04 acceptance bar."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.datapipe.hnsw import (
    KNUTH,
    MOD32,
    hnsw_build,
    hnsw_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def np_emb():
    d = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    V = np.stack([np.asarray(x, dtype=np.float64) for x in d.embedding])
    return d.vec_id.to_numpy(), V


def _levels(ids, m_level=4, max_level=3):
    out = []
    for i in ids:
        h = (int(i) * KNUTH) % MOD32
        lv = 0
        while lv < max_level and h % (m_level ** (lv + 1)) == 0:
            lv += 1
        out.append(lv)
    return np.array(out)


def _np_build(ids, V, m_edges, max_level=3):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    L = _levels(ids)
    edges = {}
    for lv in range(max_level + 1):
        memb = np.where(L >= lv)[0]
        sub = S[np.ix_(memb, memb)].copy()
        np.fill_diagonal(sub, -2.0)
        order = np.argsort(-sub, axis=1, kind="stable")
        edges[lv] = {
            int(ids[memb[i]]): [
                int(ids[memb[j]]) for j in order[i] if j != i
            ][:m_edges]
            for i in range(len(memb))
        }
    return edges, L, Vn


def _np_search(ids, Vn, L, edges, qvec, beam, hops, k=10, max_level=3):
    """Mirror walk; returns (topk ids, scored-candidate count)."""
    qs = Vn @ (qvec / np.linalg.norm(qvec))
    byid = {int(i): qs[n] for n, i in enumerate(ids)}
    seeds = [int(ids[i]) for i in np.where(L >= max_level)[0]]
    scored = set(seeds)
    cur = sorted(seeds, key=lambda i: (-byid[i], i))[:beam]
    for lv in hops:
        nbrs = set()
        for b in cur:
            nbrs.update(edges[lv].get(b, []))
        scored |= nbrs
        cur = sorted(set(cur) | nbrs, key=lambda i: (-byid[i], i))[:beam]
    return cur[:k], len(scored), byid


def test_spark_walk_matches_numpy_mirror(spark, emb, np_emb):
    ids, V = np_emb
    edges_np, L, Vn = _np_build(ids, V, m_edges=8)
    edges = hnsw_build(emb, m_edges=8).cache()
    # graph identity first: every (level, src) adjacency list matches
    got = (
        edges.groupBy("level", "src")
        .agg(F.sort_array(F.collect_list("dst")).alias("d"))
        .collect()
    )
    for r in got:
        assert sorted(edges_np[r["level"]][r["src"]]) == list(r["d"]), (
            r["level"],
            r["src"],
        )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = (
        hnsw_topk(emb, edges, q, k=10, beam=16, hop_levels=(2, 1, 0, 0))
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    for qid in range(3):
        top, _, byid = _np_search(
            ids, Vn, L, edges_np, V[list(ids).index(qid)], 16, (2, 1, 0, 0)
        )
        sub = res[res.query_id == qid]
        assert list(sub.vec_id) == top
        got_cos = sub.cosine.to_numpy()
        want = np.array([byid[i] for i in top])
        assert np.abs(got_cos - want).max() < 1e-9


def test_recall_beats_ivf_at_equal_budget(np_emb):
    """VERDICT bar: recall@10 >= IVF's at equal candidate budget.
    HNSW (m_edges=6, beam=9, 4 hops) vs IVF (8 seed centroids,
    nprobe=2) on the embeddings fixture — budgets within 5%."""
    ids, V = np_emb
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    edges_np, L, _ = _np_build(ids, V, m_edges=6)
    cents = Vn[np.argsort(ids)[:8]]
    assign = (Vn @ cents.T).argmax(axis=1)
    rh, ch, ri, ci = [], [], [], []
    for qi in range(20):
        qv = V[qi]
        qs = Vn @ (qv / np.linalg.norm(qv))
        gt = set(np.argsort(-qs, kind="stable")[:10].tolist())
        top, n_scored, _ = _np_search(ids, Vn, L, edges_np, qv, 9, (2, 1, 0, 0))
        rh.append(len(set(top) & gt) / 10)
        ch.append(n_scored)
        qc = cents @ (qv / np.linalg.norm(qv))
        probes = np.argsort(-qc, kind="stable")[:2]
        cand = np.where(np.isin(assign, probes))[0]
        iv = sorted(cand, key=lambda i: (-qs[i], i))[:10]
        ri.append(len(set(iv) & gt) / 10)
        ci.append(len(cand))
    assert np.mean(ch) <= np.mean(ci) * 1.05, (np.mean(ch), np.mean(ci))
    assert np.mean(rh) >= np.mean(ri), (np.mean(rh), np.mean(ri))


def test_bucketed_layer0_build_recall(spark, emb, np_emb):
    """Scale-path construction (layer-0 candidates = LSH bucket
    collisions): still a valid graph — search returns full top-k with
    recall well above chance."""
    ids, V = np_emb
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    edges = hnsw_build(emb, m_edges=8, level0_nbits=6)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = hnsw_topk(emb, edges, q, k=10, beam=16).toPandas()
    assert len(res) == 30
    rec = []
    for qid in range(3):
        qv = V[list(ids).index(qid)]
        qs = Vn @ (qv / np.linalg.norm(qv))
        gt = set(ids[np.argsort(-qs, kind="stable")[:10]].tolist())
        got = set(res[res.query_id == qid].vec_id.tolist())
        rec.append(len(got & gt) / 10)
    assert np.mean(rec) >= 0.5, rec
