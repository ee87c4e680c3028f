"""Exhaustive pure-pandas/numpy BM25 oracle — the golden-output producer.

No pruning, float64 throughout, deterministic tie-break (score desc,
doc_id asc). The Spark engine must be rank-identical and score-equal to
1e-6 (FIXTURES.md §3); this mirrors the reference's golden e2e index
assertions (reference e2e-test/log/.../EndToEndBasicLogTest.java:56-71).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .tokenizer import tokenize_series
from .xxh64 import doc_id_of

K1 = 1.2
B = 0.75


def corpus_doc_ids(corpus: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [
            doc_id_of(r, p, c)
            for r, p, c in zip(corpus["repo"], corpus["path"], corpus["commit"])
        ],
        index=corpus.index,
        dtype="int64",
    )


def build_term_stats(
    corpus: pd.DataFrame,
    stopwords: tuple[str, ...] | None = None,
    stemmer: str | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (postings_df[doc_id, term, tf], docs_df[doc_id, dl]).
    `stopwords`/`stemmer` mirror the build's analyzer chain: filtered
    tokens never reach postings, dl counts indexed tokens only, and
    stemmed variants merge into one term (same order as the build:
    stop filter, then stem)."""
    doc_ids = corpus_doc_ids(corpus)
    toks = tokenize_series(corpus["content"])
    if stopwords:
        sw = set(stopwords)
        toks = toks.map(lambda ts: [t for t in ts if t not in sw])
    if stemmer == "minimal_english":
        from .tokenizer import stem_minimal_english_py

        toks = toks.map(lambda ts: [stem_minimal_english_py(t) for t in ts])
    dl = toks.map(len).astype("int64")
    docs = pd.DataFrame({"doc_id": doc_ids.values, "dl": dl.values})
    ex = pd.DataFrame(
        {"doc_id": np.repeat(doc_ids.values, dl.values),
         "term": np.concatenate([np.array(t, dtype=object) if t else np.empty(0, object) for t in toks])}
    )
    postings = (
        ex.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    )
    return postings, docs


def bm25_topk(
    corpus: pd.DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    stopwords: tuple[str, ...] | None = None,
    stemmer: str | None = None,
) -> pd.DataFrame:
    """Exhaustive top-k: returns (query_id, rank, doc_id, score)."""
    postings, docs = build_term_stats(
        corpus, stopwords=stopwords, stemmer=stemmer
    )
    n_docs = len(docs)
    avgdl = float(docs["dl"].mean())
    df_per_term = postings.groupby("term", sort=False).size()

    postings = postings.merge(docs, on="doc_id")
    qtok = tokenize_series(queries["query"])
    if stopwords:
        _sw = set(stopwords)
        qtok = qtok.map(lambda ts: [t for t in ts if t not in _sw])
    if stemmer == "minimal_english":
        from .tokenizer import stem_minimal_english_py

        qtok = qtok.map(lambda ts: [stem_minimal_english_py(t) for t in ts])
    out_rows = []
    for qid, terms in zip(queries["query_id"], qtok):
        terms = sorted(set(terms))
        if not terms:
            continue
        sub = postings[postings["term"].isin(terms)]
        if sub.empty:
            continue
        dfv = df_per_term.reindex(sub["term"]).to_numpy(dtype=np.float64)
        idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        tf = sub["tf"].to_numpy(dtype=np.float64)
        dl = sub["dl"].to_numpy(dtype=np.float64)
        part = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        agg = (
            pd.DataFrame({"doc_id": sub["doc_id"].values, "s": part})
            .groupby("doc_id", sort=True)["s"]
            .sum()
            .reset_index()
        )
        agg = agg.sort_values(
            ["s", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        for rank, (did, sc) in enumerate(zip(agg["doc_id"], agg["s"]), start=1):
            out_rows.append((int(qid), rank, int(did), float(sc)))
    return pd.DataFrame(
        out_rows, columns=["query_id", "rank", "doc_id", "score"]
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64"})
