"""_explain / _termvectors / percolate / _rank_eval analogs
(index/query.py) — contributions sum to the hit score, term vectors
match a hand count, percolation is conjunctive, rank metrics match
hand-computed values."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.index.query import (
    explain_score,
    percolate,
    rank_eval,
    term_vectors,
    topk,
)


def test_explain_contributions_sum_to_score(spark, index_dir, queries_pdf):
    qdf = spark.createDataFrame(queries_pdf.head(5))
    res = topk(spark, index_dir, qdf, k=5).toPandas()
    exp = explain_score(spark, index_dir, qdf, k=5).toPandas()
    # every hit is explained, and per-term contributions sum to score
    summed = (
        exp.groupby(["query_id", "doc_id"])["contribution"].sum().reset_index()
    )
    m = res.merge(summed, on=["query_id", "doc_id"], how="left")
    assert m.contribution.notna().all()
    assert np.abs(m.score - m.contribution).max() < 1e-9
    # df/idf are per-term constants; tf >= 1 on matching rows
    assert (exp.tf >= 1).all()
    assert (exp.df >= 1).all()


def test_term_vectors_match_tokens(spark, index_dir, corpus_pdf):
    from data_prepper_spark.tokenizer import tokenize_series

    doc = corpus_pdf.iloc[0]
    docs_tbl = pd.read_parquet(os.path.join(index_dir, "docs"))
    did = docs_tbl[docs_tbl.path == doc.path].doc_id.iloc[0]
    tv = term_vectors(spark, index_dir, [int(did)]).toPandas()
    toks = tokenize_series(pd.Series([doc.content])).iloc[0]
    want = pd.Series(toks).value_counts()
    got = tv.set_index("term")["tf"]
    assert len(got) == len(want)
    assert (got.reindex(want.index) == want).all()
    # df is at least 1 (the doc itself) and ttf >= df
    assert (tv.df >= 1).all() and (tv.ttf >= tv.df).all()


def test_percolate_conjunctive(spark):
    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha"), (2, "gamma delta")],
        "query_id long, query string",
    )
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),
            (11, "alpha zeta"),
            (12, "beta delta"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.query_id)
        for r in percolate(queries, docs).collect()
    }
    # doc 10 has alpha+beta -> q0, q1; doc 11 only alpha -> q1;
    # doc 12 lacks gamma -> no q2 match
    assert got == {(10, 0), (10, 1), (11, 1)}


def test_rank_eval_hand_values(spark):
    results = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 101), (0, 3, 102)],
        "query_id long, rank int, doc_id long",
    )
    ratings = spark.createDataFrame(
        [(0, 101, 1.0), (0, 200, 1.0)],
        "query_id long, doc_id long, rating double",
    )
    out = rank_eval(results, ratings, k=3).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.precision_at_k == pytest.approx(1 / 3)
    assert r.recall_at_k == pytest.approx(1 / 2)  # 1 of 2 relevant found
    assert r.mrr == pytest.approx(1 / 2)  # first hit at rank 2
    # dcg = 1/log2(3); idcg = 1/log2(2) + 1/log2(3)
    dcg = 1 / np.log2(3)
    idcg = 1.0 + 1 / np.log2(3)
    assert r.ndcg_at_k == pytest.approx(dcg / idcg)


def test_collapse_one_hit_per_group(spark, index_dir, fixture_dir, queries_pdf):
    from data_prepper_spark.index.query import collapse_search, topk

    corpus_path = os.path.join(fixture_dir, "corpus.parquet")
    qdf = spark.createDataFrame(queries_pdf.head(4))
    out = collapse_search(
        spark, index_dir, corpus_path, qdf, field="lang", k=5
    ).toPandas()
    # at most one hit per (query, lang), ranks contiguous from 1
    assert out.groupby(["query_id", "lang"]).size().max() == 1
    for qid, grp in out.groupby("query_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
    # each collapsed hit is the best-scoring doc of its lang group:
    # its score must equal the max score of that lang in the full set
    full = topk(spark, index_dir, qdf, k=100_000).toPandas()
    docs = pd.read_parquet(os.path.join(index_dir, "docs"))
    corpus = pd.read_parquet(corpus_path)[["repo", "path", "commit", "lang"]]
    ident = docs.merge(corpus, on=["repo", "path", "commit"])
    fl = full.merge(ident[["doc_id", "lang"]], on="doc_id")
    best = fl.groupby(["query_id", "lang"]).score.max().reset_index()
    m = out.merge(best, on=["query_id", "lang"], suffixes=("", "_max"))
    assert np.abs(m.score - m.score_max).max() < 1e-9


def test_stats_facets_integer_exactness(
    spark, index_dir, fixture_dir, queries_pdf, tmp_path
):
    from data_prepper_spark.index.query import stats_facets, topk

    # the fixture corpus has no numeric stored field: derive one
    # (n_chars = content length) into an attribute-side copy; the
    # index itself is untouched (stats_facets only joins identity)
    corpus_path = str(tmp_path / "corpus_nchars.parquet")
    spark.read.parquet(os.path.join(fixture_dir, "corpus.parquet")).withColumn(
        "n_chars", F.length("content")
    ).write.parquet(corpus_path)
    qdf = spark.createDataFrame(queries_pdf.head(3))
    out = stats_facets(
        spark, index_dir, corpus_path, qdf, field="n_chars"
    ).toPandas()
    # recompute from the full match set in pandas (exact ints)
    full = topk(spark, index_dir, qdf, k=100_000).toPandas()
    docs = pd.read_parquet(os.path.join(index_dir, "docs"))
    corpus = pd.read_parquet(corpus_path)[["repo", "path", "commit", "n_chars"]]
    ident = docs.merge(corpus, on=["repo", "path", "commit"])
    fl = full.merge(ident[["doc_id", "n_chars"]], on="doc_id")
    for qid, grp in fl.groupby("query_id"):
        v = grp.n_chars.astype("int64")
        row = out[out.query_id == qid].iloc[0]
        assert row.n == len(v) and row.sum_v == v.sum()
        n, sx, sxx = len(v), int(v.sum()), int((v * v).sum())
        assert row.variance == (n * sxx - sx * sx) / (n * n)


def test_percolate_pruned_matches_plain(spark, index_dir):
    """Rarest-term-pruned percolation returns the identical match set
    as the plain term-join percolator, including queries whose rarest
    term is absent from the df table."""
    from data_prepper_spark.index.query import percolate, percolate_pruned

    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha"), (2, "gamma delta"),
         (3, "unseen alpha")],
        "query_id long, query string",
    )
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),
            (11, "alpha zeta"),
            (12, "beta delta"),
            (13, "unseen alpha here"),
        ],
        "doc_id long, text string",
    )
    dfreq = spark.createDataFrame(
        [("alpha", 3), ("beta", 2), ("gamma", 1), ("delta", 1), ("zeta", 1)],
        "term string, df long",
    )
    plain = {(r.doc_id, r.query_id) for r in percolate(queries, docs).collect()}
    pruned = {
        (r.doc_id, r.query_id)
        for r in percolate_pruned(queries, docs, dfreq).collect()
    }
    assert pruned == plain
    assert (13, 3) in pruned  # rarest term 'unseen' (df 0) still matches


def test_synonym_expansion_query_time(spark, index_dir, corpus_pdf, queries_pdf):
    """Query-time synonyms: the expanded query is term-set-equal to
    original + synonyms, and topk over the expanded text equals topk
    over a hand-expanded query."""
    from data_prepper_spark.index.query import expand_synonyms
    from data_prepper_spark.tokenizer import tokenize_series

    q = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma")], "query_id long, query string"
    )
    syn = spark.createDataFrame(
        [("alpha", "omega"), ("alpha", "psi"), ("zzz", "yyy")],
        "term string, synonym string",
    )
    out = {r.query_id: r.query for r in expand_synonyms(q, syn).collect()}
    assert set(out[0].split()) == {"alpha", "beta", "omega", "psi"}
    assert set(out[1].split()) == {"gamma"}

    # end-to-end: expansion + topk == topk of the hand-expanded text
    toks = tokenize_series(pd.Series([corpus_pdf.iloc[0].content])).iloc[0]
    a_term, b_term = toks[3], toks[40]
    q2 = spark.createDataFrame([(0, a_term)], "query_id long, query string")
    syn2 = spark.createDataFrame(
        [(a_term, b_term)], "term string, synonym string"
    )
    expanded = expand_synonyms(q2, syn2)
    got = topk(spark, index_dir, expanded, k=10).toPandas()
    want = topk(
        spark,
        index_dir,
        spark.createDataFrame(
            [(0, f"{a_term} {b_term}")], "query_id long, query string"
        ),
        k=10,
    ).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert (got.score - want.score).abs().max() < 1e-12


def test_percolate_pruned_big_registry_no_forced_broadcast(spark):
    """VERDICT r03 item 7: above the registry-size cap the percolator
    must NOT force-broadcast the stored-query registry (a millions-of-
    queries alerting registry would OOM); the plan falls back to a
    shuffle join and the match set is unchanged."""
    from pyspark.sql import functions as F

    from data_prepper_spark.index.query import percolate, percolate_pruned

    queries = spark.range(2000).select(
        F.col("id").alias("query_id"),
        F.concat(
            F.lit("term"), (F.col("id") % 50).cast("string"),
            F.lit(" common"),
        ).alias("query"),
    )
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common filler term"), (F.col("id") % 50).cast("string")
        ).alias("text"),
    )
    dfreq = spark.range(50).select(
        F.concat(F.lit("term"), F.col("id").cast("string")).alias("term"),
        F.lit(1).alias("df"),
    ).union(
        spark.createDataFrame([("common", 1000)], "term string, df long")
    )

    big = percolate_pruned(
        queries, docs, dfreq, broadcast_registry=False
    )
    plan = big._jdf.queryExecution().executedPlan().toString()
    # the registry join must not be a broadcast-hash over reg
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    got = {(r.doc_id, r.query_id) for r in big.collect()}
    want = {
        (r.doc_id, r.query_id) for r in percolate(queries, docs).collect()
    }
    assert got == want and len(got) > 0
