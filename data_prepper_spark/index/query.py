"""BM25 top-k query executor over the posting-block index.

Replaces the reference's OpenSearch query side (reference
opensearch/.../source/opensearch/worker/PitWorker.java:173-181 pages an
index via PIT + search_after; here deterministic partition pruning on
the term-hash-bucketed postings table replaces pagination).

Two modes, both exact:
  * exhaustive  — decode every matching block, native groupBy sum +
    window top-k. All heavy math vectorized numpy inside mapInPandas.
  * blockmax    — block-max pruning (WAND-family, SURVEY.md §4 item 2):
    phase A scores only the top-`probe` blocks per (query, term) to get
    a top-k score lower bound θ; phase B decodes only blocks whose
    upper bound idf·block_max + Σ_{other terms} idf·max_impact ≥ θ.
    A doc whose every block is pruned provably scores < θ, so the
    result is identical to exhaustive (asserted in tests).

Scoring: score = Σ_t idf_t · tf(k1+1)/(tf + k1(1−b+b·dl/avgdl)),
idf = ln(1 + (N−df+0.5)/(df+0.5)); tie-break score desc, doc_id asc.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tokenizer import tokenize_col
from .build import load_stats
from .codec import decode_many, to_signed


def _idf_col(n_docs: int):
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )


def query_terms(
    spark: SparkSession, index_dir: str, queries: DataFrame, n_docs: int
) -> DataFrame:
    """(query_id, query) -> (query_id, term, df, idf, bucket, max_impact).

    Terms absent from the dictionary drop out (they contribute 0 to
    every score). Duplicate terms within a query count once (standard
    bag-of-words query with binary query-term weights, matching the
    oracle)."""
    qt = queries.select(
        "query_id",
        F.explode(F.array_distinct(tokenize_col(F.col("query")))).alias("term"),
    )
    terms = spark.read.parquet(os.path.join(index_dir, "terms"))
    return (
        qt.join(terms, "term")
        .withColumn("idf", _idf_col(n_docs))
        .select("query_id", "term", "term_id", "df", "idf", "bucket", "max_impact")
    )


def _make_decoder(k1: float, b: float, avgdl: float, with_query: bool = True):
    def decode_score(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            docs_v, counts = decode_many(pdf["docs"].tolist(), deltas=True)
            tf_v, _ = decode_many(pdf["tfs"].tolist(), deltas=False)
            dl_v, _ = decode_many(pdf["dls"].tolist(), deltas=False)
            doc_ids = to_signed(docs_v)
            tf = tf_v.astype(np.float64)
            dl = dl_v.astype(np.float64)
            impact = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            idf = np.repeat(pdf["idf"].to_numpy(np.float64), counts)
            out = {
                "doc_id": doc_ids,
                "partial": idf * impact,
            }
            if with_query:
                out["query_id"] = np.repeat(
                    pdf["query_id"].to_numpy(np.int64), counts
                )
            yield pd.DataFrame(out)

    return decode_score


def _ranked(scored: DataFrame, k: int) -> DataFrame:
    """Rank on the dense ordinal (column named doc_id inside the
    decode path). ord order == doc_id order by construction, so the
    (score desc, doc_id asc) tie-break is preserved exactly."""
    res = scored.groupBy("query_id", "doc_id").agg(
        F.sum("partial").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        res.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _resolve_ords(spark: SparkSession, index_dir: str, ranked: DataFrame) -> DataFrame:
    """Map dense ordinals back to real doc ids. The ranked side is
    tiny (≤ queries × k rows) — broadcast it into the docs scan, so
    this works unchanged when the docs table has 10^12 rows."""
    ords = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "ord", F.col("doc_id").alias("_doc_id")
    )
    r = ranked.withColumnRenamed("doc_id", "ord")
    return (
        ords.join(F.broadcast(r), "ord")
        .select(
            "query_id", "rank", F.col("_doc_id").alias("doc_id"), "score"
        )
    )


def _pruned_postings(spark: SparkSession, index_dir: str, qt: DataFrame) -> DataFrame:
    """Scan only the postings partitions any query term hashes to —
    driver-side partition pruning (buckets list is tiny)."""
    buckets = [int(r["bucket"]) for r in qt.select("bucket").distinct().collect()]
    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    return post.filter(F.col("bucket").isin(buckets))


def topk_with_docs(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    mode: str = "blockmax",
) -> DataFrame:
    """topk + doc identity columns (repo, path, commit) — the
    user-facing result shape (doc ids resolve via the docs table;
    broadcast because top-k results are tiny relative to it)."""
    res = topk(spark, index_dir, queries, k=k, mode=mode)
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "doc_id", "repo", "path", "commit"
    )
    return res.join(docs, "doc_id", "left").select(
        "query_id", "rank", "doc_id", "score", "repo", "path", "commit"
    )


def topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    mode: str = "exhaustive",
    probe_blocks: int = 2,
) -> DataFrame:
    """Top-k BM25 per query: (query_id, rank, doc_id, score)."""
    # block rows are FAT (≈1.3 KB varbyte payload -> ~70 decode
    # temporary bytes per encoded byte): cap UDF batches so decode
    # working sets stay cache-friendly (the build stage sets 64k for
    # its skinny rows; that setting must not leak into the query path)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    stats = load_stats(index_dir)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    qt = query_terms(spark, index_dir, queries, n_docs)
    post = _pruned_postings(spark, index_dir, qt)
    decoder = _make_decoder(k1, b, avgdl)

    if mode == "exhaustive":
        joined = post.join(
            F.broadcast(qt.select("query_id", "term_id", "idf")), "term_id"
        )
        scored = joined.select(
            "query_id", "idf", "docs", "tfs", "dls"
        ).mapInPandas(decoder, schema="query_id long, doc_id long, partial double")
        return _resolve_ords(spark, index_dir, _ranked(scored, k))

    if mode != "blockmax":
        raise ValueError(f"unknown mode {mode!r}")

    # Σ_t idf·max_impact per query, to bound the "other terms" part
    qt = qt.withColumn("ub_term", F.col("idf") * F.col("max_impact"))
    q_ub = qt.groupBy("query_id").agg(F.sum("ub_term").alias("ub_total"))
    qtb = F.broadcast(
        qt.join(q_ub, "query_id").select(
            "query_id", "term_id", "idf", "ub_term", "ub_total"
        )
    )
    joined = post.join(qtb, "term_id")
    joined.persist()
    try:
        # phase A: probe the highest-block_max blocks per (query, term)
        wprobe = Window.partitionBy("query_id", "term_id").orderBy(
            F.desc("block_max"), F.asc("min_doc")
        )
        probed = (
            joined.withColumn("brank", F.row_number().over(wprobe))
            .filter(F.col("brank") <= probe_blocks)
            .select("query_id", "idf", "docs", "tfs", "dls")
            .mapInPandas(decoder, schema="query_id long, doc_id long, partial double")
        )
        theta = (
            _ranked(probed, k)
            .groupBy("query_id")
            .agg(F.count("*").alias("cnt"), F.min("score").alias("kth"))
            .withColumn(
                "theta",
                F.when(F.col("cnt") >= k, F.col("kth")).otherwise(F.lit(0.0)),
            )
            .select("query_id", "theta")
        )
        # phase B: keep blocks whose upper bound can reach θ
        survivors = (
            joined.join(F.broadcast(theta), "query_id", "left")
            .withColumn(
                "ub",
                F.col("idf") * F.col("block_max")
                + F.col("ub_total")
                - F.col("ub_term"),
            )
            .filter(
                F.col("theta").isNull() | (F.col("ub") >= F.col("theta"))
            )
            .select("query_id", "idf", "docs", "tfs", "dls")
        )
        scored = survivors.mapInPandas(
            decoder, schema="query_id long, doc_id long, partial double"
        )
        return _resolve_ords(spark, index_dir, _ranked(scored, k))
    finally:
        # the returned (lazy) DataFrame still references the cached
        # join; callers that materialize it benefit from the reuse
        # across phases A and B, and the short-lived session reclaims
        # the block on stop
        pass
