"""BM25F — weighted multi-field ranking over ONE physical index.

The reference stack's `multi_match` with field boosts scores each
field as its own BM25 and combines; true BM25F (Robertson/Zaragoza,
"Simple BM25 extension to multiple weighted fields", CIKM'04) instead
folds fields BEFORE saturation:

    tf~(t,d)  =  sum_f  w_f * tf_f(t,d) / B_f(d)
    B_f(d)    =  (1 - b) + b * dl_f(d) / avgdl_f
    score     =  sum_t  idf_c(t) * tf~ * (k1+1) / (k1 + tf~)

with ONE combined idf per term (df_c = docs where the term appears in
ANY field) — so a term hitting two low-weight fields saturates like
one strong hit instead of double-dipping the idf.

Index layout (no build-engine changes): each (doc, field) becomes one
corpus row — repo = the base doc key, path = the field name, content =
the field text — and flows through the NORMAL resumable build
(build.build_index): same tokenizer, salting, manifest semantics. The
docs table then IS the field map ((ord, repo=doc_key, path=field, dl))
and per-field avgdl is one tiny aggregate over it.

Query execution is a SINGLE bucket-pruned postings scan — the
dictionary holds every field's terms, so one decode pass yields every
(term, doc, field, tf, dl) triple the query touches; everything after
is Catalyst relational algebra on match-set-sized frames:

  1. decode raw (query_id, term_id, ord, tf, dl)     [one postings scan]
  2. join docs -> (doc_key, field); join broadcast field weights/avgdl
  3. combined df per term = count_distinct(doc_key) over the decoded
     frame itself (exact — the scan already holds the term's full
     posting set across fields; no second pass, no sidecar)
  4. weighted per-field normalization, sum to tf~, saturate, sum terms

At 100 TB the plan shape is identical to topk's: postings scan decodes
only matching buckets, every join key is the match set (never the
corpus), the weights/avgdl side is broadcast-tiny, and top-k uses the
same WindowGroupLimit rank. Compare textstats.multi_match (per-field
BM25 combine — kept, it is the reference's `multi_match` semantics);
this module is the principled fielded ranking the reference's users
get from OpenSearch's combined_fields/BM25F discussions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .build import BuildConfig, build_index, load_stats
from .codec import decode_many, to_signed
from .query import _pruned_postings, _sweep_deferred, query_terms


def build_fielded_index(
    spark: SparkSession,
    docs_df: DataFrame,
    index_dir: str,
    key_col: str,
    field_cols: dict[str, str],
    cfg: BuildConfig | None = None,
    work_dir: str | None = None,
) -> dict:
    """Build the BM25F index: one corpus row per (doc, field).

    field_cols maps field name -> column of docs_df holding that
    field's text. Rows whose field text is empty are dropped (a doc
    missing a field has no norm there — the Lucene contract; its
    avgdl_f averages only docs HAVING the field). Returns the build
    stats dict."""
    parts = []
    for fname, col in field_cols.items():
        parts.append(
            docs_df.select(
                F.col(key_col).cast("string").alias("repo"),
                F.lit(fname).alias("path"),
                F.lit("c0").alias("commit"),
                F.lit(fname).alias("lang"),
                F.col(col).cast("string").alias("content"),
            ).filter(F.length(F.trim(F.col("content"))) > 0)
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    cpath = work_dir or os.path.join(index_dir, "_fielded_corpus.parquet")
    corpus.write.mode("overwrite").parquet(cpath)
    return build_index(spark, cpath, index_dir, cfg or BuildConfig())


def _make_raw_decoder(chunk: int = 2048):
    """Decoder variant emitting RAW (query_id, term_id, doc_id, tf,
    dl) — no scoring math; BM25F folds fields relationally after the
    field map join, so saturation must happen post-aggregation."""

    def decode_raw(it):
        for pdf in it:
            for lo in range(0, len(pdf), chunk):
                sub = pdf.iloc[lo : lo + chunk]
                docs_v, counts = decode_many(sub["docs"].tolist(), deltas=True)
                tf_v, _ = decode_many(sub["tfs"].tolist(), deltas=False)
                dl_v, _ = decode_many(sub["dls"].tolist(), deltas=False)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(
                            sub["query_id"].to_numpy(np.int64), counts
                        ),
                        "term_id": np.repeat(
                            sub["term_id"].to_numpy(np.int64), counts
                        ),
                        "ord": to_signed(docs_v),
                        "tf": tf_v.astype(np.int64),
                        "dl": dl_v.astype(np.int64),
                    }
                )

    return decode_raw


def bm25f_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    weights: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """Top-k BM25F: (query_id, rank, doc_key, score). Tie-break
    (score desc, doc_key asc). `weights` maps field name -> boost;
    fields absent from it weigh 0 (excluded)."""
    _sweep_deferred()
    stats = load_stats(index_dir)
    k1, b = stats["k1"], stats["b"]

    qt = query_terms(
        spark, index_dir, queries, stats["n_docs"], stats=stats
    ).select("query_id", "term_id", "bucket")
    post = _pruned_postings(spark, index_dir, qt)
    raw = (
        post.join(F.broadcast(qt.select("query_id", "term_id")), "term_id")
        .select("query_id", "term_id", "docs", "tfs", "dls")
        .mapInPandas(
            _make_raw_decoder(),
            schema="query_id long, term_id long, ord long, tf long, dl long",
        )
    )

    docs = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "ord",
        F.col("repo").alias("doc_key"),
        F.col("path").alias("field"),
    )
    # field table: weight + avgdl per field (docs-having-field average)
    # — field cardinality is tiny, broadcast both ways
    fstats = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .groupBy(F.col("path").alias("field"))
        .agg(
            F.avg("dl").alias("avgdl_f"),
            F.count("*").alias("_nf"),
        )
    )
    wrows = [(fname, float(wt)) for fname, wt in weights.items()]
    wdf = spark.createDataFrame(wrows, "field string, w double")
    fields = fstats.join(wdf, "field").select("field", "avgdl_f", "w")

    # number of BASE docs (combined-idf denominator): distinct doc keys
    n_base = F.broadcast(
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .agg(F.count_distinct("repo").alias("n_base"))
    )

    attributed = raw.join(docs, "ord").join(F.broadcast(fields), "field")
    per_field = attributed.select(
        "query_id",
        "term_id",
        "doc_key",
        (
            F.col("w") * F.col("tf")
            / (1.0 - b + b * F.col("dl") / F.col("avgdl_f"))
        ).alias("tfw"),
    )
    # fold fields per (query, term, doc) BEFORE saturation
    per_doc = per_field.groupBy("query_id", "term_id", "doc_key").agg(
        F.sum("tfw").alias("tft")
    )
    # combined df per (query, term): distinct base docs in the term's
    # decoded posting set across fields — exact, derived from the same
    # single postings scan. per_doc holds ONE row per (query, term,
    # doc), so a window count(*) IS df_c; a groupBy + join-back would
    # make Catalyst duplicate the whole decode subtree (two postings
    # scans — the exact anti-pattern this executor exists to avoid)
    wqt = Window.partitionBy("query_id", "term_id")
    per_term = (
        per_doc.withColumn("df_c", F.count("*").over(wqt))
        .crossJoin(n_base)
        .select(
            "query_id",
            "doc_key",
            (
                F.log(
                    1.0
                    + (F.col("n_base") - F.col("df_c") + 0.5)
                    / (F.col("df_c") + 0.5)
                )
                * F.col("tft") * (k1 + 1.0) / (k1 + F.col("tft"))
            ).alias("partial"),
        )
    )
    scored = per_term.groupBy("query_id", "doc_key").agg(
        F.sum("partial").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_key")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_key", "score")
    )
