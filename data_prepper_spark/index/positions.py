"""Optional positional sidecar: index-side phrase / sloppy-phrase
queries (the reference stack's match_phrase with index_options=
positions — Lucene records term positions per doc field; reference
opensearch/.../BulkRetryStrategy ships the documents whose analyzed
positions OpenSearch stores).

The default build records per-(doc, term) tf only (tokens v3) — the
right trade for BM25 top-k, where positions are dead weight. This
module adds the classic Lucene option as an OPT-IN second artifact:

  index_dir/positions/   (doc_id, term, positions array<int>)

built by one extra corpus pass (`build_positions`) with the same
Arrow-native tokenizer the main build uses. A production build would
fold this into the single tokenize pass behind a BuildConfig flag;
keeping it a separate stage here means the hot path pays nothing and
the artifact is independently rebuildable (like `attach_doc_values`).

`phrase_topk_positional` then answers exact and ordered-slop phrase
queries WITHOUT touching the corpus: the positions scan prunes on a
term-IN pushdown, docs holding all phrase terms survive a counted
join, and a per-doc fold intersects successive terms' position lists
(positions of term i+1 within (prev, prev+1+slop]). Phrase frequency
= surviving positions — the standard positional-intersection
algorithm, expressed in Catalyst array functions (no Python in the
query path).

Documented divergence: slop here is ORDERED slop (terms must appear
in phrase order, gaps up to `slop` tokens); Lucene's sloppy phrase
also permits transpositions with an edit-cost budget.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tokenizer import tokenize_col

POSITIONS_SCHEMA = "doc_id long, term string, positions array<int>"


def _positions_batches(it):
    import numpy as np
    import pyarrow as pa

    from ..tokenizer import tokenize_flat_arrow

    for batch in it:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        flat, doc_idx, counts = tokenize_flat_arrow(batch.column("content"))
        if len(flat) == 0:
            continue
        # position of each kept token within its doc (0-based)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos = np.arange(len(doc_idx), dtype=np.int64) - starts[doc_idx]
        # group rows by (doc, term): dictionary-encode terms, stable
        # lexsort keyed (doc, term_code, pos) -> contiguous groups with
        # positions already in ascending order inside each group
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, codes, doc_idx))
        d_s, c_s, p_s = doc_idx[order], codes[order], pos[order]
        boundary = np.empty(len(order), bool)
        boundary[0] = True
        np.not_equal(d_s[1:], d_s[:-1], out=boundary[1:])
        np.logical_or(
            boundary[1:], c_s[1:] != c_s[:-1], out=boundary[1:]
        )
        group_start = np.flatnonzero(boundary)
        offsets = np.append(group_start, len(order)).astype(np.int32)
        values = pa.array(p_s.astype(np.int32))
        positions = pa.ListArray.from_arrays(pa.array(offsets), values)
        terms = dic.dictionary.take(pa.array(c_s[group_start]))
        out_docs = pa.array(doc_ids[d_s[group_start]], type=pa.int64())
        yield pa.RecordBatch.from_arrays(
            [out_docs, terms, positions], ["doc_id", "term", "positions"]
        )


def build_positions(
    spark: SparkSession, corpus_path: str, index_dir: str
) -> None:
    """One corpus pass -> positions sidecar at index_dir/positions.
    Same scan discipline as the tokenize stage (maxPartitionBytes
    splits give the parallelism; no shuffle before the write)."""
    src = spark.read.parquet(corpus_path).select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"), "content"
    )
    out = src.mapInArrow(_positions_batches, schema=POSITIONS_SCHEMA)
    out.write.mode("overwrite").parquet(os.path.join(index_dir, "positions"))


def phrase_topk_positional(
    spark: SparkSession,
    index_dir: str,
    phrases: DataFrame,
    k: int = 10,
    slop: int = 0,
    tie_expr=None,
) -> DataFrame:
    """Phrase top-k from the positions sidecar alone (no corpus I/O):
    phrase frequency ranks the hits (freq desc, identity asc).
    phrases: (query_id, phrase). Returns (query_id, rank, doc_id,
    phrase_freq, repo, path, commit)."""
    ptoks = tokenize_col(F.col("phrase"))
    q = phrases.select(
        "query_id", F.posexplode(ptoks).alias("ti", "term")
    )
    qn = q.groupBy("query_id").agg(F.count("*").alias("_n"))
    terms = [r["term"] for r in q.select("term").distinct().collect()]
    pos = (
        spark.read.parquet(os.path.join(index_dir, "positions"))
        .filter(F.col("term").isin(terms))
    )
    j = q.join(pos, "term").select("query_id", "ti", "doc_id", "positions")
    grouped = (
        j.groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("_nt"),
            F.array_sort(
                F.collect_list(F.struct("ti", "positions"))
            ).alias("_arr"),
        )
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("_nt") == F.col("_n"))
    )
    # fold: surviving positions of term i+1 lie in (prev, prev+1+slop]
    win = F.lit(1 + slop)
    folded = grouped.withColumn(
        "_match",
        F.aggregate(
            F.slice(F.col("_arr"), 2, F.size("_arr") - 1),
            F.col("_arr")[0]["positions"],
            lambda acc, x: F.filter(
                x["positions"],
                lambda p: F.exists(
                    acc, lambda c: (p > c) & (p <= c + win)
                ),
            ),
        ),
    ).withColumn("phrase_freq", F.size("_match")).filter(
        F.col("phrase_freq") > 0
    )
    ident = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "doc_id", "repo", "path", "commit"
    )
    out = folded.join(ident, "doc_id")
    tie = F.col("doc_id") if tie_expr is None else tie_expr
    w = Window.partitionBy("query_id").orderBy(
        F.desc("phrase_freq"), F.asc(tie)
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id", "phrase_freq",
            "repo", "path", "commit",
        )
    )
