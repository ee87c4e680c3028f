"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  vectors, score every row with native JVM expressions (zip_with +
  aggregate — no Python in the hot path), window top-k.
* LSH-bucketed ANN — the scale path: random-hyperplane sign bits
  (deterministic seed) bucket both sides; only bucket-colliding pairs
  are scored (multi-probe over `probes` nearest buckets), then exact
  rerank within candidates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, vec_id, cosine).

    Cross-join with a broadcast query side — at 100 TB the scan side
    stays partition-parallel and never shuffles; cost is O(N·Q·d) pure
    JVM codegen. Tie-break: cosine desc, vec_id asc."""
    q = F.broadcast(queries.select(qid_col, qvec_col))
    scored = vectors.crossJoin(q).select(
        qid_col,
        id_col,
        (
            _dot(F.col(vec_col).cast("array<double>"), F.col(qvec_col).cast("array<double>"))
            / (_norm(F.col(vec_col).cast("array<double>")) * _norm(F.col(qvec_col).cast("array<double>")))
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).tolist()


def _bucket_col(vec_col: str, planes: list[list[float]]):
    bits = [
        F.when(_dot(F.col(vec_col).cast("array<double>"), F.array(*[F.lit(float(x)) for x in p])) >= 0, 1)
        .otherwise(0)
        .cast("long")
        for p in planes
    ]
    acc = F.lit(0).cast("long")
    for b in bits:
        acc = acc * 2 + b
    return acc


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets prune the scan
    to colliding candidates, exact cosine rerank within them. Recall
    measured against cosine_topk in tests."""
    planes = hyperplanes(dim, nbits)
    vb = vectors.withColumn("_bucket", _bucket_col(vec_col, planes))
    # multi-probe: the query also visits every hamming-1 neighbor bucket
    # (recall boost without touching the scan side's partitioning)
    qb = queries.withColumn("_b0", _bucket_col(qvec_col, planes)).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.col("_b0"),
                *[
                    F.col("_b0").bitwiseXOR(F.lit(1 << i)).cast("long")
                    for i in range(nbits)
                ],
            )
        ),
    )
    cand = vb.join(F.broadcast(qb), "_bucket")
    scored = cand.select(
        qid_col,
        id_col,
        (
            _dot(F.col(vec_col).cast("array<double>"), F.col(qvec_col).cast("array<double>"))
            / (_norm(F.col(vec_col).cast("array<double>")) * _norm(F.col(qvec_col).cast("array<double>")))
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )


def _cos_lit(vec_col: str, cvec: list[float]):
    c = F.array(*[F.lit(float(x)) for x in cvec])
    v = F.col(vec_col).cast("array<double>")
    return _dot(v, c) / (_norm(v) * _norm(c))


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 0,
    sample_cap: int = 65536,
) -> list[list[float]]:
    """Deterministic IVF coarse centroids.

    Seeds are the `n_centroids` rows with the smallest ids — a choice
    any engine can reproduce exactly (the oracle entry pins iters=0 so
    DuckDB rebuilds the identical centroid set from the table). With
    iters>0 the seeds are Lloyd-refined over a driver-side sample
    (centroids are tiny — k·d floats — so refinement is a driver numpy
    loop; the 100-TB-scale work, assignment, stays distributed)."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r[1]] for r in rows]
    if iters > 0:
        samp = np.array(
            [
                [float(x) for x in r[0]]
                for r in vectors.select(vec_col).limit(sample_cap).collect()
            ]
        )
        c = np.array(cents)
        sn = samp / np.linalg.norm(samp, axis=1, keepdims=True)
        for _ in range(iters):
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            a = (sn @ cn.T).argmax(axis=1)
            for j in range(len(c)):
                m = samp[a == j]
                if len(m):
                    c[j] = m.mean(axis=0)
        cents = c.tolist()
    return cents


def _argmax_centroid(vec_col: str, cents: list[list[float]]):
    """Index of the highest-cosine centroid (ties -> lowest index),
    as a single codegen expression: array_max over (sim, -idx) structs
    — no shuffle, no UDF."""
    arr = F.array(
        *[
            F.struct(
                _cos_lit(vec_col, c).alias("s"), F.lit(-i).alias("nc")
            )
            for i, c in enumerate(cents)
        ]
    )
    return (-F.array_max(arr)["nc"]).cast("int")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize every row to its nearest
    centroid (one map-only Catalyst pass — the inverted-file
    "posting lists" are just the _cid column, no shuffle), probe the
    `nprobe` nearest centroids per query, exact cosine rerank within
    the probed lists.

    Scale shape: the scan side is touched once and never shuffled
    (assignment is codegen over literal centroids, the query side
    broadcasts); the only exchange is the final per-query window over
    candidates, whose size is bounded by the probed lists — at 1000
    executors the candidate fraction ~ nprobe/n_centroids of the
    corpus. Complements ann_lsh_topk: IVF adapts to the data's
    cluster structure (with iters>0), LSH is data-oblivious."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(vectors, n_centroids, id_col, vec_col, iters)
    )
    vb = vectors.withColumn("_cid", _argmax_centroid(vec_col, cents))
    qarr = F.array(
        *[
            F.struct(
                _cos_lit(qvec_col, c).alias("s"), F.lit(-i).alias("nc")
            )
            for i, c in enumerate(cents)
        ]
    )
    qb = queries.withColumn(
        "_cid",
        F.explode(
            F.transform(
                F.slice(F.sort_array(qarr, asc=False), 1, nprobe),
                lambda x: (-x["nc"]).cast("int"),
            )
        ),
    )
    # a vector lives in exactly one list and a query probes distinct
    # lists, so the candidate set is duplicate-free (no DISTINCT, in
    # contrast to multi-probe LSH)
    cand = vb.join(F.broadcast(qb.select(qid_col, qvec_col, "_cid")), "_cid")
    scored = cand.select(
        qid_col,
        id_col,
        (
            _dot(
                F.col(vec_col).cast("array<double>"),
                F.col(qvec_col).cast("array<double>"),
            )
            / (
                _norm(F.col(vec_col).cast("array<double>"))
                * _norm(F.col(qvec_col).cast("array<double>"))
            )
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "cosine")
    )
