"""HNSW-style layered ANN as deterministic DataFrame joins.

The classic HNSW (Malkov & Yashunin, TPAMI'18) is a pointer-chasing
structure: insertion-order-dependent graph, greedy descent with a
visited set — per-row imperative state that neither Catalyst nor a SQL
oracle can replay. This module keeps the two ideas that give HNSW its
quality — a layered small-world graph and beam search that coarsens
with height — and re-derives both as *deterministic relational
algebra*, so the whole structure is reproducible from the vector table
alone (the DuckDB oracle rebuilds graph AND walk value-for-value):

* **Levels** are not random draws at insert time but a pure function
  of the vector id: ``h(v) = (v * 2654435761) mod 2^32`` (Knuth
  multiplicative hash, integer-exact in any engine) and
  ``lvl(v) = #{l : h(v) mod M^l == 0}`` capped at ``max_level`` — a
  geometric ladder with expected fraction ``M^-l`` per level, same
  distribution HNSW samples, zero state.
* **Edges** at level ``l`` connect each member (``lvl >= l``) to its
  ``m_edges`` nearest neighbors by cosine among the other members
  (ties: lowest id). Construction is one self-join + window per level;
  the level-``l`` member set shrinks by ``M``× per level so upper
  layers are near-free. Layer-0 exact kNN is quadratic and therefore
  TEST-SCALE ONLY — at 100 TB pass ``level0_nbits`` to restrict
  layer-0 candidate pairs to sign-LSH bucket collisions (the banded
  equi-join shape every near-dup operator in this package uses;
  recall measured in tests), or feed ``prebuilt_edges``.
* **Search** replaces greedy descent + visited set with a fixed
  schedule of *bounded per-hop joins*: seed the beam with ALL top-level
  nodes scored exactly (the top layer has ~n/M^Lmax members — the
  multi-entry analog of HNSW's single entry point), then for each hop
  level in ``hop_levels`` expand the beam through that level's edges,
  score the frontier, and keep the top-``beam`` per query. Hop count
  is fixed, so the plan is a finite chain of joins — no iteration
  driver-side beyond the loop that builds the plan, no visited set
  (re-scored nodes dedupe by key; scores are pure).

Scale shape per hop: the beam is ``Q x beam`` rows (broadcast), edges
join is broadcast-hash against the edge table, and the frontier scoring
is one semi-join-pruned pass over the vector table — the vector table
is never shuffled. Beyond the reference (Data Prepper has no ANN; cf.
its `opensearch` sink handing vectors to a k-NN index —
data-prepper-plugins/opensearch/README) — this is the training-data
brief's similarity-search ladder: brute force < IVF/LSH < layered
graph (similarity.py:31,80,191 for the first two rungs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _bucket_col, _dot, _norm, hyperplanes

KNUTH = 2654435761
MOD32 = 4294967296


def hnsw_level(id_col: Column, m_level: int = 4, max_level: int = 3) -> Column:
    """Deterministic level: count of l in 1..max_level with
    h(id) % m_level^l == 0 (h = Knuth multiplicative hash mod 2^32).
    Integer-exact — any engine reproduces it from the id alone."""
    h = (id_col.cast("long") * F.lit(KNUTH)) % F.lit(MOD32)
    lv = F.lit(0)
    for l in range(1, max_level + 1):
        lv = lv + F.when(h % F.lit(m_level**l) == 0, 1).otherwise(0)
    return lv


def _cos(a: Column, b: Column) -> Column:
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def hnsw_build(
    vectors: DataFrame,
    m_edges: int = 8,
    m_level: int = 4,
    max_level: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    level0_nbits: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Build the layered neighbor table: (level, src, dst), dst = the
    m_edges highest-cosine members of level >= l (ties lowest id),
    self excluded.

    level0_nbits=None -> exact kNN per level (quadratic in the level's
    member count; fine for levels >= 1 whose membership shrinks
    geometrically, TEST-SCALE ONLY for the full layer 0).
    level0_nbits=k -> layer-0 candidate pairs are sign-LSH bucket
    collisions (multi-probe, hamming-1), the linear-shuffle scale path;
    upper levels stay exact (they are m_level^l times smaller)."""
    lv = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        hnsw_level(F.col(id_col), m_level, max_level).alias("_lvl"),
    )
    planes = (
        hyperplanes(dim, level0_nbits) if level0_nbits else None
    )
    out = None
    for level in range(max_level + 1):
        memb = lv.filter(F.col("_lvl") >= level)
        a = memb.select(
            F.col("_id").alias("src"), F.col("_vec").alias("_va")
        )
        b = memb.select(
            F.col("_id").alias("dst"), F.col("_vec").alias("_vb")
        )
        if level == 0 and planes is not None:
            ab = a.withColumn("_bkt", _bucket_col("_va", planes))
            bb = b.withColumn("_b0", _bucket_col("_vb", planes)).withColumn(
                "_bkt",
                F.explode(
                    F.array(
                        F.col("_b0"),
                        *[
                            F.col("_b0").bitwiseXOR(F.lit(1 << i)).cast(
                                "long"
                            )
                            for i in range(level0_nbits)
                        ],
                    )
                ),
            )
            pairs = (
                ab.join(bb, "_bkt")
                .filter(F.col("src") != F.col("dst"))
                .select("src", "_va", "dst", "_vb")
                .dropDuplicates(["src", "dst"])
            )
        else:
            pairs = a.crossJoin(b).filter(F.col("src") != F.col("dst"))
        w = Window.partitionBy("src").orderBy(
            F.desc("_c"), F.asc("dst")
        )
        lvl_edges = (
            pairs.withColumn("_c", _cos(F.col("_va"), F.col("_vb")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= m_edges)
            .select(F.lit(level).alias("level"), "src", "dst")
        )
        out = lvl_edges if out is None else out.unionByName(lvl_edges)
    return out


def hnsw_topk(
    vectors: DataFrame,
    edges: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 16,
    hop_levels: tuple[int, ...] = (2, 1, 0, 0),
    m_level: int = 4,
    max_level: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Beam search over the layered graph: (query_id, rank, vec_id,
    cosine). Seed = every node on the top level scored exactly; each
    hop expands the beam through `edges` at that hop's level, scores
    the frontier against the vector table (semi-join-pruned scan, no
    shuffle of the vector side), unions with the beam, keeps the
    top-`beam` per query (cosine desc, id asc). Fixed hop schedule ->
    finite join chain, fully oracle-reproducible."""
    v = vectors.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec")
    )
    q = F.broadcast(
        queries.select(
            F.col(qid_col).alias("_qid"), F.col(qvec_col).alias("_qvec")
        )
    )
    seeds = (
        v.withColumn("_lvl", hnsw_level(F.col("_vid"), m_level, max_level))
        .filter(F.col("_lvl") >= max_level)
        .crossJoin(q)
        .select(
            "_qid", "_vid", _cos(F.col("_vec"), F.col("_qvec")).alias("_c")
        )
    )
    wb = Window.partitionBy("_qid").orderBy(F.desc("_c"), F.asc("_vid"))
    cur = (
        seeds.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= beam)
        .select("_qid", "_vid", "_c")
        .localCheckpoint()
    )
    for level in hop_levels:
        e = edges.filter(F.col("level") == level).select("src", "dst")
        frontier = (
            F.broadcast(cur.select("_qid", "_vid"))
            .join(e, cur["_vid"] == e["src"])
            .select("_qid", F.col("dst").alias("_vid"))
            .distinct()
        )
        scored = (
            frontier.join(v, "_vid")
            .join(q, "_qid")
            .select(
                "_qid",
                "_vid",
                _cos(F.col("_vec"), F.col("_qvec")).alias("_c"),
            )
        )
        cur = (
            cur.unionByName(scored)
            .groupBy("_qid", "_vid")
            .agg(F.max("_c").alias("_c"))
            .withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= beam)
            .select("_qid", "_vid", "_c")
            .localCheckpoint()
        )
    return (
        cur.withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(qid_col),
            "rank",
            F.col("_vid").alias(id_col),
            F.col("_c").alias("cosine"),
        )
    )
