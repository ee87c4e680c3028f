"""Parent/child join-field queries (OpenSearch `join` field type):
has_child / has_parent / parent_id over a doc-values-modeled relation.

OpenSearch stores the relation in a mapped join field ({"name":
"question"} on parents, {"name": "answer", "parent": "<_id>"} on
children) and resolves it with doc-values + a per-shard ordinal map
(cf. the reference's passthrough of these bodies to OpenSearch, e.g.
data-prepper-plugins/opensearch). This engine models the SAME relation
as two doc-values sidecar columns, attached like any other field
(query.attach_doc_values):

- ``join_name``   — the relation name of THIS doc ("question"/"answer")
- ``join_parent`` — the parent's stored ``_id`` (the engine's `path`)
  for child docs, null for parents

Physical shapes (all equi-joins — the 100-TB story):

- has_child: inner query's match set (already index-shaped) -> dv
  lookup join (ord) -> groupBy(join_parent) with the score_mode
  aggregate + child count (ONE shuffle keyed by parent id; a viral
  parent with 10^6 children is one hot group, AQE-splittable because
  the agg is algebraic) -> equi-join against identity on path.
- has_parent: parent match set -> identity join for `path` -> children
  via ONE dv equi-join on join_parent (parent side is match-set-sized
  and follows AQE's broadcast decision, never forced).
- parent_id: pure dv predicate — no text scan at all.

Nothing here collects, crossJoins, or windows over an unbounded
frame; ranks use the same WindowGroupLimit-bounded row_number as
every other ranked path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .query import _anti_tombstones

_SCORE_MODES = ("none", "sum", "max", "min", "avg")


def _dv(spark: SparkSession, index_dir: str) -> DataFrame:
    dv = spark.read.parquet(os.path.join(index_dir, "docvalues"))
    missing = {"join_name", "join_parent"} - set(dv.columns)
    if missing:
        raise ValueError(
            "join-field queries need doc-values columns "
            f"{sorted(missing)} (attach_doc_values with the relation "
            "columns first)"
        )
    return dv.select("ord", "join_name", "join_parent")


def _ident(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "ord", "doc_id", "repo", "path", "commit"
    )


def _ranked(matched: DataFrame, ident: DataFrame, k: int,
            query_id: int, extra: list[str]) -> DataFrame:
    m = matched.withColumn("query_id", F.lit(query_id).cast("long"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("ord")
    )
    topped = m.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return ident.join(F.broadcast(topped), "ord").select(
        "query_id", "rank", "doc_id", "score",
        "repo", "path", "commit", *extra,
    )


def has_child_search(
    spark: SparkSession,
    index_dir: str,
    child_query: dict,
    child_type: str,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    k: int | None = 10,
    query_id: int = 0,
    corpus_path: str | None = None,
) -> DataFrame:
    """Parents whose children of `child_type` match `child_query`
    (HasChildQuery semantics): the inner tree runs through the normal
    compiler, its match set is restricted to join_name == child_type,
    grouped by join_parent with the score_mode aggregate over child
    BM25 scores (none -> 0.0, the OpenSearch default) plus a child
    count for min_children/max_children, then joined to the parents'
    identity rows on the stored _id. Returns the ranked search shape
    + n_children; k=None returns the pre-rank (ord, score,
    n_children) match frame (the aggs protocol)."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode '{score_mode}' not in {_SCORE_MODES}")
    from .booltree import bool_tree_match

    children = bool_tree_match(
        spark, index_dir, child_query, corpus_path
    )
    dv = _dv(spark, index_dir)
    typed = (
        children.join(dv, "ord")
        .filter(
            (F.col("join_name") == F.lit(child_type))
            & F.col("join_parent").isNotNull()
        )
    )
    agg_fn = {
        "none": F.lit(0.0),
        "sum": F.sum("score"),
        "max": F.max("score"),
        "min": F.min("score"),
        "avg": F.avg("score"),
    }[score_mode]
    per_parent = typed.groupBy("join_parent").agg(
        agg_fn.cast("double").alias("score"),
        F.count("*").alias("n_children"),
    ).filter(F.col("n_children") >= F.lit(int(min_children)))
    if max_children is not None:
        per_parent = per_parent.filter(
            F.col("n_children") <= F.lit(int(max_children))
        )
    ident = _ident(spark, index_dir)
    parents = ident.join(
        per_parent, ident["path"] == per_parent["join_parent"]
    ).select("ord", "score", "n_children")
    parents = _anti_tombstones(spark, index_dir, parents, col="ord")
    if k is None:
        return parents
    return _ranked(parents, ident, k, query_id, ["n_children"])


def has_parent_search(
    spark: SparkSession,
    index_dir: str,
    parent_query: dict,
    parent_type: str,
    score: bool = False,
    k: int | None = 10,
    query_id: int = 0,
    corpus_path: str | None = None,
) -> DataFrame:
    """Children whose parent of `parent_type` matches `parent_query`
    (HasParentQuery): parent match set restricted to join_name ==
    parent_type, identity-joined for the stored _id, then ONE dv
    equi-join finds all docs whose join_parent is a matching parent.
    score=True propagates the parent's BM25 score to every child
    (OpenSearch `score` flag); default scores 0.0. k=None returns
    the pre-rank (ord, score) match frame (the aggs protocol)."""
    from .booltree import bool_tree_match

    parents = bool_tree_match(
        spark, index_dir, parent_query, corpus_path
    )
    dv = _dv(spark, index_dir)
    ident = _ident(spark, index_dir)
    typed = parents.join(dv, "ord").filter(
        F.col("join_name") == F.lit(parent_type)
    )
    pkeys = typed.join(ident, "ord").select(
        F.col("path").alias("_pkey"),
        (F.col("score") if score else F.lit(0.0))
        .cast("double")
        .alias("_pscore"),
    )
    kids = (
        dv.filter(F.col("join_parent").isNotNull())
        .join(pkeys, dv["join_parent"] == pkeys["_pkey"])
        .select("ord", F.col("_pscore").alias("score"))
    )
    kids = _anti_tombstones(spark, index_dir, kids, col="ord")
    if k is None:
        return kids
    return _ranked(kids, ident, k, query_id, [])


def pivot_relation(
    spark: SparkSession,
    index_dir: str,
    matched: DataFrame,
    direction: str,
    rel_type: str | None = None,
) -> DataFrame:
    """(query_id, ord) match frame -> (query_id, ord) of RELATED docs
    across the join field — the `children` / `parent` aggregation
    pivot (OpenSearch ChildrenAggregator / ParentAggregator).

    direction='children': docs whose join_parent is a matched doc's
    stored _id (restricted to join_name == rel_type when given).
    direction='parent': the DISTINCT parents of matched child docs
    (children restricted to join_name == rel_type when given).

    Both directions are one identity join + one dv equi-join; the
    parent direction dedups on the parent key BEFORE joining identity
    so a million matched children of one parent collapse to one key
    row pre-join."""
    dv = _dv(spark, index_dir)
    ident = _ident(spark, index_dir)
    if direction == "children":
        pkeys = (
            matched.join(ident, "ord")
            .select("query_id", F.col("path").alias("_pkey"))
        )
        kids = dv.filter(F.col("join_parent").isNotNull())
        if rel_type:
            kids = kids.filter(F.col("join_name") == F.lit(rel_type))
        out = kids.join(
            pkeys, kids["join_parent"] == pkeys["_pkey"]
        ).select("query_id", "ord")
    elif direction == "parent":
        pk = matched.join(dv, "ord").filter(
            F.col("join_parent").isNotNull()
        )
        if rel_type:
            pk = pk.filter(F.col("join_name") == F.lit(rel_type))
        keys = pk.select(
            "query_id", F.col("join_parent").alias("_pkey")
        ).distinct()
        out = keys.join(
            ident, ident["path"] == keys["_pkey"]
        ).select("query_id", "ord")
    else:
        raise ValueError(f"direction '{direction}'")
    return _anti_tombstones(spark, index_dir, out, col="ord")


def parent_id_search(
    spark: SparkSession,
    index_dir: str,
    child_type: str,
    parent_id: str,
    k: int | None = 10,
    query_id: int = 0,
) -> DataFrame:
    """Children of one parent (ParentIdQuery): a pure doc-values
    predicate — join_name == type AND join_parent == id. Unscored
    (0.0), ranked by ordinal like other identity filters. k=None
    returns the pre-rank (ord, score) match frame."""
    dv = _dv(spark, index_dir)
    kids = dv.filter(
        (F.col("join_name") == F.lit(child_type))
        & (F.col("join_parent") == F.lit(str(parent_id)))
    ).select("ord", F.lit(0.0).alias("score"))
    kids = _anti_tombstones(spark, index_dir, kids, col="ord")
    if k is None:
        return kids
    ident = _ident(spark, index_dir)
    m = kids.withColumn("query_id", F.lit(query_id).cast("long"))
    w = Window.partitionBy("query_id").orderBy(F.asc("ord"))
    topped = m.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return ident.join(F.broadcast(topped), "ord").select(
        "query_id", "rank", "doc_id", "score", "repo", "path", "commit",
    )
