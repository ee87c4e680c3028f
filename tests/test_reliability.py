"""DLQ/quarantine + resumable-build semantics (SURVEY.md §2.10,
FIXTURES.md §4-5): the Data Prepper ack/lease-store contract recast as
manifest anti-joins and per-row sha256 assertion."""

import os

import pandas as pd
import pytest

from data_prepper_spark.corpus import write_corrupt_corpus
from data_prepper_spark.index import manifest as mf
from data_prepper_spark.index.build import (
    BuildConfig,
    build_index,
    read_quarantine,
)
from data_prepper_spark.index.query import topk

CFG = BuildConfig(n_buckets=8, hot_group_target=2_000)


def test_corrupt_rows_quarantined_never_indexed(spark, tmp_path):
    corpus = str(tmp_path / "corrupt.parquet")
    write_corrupt_corpus(0.001, corpus)
    idx = str(tmp_path / "idx")
    build_index(spark, corpus, idx, CFG)

    q = read_quarantine(spark, idx).toPandas()
    # 1000 docs: i%100==13 -> bad sha (10), i%200==57 & not bad_sha -> null (5)
    assert len(q) == 15
    assert set(q["plugin_name"]) == {"sha256_validator"}
    assert set(q["pipeline_name"]) == {"index-build"}
    assert {"content sha256 mismatch", "content is null"} == set(
        q["error_message"]
    )

    # quarantined docs are not in the docs table
    from data_prepper_spark.xxh64 import doc_id_of

    bad_ids = {
        doc_id_of(r, p, c)
        for r, p, c in zip(q["repo"], q["path"], q["commit"])
    }
    docs = spark.read.parquet(os.path.join(idx, "docs")).toPandas()
    assert not bad_ids & set(docs["doc_id"])
    assert len(docs) == 1000 - 15

    # manifest records the failure in sha256_ok + lineage
    m = mf.read_manifest(idx)
    tok = m[m["stage"] == "tokenize"]
    assert not tok["sha256_ok"].any()  # single unit, had failures
    assert tok["rows_in"].sum() == 1000


def test_resume_skips_completed_units(spark, multiunit_corpus, fresh_dir):
    # run 1: tokenize only the first unit, then "crash"
    out = build_index(spark, multiunit_corpus, fresh_dir, CFG, max_units=1)
    assert out == {"partial": True}
    att1 = mf.attempts(fresh_dir, "tokenize")
    assert len(att1) == 1

    # run 2: full build resumes — completed unit NOT re-tokenized
    stats = build_index(spark, multiunit_corpus, fresh_dir, CFG)
    att2 = mf.attempts(fresh_dir, "tokenize")
    assert len(att2) == 2
    done_unit = next(iter(att1))
    assert att2[done_unit] == att1[done_unit] == 1  # attempt unchanged
    assert stats["n_docs"] == 1000

    # run 3: idempotent — nothing re-runs, same stats returned
    stats3 = build_index(spark, multiunit_corpus, fresh_dir, CFG)
    att3 = mf.attempts(fresh_dir, "tokenize")
    assert att3 == att2
    assert stats3 == stats


def test_resumed_index_identical_to_uninterrupted(
    spark, multiunit_corpus, tmp_path, queries_pdf
):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(spark, multiunit_corpus, a, CFG, max_units=1)
    build_index(spark, multiunit_corpus, a, CFG)  # resume
    build_index(spark, multiunit_corpus, b, CFG)  # uninterrupted

    qdf = spark.createDataFrame(queries_pdf)
    ra = topk(spark, a, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    rb = topk(spark, b, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(ra, rb)

    # block-level identity: same (term, min_doc, n, payload) everywhere
    pa_ = (
        spark.read.parquet(os.path.join(a, "postings"))
        .select("term_id", "min_doc", "n", "docs", "tfs")
        .toPandas()
        .sort_values(["term_id", "min_doc"])
        .reset_index(drop=True)
    )
    pb_ = (
        spark.read.parquet(os.path.join(b, "postings"))
        .select("term_id", "min_doc", "n", "docs", "tfs")
        .toPandas()
        .sort_values(["term_id", "min_doc"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pa_, pb_)


def test_manifest_lineage_rows_exist(spark, index_dir):
    m = mf.read_manifest(index_dir)
    assert set(m["stage"]) >= {"tokenize", "index"}
    assert (m["status"] == "COMPLETE").all()
    assert (m[m["stage"] == "tokenize"]["rows_out"] > 0).all()
    # per-bucket lineage rows for the index stage
    assert (m["partition_id"].str.startswith("bucket=")).any()


def test_build_and_resume_with_file_uri(spark, multiunit_corpus, tmp_path):
    """The manifest/units/stats layer runs through the pyarrow.fs shim:
    an index addressed by file:// URI builds, resumes idempotently and
    answers queries — the object-store code path exercised locally."""
    idx = "file://" + str(tmp_path / "uri_idx")
    stats = build_index(spark, multiunit_corpus, idx, CFG)
    assert stats["n_docs"] > 0
    # manifest was written + read back through the shim
    m = mf.read_manifest(idx)
    assert (m["status"] == "COMPLETE").all() and len(m) > 0
    att = mf.attempts(idx, "tokenize")
    # idempotent re-run: nothing re-tokenizes
    stats2 = build_index(spark, multiunit_corpus, idx, CFG)
    assert stats2 == stats
    assert mf.attempts(idx, "tokenize") == att
    q = spark.createDataFrame(
        [(0, "def main")], "query_id long, query string"
    )
    assert topk(spark, idx, q, k=5).count() >= 0


def test_snapshot_restore_roundtrip(spark, index_dir, queries_pdf, tmp_path):
    """_snapshot analog: snapshot -> verify -> restore yields an index
    answering queries identically; incomplete snapshots (no manifest)
    refuse to restore; tampered bytes fail verification."""
    import json
    import os

    import pytest as _pytest

    from data_prepper_spark.index.query import topk
    from data_prepper_spark.index.snapshot import (
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    repo = str(tmp_path / "snaprepo")
    man = snapshot_index(index_dir, repo, "snap1")
    assert man["n_files"] > 0
    verify_snapshot(repo, "snap1")
    # immutable: same name refuses
    with _pytest.raises(RuntimeError):
        snapshot_index(index_dir, repo, "snap1")

    restored = str(tmp_path / "restored")
    stats = restore_index(repo, "snap1", restored)
    assert stats["n_docs"] > 0
    qdf = spark.createDataFrame(queries_pdf.head(5))
    a = topk(spark, index_dir, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = topk(spark, restored, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert (a.doc_id == b.doc_id).all()
    assert (a.score == b.score).all()

    # tamper: truncate one postings file -> verify fails
    snapfiles = os.path.join(repo, "snap1", "files")
    victim = None
    for root, _, files in os.walk(snapfiles):
        for f in files:
            if f.endswith(".parquet") and "postings" in root:
                victim = os.path.join(root, f)
                break
        if victim:
            break
    with open(victim, "ab") as fh:
        fh.write(b"x")
    with _pytest.raises(RuntimeError, match="size"):
        verify_snapshot(repo, "snap1")

    # incomplete snapshot (manifest missing) refuses restore
    os.remove(os.path.join(repo, "snap1", "SNAPSHOT.json"))
    with _pytest.raises(RuntimeError, match="manifest"):
        restore_index(repo, "snap1", str(tmp_path / "nope"))


def test_snapshot_restore_distributed(spark, index_dir, queries_pdf,
                                      tmp_path):
    """Distributed byte copy (spark passed): manifest and restored
    query results identical to the driver-loop path, including the
    per-file size map."""
    from data_prepper_spark.index.query import topk
    from data_prepper_spark.index.snapshot import (
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    repo = str(tmp_path / "snaprepo_dist")
    man_d = snapshot_index(index_dir, repo, "sd", spark=spark)
    # driver loop, incremental OFF so both are full copies and the
    # size maps are comparable
    man_l = snapshot_index(
        index_dir, repo, "sl", incremental=False
    )
    assert man_d["files"] == man_l["files"]
    verify_snapshot(repo, "sd")

    restored = str(tmp_path / "restored_dist")
    stats = restore_index(repo, "sd", restored, spark=spark)
    assert stats["n_docs"] > 0
    qdf = spark.createDataFrame(queries_pdf.head(5))
    a = topk(spark, index_dir, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = topk(spark, restored, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert (a.doc_id == b.doc_id).all()
    assert (a.score == b.score).all()


def test_incremental_snapshot_reuse_and_gc(spark, index_dir,
                                           queries_pdf, tmp_path):
    """Incremental snapshots: a second snapshot of the same index
    copies ZERO parquet bytes (every data file referenced from the
    first), restore resolves references and answers queries
    identically, delete refuses while referenced, and a lineage that
    gains one new parquet file copies ONLY that file."""
    import os

    import pandas as pd
    import pytest as _pytest

    from data_prepper_spark.index.query import topk
    from data_prepper_spark.index.snapshot import (
        delete_snapshot,
        restore_index,
        snapshot_index,
        verify_snapshot,
    )

    repo = str(tmp_path / "increpo")
    m1 = snapshot_index(index_dir, repo, "s1")
    assert m1["reused"] == {} and m1["bytes_copied"] > 0

    m2 = snapshot_index(index_dir, repo, "s2")
    assert m2["n_files"] == m1["n_files"]
    # every parquet referenced, nothing parquet-sized copied
    assert all(r.endswith(".parquet") for r in m2["reused"])
    assert not any(r.endswith(".parquet") for r in m2["files"])
    assert m2["bytes_reused"] > 0
    assert m2["bytes_copied"] < m1["bytes_copied"]
    assert all(ref["from"] == "s1" for ref in m2["reused"].values())
    verify_snapshot(repo, "s2")

    restored = str(tmp_path / "restored2")
    restore_index(repo, "s2", restored)
    qdf = spark.createDataFrame(queries_pdf.head(5))
    a = topk(spark, index_dir, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = topk(spark, restored, qdf, k=10).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert (a.doc_id == b.doc_id).all() and (a.score == b.score).all()

    # holders outlive referrers
    with _pytest.raises(RuntimeError, match="referenced"):
        delete_snapshot(repo, "s1")

    # a lineage gaining one parquet file copies only that file
    extra_dir = os.path.join(restored, "extra")
    os.makedirs(extra_dir)
    pd.DataFrame({"x": [1, 2]}).to_parquet(
        os.path.join(extra_dir, "part-new.parquet")
    )
    m3 = snapshot_index(restored, repo, "s3")
    new_parquets = [
        r for r in m3["files"] if r.endswith(".parquet")
    ]
    assert new_parquets == ["extra/part-new.parquet"]
    assert len(m3["reused"]) == len(m2["reused"])
    verify_snapshot(repo, "s3")

    # third-generation references point at the ORIGINAL holder (s1),
    # never forming chains through s2
    assert {ref["from"] for ref in m3["reused"].values()} == {"s1"}

    delete_snapshot(repo, "s3")
    delete_snapshot(repo, "s2")
    delete_snapshot(repo, "s1")  # now unreferenced
    with _pytest.raises(RuntimeError, match="no completed snapshot"):
        delete_snapshot(repo, "s1")
