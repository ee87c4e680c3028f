"""Structured-Streaming semantics smoke (SURVEY.md §2.9): windowed
aggregate action, streaming dedup, router, incremental index via
foreachBatch — driven synchronously with availableNow/memory sinks."""

import os

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.streaming.pipeline import (
    incremental_index,
    streaming_remove_duplicates,
    windowed_count,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture()
def stream_src(spark, tmp_path):
    p = str(tmp_path / "stream_in")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.parquet(p)
    return spark.readStream.schema(SCHEMA).parquet(p)


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_count(spark, stream_src):
    agg = windowed_count(
        stream_src, "ts", ["event_type"], window="1 hour", watermark="2 hours"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from wc").toPandas()
    want = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .count()
    )
    assert len(got) == want
    assert got["count"].sum() == 1000


def test_streaming_dedup(spark, stream_src):
    dd = streaming_remove_duplicates(
        stream_src, ["user_id", "event_type"], "ts", watermark="10 days"
    )
    _run(dd, "dedup_out")
    got = spark.sql("select * from dedup_out").toPandas()
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = batch.dropDuplicates(["user_id", "event_type"]).count()
    assert len(got) == want
    assert got.duplicated(["user_id", "event_type"]).sum() == 0


def test_stateful_aggregate_count(spark, tmp_path):
    """State accumulates across micro-batches (maxFilesPerTrigger=1
    forces several batches; the final running count per key must equal
    the batch groupBy count)."""
    from data_prepper_spark.streaming.pipeline import stateful_aggregate_count

    src_dir = str(tmp_path / "multi_batch")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # three separate files -> three micro-batches
    for i in range(3):
        batch.filter(F.col("event_id") % 3 == i).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = stateful_aggregate_count(stream, ["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("state_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from state_counts")
        .groupBy("event_type")
        .agg(F.max("count").alias("count"))
        .toPandas()
        .set_index("event_type")["count"]
        .to_dict()
    )
    want = {
        r.event_type: r["cnt"]
        for r in batch.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_incremental_index(spark, tmp_path):
    from data_prepper_spark.corpus import ensure_fixtures
    from data_prepper_spark.index.query import topk

    fdir = ensure_fixtures(0.001)
    src_schema = (
        "repo string, path string, commit string, lang string, "
        "content string, content_sha256 string"
    )
    stream = spark.readStream.schema(src_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{fdir}/corpus.parquet")
    root = str(tmp_path / "inc_index")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_index(spark, stream, root, ckpt).start()
    q.awaitTermination(600)

    deltas = sorted(d for d in os.listdir(root) if d.startswith("delta="))
    assert len(deltas) >= 1
    # every delta is a complete queryable index
    queries = spark.createDataFrame([(0, "init")], "query_id long, query string")
    total = 0
    for d in deltas:
        res = topk(spark, os.path.join(root, d), queries, k=5).toPandas()
        total += len(res)
    assert total >= 5


def test_compact_deltas_matches_batch_build(spark, tmp_path):
    """Compacting streamed delta indexes yields an index bit-identical
    (block level) to a one-shot batch build over the same corpus."""
    import pandas as pd

    from data_prepper_spark.corpus import write_corpus
    from data_prepper_spark.index.build import BuildConfig, build_index
    from data_prepper_spark.streaming.pipeline import (
        compact_deltas,
        incremental_index,
    )

    src = str(tmp_path / "src")
    write_corpus(0.001, src, chunks_per_file=1)  # 2 work-unit files
    root = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_index(spark, stream, root, ckpt).start()
    q.awaitTermination(240)

    cfg = BuildConfig(n_buckets=8, hot_group_target=10_000)
    stats = compact_deltas(spark, root, str(tmp_path / "compacted"), cfg)
    batch_idx = str(tmp_path / "batch")
    bstats = build_index(spark, src, batch_idx, cfg)
    assert stats["n_docs"] == bstats["n_docs"]
    assert abs(stats["avgdl"] - bstats["avgdl"]) < 1e-12

    def blocks(idx):
        return (
            spark.read.parquet(os.path.join(idx, "postings"))
            .select("term_id", "min_doc", "n", "docs", "tfs", "dls")
            .toPandas()
            .sort_values(["term_id", "min_doc"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(
        blocks(str(tmp_path / "compacted")), blocks(batch_idx)
    )


def test_topk_deltas_matches_compacted(spark, tmp_path):
    """Querying delta indexes directly is rank-identical to querying
    the compacted index (global BM25 stats recomputed across deltas)."""
    import pandas as pd

    from data_prepper_spark.corpus import write_corpus
    from data_prepper_spark.index.build import BuildConfig
    from data_prepper_spark.index.query import topk, topk_deltas
    from data_prepper_spark.streaming.pipeline import (
        compact_deltas,
        incremental_index,
    )

    src = str(tmp_path / "src")
    write_corpus(0.001, src, chunks_per_file=1)
    root = str(tmp_path / "deltas")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_index(spark, stream, root, str(tmp_path / "ck")).start()
    q.awaitTermination(240)

    cfg = BuildConfig(n_buckets=8, hot_group_target=10_000)
    compacted = str(tmp_path / "compacted")
    compact_deltas(spark, root, compacted, cfg)

    queries = spark.createDataFrame(
        [(0, "def init"), (1, "return value"), (2, "parse data")],
        "query_id long, query string",
    )
    a = (
        topk_deltas(spark, root, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        topk(spark, compacted, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (abs(a["score"] - b["score"]) < 1e-9).all()


def test_maybe_compact_policy(spark, tmp_path):
    from data_prepper_spark.streaming.pipeline import maybe_compact

    root = tmp_path / "r"
    for i in range(3):
        (root / f"delta={i}").mkdir(parents=True)
    # below threshold: no-op, no output dir
    assert maybe_compact(spark, str(root), str(tmp_path / "o"),
                         max_deltas=8) is None
    assert not (tmp_path / "o").exists()


def test_leveled_compaction_matches_batch_build(spark, tmp_path):
    """policy='leveled' merges only the smallest fan_in deltas per
    trigger (LSM-style partial merge); after any sequence of partial
    merges the final full compaction is still bit-identical to a
    one-shot batch build — the merge tree does not leak into the
    index bytes."""
    import pandas as pd

    from data_prepper_spark.corpus import write_corpus
    from data_prepper_spark.index.build import BuildConfig, build_index
    from data_prepper_spark.streaming.pipeline import (
        compact_deltas,
        incremental_index,
        maybe_compact,
    )

    src = str(tmp_path / "src")
    write_corpus(0.003, src, chunks_per_file=1)  # 6 work-unit files
    root = str(tmp_path / "deltas")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_index(spark, stream, root, str(tmp_path / "ck")).start()
    q.awaitTermination(300)
    cfg = BuildConfig(n_buckets=8, hot_group_target=10_000)

    def ndeltas():
        return sum(d.startswith("delta=") for d in os.listdir(root))

    assert ndeltas() == 6
    out = str(tmp_path / "unused")
    assert maybe_compact(spark, root, out, max_deltas=3, cfg=cfg,
                         policy="leveled", fan_in=3) is not None
    assert ndeltas() == 4  # 6 - 3 merged + 1 new run
    assert os.path.isdir(os.path.join(root, "delta=c0"))
    # live querying MID-merge-tree (mixed original + merged runs) is
    # rank-identical to a one-shot batch index over the same corpus
    from data_prepper_spark.index.query import topk, topk_deltas

    batch_idx = str(tmp_path / "batch")
    build_index(spark, src, batch_idx, cfg)
    queries = spark.createDataFrame(
        [(0, "def init"), (1, "return value"), (2, "parse data")],
        "query_id long, query string",
    )
    a = (
        topk_deltas(spark, root, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        topk(spark, batch_idx, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (abs(a["score"] - b["score"]) < 1e-9).all()
    assert maybe_compact(spark, root, out, max_deltas=3, cfg=cfg,
                         policy="leveled", fan_in=3) is not None
    assert ndeltas() == 2
    # below the fan-in bound now: policy is quiescent
    assert maybe_compact(spark, root, out, max_deltas=3, cfg=cfg,
                         policy="leveled", fan_in=3) is None
    assert not os.path.exists(out)

    compacted = str(tmp_path / "compacted")
    compact_deltas(spark, root, compacted, cfg)

    def blocks(idx):
        return (
            spark.read.parquet(os.path.join(idx, "postings"))
            .select("term_id", "min_doc", "n", "docs", "tfs", "dls")
            .toPandas()
            .sort_values(["term_id", "min_doc"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(blocks(compacted), blocks(batch_idx))


def test_streaming_percolate_matches_batch(spark, tmp_path):
    """Stateless streaming percolation (append mode, no state store)
    emits exactly the batch percolator's match set."""
    from data_prepper_spark.index.query import percolate
    from data_prepper_spark.streaming.pipeline import streaming_percolate

    docs_pdf = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),
            (11, "alpha zeta"),
            (12, "beta delta"),
            (13, "unseen alpha here"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "perc_src")
    docs_pdf.write.parquet(src)
    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha"), (2, "gamma delta"),
         (3, "unseen alpha")],
        "query_id long, query string",
    )
    dfreq = spark.createDataFrame(
        [("alpha", 3), ("beta", 2), ("gamma", 1), ("delta", 1), ("zeta", 1)],
        "term string, df long",
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = streaming_percolate(stream, queries, dfreq)
    q = (
        out.writeStream.format("memory")
        .queryName("perc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.doc_id, r.query_id)
        for r in spark.sql("select * from perc_stream").collect()
    }
    want = {
        (r.doc_id, r.query_id)
        for r in percolate(queries, docs_pdf).collect()
    }
    assert got == want and got


def test_faceted_deltas_matches_compacted(spark, tmp_path):
    """Incremental doc-values + faceting over the live delta tree:
    attach_doc_values_deltas touches only deltas lacking a sidecar
    (second call is a no-op), and faceted_search_deltas returns
    bucket-identical results to faceting the compacted index."""
    from data_prepper_spark.corpus import write_corpus
    from data_prepper_spark.index.build import BuildConfig
    from data_prepper_spark.index.query import (
        attach_doc_values,
        attach_doc_values_deltas,
        faceted_search,
        faceted_search_deltas,
    )
    from data_prepper_spark.streaming.pipeline import (
        compact_deltas,
        incremental_index,
    )

    src = str(tmp_path / "src")
    write_corpus(0.001, src, chunks_per_file=1)
    root = str(tmp_path / "deltas")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_index(spark, stream, root, str(tmp_path / "ck")).start()
    q.awaitTermination(240)

    # incremental attach: N deltas first time, 0 the second
    n1 = attach_doc_values_deltas(spark, root, src, cols=("lang",))
    assert n1 >= 2
    assert attach_doc_values_deltas(spark, root, src, cols=("lang",)) == 0

    cfg = BuildConfig(n_buckets=8, hot_group_target=10_000)
    compacted = str(tmp_path / "compacted")
    compact_deltas(spark, root, compacted, cfg)
    attach_doc_values(spark, compacted, src, cols=("lang",))

    queries = spark.createDataFrame(
        [(0, "def init"), (1, "return value")],
        "query_id long, query string",
    )
    a = (
        faceted_search_deltas(spark, root, src, queries, facet_col="lang")
        .toPandas().sort_values(["query_id", "bucket_rank"])
        .reset_index(drop=True)
    )
    b = (
        faceted_search(spark, compacted, src, queries, facet_col="lang")
        .toPandas().sort_values(["query_id", "bucket_rank"])
        .reset_index(drop=True)
    )
    assert a.facet.tolist() == b.facet.tolist()
    assert a.doc_count.tolist() == b.doc_count.tolist()


def test_compaction_crash_recovery(spark, tmp_path):
    """ADVICE r03: a merge that crashed AFTER deleting its victim
    deltas but BEFORE publishing _compacting must be recovered (the
    merged run is the only copy of those docs), and an INCOMPLETE
    _compacting (no completion marker) must be discarded with the
    victims untouched. Either way, topk_deltas afterwards matches a
    one-shot batch build — no docs lost, none double-counted."""
    import json as _json
    import shutil

    from data_prepper_spark.corpus import write_corpus
    from data_prepper_spark.index.build import BuildConfig, build_index
    from data_prepper_spark.index.query import topk, topk_deltas
    from data_prepper_spark.streaming.pipeline import (
        compact_deltas,
        incremental_index,
        maybe_compact,
    )

    src = str(tmp_path / "src")
    write_corpus(0.003, src, chunks_per_file=1)  # 6 work-unit files
    root = str(tmp_path / "deltas")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_index(spark, stream, root, str(tmp_path / "ck")).start()
    q.awaitTermination(300)
    cfg = BuildConfig(n_buckets=8, hot_group_target=10_000)

    def deltas():
        return sorted(
            d for d in os.listdir(root) if d.startswith("delta=")
        )

    assert len(deltas()) == 6

    # --- simulate the fatal crash window: merge complete, marker
    # written, victims deleted, publish rename NEVER happened ---
    victims = [os.path.join(root, d) for d in deltas()[:3]]
    tmp = os.path.join(root, "_compacting")
    compact_deltas(spark, root, tmp, cfg, deltas=victims)
    with open(os.path.join(tmp, "victims.json"), "w") as fh:
        _json.dump(sorted(victims), fh)
    for v in victims:
        shutil.rmtree(v)
    # old behavior would rmtree(tmp) here and lose the docs forever;
    # the recovery path must publish it instead
    out = str(tmp_path / "unused")
    maybe_compact(spark, root, out, max_deltas=99, cfg=cfg,
                  policy="leveled", fan_in=3)
    assert os.path.isdir(os.path.join(root, "delta=c0"))
    assert not os.path.exists(tmp)

    batch_idx = str(tmp_path / "batch")
    build_index(spark, src, batch_idx, cfg)
    queries = spark.createDataFrame(
        [(0, "def init"), (1, "return value")],
        "query_id long, query string",
    )
    a = (
        topk_deltas(spark, root, queries, k=10).toPandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        topk(spark, batch_idx, queries, k=10).toPandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (abs(a["score"] - b["score"]) < 1e-9).all()

    # --- incomplete merge (no marker): discarded, victims intact ---
    before = deltas()
    os.makedirs(os.path.join(tmp, "tokens"), exist_ok=True)
    with open(os.path.join(tmp, "tokens", "junk"), "w") as fh:
        fh.write("partial")
    assert maybe_compact(spark, root, out, max_deltas=99, cfg=cfg,
                         policy="leveled", fan_in=3) is None
    assert not os.path.exists(tmp)
    assert deltas() == before

    # --- crash BETWEEN marker write and any victim deletion: the
    # recovery finishes the job (deletes victims, publishes) ---
    victims2 = [os.path.join(root, d) for d in deltas()[:2]]
    compact_deltas(spark, root, tmp, cfg, deltas=victims2)
    with open(os.path.join(tmp, "victims.json"), "w") as fh:
        _json.dump(sorted(victims2), fh)
    maybe_compact(spark, root, out, max_deltas=99, cfg=cfg,
                  policy="leveled", fan_in=3)
    assert not os.path.exists(tmp)
    for v in victims2:
        assert not os.path.exists(v)
    a2 = (
        topk_deltas(spark, root, queries, k=10).toPandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert (a2["doc_id"] == b["doc_id"]).all()


def test_http_push_to_live_index(spark, tmp_path):
    """End-to-end push-ingest story: documents POSTed to the HTTP
    listener stream off the spool, re-shape to the corpus contract
    (sha256 computed in-flight), land as delta indexes via
    incremental_index, and a query over the delta tree finds them —
    the reference's http-source -> pipeline -> opensearch-sink loop
    closed inside this engine."""
    import hashlib
    import json as _json
    import urllib.request

    from data_prepper_spark.index.query import topk_deltas
    from data_prepper_spark.sources.http import HttpSource
    from pyspark.sql import functions as F

    docs = [
        {"repo": "r1", "path": f"f{i}", "commit": "c",
         "content": f"streaming ingest doc number{i} class def"}
        for i in range(6)
    ]
    with HttpSource(str(tmp_path / "spool")) as src:
        for batch in (docs[:3], docs[3:]):
            req = urllib.request.Request(
                f"http://127.0.0.1:{src.port}/log/ingest",
                data=_json.dumps(batch).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            assert urllib.request.urlopen(req).status == 200
        schema = (
            "repo string, path string, commit string, content string"
        )
        stream = src.stream_logs(spark, schema, max_files_per_trigger=1)
        corpus = stream.select(
            "repo", "path", "commit",
            F.lit("text").alias("lang"),
            "content",
            F.sha2("content", 256).alias("content_sha256"),
        )
        root = str(tmp_path / "live_idx")
        q = incremental_index(
            spark, corpus, root, str(tmp_path / "ck")
        ).start()
        q.awaitTermination(600)

    deltas = sorted(
        d for d in os.listdir(root) if d.startswith("delta=")
    )
    assert len(deltas) == 2  # one per spooled POST (file per trigger)
    queries = spark.createDataFrame(
        [(0, "number4")], "query_id long, query string"
    )
    res = topk_deltas(spark, root, queries, k=5).toPandas()
    assert len(res) == 1
    # sha validated in-flight: nothing quarantined
    for d in deltas:
        hashlib.sha256  # (sanity import use)
        qr = spark.read.schema(
            "repo string, path string, commit string, plugin_name string,"
            " pipeline_name string, error_message string, unit string"
        ).parquet(os.path.join(root, d, "quarantine"))
        assert qr.count() == 0


def test_compaction_never_reuses_victim_seq(spark, tmp_path):
    """ADVICE r04: when the highest delta=cN is itself a merge victim,
    the merged output must get a FRESH sequence number (pre-deletion
    listing), never the just-deleted name — a concurrent reader that
    listed deltas before compaction would otherwise read the merged
    run under the old name and double-count its docs."""
    import shutil

    from data_prepper_spark.corpus import write_corpus
    from data_prepper_spark.index.build import BuildConfig
    from data_prepper_spark.streaming.pipeline import (
        compact_deltas,
        incremental_index,
        maybe_compact,
    )

    src = str(tmp_path / "src")
    write_corpus(0.002, src, chunks_per_file=1)
    root = str(tmp_path / "deltas")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_index(spark, stream, root, str(tmp_path / "ck")).start()
    q.awaitTermination(240)
    cfg = BuildConfig(n_buckets=8, hot_group_target=10_000)

    def deltas():
        return sorted(d for d in os.listdir(root) if d.startswith("delta="))

    n0 = len(deltas())
    assert n0 >= 3

    def du(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(root, d))
            for f in fs
        )

    # name the deltas so the SMALLEST ones carry the HIGHEST c-numbers
    # — the smallest-first victim selection then consumes the highest
    # cN, the exact name-reuse window the fix closes
    by_size = sorted(deltas(), key=du, reverse=True)  # biggest first
    for i, d in enumerate(by_size):
        shutil.move(os.path.join(root, d), os.path.join(root, f"delta=t{i}"))
    for i in range(n0):
        shutil.move(
            os.path.join(root, f"delta=t{i}"),
            os.path.join(root, f"delta=c{i}"),
        )
    stats = maybe_compact(
        spark, root, str(tmp_path / "unused"), max_deltas=1, cfg=cfg,
        policy="leveled", fan_in=2,
    )
    assert stats is not None
    after = deltas()
    # victims are the two smallest; whatever they were, the merged run
    # must carry a sequence strictly greater than every pre-merge cN
    merged = [d for d in after if int(d.split("=c")[-1]) >= n0]
    assert merged, f"merged run reused an old name: {after}"


def test_positional_phrase_over_deltas(spark, tmp_path):
    """Delta-tree positional phrase (VERDICT r04 #8): querying the
    positions sidecars of the live deltas directly is rank-identical
    to querying the compacted index — for exact phrases, ordered slop,
    and unordered sloppy phrases — and compaction (full AND leveled)
    carries the sidecar through the merge."""
    import os

    from data_prepper_spark.corpus import write_corpus
    from data_prepper_spark.index.build import BuildConfig
    from data_prepper_spark.index.positions import (
        phrase_topk_positional,
        phrase_topk_positional_deltas,
        sloppy_phrase_topk,
        sloppy_phrase_topk_deltas,
    )
    from data_prepper_spark.streaming.pipeline import (
        compact_deltas,
        incremental_index,
        maybe_compact,
    )

    src = str(tmp_path / "src")
    write_corpus(0.001, src, chunks_per_file=1)  # 2 work-unit files
    root = str(tmp_path / "deltas")
    cfg = BuildConfig(n_buckets=8, hot_group_target=10_000, positions=True)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_index(
        spark, stream, root, str(tmp_path / "ck"), cfg=cfg
    ).start()
    q.awaitTermination(240)

    compacted = str(tmp_path / "compacted")
    compact_deltas(spark, root, compacted, cfg)
    assert os.path.isdir(os.path.join(compacted, "positions"))

    # phrases drawn from the corpus itself so match sets are non-empty
    import pandas as pd

    from data_prepper_spark.tokenizer import tokenize_series

    corpus_pdf = spark.read.parquet(src).limit(2).toPandas()
    toks0 = tokenize_series(pd.Series([corpus_pdf.iloc[0].content])).iloc[0]
    toks1 = tokenize_series(pd.Series([corpus_pdf.iloc[1].content])).iloc[0]
    phrases = spark.createDataFrame(
        [
            (0, " ".join(toks0[10:12])),
            (1, " ".join(toks0[30:33])),
            (2, " ".join(toks1[5:7])),
        ],
        "query_id long, phrase string",
    )

    def norm(df):
        return (
            df.toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )

    for slop in (0, 2):
        a = norm(phrase_topk_positional_deltas(spark, root, phrases, k=10, slop=slop))
        b = norm(phrase_topk_positional(spark, compacted, phrases, k=10, slop=slop))
        assert len(a) and len(a) == len(b), (slop, len(a), len(b))
        assert (a["doc_id"] == b["doc_id"]).all()
        assert (a["phrase_freq"] == b["phrase_freq"]).all()

    sa = norm(sloppy_phrase_topk_deltas(spark, root, phrases, k=10, slop=2))
    sb = norm(sloppy_phrase_topk(spark, compacted, phrases, k=10, slop=2))
    assert len(sa) and len(sa) == len(sb)
    assert (sa["doc_id"] == sb["doc_id"]).all()
    assert (sa["min_cost"] == sb["min_cost"]).all()

    # leveled partial merge: victims' sidecars fold into the merged
    # run; the delta tree stays positional and rank-identical
    merged = maybe_compact(
        spark, root, str(tmp_path / "unused"), max_deltas=1,
        policy="leveled", fan_in=2, cfg=cfg,
    )
    assert merged is not None
    c = norm(phrase_topk_positional_deltas(spark, root, phrases, k=10))
    b0 = norm(phrase_topk_positional(spark, compacted, phrases, k=10))
    assert (c["doc_id"] == b0["doc_id"]).all()
    assert (c["phrase_freq"] == b0["phrase_freq"]).all()


def test_streaming_service_map_cross_batch(spark, tmp_path):
    """Parent and child spans arriving in DIFFERENT micro-batches must
    still produce their service-graph edge (the reference's rotating
    MapDB windows carry parents across window boundaries; here the
    per-trace state does). Final distinct edge set == the batch
    self-join over all data."""
    from data_prepper_spark.operators.trace import service_map_edges
    from data_prepper_spark.streaming.pipeline import streaming_service_map

    spans_schema = (
        "trace_id long, span_id long, parent_span_id long, "
        "service_name string"
    )
    rows = []
    # 40 traces, 3 spans each: gateway -> auth -> db; the child of the
    # cross-service hop lands in a different file than its parent
    for t in range(40):
        base = t * 10
        rows.append((t, base + 1, None, "gateway"))
        rows.append((t, base + 2, base + 1, "auth"))
        rows.append((t, base + 3, base + 2, "db"))
        # same-service hop (must NOT emit an edge)
        rows.append((t, base + 4, base + 3, "db"))
    sdf = spark.createDataFrame(rows, spans_schema)
    src = str(tmp_path / "spans_stream")
    # batch 0: all parents (gateway spans); batch 1: auth spans
    # (children of batch 0, parents of batch 2); batch 2: db spans —
    # every cross-service edge spans a batch boundary
    for i, svc in enumerate(["gateway", "auth", "db"]):
        sdf.filter(F.col("service_name") == svc).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(spans_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_service_map(stream, window_duration="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("svc_edges")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.source_service, r.dest_service)
        for r in spark.sql("select distinct * from svc_edges").collect()
    }
    want = {
        (r.source_service, r.dest_service)
        for r in service_map_edges(sdf).collect()
    }
    assert got == want == {("gateway", "auth"), ("auth", "db")}
