"""Block-max WAND microbenchmark on a PRUNABLE index.

The fixture corpus is the structural worst case for WAND-family
pruning — per-term impacts are near-uniform (block_max CV ~0.05) and
doc ids are hash-random (no locality) — so block-max pruning removes
<1% of candidate blocks there and exhaustive decode always wins
(BASELINE.md §blockmax). This tool fabricates the opposite: an index
whose terms have CLUSTERED high-tf bands (the shape impact-ordered or
URL-ordered real-world indexes have), then times exhaustive vs
blockmax over the same queries and asserts rank identity.

Usage: python tools/blockmax_micro.py [n_docs] [n_terms] [n_queries]
Prints one JSON line with both timings, the pruned-block fraction and
the index's blockmax_dispersion statistic (the value auto mode keys
on).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_prepper_spark.index.build import (  # noqa: E402
    BuildConfig,
    _blocks_pa_schema,
    _encode_chunk_arrow,
)

N_BUCKETS = 32


def fabricate_index(idx: str, n_docs: int, n_terms: int) -> dict:
    """Write a real on-disk index (postings/terms/docs/stats.json)
    where each term has df = n_docs/2 postings: tf=1 background everywhere
    except one contiguous 2%-of-docs band where tf is 20-60. Blocks in
    the band carry ~10x the impact of background blocks, so block-max
    pruning has something to prune."""
    cfg = BuildConfig()
    k1, b = cfg.k1, cfg.b
    dl = 100.0
    shutil.rmtree(idx, ignore_errors=True)
    os.makedirs(idx)

    rng = np.random.default_rng(7)
    rows_term, rows_doc, rows_tf = [], [], []
    for t in range(n_terms):
        # every other doc holds the term (df = n_docs // 2)
        docs = np.arange(0, n_docs, 2, dtype=np.int64)
        tf = np.ones(len(docs), dtype=np.int64)
        band_w = max(len(docs) // 50, 1)
        b0 = int(rng.integers(0, len(docs) - band_w))
        tf[b0 : b0 + band_w] = rng.integers(20, 60, band_w)
        rows_term.append(np.full(len(docs), t + 1, dtype=np.int64))
        rows_doc.append(docs)
        rows_tf.append(tf)

    term_id = np.concatenate(rows_term)
    doc = np.concatenate(rows_doc)
    tf = np.concatenate(rows_tf)
    order = np.lexsort((doc, term_id))
    tbl = pa.table(
        {
            "term_id": term_id[order],
            "salt": np.zeros(len(order), np.int64),
            "bucket": (term_id[order] % N_BUCKETS).astype(np.int32),
            "doc_id": doc[order],
            "tf": tf[order],
            "dl": np.full(len(order), dl),
        }
    )
    blocks = _encode_chunk_arrow(tbl, k1, b, cfg.block_size, dl)
    btbl = pa.Table.from_batches([blocks], schema=_blocks_pa_schema())

    # postings/bucket=N/ layout (bucket as partition directory)
    bcol = btbl.column("bucket").to_numpy()
    data = btbl.drop_columns(["bucket"])
    for bk in np.unique(bcol):
        sub = data.take(np.flatnonzero(bcol == bk))
        d = os.path.join(idx, "postings", f"bucket={bk}")
        os.makedirs(d)
        pq.write_table(sub, os.path.join(d, "part-0.parquet"))

    # term dictionary with per-term df / max_impact
    bm = btbl.column("block_max").to_numpy()
    tid_b = btbl.column("term_id").to_numpy()
    terms = []
    for t in range(n_terms):
        sel = tid_b == t + 1
        terms.append(
            (
                f"term{t:03d}",
                t + 1,
                int(n_docs // 2),
                int((t + 1) % N_BUCKETS),
                float(bm[sel].max()),
            )
        )
    pq.write_table(
        pa.table(
            {
                "term": [x[0] for x in terms],
                "term_id": pa.array([x[1] for x in terms], pa.int64()),
                "df": pa.array([x[2] for x in terms], pa.int64()),
                "bucket": pa.array([x[3] for x in terms], pa.int32()),
                "max_impact": [x[4] for x in terms],
            }
        ),
        os.path.join(idx, "terms") + ".parquet",
    )
    os.makedirs(os.path.join(idx, "terms"), exist_ok=True)
    shutil.move(
        os.path.join(idx, "terms.parquet"),
        os.path.join(idx, "terms", "part-0.parquet"),
    )

    # docs: ord == doc_id (identity mapping keeps tie-breaks trivial)
    ords = np.arange(n_docs, dtype=np.int64)
    os.makedirs(os.path.join(idx, "docs"))
    pq.write_table(
        pa.table(
            {
                "ord": ords,
                "doc_id": ords,
                "dl": np.full(n_docs, dl),
                "repo": np.full(n_docs, "micro/repo").astype(object),
                "path": np.array([f"f{i}.py" for i in ords], dtype=object),
                "commit": np.full(n_docs, "0" * 40).astype(object),
            }
        ),
        os.path.join(idx, "docs", "part-0.parquet"),
    )

    # dispersion statistic exactly as the build computes it
    import pandas as pd

    bdf = pd.DataFrame({"t": tid_b, "bm": bm})
    g = bdf.groupby("t")["bm"]
    cv = (g.std(ddof=1) / g.mean())[g.count() >= 8]
    disp = float(cv.mean()) if len(cv) else 0.0
    stats = {
        "n_docs": n_docs,
        "avgdl": dl,
        "n_buckets": N_BUCKETS,
        "block_size": cfg.block_size,
        "k1": k1,
        "b": b,
        "blockmax_dispersion": round(disp, 4),
        "units": ["micro"],
    }
    with open(os.path.join(idx, "stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def main() -> None:
    from data_prepper_spark.index.query import topk
    from data_prepper_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_terms = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    idx = "/tmp/blockmax_micro_idx"
    stats = fabricate_index(idx, n_docs, n_terms)

    spark = get_spark(app_name="blockmax_micro", master="local[32]")
    rng = np.random.default_rng(11)
    qrows = [
        (
            qid,
            " ".join(
                f"term{t:03d}"
                for t in rng.choice(n_terms, size=2, replace=False)
            ),
        )
        for qid in range(n_queries)
    ]
    q = spark.createDataFrame(qrows, "query_id long, query string")

    out = {"n_docs": n_docs, "dispersion": stats["blockmax_dispersion"]}
    results = {}
    for mode in ("exhaustive", "blockmax", "exhaustive", "blockmax"):
        t0 = time.time()
        res = topk(spark, idx, q, k=10, mode=mode).toPandas()
        dt = time.time() - t0
        key = f"{mode}_sec"
        out[key] = round(min(dt, out.get(key, 1e9)), 2)
        results[mode] = res.sort_values(["query_id", "rank"]).reset_index(
            drop=True
        )
    pdx = results["exhaustive"]
    pdb = results["blockmax"]
    assert (pdx["doc_id"].to_numpy() == pdb["doc_id"].to_numpy()).all()
    assert np.allclose(pdx["score"], pdb["score"])
    out["rank_identical"] = True
    out["speedup"] = round(out["exhaustive_sec"] / out["blockmax_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
