"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index_build": {...}, "bm25": {...}}

The index build + BM25 section runs on the synthetic code corpus at
the matching SF (FIXTURES.md; generated+cached under fixtures/):
build files/sec and batch BM25 latency are the BASELINE.md metrics.

Scaling-efficiency evidence (north_rule: N vs 4N executors >= 0.8):
  python bench.py --scaling
runs the same build at local[8] and local[32] and reports
(T8 / T32) / 4. Results belong in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from data_prepper_spark.corpus import ensure_fixtures, n_docs_for_sf  # noqa: E402
from data_prepper_spark.index.build import BuildConfig, build_index  # noqa: E402
from data_prepper_spark.index.query import topk  # noqa: E402
from data_prepper_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "bm25_topk",
    "tpch_q1",
    "revenue_by_nation",
    "inverted_index_stats",
    "token_jaccard_pairs",
    "cosine_topk_bruteforce",
    "minhash_dedup",
    "sessionization",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else 0.1


def run_build_and_query(spark, sf: float, tag: str, single_p50: bool = False) -> dict:
    fdir = ensure_fixtures(sf, base_dir=os.path.join(REPO, "fixtures"))
    idx = f"/tmp/bench_idx_{tag}_{sf}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_index(spark, f"{fdir}/corpus.parquet", idx, BuildConfig())
    build_sec = time.time() - t0
    n_docs = n_docs_for_sf(sf)

    queries = spark.read.parquet(f"{fdir}/queries.parquet")
    nq = queries.count()
    out = {
        "build_sec": round(build_sec, 2),
        "files_per_sec": round(n_docs / build_sec, 1),
        "n_docs": n_docs,
        "n_queries": int(nq),
    }
    # exhaustive decode wins at this index size; blockmax pruning is
    # the large-index path — report both (same results, asserted in
    # tests)
    for mode in ("exhaustive", "blockmax"):
        t0 = time.time()
        n_res = topk(spark, idx, queries, k=10, mode=mode).count()
        query_sec = time.time() - t0
        key = "bm25" if mode == "exhaustive" else "bm25_blockmax"
        out[f"{key}_batch_sec"] = round(query_sec, 2)
        out[f"{key}_per_query_ms"] = round(query_sec / nq * 1000, 1)
        out["n_result_rows"] = int(n_res)

    if single_p50:
        # cold path: one ad-hoc Spark job per query (plan + parquet
        # footers every time — the honest batch-engine number)
        lats = []
        singles = queries.limit(15).collect()
        for r in singles:
            q1 = spark.createDataFrame(
                [(r["query_id"], r["query"])], "query_id long, query string"
            )
            t0 = time.time()
            topk(spark, idx, q1, k=10, mode="exhaustive").count()
            lats.append(time.time() - t0)
        lats.sort()
        out["bm25_single_query_p50_ms"] = round(lats[len(lats) // 2] * 1000, 1)
        out["bm25_single_query_min_ms"] = round(lats[0] * 1000, 1)
        # cold SERVE path: still no resident state, but the query runs
        # as pushdown-pruned scans (terms by token, postings by
        # bucket+term_id, docs by ord) + driver decode instead of the
        # full batch plan — what an ad-hoc user should actually call
        from data_prepper_spark.index.query import topk_one_cold

        clats = []
        for r in singles:
            t0 = time.time()
            topk_one_cold(spark, idx, r["query"], k=10,
                          query_id=r["query_id"])
            clats.append(time.time() - t0)
        clats.sort()
        out["bm25_cold_serve_p50_ms"] = round(
            clats[len(clats) // 2] * 1000, 1
        )
        out["bm25_cold_serve_min_ms"] = round(clats[0] * 1000, 1)
        # warm path: resident QuerySession (cached dictionary /
        # postings / ordinal map) — the serving-shape number
        from data_prepper_spark.index.query import QuerySession

        qs = QuerySession(spark, idx).warm()
        wlats = []
        for r in singles:
            t0 = time.time()
            qs.topk_one(r["query"], k=10, query_id=r["query_id"])
            wlats.append(time.time() - t0)
        qs.close()
        wlats.sort()
        out["bm25_warm_single_query_p50_ms"] = round(
            wlats[len(wlats) // 2] * 1000, 1
        )
        out["bm25_warm_single_query_min_ms"] = round(wlats[0] * 1000, 1)
    return out


def _sf03_block(spark) -> dict:
    """VERDICT r03 item 10: the 3x-scale numbers belong in the BENCH
    json, machine-checkable round-over-round, not only in BASELINE.md
    prose. The SF=0.3 index is built ONCE and cached under
    fixtures/_idxcache (the build is deterministic, so reuse cannot
    change results); every bench run re-times the 200-query batch in
    both modes. On a fresh workspace the first run pays one build and
    records its files/sec; later runs carry `cached: true`."""
    sf = 0.3
    fdir = ensure_fixtures(sf, base_dir=os.path.join(REPO, "fixtures"))
    idx = os.path.join(REPO, "fixtures", "_idxcache", "sf0.3_docid")
    out = {"sf": sf, "n_docs": n_docs_for_sf(sf)}
    if not os.path.exists(os.path.join(idx, "stats.json")):
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index(spark, f"{fdir}/corpus.parquet", idx, BuildConfig())
        b = time.time() - t0
        out["build_sec"] = round(b, 1)
        out["files_per_sec"] = round(out["n_docs"] / b, 1)
        shutil.rmtree(os.path.join(idx, "tokens"), ignore_errors=True)
    else:
        out["cached"] = True
    queries = spark.read.parquet(f"{fdir}/queries.parquet")
    nq = queries.count()
    for mode in ("exhaustive", "blockmax"):
        t0 = time.time()
        topk(spark, idx, queries, k=10, mode=mode).count()
        out[f"{mode}_per_query_ms"] = round(
            (time.time() - t0) / nq * 1000, 1
        )
    return out


def _sf1_blockmax_block(spark) -> dict | None:
    """VERDICT r03 item 2: blockmax vs exhaustive at the scale the
    auto-mode gates were written for — a 1M-doc impact-ordered index
    (dispersion above AUTO_BLOCKMAX_MIN_DISPERSION, n_docs at
    AUTO_BLOCKMAX_MIN_DOCS, so mode='auto' selects blockmax). The
    index is built once by tools/build_sf1_index.py (~15 min) and
    cached; this block only times the query batch, and is skipped
    (None) when the cache is absent so the per-round bench stays
    bounded."""
    idx = os.path.join(REPO, "fixtures", "_idxcache", "sf1.0_dl")
    qpath = os.path.join(REPO, "fixtures", "sf1.0", "queries.parquet")
    if not (
        os.path.exists(os.path.join(idx, "stats.json"))
        and os.path.exists(qpath)
    ):
        return None
    from data_prepper_spark.index.build import load_stats
    from data_prepper_spark.index.query import (
        AUTO_BLOCKMAX_MIN_DISPERSION,
        AUTO_BLOCKMAX_MIN_DOCS,
    )

    stats = load_stats(idx)
    queries = spark.read.parquet(qpath)
    nq = queries.count()
    out = {
        "sf": 1.0,
        "n_docs": stats["n_docs"],
        "dispersion": stats["blockmax_dispersion"],
        "ordinal_order": stats["ordinal_order"],
        "auto_picks": (
            "blockmax"
            if stats["n_docs"] >= AUTO_BLOCKMAX_MIN_DOCS
            and stats["blockmax_dispersion"] >= AUTO_BLOCKMAX_MIN_DISPERSION
            else "exhaustive"
        ),
    }
    # VERDICT r04 item 2: one timed pass per mode in a shared session
    # on an ambient-noisy box cannot resolve a 1.2-1.4x effect, so the
    # round-4 artifact showed blockmax "losing" while the quiet-box run
    # showed it winning. Run N interleaved repetitions per mode
    # (exhaustive, blockmax, auto, repeated — interleaving spreads any
    # slow ambient phase across all three modes instead of one) and
    # report min + median; the min is the noise-robust estimator the
    # auto gate answers to.
    reps = int(os.environ.get("SPARK_GRAFT_SF1_REPS", "5"))
    times: dict[str, list] = {"exhaustive": [], "blockmax": [], "auto": []}
    for _ in range(reps):
        for mode in ("exhaustive", "blockmax", "auto"):
            t0 = time.time()
            topk(spark, idx, queries, k=10, mode=mode).count()
            times[mode].append((time.time() - t0) / nq * 1000)
    for mode, ts in times.items():
        ts = sorted(ts)
        out[f"{mode}_per_query_ms"] = round(ts[0], 1)  # min
        out[f"{mode}_per_query_ms_median"] = round(
            ts[len(ts) // 2] if len(ts) % 2 else
            (ts[len(ts) // 2 - 1] + ts[len(ts) // 2]) / 2, 1
        )
    out["reps"] = reps
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    if "--scaling" in sys.argv:
        pair = os.environ.get("SPARK_GRAFT_SCALING_PAIR", "8,32")
        lo, hi = (int(x) for x in pair.split(","))
        out = {}
        for n in (lo, hi):
            # identical shuffle layout at both parallelism levels (AQE
            # coalesces at runtime) so the comparison isolates cores
            spark = get_spark(
                app_name=f"bench_scaling_{n}",
                master=f"local[{n}]",
                shuffle_partitions=64,
            )
            out[f"local[{n}]"] = run_build_and_query(spark, sf, f"scal{n}")
            spark.stop()
        tlo = out[f"local[{lo}]"]["files_per_sec"]
        thi = out[f"local[{hi}]"]["files_per_sec"]
        out["scaling_efficiency"] = round((thi / tlo) / (hi / lo), 3)
        out["pair"] = f"local[{lo}] vs local[{hi}]"
        print(json.dumps(out))
        return

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        if name == "minhash_dedup":
            # bench the PRODUCTION minhash (vectorized numpy/siphash
            # signatures); the driver entry of the same name runs the
            # slower md5-portable twin that exists so DuckDB can
            # oracle-check the LSH math bit-for-bit
            from data_prepper_spark.datapipe.dedup import minhash_lsh_pairs

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            )
            minhash_lsh_pairs(
                docs, "doc_id", "text",
                num_perm=32, bands=8, shingle=3, threshold=0.3,
            ).count()
        else:
            qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    t0 = time.time()
    engine = run_build_and_query(spark, sf, "main", single_p50=True)
    timings["index_build_and_bm25"] = round(time.time() - t0, 3)

    # larger-scale blocks (VERDICT r03 items 2/10) — cached indexes,
    # reported OUTSIDE `queries`/`value` so the suite wall-clock stays
    # comparable round-over-round
    sf03 = _sf03_block(spark)
    sf1 = _sf1_blockmax_block(spark)

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "headline suite wall-clock (operators + index build + BM25)",
                "value": round(total, 2),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "index_build": engine,
                "sf03": sf03,
                "sf1_blockmax": sf1,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
