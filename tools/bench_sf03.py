"""SF=0.3 engine bench (VERDICT r02 item 10): build + query at 3x the
driver's bench scale, with both ordinal orders, to pin the blockmax
scaling story with data.

Builds two indexes over the SF=0.3 fixture corpus (300k files):
  * default doc_id-ordered ordinals (hash-random impact order)
  * ordinal_order='dl'   (impact-ordered — the docid-reordering trade)
and times the 200-query batch in exhaustive and blockmax modes on
each, printing one JSON line with build files/s, per-query ms, the
build-time blockmax_dispersion statistic, and what mode='auto' picks.

Usage: python tools/bench_sf03.py [sf]  (default 0.3)
"""

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_prepper_spark.corpus import ensure_fixtures, n_docs_for_sf  # noqa: E402
from data_prepper_spark.index.build import BuildConfig, build_index  # noqa: E402
from data_prepper_spark.index.query import (  # noqa: E402
    AUTO_BLOCKMAX_MIN_DISPERSION,
    AUTO_BLOCKMAX_MIN_DOCS,
    topk,
)
from data_prepper_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    fdir = ensure_fixtures(sf, base_dir=os.path.join(REPO, "fixtures"))
    spark = get_spark(app_name="bench_sf03", master="local[32]")
    queries = spark.read.parquet(f"{fdir}/queries.parquet")
    nq = queries.count()
    out = {"sf": sf, "n_docs": n_docs_for_sf(sf), "n_queries": int(nq)}
    for order in ("doc_id", "dl"):
        idx = f"/tmp/bench_sf03_{order}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        stats = build_index(
            spark, f"{fdir}/corpus.parquet", idx,
            BuildConfig(ordinal_order=order),
        )
        b = time.time() - t0
        sec = {"build_sec": round(b, 1),
               "files_per_sec": round(out["n_docs"] / b, 1),
               "dispersion": stats["blockmax_dispersion"]}
        for mode in ("exhaustive", "blockmax"):
            t0 = time.time()
            topk(spark, idx, queries, k=10, mode=mode).count()
            sec[f"{mode}_per_query_ms"] = round(
                (time.time() - t0) / nq * 1000, 1
            )
        sec["auto_picks"] = (
            "blockmax"
            if stats["n_docs"] >= AUTO_BLOCKMAX_MIN_DOCS
            and stats["blockmax_dispersion"] >= AUTO_BLOCKMAX_MIN_DISPERSION
            else "exhaustive"
        )
        out[f"ordinal_{order}"] = sec
        print(json.dumps({order: sec}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
