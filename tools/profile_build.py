"""Per-stage wall-clock profile of the index build (diagnosis harness
for the scaling-efficiency work; see BASELINE.md §protocol).

Usage: python tools/profile_build.py [sf] [cores]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_prepper_spark.corpus import ensure_fixtures  # noqa: E402
from data_prepper_spark.index.build import (  # noqa: E402
    BuildConfig,
    run_index_stage,
    run_tokenize_stage,
)
from data_prepper_spark.session import get_spark  # noqa: E402

sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

fdir = ensure_fixtures(sf, base_dir=os.path.join(REPO, "fixtures"))
idx = f"/tmp/profile_idx_{sf}_{cores}"
shutil.rmtree(idx, ignore_errors=True)
os.makedirs(idx, exist_ok=True)

spark = get_spark(
    app_name="profile", master=f"local[{cores}]", shuffle_partitions=64
)

marks: list[tuple[str, float]] = []


def mark(name):
    marks.append((name, time.time()))
    if len(marks) > 1:
        prev = marks[-2]
        print(f"[profile] {prev[0]} -> {name}: {marks[-1][1]-prev[1]:.1f}s", flush=True)


cfg = BuildConfig()
mark("start")
run_tokenize_stage(spark, f"{fdir}/corpus.parquet", idx, cfg)
mark("tokenize_stage")
run_index_stage(spark, idx, cfg)
mark("index_stage")

# sub-profile of index-stage jobs (re-run pieces on the written tokens)
tokens = spark.read.parquet(os.path.join(idx, "tokens"))
tok = tokens.filter(F.col("term").isNotNull())
mark("setup")
print("token rows:", tok.count(), flush=True)
mark("tok_count")
tok2 = tok.repartition(64, "term").sortWithinPartitions("term", "doc_id")
print("shuffle+sort rows:", tok2.count(), flush=True)
mark("shuffle_sort_count")
spark.stop()
