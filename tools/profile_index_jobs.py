"""Per-Spark-job profile of the full build via the UI REST API.

Usage: python tools/profile_index_jobs.py [sf] [cores]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_prepper_spark.corpus import ensure_fixtures  # noqa: E402
from data_prepper_spark.index.build import build_index, BuildConfig  # noqa: E402
from data_prepper_spark.session import get_spark  # noqa: E402

sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
fdir = ensure_fixtures(sf, base_dir=os.path.join(REPO, "fixtures"))
idx = f"/tmp/profile_jobs_{sf}_{cores}"
shutil.rmtree(idx, ignore_errors=True)
spark = get_spark(
    app_name="profile_jobs", master=f"local[{cores}]", shuffle_partitions=64,
    extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "true"},
)
t0 = time.time()
build_index(spark, f"{fdir}/corpus.parquet", idx, BuildConfig())
total = time.time() - t0
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))
rows = []
for j in jobs:
    from datetime import datetime
    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    st = datetime.strptime(j["submissionTime"], fmt)
    en = datetime.strptime(j["completionTime"], fmt)
    rows.append((j["jobId"], (en - st).total_seconds(), j["name"][:90]))
rows.sort()
for jid, dur, name in rows:
    print(f"job {jid:3d}  {dur:7.1f}s  {name}")
print(f"TOTAL build {total:.1f}s")
spark.stop()
