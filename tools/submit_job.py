"""spark-submit entry point (north_rule: "run via spark-submit
--py-files on multi-executor clusters").

Usage:
  cd /root/repo && zip -qr /tmp/dps.zip data_prepper_spark
  spark-submit --master local[32] --py-files /tmp/dps.zip \
      tools/submit_job.py build  <corpus_dir> <index_dir>
  spark-submit ... tools/submit_job.py query <index_dir> <queries.parquet>

On a real cluster, replace --master and add executor sizing; the job
code is identical (the package ships via --py-files).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    cmd = sys.argv[1]
    spark = (
        SparkSession.builder.appName(f"data_prepper_spark_{cmd}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .getOrCreate()
    )
    if cmd == "build":
        from data_prepper_spark.index.build import build_index

        corpus, index_dir = sys.argv[2], sys.argv[3]
        t0 = time.time()
        stats = build_index(spark, corpus, index_dir)
        print(json.dumps({"cmd": "build", "sec": round(time.time() - t0, 2),
                          "n_docs": stats.get("n_docs")}))
    elif cmd == "query":
        from data_prepper_spark.index.query import topk

        index_dir, queries_path = sys.argv[2], sys.argv[3]
        q = spark.read.parquet(queries_path)
        t0 = time.time()
        n = topk(spark, index_dir, q, k=10, mode="blockmax").count()
        print(json.dumps({"cmd": "query", "sec": round(time.time() - t0, 2),
                          "rows": n}))
    else:
        raise SystemExit(f"unknown command {cmd!r}")
    spark.stop()


if __name__ == "__main__":
    main()
