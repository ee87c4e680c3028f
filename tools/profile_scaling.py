"""Component-level scaling probe: times each build component at a given
core count so the non-scaling component can be isolated.

Usage: python tools/profile_scaling.py <cores> [sf]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_prepper_spark.corpus import ensure_fixtures  # noqa: E402
from data_prepper_spark.index.build import (  # noqa: E402
    BuildConfig,
    TOKENS_SCHEMA,
    _make_block_builder,
    _tokenize_batches_arrow,
)
from data_prepper_spark.session import get_spark  # noqa: E402

cores = int(sys.argv[1])
sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1

fdir = ensure_fixtures(sf, base_dir=os.path.join(REPO, "fixtures"))
tokens_dir = f"/tmp/profile_idx_{sf}_32/tokens"  # from profile_build.py

spark = get_spark(app_name=f"scalprobe{cores}", master=f"local[{cores}]",
                  shuffle_partitions=64)


def timed(name, fn):
    t0 = time.time()
    out = fn()
    print(f"[{cores}c] {name}: {time.time()-t0:.1f}s ({out})", flush=True)


corpus = spark.read.parquet(f"{fdir}/corpus.parquet")
src = corpus.withColumn("unit", F.lit("u")).select(
    "unit",
    F.xxhash64("repo", "path", "commit").alias("doc_id"),
    "repo", "path", "commit", "content", "content_sha256",
)

timed("scan_only_count", lambda: corpus.count())
timed(
    "tokenize_mapInArrow_count",
    lambda: src.mapInArrow(_tokenize_batches_arrow, schema=TOKENS_SCHEMA).count(),
)

if os.path.isdir(tokens_dir):
    raw = spark.read.parquet(tokens_dir).filter(F.col("term").isNotNull())
    timed(
        "tf_agg_jvm_count",
        lambda: raw.groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
        .count(),
    )
    tok = (
        raw.groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
        .withColumn("salt", F.lit(0))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(32)).cast("int"))
    )
    cfg = BuildConfig()
    timed(
        "encode_blocks_count",
        lambda: tok.repartition(64, "term", "salt")
        .sortWithinPartitions("term", "salt", "doc_id")
        .mapInArrow(_make_block_builder(cfg, 1000.0), schema=(
            "term string, bucket int, min_doc long, max_doc long, n int, "
            "docs binary, tfs binary, dls binary, max_tf int, block_max double"
        ))
        .count(),
    )
    timed(
        "tokens_rewrite_parquet",
        lambda: spark.read.parquet(tokens_dir)
        .write.mode("overwrite")
        .parquet(f"/tmp/tokrw_{cores}"),
    )
spark.stop()
