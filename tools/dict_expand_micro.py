"""Micro-bench: blocked equi-join dictionary expansion vs the r03
BroadcastNestedLoopJoin formulation, at a 10M-term synthetic
dictionary (the VERDICT r03 'done' criterion for next-round item 1).

The corpus-scale entries can't show this difference — their fixture
dictionaries are ~10^4 terms. Here the dictionary is 10^7 terms
(deterministic base-36 tokens, written SORTED by term so the
startswith scan filter can prune parquet row groups, exactly like the
real terms table, which is written from a term-sorted shuffle), and
the pattern batch is 32 requests — a realistic suggest/expansion
request batch.

Usage: python tools/dict_expand_micro.py [n_terms] [n_patterns]
Prints one JSON line per (mode, plan) with wall seconds + matched rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_prepper_spark.index.query import (  # noqa: E402
    _blocked_dictionary_match,
    _delete_neighborhood,
)
from data_prepper_spark.session import get_spark  # noqa: E402

N_TERMS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_PATS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DICT_PATH = f"/tmp/dict_micro_{N_TERMS}"


def build_dictionary(spark):
    if not os.path.exists(os.path.join(DICT_PATH, "_SUCCESS")):
        (
            spark.range(N_TERMS)
            .select(
                F.lower(F.conv(F.col("id") + 36**4, 10, 36)).alias("term"),
                (F.xxhash64("id") % 1000 + 1000).alias("df"),
            )
            .sort("term")
            .write.mode("overwrite")
            .parquet(DICT_PATH)
        )
    return spark.read.parquet(DICT_PATH)


def bench(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(json.dumps({"case": label, "sec": round(dt, 2), "rows": int(n)}))
    return dt


def main():
    spark = get_spark(
        app_name="dict_expand_micro",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    terms = build_dictionary(spark)
    terms.count()  # warm FS cache / commit the write

    # 32 deterministic patterns drawn from the dictionary's own shape
    pat_terms = [
        r["term"]
        for r in terms.limit(200_000).sample(False, 0.01, seed=7).limit(N_PATS).collect()
    ]
    prefixes = [(i, t[:3]) for i, t in enumerate(pat_terms)]
    fuzzies = [(i, t[:-1] + "q") for i, t in enumerate(pat_terms)]

    ppats = spark.createDataFrame(prefixes, "query_id long, pattern string")
    fpats = spark.createDataFrame(fuzzies, "query_id long, pattern string")

    # --- old r03 formulation: non-equi broadcast join -> BNLJ ---
    def old_prefix():
        j = terms.join(
            F.broadcast(ppats), F.col("term").startswith(F.col("pattern"))
        )
        return j.count()

    def old_fuzzy():
        j = terms.join(
            F.broadcast(fpats),
            (F.abs(F.length("term") - F.length("pattern")) <= F.lit(1))
            & (F.levenshtein(F.col("term"), F.col("pattern")) <= F.lit(1)),
        )
        return j.count()

    # --- blocked equi-join (the shipped path) ---
    def new_prefix():
        rows = ppats.collect()
        return _blocked_dictionary_match(terms, ppats, rows, "prefix").count()

    def new_fuzzy():
        rows = fpats.collect()
        return _blocked_dictionary_match(terms, fpats, rows, "fuzzy").count()

    # depth-2 suggest blocking vs the old +/-2-band NLJ
    spats = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pat_terms)], "input_id long, text string"
    )

    def old_suggest():
        j = (
            terms.join(
                F.broadcast(spats),
                (F.abs(F.length("term") - F.length("text")) <= F.lit(2))
                & (F.col("term") != F.col("text")),
            )
            .withColumn("d", F.levenshtein(F.col("term"), F.col("text")))
            .filter(F.col("d") <= 2)
        )
        return j.count()

    def new_suggest():
        # the shipped no-sidecar plan: length-grouped OR-of-literal
        # scan filter, then length-equi-key assignment over survivors
        from data_prepper_spark.index.query import (
            _assign_by_distance,
            _edit_scan_filter,
        )

        surv = terms.filter(_edit_scan_filter("term", pat_terms, 2))
        j = _assign_by_distance(surv, spats, "text", 2).filter(
            F.col("term") != F.col("text")
        )
        return j.count()

    # --- persisted deletion-key sidecar (the serving path) ---
    from data_prepper_spark.index.query import _deletes_py, _kb

    DELETES_PATH = f"{DICT_PATH}_deletes"

    def build_sidecar():
        out = terms.select(
            "term",
            "df",
            F.explode(_delete_neighborhood("term", 2)).alias("_key"),
        ).withColumn("_kb", F.substring(F.rpad("_key", 2, "#"), 1, 2))
        (
            out.repartition("_kb")
            .sortWithinPartitions("_key")
            .write.mode("overwrite")
            .partitionBy("_kb")
            .parquet(DELETES_PATH)
        )
        return spark.read.parquet(DELETES_PATH).count()

    def make_sidecar_suggest(texts):
        sp = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "input_id long, text string",
        )

        def run():
            from data_prepper_spark.index.query import _assign_by_distance

            deletes = spark.read.parquet(DELETES_PATH)
            keys = sorted({k for t in texts for k in _deletes_py(t, 2)})
            surv = (
                deletes.filter(
                    F.col("_kb").isin(sorted({_kb(k) for k in keys}))
                )
                .filter(F.col("_key").isin(keys))
                .select("term", "df")
                .dropDuplicates(["term"])
            )
            j = _assign_by_distance(surv, sp, "text", 2).filter(
                F.col("term") != F.col("text")
            )
            return j.count()

        return run

    def make_bnlj_suggest(texts):
        sp = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "input_id long, text string",
        )

        def run():
            j = (
                terms.join(
                    F.broadcast(sp),
                    (F.abs(F.length("term") - F.length("text")) <= F.lit(2))
                    & (F.col("term") != F.col("text")),
                )
                .withColumn("d", F.levenshtein(F.col("term"), F.col("text")))
                .filter(F.col("d") <= 2)
            )
            return j.count()

        return run

    results = {}
    for label, fn in [
        ("prefix_bnlj_r03", old_prefix),
        ("prefix_blocked", new_prefix),
        ("fuzzy_bnlj_r03", old_fuzzy),
        ("fuzzy_blocked", new_fuzzy),
        ("suggest2_bnlj_r03", old_suggest),
        ("suggest2_scanfilter", new_suggest),
        ("deletes_sidecar_build_once", build_sidecar),
        ("suggest2_sidecar_batch32", make_sidecar_suggest(pat_terms)),
        ("suggest2_sidecar_single", make_sidecar_suggest(pat_terms[:1])),
        ("suggest2_bnlj_single", make_bnlj_suggest(pat_terms[:1])),
    ]:
        results[label] = bench(label, fn)
    print(
        json.dumps(
            {
                "n_terms": N_TERMS,
                "n_patterns": N_PATS,
                "speedup_prefix": round(
                    results["prefix_bnlj_r03"] / results["prefix_blocked"], 2
                ),
                "speedup_fuzzy": round(
                    results["fuzzy_bnlj_r03"] / results["fuzzy_blocked"], 2
                ),
                "speedup_suggest2_scanfilter": round(
                    results["suggest2_bnlj_r03"]
                    / results["suggest2_scanfilter"],
                    2,
                ),
                "speedup_suggest2_sidecar_batch32": round(
                    results["suggest2_bnlj_r03"]
                    / results["suggest2_sidecar_batch32"],
                    2,
                ),
                "speedup_suggest2_sidecar_single": round(
                    results["suggest2_bnlj_single"]
                    / results["suggest2_sidecar_single"],
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
