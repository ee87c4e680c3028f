"""Measure the grok single-pass extraction win (VERDICT r02 #5).

Loads the pre-single-pass parse.py from git history (parent of the
commit that landed the rework), times both implementations parsing
%{COMBINEDAPACHELOG} (~10 captures) over N synthetic log rows, and
prints one JSON line. The old implementation ran the compiled regex
once per capture plus two rlike gates (~12 evaluations/row); the new
one runs exactly two (one rlike + one regexp_replace).

Usage: python tools/profile_grok.py [n_rows]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OLD_COMMIT = "2a09770^"  # parent of "single-pass grok/dissect" commit


def load_old_parse(tmp: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show",
         f"{OLD_COMMIT}:data_prepper_spark/operators/parse.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = os.path.join(tmp, "old_parse.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("old_parse", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import functions as F

    from data_prepper_spark.operators import parse as new_parse
    from data_prepper_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    old_parse = load_old_parse("/tmp")

    spark = get_spark(app_name="profile_grok", master="local[32]")
    line = (
        '198.51.100.{i} frank frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb_{i}.gif HTTP/1.0" 200 2326 '
        '"http://ref.example/{i}" "Mozilla/5.0 (X11; Linux) Gecko"'
    )
    df = (
        spark.range(n_rows)
        .select(
            F.format_string(
                line.replace("{i}", "%d").replace("198.51.100.%d", "198.51.100.7"),
                *([F.col("id")] * line.count("{i}")),
            ).alias("log")
        )
        .persist()
    )
    df.count()

    out = {"n_rows": n_rows}
    for name, mod in (("old", old_parse), ("new", new_parse)):
        for _ in range(2):  # min of two runs
            t0 = time.time()
            g = mod.grok(df, "log", "%{COMBINEDAPACHELOG}")
            g.agg(
                F.count("verb"), F.count("response"), F.count("agent")
            ).collect()
            dt = time.time() - t0
            key = f"{name}_sec"
            out[key] = round(min(dt, out.get(key, 1e9)), 2)
    out["speedup"] = round(out["old_sec"] / out["new_sec"], 2)
    # same captures on both paths
    a = new_parse.grok(df.limit(5), "log", "%{COMBINEDAPACHELOG}").collect()
    b = old_parse.grok(df.limit(5), "log", "%{COMBINEDAPACHELOG}").collect()
    assert [r["request"] for r in a] == [r["request"] for r in b]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
