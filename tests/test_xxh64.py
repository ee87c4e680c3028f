"""xxh64 must match Spark's F.xxhash64 bit-for-bit (doc identity)."""

import pyspark.sql.functions as F

from data_prepper_spark.xxh64 import doc_id_of, xxh64, xxhash64_cols


def test_matches_spark_strings(spark):
    rows = [
        ("org1/repoA", "src/main/Foo.java", "abc123def"),
        ("o", "p", "c"),
        ("a" * 40, "b" * 17, "c" * 3),
        ("", "x", "yy"),
        ("unicodé/répo", "päth", "cømmit"),
        ("x" * 7, "y" * 8, "z" * 9),
        ("q" * 31, "r" * 32, "s" * 33),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string")
    got = [r[0] for r in df.select(F.xxhash64("repo", "path", "commit")).collect()]
    want = [xxhash64_cols(*r) for r in rows]
    assert got == want


def test_matches_spark_longs(spark):
    vals = [12345, -7, 0, 2**62, -(2**62)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [xxhash64_cols(v) for v in vals]


def test_all_input_lengths():
    # exercise every tail path (0..40 bytes) for self-consistency
    seen = set()
    for n in range(41):
        h = xxh64(b"a" * n, 42)
        assert 0 <= h < 2**64
        seen.add(h)
    assert len(seen) == 41


def test_doc_id_stable():
    assert doc_id_of("r", "p", "c") == xxhash64_cols("r", "p", "c")
