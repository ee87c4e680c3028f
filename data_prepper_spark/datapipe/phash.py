"""Portable 60-bit string hash, bit-identical between Spark SQL and
DuckDB SQL.

The driver's CORRECTNESS gate runs every entry against a DuckDB oracle,
so hash-based operators (minhash, simhash, winnowing) need a hash both
engines can compute exactly. md5 is in both; the low 15 hex chars parse
into a non-negative int64 (60 bits):

  Spark : CAST(conv(substring(md5(s), 18, 15), 16, 10) AS BIGINT)
  DuckDB: CAST(('0x' || substr(md5(s), 18, 15)) AS BIGINT)

Equality is asserted in tests/test_datapipe.py (property test over
random strings). Production paths keep F.xxhash64 (native, faster);
these portable variants exist so the hash-based dedup family is
oracle-provable end-to-end, not just pytest-asserted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash60(c: Column) -> Column:
    """Spark: portable 60-bit hash of a string column (non-negative)."""
    return F.conv(F.substring(F.md5(c), 18, 15), 16, 10).cast("long")


def phash60_sql(expr: str) -> str:
    """DuckDB fragment computing the identical value."""
    return f"CAST(('0x' || substr(md5({expr}), 18, 15)) AS BIGINT)"
