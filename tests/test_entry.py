"""Driver-contract smoke: entry() runs, and a representative subset of
queries() matches its oracle_sql() via DuckDB at sf0.001 (the full set
is exercised by tools/check_entries.py at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_entries import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "bm25_topk",
    "tpch_q1",
    "translate_event_type",
    "aggregate_histogram_action",
    "service_map_edges",
    "cosine_topk_bruteforce",
    "inverted_index_stats",
    "sessionization",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"query", "rank", "doc_id", "score_r"} <= set(df.columns)


def test_every_query_has_callable():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # oracle coverage: at least 80% of entries are SQL-verified
    assert len(oracles) / len(qs) >= 0.8


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_subset(spark, duck, name):
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    want = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    errs = compare(name, got, want)
    assert not errs, errs
