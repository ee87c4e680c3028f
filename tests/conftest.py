from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from data_prepper_spark.corpus import ensure_fixtures, write_corpus
from data_prepper_spark.index.build import BuildConfig, build_index
from data_prepper_spark.session import get_spark

SF = 0.001  # 1,000 docs — smoke/unit scale (FIXTURES.md)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir() -> str:
    return ensure_fixtures(SF)


@pytest.fixture(scope="session")
def corpus_pdf(fixture_dir) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(fixture_dir, "corpus.parquet"))


@pytest.fixture(scope="session")
def queries_pdf(fixture_dir) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(fixture_dir, "queries.parquet"))


@pytest.fixture(scope="session")
def index_dir(spark, fixture_dir, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("index"))
    build_index(
        spark,
        os.path.join(fixture_dir, "corpus.parquet"),
        d,
        BuildConfig(n_buckets=8, hot_group_target=2_000),
    )
    return d


@pytest.fixture(scope="session")
def multiunit_corpus(tmp_path_factory) -> str:
    """Small corpus split into several files (resume/lineage tests)."""
    d = str(tmp_path_factory.mktemp("corpus_units"))
    out = os.path.join(d, "corpus.parquet")
    write_corpus(0.001, out, chunks_per_file=1)  # 2 units of 512/488 docs
    return out


@pytest.fixture()
def fresh_dir(tmp_path) -> str:
    d = str(tmp_path / "idx")
    shutil.rmtree(d, ignore_errors=True)
    return d
