"""Pipeline-YAML compiler parity: the reference's e2e basic-log shape
(grok -> date -> mutations -> routes -> sinks) plus pipeline chaining
(PipelineConnector) — SURVEY.md §3.1 / reference
e2e-test/log/.../basic-grok-e2e-pipeline.yml."""

import os

import pytest

from data_prepper_spark.operators.parse import COMMON_APACHE_LOG
from data_prepper_spark.pipeline import build_pipelines

LOGS = [
    '10.0.0.1 - alice [10/Oct/2000:13:55:36 -0700] "GET /index.html HTTP/1.0" 200 1043',
    '10.0.0.2 - bob [10/Oct/2000:13:56:01 -0700] "POST /login HTTP/1.0" 500 532',
    '10.0.0.3 - carol [10/Oct/2000:13:57:12 -0700] "GET /missing HTTP/1.0" 404 0',
    '10.0.0.4 - dave [10/Oct/2000:13:58:40 -0700] "GET /index.html HTTP/1.0" 200 1043',
]


@pytest.fixture()
def log_path(spark, tmp_path):
    p = str(tmp_path / "logs.parquet")
    spark.createDataFrame([(x,) for x in LOGS], "log string").write.parquet(p)
    return p


def test_basic_grok_pipeline(spark, log_path, tmp_path):
    out_all = str(tmp_path / "out_all")
    out_err = str(tmp_path / "out_err")
    cfg = {
        "log-pipeline": {
            "source": {"parquet": {"path": log_path}},
            "processor": [
                {"grok": {"source": "log", "pattern": COMMON_APACHE_LOG}},
                {"convert_type": {"key": "response", "type": "integer"}},
                {"uppercase_string": {"with_keys": ["verb"]}},
                {"add_entries": {"entries": [
                    {"key": "label", "format": "${verb}:${request}"}
                ]}},
                {"drop_events": {"drop_when": "/response == 404"}},
            ],
            "route": {"errors": "/response >= 500"},
            "sink": [
                {"parquet": {"path": out_all}},
                {"parquet": {"path": out_err}, "routes": ["errors"]},
            ],
        }
    }
    res = build_pipelines(spark, cfg)
    got_all = spark.read.parquet(out_all).toPandas()
    got_err = spark.read.parquet(out_err).toPandas()
    assert len(got_all) == 3  # 404 dropped
    assert set(got_all.verb) == {"GET", "POST"}
    assert got_all.label.str.contains(":").all()
    assert len(got_err) == 1 and got_err.clientip.iloc[0] == "10.0.0.2"
    assert "log-pipeline" in res


def test_pipeline_connector_chaining(spark, log_path, tmp_path):
    out = str(tmp_path / "out_chained")
    cfg = {
        "downstream": {
            "source": {"pipeline": "upstream"},
            "processor": [
                {"aggregate_count": {"identification_keys": ["verb"],
                                     "count_key": "n"}},
            ],
            "sink": [{"parquet": {"path": out}}],
        },
        "upstream": {
            "source": {"parquet": {"path": log_path}},
            "processor": [
                {"grok": {"source": "log", "pattern": COMMON_APACHE_LOG}},
            ],
            "sink": [{"noop": {}}],
        },
    }
    build_pipelines(spark, cfg)
    got = spark.read.parquet(out).toPandas().set_index("verb")["n"].to_dict()
    assert got == {"GET": 3, "POST": 1}


def test_yaml_string_input(spark, log_path, tmp_path):
    out = str(tmp_path / "out_yaml")
    yml = f"""
simple:
  source:
    parquet: {{ path: {log_path} }}
  processor:
    - dissect:
        source: log
        pattern: "%{{ip}} - %{{user}} ["
  sink:
    - parquet: {{ path: {out} }}
"""
    build_pipelines(spark, yml)
    got = spark.read.parquet(out).toPandas()
    assert set(got.user) == {"alice", "bob", "carol", "dave"}


def test_log_generator_perf_pipeline_shape(spark, tmp_path):
    """The reference's 11-processor perf pipeline shape
    (docs/latest_performance_test_results.md:117-191) over the
    deterministic log generator."""
    out = str(tmp_path / "out_perf")
    cfg = {
        "perf-pipeline": {
            "source": {"log_generator": {"count": 500}},
            "processor": [
                {"grok": {"source": "log", "pattern": COMMON_APACHE_LOG}},
                {"date": {"source": "timestamp",
                          "match": ["dd/MMM/yyyy:HH:mm:ss Z"]}},
                {"substitute_string": {"entries": [
                    {"source": "request", "from": "/page/", "to": "page-"}]}},
                {"uppercase_string": {"with_keys": ["verb"]}},
                {"trim_string": {"with_keys": ["auth"]}},
                {"split_string": {"entries": [
                    {"source": "httpversion", "delimiter": "/"}]}},
                {"add_entries": {"entries": [
                    {"key": "source_kind", "value": "apache"}]}},
                {"rename_keys": {"entries": [
                    {"from_key": "clientip", "to_key": "client_ip"}]}},
                {"copy_values": {"entries": [
                    {"from_key": "response", "to_key": "status"}]}},
                {"convert_type": {"key": "status", "type": "integer"}},
                {"delete_entries": {"with_keys": ["ident"]}},
            ],
            "sink": [{"parquet": {"path": out}}],
        }
    }
    build_pipelines(spark, cfg)
    got = spark.read.parquet(out)
    assert got.count() == 500
    cols = set(got.columns)
    assert "client_ip" in cols and "ident" not in cols
    assert got.schema["status"].dataType.simpleString() == "int"
    assert got.filter("`@timestamp` IS NULL").count() == 0


def test_unknown_processor_rejected(spark, log_path):
    with pytest.raises(ValueError, match="unknown processor"):
        build_pipelines(
            spark,
            {"p": {"source": {"parquet": {"path": log_path}},
                   "processor": [{"bogus": {}}], "sink": [{"noop": {}}]}},
        )
