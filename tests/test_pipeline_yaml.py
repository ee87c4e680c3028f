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


def test_yaml_round2_processors(spark, tmp_path):
    """The YAML layer dispatches the round-2 processor surface:
    key_value grouping options, csv auto columns, parse_ion, date
    output_format, flatten recursive, translate file mappings,
    aggregate actions."""
    import yaml as _yaml

    from data_prepper_spark.pipeline import build_pipelines

    src = tmp_path / "in.parquet"
    spark.createDataFrame(
        [
            (1, 'k="a&b"&n=1', "1,two,3", "ann::{v: open}",
             "2024-02-03 04:05:06", 42.0),
            (2, "n=2", "4,five,6", "{v: closed}",
             "2024-02-03 05:05:06", 7.0),
        ],
        "id long, kv string, line string, ion string, ts string, val double",
    ).write.mode("overwrite").parquet(str(src))
    mfile = tmp_path / "m.yaml"
    mfile.write_text("'0-10': low\n'11-100': high\n")
    cfg = {
        "p": {
            "source": {"parquet": {"path": str(src)}},
            "processor": [
                {"key_value": {
                    "source": "kv", "destination": "kvp",
                    "value_grouping": True,
                    "string_literal_character": '"',
                }},
                {"csv": {"source": "line", "n_columns": 3,
                         "destination": "cols"}},
                {"parse_ion": {"source": "ion", "schema": "v string",
                               "destination": "ionp"}},
                {"date": {"source": "ts",
                          "match": ["yyyy-MM-dd HH:mm:ss"],
                          "destination": "day",
                          "output_format": "yyyy/MM/dd"}},
                {"translate": {"source": "val", "target": "band",
                               "file": str(mfile), "default": "other"}},
            ],
            "sink": [{"noop": None}],
        }
    }
    res = build_pipelines(spark, cfg, execute_sinks=False)
    out = {r["id"]: r for r in res["p"].sinks[0][1].collect()}
    assert out[1]["kvp"]["k"] == '"a&b"'
    assert out[1]["cols"]["column2"] == "two"
    assert out[1]["ionp"]["v"] == "open" and out[2]["ionp"]["v"] == "closed"
    assert out[1]["day"] == "2024/02/03"
    assert out[1]["band"] == "high" and out[2]["band"] == "low"


def test_anomaly_detector_pipeline(spark, tmp_path):
    """anomaly_detector declared in a pipeline config (reference
    pipelines.yaml surface: keys / mode / identification_keys /
    verbose) emits only anomalous events with deviation + grade."""
    import pandas as pd

    src = str(tmp_path / "anom_events")
    vals = [10.0, 11.0] * 10 + [100.0] + [10.0] * 5
    pd.DataFrame(
        {"g": "a", "event_id": range(len(vals)), "value": vals}
    ).to_parquet(src + ".parquet")
    out = str(tmp_path / "anom_out")
    cfg = {
        "anomaly-pipeline": {
            "source": {"parquet": {"path": src + ".parquet"}},
            "processor": [
                {"anomaly_detector": {
                    "keys": ["value"],
                    "identification_keys": ["g"],
                    "order_by": ["event_id"],
                    "mode": {"sample_size": 16, "output_after": 8},
                    "threshold": 2.0,
                    "verbose": True,
                }},
            ],
            "sink": [{"parquet": {"path": out}}],
        }
    }
    build_pipelines(spark, cfg)
    got = spark.read.parquet(out).toPandas()
    assert list(got.event_id) == [20]
    assert got.grade.iloc[0] == 1.0
    assert "deviation_from_expected" in got.columns


def test_yaml_recursive_kv_and_grok_options(spark):
    """Round-4 YAML surface: key_value recursive mode and grok's full
    option set route through the pipeline compiler."""
    import json

    from data_prepper_spark.pipeline import PROCESSORS

    df = spark.createDataFrame(
        [("a=1&b=(c=2)",)], "message string"
    )
    out = PROCESSORS["key_value"](
        df, {"source": "message", "recursive": True}
    ).collect()
    assert json.loads(out[0]["parsed"]) == {"a": "1", "b": {"c": "2"}}

    g = PROCESSORS["grok"](
        df.selectExpr("'x=1' as message"),
        {
            "source": "message",
            "pattern": "%{WORD:k}=%{INT:v}",
            "target_key": "gk",
            "match_timeout_ms": 5000,
        },
    ).collect()
    assert g[0]["gk"]["k"] == "x" and g[0]["gk"]["v"] == "1"


def test_yaml_geoip_processor(spark, tmp_path):
    """geoip routes through the pipeline compiler with a database
    file on disk (the reference's database_path config)."""
    from data_prepper_spark.operators.geoip import build_mmdb
    from data_prepper_spark.pipeline import PROCESSORS

    db_path = tmp_path / "fixture.mmdb"
    db_path.write_bytes(
        build_mmdb(
            [("10.0.0.0/8",
              {"country": {"iso_code": "DE", "names": {"en": "Germany"}}})]
        )
    )
    df = spark.createDataFrame(
        [("10.1.2.3",), ("8.8.8.8",)], "ip string"
    )
    out = PROCESSORS["geoip"](
        df,
        {
            "source": "ip",
            "database_path": str(db_path),
            "include_fields": ["country_name", "country_iso_code"],
            "tags_on_no_valid_ip": ["_miss"],
        },
    ).collect()
    by = {r["ip"]: r for r in out}
    assert by["10.1.2.3"]["geo"]["country_iso_code"] == "DE"
    assert by["8.8.8.8"]["geo"] is None
    assert "_miss" in by["8.8.8.8"]["_tags"]
