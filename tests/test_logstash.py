"""Logstash .conf -> pipeline-YAML converter (data_prepper_spark/
logstash.py), mirroring the reference's LogstashConfigConverter.java:32
+ mapping resources: same plugin-name/attribute translations, same
mutate split, same nested-[a][b] -> /a/b rewrite — targeted at THIS
engine's runnable pipeline surface (pipeline.build_pipelines)."""

from __future__ import annotations

import glob
import os

import pytest

from data_prepper_spark.logstash import (
    convert,
    convert_to_yaml,
    parse_conf,
)

LOG_INGEST_CONF = """
input {
    http {
        port => 3000
        threads => 10.0
        ssl => true
    }
}
filter {
    grok {
        match => {"log" => "%{COMBINEDAPACHELOG}"}
        break_on_match => false
    }
    drop { }
    kv {
        source => "message"
        target => "test"
    }
    mutate {
        add_field => { "message1" => 3 "message2" => 4.2 "message3" => "test3" "message4" => true }
        rename => { "messagea" => "newMessage" "messageb" => "newMessage2" }
        copy => { "messagec" => "messaged" }
        remove_field => ["test", "test2"]
        remove_field => ["test3", "test4"]
        uppercase => ["uppercaseField"]
        lowercase => ["lowercaseField"]
        trim => ["trimField"]
        gsub => ["source", "from", "to", "source2", "from2", "to2"]
        split => { "splitMessage" => ","}
    }
}
output {
    elasticsearch {
        hosts => ["https://localhost:19000"]
        user => myuser
        password => mypassword
        index => "simple-pipeline"
    }
}
"""


def test_parse_conf_value_forms():
    conf = parse_conf(
        """
# a comment
input {
  file { path => "/tmp/x.log" codec => json sincedb_path => '/dev/null' }
}
filter {
  mutate { convert => { "num" => "integer" } add_field => { "pi" => 3.14 "on" => true } }
}
output { stdout { } }
"""
    )
    (name, attrs), = conf["input"]
    assert name == "file" and attrs["path"] == "/tmp/x.log"
    assert attrs["codec"] == "json"
    (mname, mattrs), = conf["filter"]
    assert mattrs["add_field"] == {"pi": 3.14, "on": True}
    assert conf["output"] == [("stdout", {})]


def test_convert_log_ingest_golden():
    out = convert(LOG_INGEST_CONF)
    (pname, spec), = out.items()
    assert pname == "logstash-converted-pipeline"
    # http input: mapped attrs + the reference's additional defaults
    assert spec["source"]["http"] == {
        "max_connection_count": 500,
        "request_timeout": 10000,
        "port": 3000,
        "thread_count": 10.0,
        "ssl": True,
    }
    procs = spec["processor"]
    names = [next(iter(p)) for p in procs]
    # grok, drop, kv, then mutate split in canonical order
    assert names == [
        "grok", "drop_events", "key_value",
        "add_entries", "rename_keys", "copy_values", "delete_entries",
        "uppercase_string", "lowercase_string", "trim_string",
        "substitute_string", "split_string",
    ]
    assert procs[0]["grok"]["match"] == {"log": ["%{COMBINEDAPACHELOG}"]}
    assert procs[0]["grok"]["break_on_match"] is False
    assert procs[2]["key_value"] == {
        "source": "message", "destination": "test",
    }
    assert procs[3]["add_entries"]["entries"] == [
        {"key": "message1", "value": 3},
        {"key": "message2", "value": 4.2},
        {"key": "message3", "value": "test3"},
        {"key": "message4", "value": True},
    ]
    # repeated remove_field merges into ONE delete_entries
    assert procs[6]["delete_entries"]["with_keys"] == [
        "test", "test2", "test3", "test4",
    ]
    assert procs[10]["substitute_string"]["entries"] == [
        {"source": "source", "from": "from", "to": "to"},
        {"source": "source2", "from": "from2", "to": "to2"},
    ]
    assert procs[11]["split_string"]["entries"] == [
        {"source": "splitMessage", "delimiter": ","},
    ]
    # elasticsearch -> opensearch, user -> username
    (sink,), = (spec["sink"],)
    assert sink["opensearch"]["hosts"] == ["https://localhost:19000"]
    assert sink["opensearch"]["username"] == "myuser"
    assert sink["opensearch"]["index"] == "simple-pipeline"
    # yaml form round-trips
    import yaml

    assert yaml.safe_load(convert_to_yaml(LOG_INGEST_CONF)) == out


def test_nested_field_syntax_rewrites_to_json_pointer():
    out = convert(
        """
input { http { } }
filter {
  grok {
    match => ["[data][log1]", "%{COMBINEDAPACHELOG}"]
    match => ["[data][log1]", "%{NUMBER} %{GREEDYDATA:[nested][field][data1]}"]
    match => {"[data][log2]" => "%{COMBINEDAPACHELOG}"}
    overwrite => ["[nested][field][data1]"]
  }
  date {
    match => ["[data][timestamp]", "yyyy-MM-dd"]
    target => "[data][@timestamp]"
  }
  mutate {
    rename => { "[messages][messagea]" => "[newMessage]" }
  }
}
output { stdout { } }
"""
    )
    procs = next(iter(out.values()))["processor"]
    g = procs[0]["grok"]
    # repeated match merges per rewritten field, pattern order kept;
    # capture names inside patterns rewrite too
    assert g["match"] == {
        "/data/log1": [
            "%{COMBINEDAPACHELOG}",
            "%{NUMBER} %{GREEDYDATA:/nested/field/data1}",
        ],
        "/data/log2": ["%{COMBINEDAPACHELOG}"],
    }
    assert g["keys_to_overwrite"] == ["/nested/field/data1"]
    d = procs[1]["date"]
    assert d["match"] == [{"key": "/data/timestamp",
                           "patterns": ["yyyy-MM-dd"]}]
    assert d["destination"] == "/data/@timestamp"
    assert d["from_time_received"] is False
    assert procs[2]["rename_keys"]["entries"] == [
        {"from_key": "/messages/messagea", "to_key": "/newMessage"},
    ]


def test_amazon_es_and_multiple_outputs():
    out = convert(
        """
input { http { } }
output {
  elasticsearch { hosts => ["https://localhost:9200"] user => admin password => p index => "logingest" }
  amazon_es { hosts => ["fake.us-east-1.es.amazonaws.com"] region => "us-east-1" index => "logingest" }
}
"""
    )
    sinks = next(iter(out.values()))["sink"]
    assert len(sinks) == 2
    assert sinks[0]["opensearch"]["username"] == "admin"
    assert sinks[1]["opensearch"]["aws_region"] == "us-east-1"
    assert sinks[1]["opensearch"]["aws_sigv4"] is True


def test_conditionals_raise_loudly():
    with pytest.raises(NotImplementedError, match="conditional"):
        convert(
            """
input { http { } }
filter { if [status] { drop { } } }
output { stdout { } }
"""
        )


def test_unknown_plugin_raises():
    with pytest.raises(NotImplementedError, match="throttle"):
        convert("input { http {} } filter { throttle {} } output {}")


REF_SAMPLES = sorted(
    glob.glob(
        "/root/reference/data-prepper-logstash-configuration/src/test/"
        "resources/org/opensearch/dataprepper/logstash/*.conf"
    )
)


@pytest.mark.skipif(not REF_SAMPLES, reason="reference samples absent")
@pytest.mark.parametrize(
    "conf_path", REF_SAMPLES, ids=[os.path.basename(p) for p in REF_SAMPLES]
)
def test_reference_sample_configs_convert(conf_path):
    """Every sample .conf the reference converter's own tests use
    converts cleanly into a pipeline dict with a source and sinks."""
    with open(conf_path) as f:
        out = convert(f.read())
    spec = next(iter(out.values()))
    assert set(spec) == {"source", "processor", "sink"}
    assert spec["sink"]


def test_converted_pipeline_runs_end_to_end(spark, tmp_path):
    """file input -> grok COMMONAPACHELOG -> mutate -> opensearch sink
    (local physical index) entirely through a CONVERTED config, then
    the built index answers a BM25 query — the migration path a
    Logstash user would walk."""
    from data_prepper_spark.index.query import topk_with_docs
    from data_prepper_spark.pipeline import build_pipelines

    log = tmp_path / "access.log"
    lines = [
        f'10.0.0.{i % 7} - frank [10/Oct/2000:13:55:3{i % 10} -0700] '
        f'"GET /item/{i} HTTP/1.0" 200 {100 + i}'
        for i in range(50)
    ]
    log.write_text("\n".join(lines) + "\n")
    idx_root = tmp_path / "os_sink"

    conf = f"""
input {{ file {{ path => "{log}" }} }}
filter {{
  grok {{ match => {{ "message" => "%{{COMMONAPACHELOG}}" }} }}
  mutate {{
    uppercase => ["verb"]
    add_field => {{ "pipeline" => "converted" }}
    remove_field => ["ident"]
  }}
}}
output {{
  opensearch {{
    hosts => ["https://localhost:19000"]
    index => "access"
    index_dir => "{idx_root}"
  }}
}}
"""
    cfg = convert(conf)
    results = build_pipelines(spark, cfg)
    out_df = results["logstash-converted-pipeline"].output
    cols = out_df.columns
    assert "verb" in cols and "pipeline" in cols and "ident" not in cols
    rows = out_df.select("verb", "response").distinct().collect()
    assert {(r["verb"], r["response"]) for r in rows} == {("GET", "200")}

    q = spark.createDataFrame(
        [(0, "frank")], "query_id long, query string"
    )
    hits = topk_with_docs(spark, str(idx_root / "index"), q, k=5).collect()
    assert len(hits) == 5
    assert all(h["repo"] == "access" for h in hits)


def test_geoip_filter_converts():
    from data_prepper_spark.logstash import convert

    out = convert(
        """
input { http { } }
filter {
  geoip {
    source => "[client][ip]"
    database => "/data/GeoLite2-City.mmdb"
    target => "geo"
    fields => ["country_name", "city_name", "latitude"]
  }
}
output { stdout { } }
"""
    )
    procs = next(iter(out.values()))["processor"]
    g = procs[0]["geoip"]
    assert g["source"] == "/client/ip"
    assert g["database_path"] == "/data/GeoLite2-City.mmdb"
    assert g["target"] == "geo"
    assert g["include_fields"] == [
        "country_name", "city_name", "latitude",
    ]
