"""Pipeline YAML -> composed DataFrame job (the reference's "query
compiler", SURVEY.md §3.1).

The reference parses pipeline YAML into PipelinesDataFlowModel, builds
Source -> Buffer -> Processor* -> Router -> Sink+ object graphs, and
chains pipelines through PipelineConnector
(data-prepper-pipeline-parser/.../PipelinesDataflowModelParser.java:26-61,
core/parser/PipelineTransformer.java:143-252, :349-382). Here the same
YAML shape compiles to chained DataFrame transforms:

    my-pipeline:
      source:
        parquet: { path: /data/in }
      processor:
        - grok: { source: log, pattern: "%{IP:clientip} ..." }
        - add_entries: { entries: [{key: tag, value: x}] }
        - drop_events: { drop_when: '/response == "404"' }
      route:
        errors: '/response =~ "^5"'
      sink:
        - parquet: { path: /data/out, routes: [errors] }

    second-pipeline:
      source: { pipeline: my-pipeline }   # PipelineConnector analog
      ...

No buffer section: Spark's exchange/scheduler is the buffer (SURVEY.md
§2.3). `workers`/`batch_size` tuning keys are accepted and ignored
(parallelism comes from partitioning).
"""

from __future__ import annotations

from typing import Any

import yaml
from pyspark.sql import DataFrame, SparkSession

from .operators import aggregate as agg_ops
from .operators import codec_ops, enrich, mutate, parse
from .operators.anomaly import anomaly_detector as _anomaly_detector
from .operators.route import apply_routes, drop_events

def _grok_adapter(df: DataFrame, c: dict) -> DataFrame:
    """grok config in either form: {source, pattern} (native) or the
    reference's {match: {field: [patterns]}} (what the Logstash
    converter and the reference's own YAML emit — GrokProcessorConfig
    `match`); multi-field match applies per field in order."""
    kw = dict(
        tags_on_match_failure=c.get("tags_on_match_failure"),
        keys_to_overwrite=c.get("keys_to_overwrite"),
        target_key=c.get("target_key"),
        tags_on_timeout=c.get("tags_on_timeout"),
        named_captures_only=c.get("named_captures_only", True),
        match_timeout_ms=c.get("match_timeout_ms"),
    )
    if "match" in c:
        for field, pats in c["match"].items():
            df = parse.grok(df, field, pats, **kw)
        return df
    return parse.grok(df, c["source"], c["pattern"], **kw)


def _date_adapter(df: DataFrame, c: dict) -> DataFrame:
    """date config in either form: {source, match: [fmts]} (native) or
    the reference's {match: [{key, patterns}]} (DateProcessorConfig
    `match` — what the Logstash converter emits)."""
    source, patterns = c.get("source"), c.get("match")
    if (
        isinstance(patterns, list) and patterns
        and isinstance(patterns[0], dict)
    ):
        source = patterns[0]["key"]
        patterns = patterns[0]["patterns"]
    return parse.date_parse(
        df, source, patterns,
        c.get("destination", "@timestamp"),
        from_time_received=c.get("from_time_received", False),
        source_zone=c.get("source_timezone"),
        output_format=c.get("output_format"),
        locale=c.get("locale"),
    )


# processor name -> adapter(df, config) -> df
# names match the reference's registered plugin names (SURVEY.md §2.4)
PROCESSORS: dict[str, Any] = {
    "grok": lambda df, c: _grok_adapter(df, c),
    "dissect": lambda df, c: parse.dissect(df, c["source"], c["pattern"]),
    "key_value": lambda df, c: parse.key_value_recursive(
        df,
        c["source"],
        c.get("destination", "parsed"),
        field_split=c.get("field_split_characters", "&"),
        value_split=c.get("value_split_characters", "="),
        non_match_value=c.get("non_match_value"),
    )
    if c.get("recursive")
    else parse.key_value(
        df,
        c["source"],
        c.get("destination", "parsed"),
        c.get("field_split_characters", "&"),
        c.get("value_split_characters", "="),
        field_delimiter_regex=c.get("field_delimiter_regex"),
        key_value_delimiter_regex=c.get("key_value_delimiter_regex"),
        include_keys=c.get("include_keys"),
        exclude_keys=c.get("exclude_keys"),
        default_values=c.get("default_values"),
        prefix=c.get("prefix", ""),
        delete_key_regex=c.get("delete_key_regex"),
        delete_value_regex=c.get("delete_value_regex"),
        transform_key=c.get("transform_key"),
        whitespace=c.get("whitespace", "lenient"),
        drop_keys_with_no_value=c.get("drop_keys_with_no_value", False),
        non_match_value=c.get("non_match_value"),
        value_grouping=c.get("value_grouping", False),
        remove_brackets=c.get("remove_brackets", False),
        string_literal_character=c.get("string_literal_character"),
    ),
    "csv": lambda df, c: parse.csv_parse(
        df, c["source"], c.get("schema"), c.get("destination", "parsed"),
        c.get("delimiter", ","), c.get("quote_character", '"'),
        n_columns=c.get("n_columns"),
        header_source=c.get("column_names_source_key"),
    ),
    "parse_json": lambda df, c: parse.parse_json(
        df, c["source"], c["schema"], c.get("destination", "parsed")
    ),
    "parse_xml": lambda df, c: parse.parse_xml(
        df, c["source"], c["schema"], c.get("destination", "parsed")
    ),
    "parse_ion": lambda df, c: parse.parse_ion(
        df, c["source"], c["schema"], c.get("destination", "parsed")
    ),
    "date": lambda df, c: _date_adapter(df, c),
    "detect_format": lambda df, c: parse.detect_format(
        df, c["source"], c.get("destination", "detected_format")
    ),
    "add_entries": lambda df, c: mutate.add_entries(df, c["entries"]),
    "copy_values": lambda df, c: mutate.copy_values(
        df, [(e["from_key"], e["to_key"]) for e in c["entries"]]
    ),
    "rename_keys": lambda df, c: mutate.rename_keys(
        df, {e["from_key"]: e["to_key"] for e in c["entries"]}
    ),
    "delete_entries": lambda df, c: mutate.delete_entries(
        df, c.get("with_keys"), c.get("delete_key_regex")
    ),
    "list_to_map": lambda df, c: mutate.list_to_map(
        df, c["source"], c["key"], c.get("value_key", "value"),
        c.get("target", c["source"] + "_map"),
    ),
    "map_to_list": lambda df, c: mutate.map_to_list(
        df, c["source"], c.get("target", c["source"] + "_list")
    ),
    "wrap_entries": lambda df, c: mutate.wrap_entries(
        df, c["with_keys"], c["wrapper"]
    ),
    "select_entries": lambda df, c: mutate.select_entries(df, c["include_keys"]),
    "convert_type": lambda df, c: mutate.convert_type(
        df, c["key"], c["type"], c.get("scale"), c.get("tags_on_failure")
    ),
    "uppercase_string": lambda df, c: mutate.uppercase_string(df, c["with_keys"]),
    "lowercase_string": lambda df, c: mutate.lowercase_string(df, c["with_keys"]),
    "trim_string": lambda df, c: mutate.trim_string(df, c["with_keys"]),
    "split_string": lambda df, c: _split_many(df, c["entries"]),
    "substitute_string": lambda df, c: _subst_many(df, c["entries"]),
    "replace_string": lambda df, c: _replace_many(df, c["entries"]),
    "truncate": lambda df, c: mutate.truncate(
        df, c["source"], c.get("start_at", 0), c.get("length")
    ),
    "obfuscate": lambda df, c: mutate.obfuscate(
        df, c["source"], c.get("action", "mask"),
        c.get("patterns", c.get("pattern")),
        c.get("salt", ""), c.get("bits", 512),
        mask_character=c.get("mask_character", "*"),
        mask_character_length=c.get("mask_character_length", 3),
    ),
    "flatten": lambda df, c: mutate.flatten(
        df, c["source"], recursive=c.get("recursive", False)
    ),
    "write_json": lambda df, c: mutate.write_json(
        df, c["source"], c.get("target", c["source"] + "_json")
    ),
    "split_event": lambda df, c: mutate.split_event(
        df, c["field"], c.get("delimiter_regex", c.get("delimiter", " "))
    ),
    "drop_events": lambda df, c: drop_events(df, c["drop_when"]),
    "translate": lambda df, c: (
        enrich.translate_file(
            df, c["source"], c["target"], c["file"], c.get("default")
        )
        if "file" in c
        else enrich.translate(
            df, c["source"], c["target"], c["map"], c.get("default")
        )
    ),
    "aggregate_count": lambda df, c: agg_ops.aggregate_count(
        df, c["identification_keys"], c.get("count_key", "count"),
        c.get("aggregate_when"),
        output_format=c.get("output_format", "raw"),
        metric_name=c.get("metric_name", "count"),
        event_time_col=c.get("event_time_key"),
    ),
    "aggregate_histogram": lambda df, c: agg_ops.aggregate_histogram(
        df, c["identification_keys"], c["key"], c["buckets"]
    ),
    "aggregate_put_all": lambda df, c: agg_ops.aggregate_put_all(
        df, c["identification_keys"], c["value_keys"]
    ),
    "aggregate_append": lambda df, c: agg_ops.aggregate_append(
        df, c["identification_keys"], c["value_key"]
    ),
    "percent_sampler": lambda df, c: agg_ops.percent_sampler(
        df, c["percent"], c["hash_keys"]
    ),
    "tail_sampler": lambda df, c: agg_ops.tail_sampler(
        df, c["identification_key"], c["error_condition"], c["percent"]
    ),
    # reference anomaly-detector-processor config surface: keys, mode
    # (sample_size/output_after from random_cut_forest mode config),
    # identification_keys, verbose, cardinality_limit; batch needs an
    # explicit order_by (arrival order has no batch analog)
    "anomaly_detector": lambda df, c: _anomaly_detector(
        df,
        c["keys"],
        identification_keys=c.get("identification_keys"),
        order_by=c["order_by"],
        sample_size=c.get("mode", {}).get("sample_size", 256),
        output_after=c.get("mode", {}).get("output_after", 32),
        threshold=c.get("threshold", 3.0),
        verbose=c.get("verbose", False),
        cardinality_limit=c.get("cardinality_limit"),
    ),
    "remove_duplicates": lambda df, c: agg_ops.remove_duplicates(
        df, c["identification_keys"], c.get("order_by")
    ),
    "decompress": lambda df, c: codec_ops.decompress(
        df, c["source"], c.get("destination")
    ),
    "user_agent": lambda df, c: codec_ops.user_agent(
        df, c["source"], c.get("destination", "user_agent")
    ),
    # geoip (EntryConfig source/target/include_fields + the reference's
    # database file): database_path points at a MaxMind .mmdb on any
    # fsio-readable path; decode is the hand-rolled spec reader
    "geoip": lambda df, c: __import__(
        "data_prepper_spark.operators.geoip", fromlist=["geoip"]
    ).geoip(
        df,
        c["source"],
        open(c["database_path"], "rb").read(),
        target=c.get("target", "geo"),
        fields=tuple(
            c.get(
                "include_fields",
                __import__(
                    "data_prepper_spark.operators.geoip",
                    fromlist=["geoip"],
                ).DEFAULT_FIELDS,
            )
        ),
        tags_on_no_valid_ip=tuple(c.get("tags_on_no_valid_ip", ())),
    ),
    # remote UDF: url stands in for the function ARN (the transport
    # here is plain HTTP; SigV4/AWS client is out of scope)
    "aws_lambda": lambda df, c: __import__(
        "data_prepper_spark.operators.remote", fromlist=["remote"]
    ).lambda_processor(
        df,
        c["url"],
        batch_size=c.get("batch", {}).get("threshold", {}).get(
            "event_count", 100
        ),
        response_events_match=c.get("response_events_match", True),
        tags_on_failure=tuple(
            c.get("tags_on_failure", ("lambda_failure",))
        ),
    ),
}


def _split_many(df, entries):
    for e in entries:
        df = mutate.split_string(df, e["source"], e["delimiter"])
    return df


def _subst_many(df, entries):
    for e in entries:
        df = mutate.substitute_string(df, e["source"], e["from"], e["to"])
    return df


def _replace_many(df, entries):
    for e in entries:
        df = mutate.replace_string(df, e["source"], e["from"], e["to"])
    return df


class PipelineResult:
    """What each sink received (DataFrames are lazy until written)."""

    def __init__(self):
        self.sinks: list[tuple[str, DataFrame]] = []
        self.output: DataFrame | None = None  # feed for downstream pipelines


def _load_source(spark: SparkSession, src: dict, upstream: dict[str, PipelineResult]) -> DataFrame:
    if "pipeline" in src:
        name = src["pipeline"] if isinstance(src["pipeline"], str) else src["pipeline"]["name"]
        if name not in upstream:
            raise ValueError(f"upstream pipeline {name!r} not built yet")
        return upstream[name].output
    if "parquet" in src:
        return spark.read.parquet(src["parquet"]["path"])
    if "json" in src:
        cfg = src["json"]
        reader = spark.read
        if "schema" in cfg:
            reader = reader.schema(cfg["schema"])
        return reader.json(cfg["path"])
    if "csv" in src:
        cfg = src["csv"]
        return spark.read.csv(cfg["path"], header=cfg.get("header", True))
    if "file" in src:
        # reference file source (FileSource.java): one event per line
        # as {message: line}; codec json parses each line instead
        cfg = src["file"]
        if cfg.get("codec") == "json":
            return spark.read.json(cfg["path"])
        from pyspark.sql import functions as F

        return spark.read.text(cfg["path"]).select(
            F.col("value").alias("message")
        )
    if "stdin" in src:
        from .sources.stdin import read_stdin

        cfg = src["stdin"] or {}
        return read_stdin(spark, max_lines=cfg.get("max_lines"))
    if "log_generator" in src:
        cfg = src["log_generator"] or {}
        return apache_log_generator(spark, int(cfg.get("count", 1000)))
    if "random" in src:
        # reference common/.../RandomStringSource.java:24 (random UUIDs);
        # deterministic here: uuid derived from the row id
        from pyspark.sql import functions as F

        cfg = src["random"] or {}
        return spark.range(int(cfg.get("count", 100))).select(
            F.md5(F.col("id").cast("string")).alias("message")
        )
    raise ValueError(f"unsupported source {list(src)}")


def apache_log_generator(spark: SparkSession, count: int) -> DataFrame:
    """Deterministic Apache-common-log generator (the reference's
    log_generator source / ApacheLogFaker.java:16) — pure SQL, no UDF."""
    from pyspark.sql import functions as F

    ips = F.concat(
        F.lit("10."), (F.col("id") % 250).cast("string"),
        F.lit("."), (F.col("id") * 7 % 250).cast("string"),
        F.lit("."), (F.col("id") * 13 % 250).cast("string"),
    )
    users = F.element_at(
        F.array(F.lit("alice"), F.lit("bob"), F.lit("carol"), F.lit("-")),
        (F.col("id") % 4 + 1).cast("int"),
    )
    verbs = F.element_at(
        F.array(F.lit("GET"), F.lit("POST"), F.lit("PUT"), F.lit("DELETE")),
        (F.col("id") % 4 + 1).cast("int"),
    )
    paths = F.concat(F.lit("/page/"), (F.col("id") % 97).cast("string"))
    codes = F.element_at(
        F.array(F.lit("200"), F.lit("200"), F.lit("404"), F.lit("500")),
        (F.col("id") % 4 + 1).cast("int"),
    )
    ts = F.date_format(
        F.timestamp_seconds(F.lit(946684800) + F.col("id") * 60),
        "dd/MMM/yyyy:HH:mm:ss Z",
    )
    return spark.range(count).select(
        F.concat(
            ips, F.lit(" - "), users, F.lit(" ["), ts, F.lit('] "'),
            verbs, F.lit(" "), paths, F.lit(' HTTP/1.0" '), codes,
            F.lit(" "), (F.col("id") % 5000 + 100).cast("string"),
        ).alias("log")
    )


def _write_sink(sink_cfg: dict, df: DataFrame) -> None:
    if "parquet" in sink_cfg:
        cfg = sink_cfg["parquet"]
        w = df.write.mode(cfg.get("mode", "overwrite"))
        if cfg.get("partition_by"):
            w = w.partitionBy(*cfg["partition_by"])
        w.parquet(cfg["path"])
    elif "json" in sink_cfg:
        df.write.mode("overwrite").json(sink_cfg["json"]["path"])
    elif "stdout" in sink_cfg:
        df.show(int(sink_cfg["stdout"].get("rows", 20)) if sink_cfg["stdout"] else 20)
    elif "opensearch" in sink_cfg:
        # the engine's bulk-index analog (SURVEY §2.2 opensearch sink):
        # serialize each event as its JSON document and build the local
        # physical index. There is no cluster in this environment, so
        # `index_dir` is required — loud, not a silent remote no-op.
        cfg = sink_cfg["opensearch"]
        index_dir = cfg.get("index_dir")
        if not index_dir:
            raise ValueError(
                "opensearch sink: no cluster in this environment; set "
                "index_dir to build the local physical index (then "
                "query it with index.query / index.dsl)"
            )
        import os as _os

        from pyspark.sql import functions as F

        from .index.build import BuildConfig, build_index

        content = (
            F.col(cfg["content_column"]).cast("string")
            if cfg.get("content_column")
            else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        )
        corpus = df.select(
            F.lit(str(cfg.get("index", "events"))).alias("repo"),
            F.sha2(content, 256).alias("path"),
            F.lit("c0").alias("commit"),
            F.lit("json").alias("lang"),
            content.alias("content"),
            F.sha2(content, 256).alias("content_sha256"),
        )
        cpath = _os.path.join(index_dir, "corpus.parquet")
        corpus.write.mode("overwrite").parquet(cpath)
        build_index(
            df.sparkSession, cpath, _os.path.join(index_dir, "index"),
            BuildConfig(n_buckets=8),
        )
    elif "noop" in sink_cfg:
        pass
    else:
        raise ValueError(f"unsupported sink {list(sink_cfg)}")


def build_pipelines(
    spark: SparkSession, config: dict | str, execute_sinks: bool = True
) -> dict[str, PipelineResult]:
    """Compile (and optionally execute) a multi-pipeline YAML config.

    Returns per-pipeline results with the routed DataFrame each sink
    received. Pipelines are topologically ordered by their
    `source.pipeline` references (the reference builds connectors the
    same way, PipelineTransformer.java:349-382)."""
    if isinstance(config, str):
        config = yaml.safe_load(config)

    results: dict[str, PipelineResult] = {}
    pending = dict(config)
    while pending:
        progressed = False
        for name in list(pending):
            spec = pending[name]
            src = spec["source"]
            dep = src.get("pipeline") if isinstance(src, dict) else None
            if dep is not None:
                dep_name = dep if isinstance(dep, str) else dep["name"]
                if dep_name in pending:
                    continue  # build upstream first
            df = _load_source(spark, src, results)
            for proc in spec.get("processor", []) or []:
                (pname, pcfg), = proc.items()
                if pname not in PROCESSORS:
                    raise ValueError(f"unknown processor {pname!r}")
                df = PROCESSORS[pname](df, pcfg or {})
            res = PipelineResult()
            res.output = df
            routes = spec.get("route") or {}
            if isinstance(routes, list):  # list of {name: expr}
                routes = {k: v for d in routes for k, v in d.items()}
            routed = apply_routes(df, routes) if routes else {}
            for sink_cfg in spec.get("sink", []) or []:
                subscribed = sink_cfg.pop("routes", None) if isinstance(sink_cfg, dict) else None
                if subscribed:
                    # a sink subscribed to several routes receives the
                    # union of matching events, deduplicated per event
                    # copy (reference SinkModel route subscription)
                    sunk = routed[subscribed[0]]
                    for r in subscribed[1:]:
                        sunk = sunk.unionByName(routed[r])
                    if len(subscribed) > 1:
                        sunk = sunk.distinct()
                    res.sinks.append((f"{name}:{'+'.join(subscribed)}", sunk))
                else:
                    sunk = df
                    res.sinks.append((name, sunk))
                if execute_sinks:
                    _write_sink(sink_cfg, sunk)
            results[name] = res
            del pending[name]
            progressed = True
        if not progressed:
            raise ValueError(
                f"pipeline cycle or missing upstream among {list(pending)}"
            )
    return results
