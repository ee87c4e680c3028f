"""`aggregate` processor actions as native grouped aggregations
(SURVEY.md §2.5; reference aggregate-processor/.../AggregateProcessor.java:35
holds per-key in-memory state flushed on a processing-time window —
in batch the window collapses to a plain groupBy; streaming variants
live in data_prepper_spark.streaming).

The reference shuffles by identification_keys before aggregating
(RequiresPeerForwarding, SURVEY.md §2.8); Spark's groupBy does the
same hash exchange with map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .expression import dp_expr


def aggregate_count(
    df: DataFrame,
    identification_keys: list[str],
    count_key: str = "aggr._count",
    aggregate_when: str | None = None,
    output_format: str = "raw",
    metric_name: str = "count",
    event_time_col: str | None = None,
) -> DataFrame:
    """count action (CountAggregateAction.java:46). output_format
    'raw' emits the identification keys + count; 'otel_metrics' emits
    the reference's Sum-metric event shape (name/description/unit/
    isMonotonic/value/startTime/time — :52-54, :171-176), with the
    group window bounds from min/max event time when a time column is
    given."""
    if aggregate_when:
        df = df.filter(dp_expr(aggregate_when))
    key = count_key.replace(".", "_")
    aggs = [F.count("*").alias(key)]
    if event_time_col:
        aggs += [
            F.date_format(
                F.min(event_time_col), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
            ).alias("startTime"),
            F.date_format(
                F.max(event_time_col), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
            ).alias("time"),
        ]
    out = df.groupBy(*identification_keys).agg(*aggs)
    if output_format == "raw":
        return out
    if output_format != "otel_metrics":
        raise ValueError(output_format)
    cols = [
        F.lit(metric_name).alias("name"),
        F.lit("Number of events").alias("description"),
        F.lit("1").alias("unit"),
        F.lit(True).alias("isMonotonic"),
        F.col(key).cast("double").alias("value"),
        F.lit("AGGREGATION_TEMPORALITY_DELTA").alias("aggregationTemporality"),
        F.lit("sum").alias("kind"),
        F.struct(*identification_keys).alias("attributes"),
    ]
    if event_time_col:
        cols += [F.col("startTime"), F.col("time")]
    return out.select(*cols)


def aggregate_histogram(
    df: DataFrame,
    identification_keys: list[str],
    key: str,
    buckets: list[float],
) -> DataFrame:
    """histogram action (HistogramAggregateAction.java:47): explicit
    bucket boundaries; emits per-group bucket counts + min/max/sum/count.
    Bucket id = number of boundaries <= value (0 = underflow)."""
    c = F.col(key)
    bucket = sum(
        (F.when(c >= F.lit(b), 1).otherwise(0) for b in buckets),
        F.lit(0),
    )
    per_bucket = (
        df.withColumn("bucket", bucket)
        .groupBy(*identification_keys, "bucket")
        .agg(
            F.count("*").alias("bucket_count"),
            F.min(c).alias("min_value"),
            F.max(c).alias("max_value"),
            F.sum(c).alias("sum_value"),
        )
    )
    return per_bucket


def aggregate_put_all(
    df: DataFrame, identification_keys: list[str], value_keys: list[str]
) -> DataFrame:
    """put_all action (PutAllAggregateAction.java:31): last-write-wins
    merge of all events' fields per key. Batch semantics: last non-null
    value per column (reference merges in arrival order; we define
    arrival order = max to stay deterministic for the oracle)."""
    return df.groupBy(*identification_keys).agg(
        *[F.max(k).alias(k) for k in value_keys]
    )


def aggregate_append(
    df: DataFrame,
    identification_keys: list[str],
    value_key: str,
    sort: bool = True,
) -> DataFrame:
    """append action (AppendAggregateAction.java:37): values -> list per
    key. `sort=True` makes the list deterministic across partitionings
    (the reference preserves arrival order, which a parallel engine
    cannot reproduce; sorted is the canonical form)."""
    lst = F.collect_list(value_key)
    if sort:
        lst = F.sort_array(lst)
    return df.groupBy(*identification_keys).agg(lst.alias(f"{value_key}_list"))


def remove_duplicates(
    df: DataFrame, identification_keys: list[str], order_by: str | None = None
) -> DataFrame:
    """remove_duplicates action (RemoveDuplicatesAggregateAction.java:26):
    keep the first event per key. Batch determinism: "first" = lowest
    order_by value (required; arrival order is not defined in a
    distributed batch)."""
    if order_by is None:
        return df.dropDuplicates(identification_keys)
    from pyspark.sql import Window

    w = Window.partitionBy(*identification_keys).orderBy(F.col(order_by))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def percent_sampler(
    df: DataFrame, percent: float, hash_cols: list[str]
) -> DataFrame:
    """percent_sampler action (PercentSamplerAggregateAction.java:25):
    deterministic hash sampling (stable across runs/parallelism, unlike
    df.sample) — pass only ~percent% of events."""
    h = F.pmod(F.xxhash64(*hash_cols), F.lit(10_000))
    return df.filter(h < F.lit(int(percent * 100)))


def tail_sampler(
    df: DataFrame,
    trace_key: str,
    error_condition: str,
    percent: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """tail_sampler action (TailSamplerAggregateAction.java:35): keep
    ALL events of a trace if any event in it matches the error
    condition; otherwise keep the trace with probability percent%
    (deterministic by trace hash). Batch form of the reference's
    wait-period buffering."""
    err = (
        df.groupBy(trace_key)
        .agg(F.max(F.when(dp_expr(error_condition), 1).otherwise(0)).alias("_err"))
    )
    sampled = F.pmod(F.xxhash64(trace_key), F.lit(10_000)) < F.lit(
        int(percent * 100)
    )
    # left_semi WITHOUT a broadcast hint: the keep-set is one row per
    # sampled trace, which grows with the input — AQE may still choose
    # broadcast when it is small, but forcing it would OOM at scale
    keep = err.filter((F.col("_err") == 1) | sampled).select(trace_key)
    return df.join(keep, trace_key, "left_semi")
